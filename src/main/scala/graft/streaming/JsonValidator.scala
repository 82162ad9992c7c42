package graft.streaming

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.json.Js

/** JVM-side validator for aggregate commands (docs/validator.md): the same
  * condition language as the $validate stage, evaluated over Jackson nodes
  * (commands are reduced per key on the JVM, not as Columns). A condition
  * may reference the current aggregate snapshot through the `_state` field
  * (docs/state.md:63).
  */
object JsonValidator {

  /** Evaluate all conditions; return [{location, code}...] for failures. */
  def validate(validator: JsonNode, command: ObjectNode,
      state: Option[ObjectNode]): ArrayNode = {
    val errors = Js.arr()
    val doc = command.deepCopy[ObjectNode]()
    state.foreach(s => doc.set[JsonNode]("_state", s))
    Option(validator.get("conditions")).foreach { conds =>
      Js.elems(conds).foreach { cond =>
        val code = Option(cond.get("$code")).map(_.asText())
          .orElse(Js.fields(cond).collectFirst {
            case (_, v) if v.isObject && v.has("$code") =>
              v.get("$code").asText()
          })
        val fields = Js.fields(cond).filter(_._1 != "$code")
        fields.foreach { case (field, fieldCond) =>
          if (!field.startsWith("$")) {
            val target = path(doc, field)
            if (fieldCond.isObject && fieldCond.has("conditions")) {
              // nested validator (docs/validator.md "Nesting"): the
              // subobject is the context; error locations are prefixed
              target.foreach {
                case sub: ObjectNode =>
                  Js.elems(validate(fieldCond, sub, None)).foreach { e =>
                    val nested = e.deepCopy[ObjectNode]()
                    val loc = nested.get("location").asText()
                    nested.put("location",
                      "/" + field.split("\\.").mkString("/") +
                        (if (loc == "/") "" else loc))
                    errors.add(nested)
                  }
                case _ =>
              }
            } else {
              val hasExists = fieldCond.isObject && fieldCond.has("$exists")
              // field conditions apply only when the field exists
              // (docs/validator.md:3), except $exists itself
              val applies = hasExists || target.isDefined
              if (applies && !matches(target, fieldCond)) {
                val err = Js.obj()
                val parts = field.split("\\.")
                val loc =
                  if (hasExists)
                    "/" + parts.init.mkString("/")
                  else "/" + parts.mkString("/")
                err.put("location", if (loc == "//") "/" else loc)
                code.foreach(err.put("code", _))
                errors.add(err)
              }
            }
          }
        }
      }
    }
    errors
  }

  private def path(n: JsonNode, p: String): Option[JsonNode] =
    p.split("\\.").foldLeft(Option(n): Option[JsonNode]) {
      case (cur, f) => cur.flatMap(c => Option(c.get(f)))
    }

  /** Field condition: operator object or implicit equality. */
  private def matches(target: Option[JsonNode], cond: JsonNode): Boolean =
    if (cond.isObject && Js.fields(cond).forall(_._1.startsWith("$")))
      Js.fields(cond).filter(_._1 != "$code").forall {
        case ("$exists", v) => target.isDefined == v.asBoolean()
        case ("$eq", v)     => target.contains(v)
        case ("$ne", v)     => !target.contains(v)
        case ("$gt", v)     => target.exists(t => compare(t, v) > 0)
        case ("$gte", v)    => target.exists(t => compare(t, v) >= 0)
        case ("$lt", v)     => target.exists(t => compare(t, v) < 0)
        case ("$lte", v)    => target.exists(t => compare(t, v) <= 0)
        case ("$in", v) =>
          target.exists(t => Js.elems(v).contains(t))
        case ("$nin", v) =>
          !target.exists(t => Js.elems(v).contains(t))
        case ("$type", v)   => target.exists(t => typeName(t) == v.asText())
        case ("$regex", v) =>
          target.exists(t =>
            t.isTextual &&
              java.util.regex.Pattern.compile(v.asText())
                .matcher(t.asText()).find())
        case ("$size", v) =>
          target.exists(t => t.isArray && t.size() == v.asInt())
        case (op, _) =>
          throw new IllegalArgumentException(s"validator operator $op")
      }
    else target.contains(cond)

  private def compare(a: JsonNode, b: JsonNode): Int =
    if (a.isNumber && b.isNumber) java.lang.Double.compare(a.asDouble(), b.asDouble())
    else a.asText().compareTo(b.asText())

  private def typeName(n: JsonNode): String =
    if (n.isTextual) "string"
    else if (n.isInt || n.isLong) "int"
    else if (n.isNumber) "double"
    else if (n.isBoolean) "bool"
    else if (n.isArray) "array"
    else if (n.isObject) "object"
    else if (n.isNull) "null"
    else "unknown"
}
