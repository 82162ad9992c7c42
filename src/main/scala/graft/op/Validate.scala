package graft.op

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.json.Js
import graft.expr.QueryCompiler

/** `$validate` (docs/aggregation_stages.md:857-879, docs/validator.md):
  * annotates failing messages with `_error: true` and
  * `errors: [{location, code}]`.
  *
  * Field conditions apply only when the field exists (docs/validator.md:3);
  * presence itself is checked with `$exists`. The `location` is the JSON
  * pointer of the field (its parent for a failed `$exists`). The relational
  * model represents "absent" as NULL, so the annotations are NULL on valid
  * messages.
  */
object Validate {

  /** Resolve a validator spec (docs/validator.md): filename → load
    * (relative to the including file, `cur`); `include` files merge their
    * conditions AND macros into the including validator (the includer's
    * macros win on name clashes); `_name_` strings expand to the macro's
    * expression; `{ref: "file"}` objects are replaced by the referred
    * validator's resolved contents (which do NOT see the referring
    * macros). Returns `{conditions: [...]}` fully expanded.
    */
  def resolve(spec: JsonNode, scripts: String => String,
      cur: String = ""): JsonNode = {
    val (conds, _) = resolveFull(spec, scripts, cur)
    val out = graft.json.Js.obj()
    val arr = graft.json.Js.arr()
    conds.foreach(arr.add)
    out.set[JsonNode]("conditions", arr)
    out
  }

  private def resolveFull(spec: JsonNode, scripts: String => String,
      cur: String): (Seq[JsonNode], Map[String, JsonNode]) = {
    val (node, base) =
      if (spec.isTextual) {
        val full = Js.relativeTo(cur, spec.asText())
        (graft.json.Js.parseYaml(scripts(full)), full)
      } else (spec, cur)
    val (incConds, incMacros) =
      Option(node.get("include")).map(Js.elems).getOrElse(Nil)
        .foldLeft((Seq.empty[JsonNode], Map.empty[String, JsonNode])) {
          case ((cs, ms), inc) =>
            val (c, m) = resolveFull(inc, scripts, base)
            (cs ++ c, ms ++ m)
        }
    val ownMacros = Option(node.get("macros"))
      .map(m => Js.fields(m).toMap).getOrElse(Map.empty)
    val macros = incMacros ++ ownMacros // the includer wins
    val ownConds =
      Option(node.get("conditions")).map(Js.elems).getOrElse(Nil)
    val conds =
      (incConds ++ ownConds).map(expand(_, macros, scripts, base))
    (conds, macros)
  }

  private val MacroRef = "^_(.+)_$".r

  private def expand(n: JsonNode, macros: Map[String, JsonNode],
      scripts: String => String, base: String): JsonNode = n match {
    case t if t.isTextual =>
      t.asText() match {
        case MacroRef(name) if macros.contains(name) =>
          expand(macros(name), macros, scripts, base)
        case _ => t
      }
    case o if o.isObject && o.size() == 1 && o.has("ref") =>
      // referred validators resolve with their OWN macros only
      resolve(o.get("ref"), scripts, base)
    case o if o.isObject =>
      val out = graft.json.Js.obj()
      Js.fields(o).foreach { case (k, v) =>
        out.set[JsonNode](k, expand(v, macros, scripts, base))
      }
      out
    case a if a.isArray =>
      val out = graft.json.Js.arr()
      Js.elems(a).foreach(e => out.add(expand(e, macros, scripts, base)))
      out
    case other => other
  }

  def apply(df: DataFrame, spec: JsonNode): DataFrame = {
    val ctx = Stages.ctxOf(df)
    val conds = Js.elems(spec.get("conditions"))

    val errorCols: Seq[Column] = conds.map { cond =>
      val code = Option(cond.get("$code")).orElse {
        // $code may sit inside the field's operator object
        Js.fields(cond).collectFirst {
          case (_, v) if v.isObject && v.has("$code") => v.get("$code")
        }
      }.map(_.asText())

      val fieldEntries = Js.fields(cond).filter(_._1 != "$code")
      val (pass, location) = fieldEntries match {
        case Seq((field, fieldCond)) if !field.startsWith("$") =>
          val stripped = stripCode(fieldCond)
          val hasExists = stripped.isObject && stripped.has("$exists")
          val target = ctx.doc.path(field)
          val matched = QueryCompiler.compile(
            objOf(field, stripped), ctx)
          val parts = field.split("\\.")
          val loc =
            if (hasExists) "/" + parts.init.mkString("/")
            else "/" + parts.mkString("/")
          val ok =
            if (hasExists) matched
            else target.isNull || coalesce(matched, lit(false))
          (ok, loc.replaceAll("//", "/"))
        case _ => // whole-message condition
          (coalesce(QueryCompiler.compile(stripCode(cond), ctx), lit(false)),
            "/")
      }
      when(!pass,
        struct(lit(location).as("location"),
          code.map(lit(_)).getOrElse(lit(null).cast("string")).as("code")))
        .otherwise(lit(null))
    }

    val errors = filter(array(errorCols: _*), _.isNotNull)
    df.withColumn("errors", when(size(errors) > 0, errors))
      .withColumn("_error", when(size(errors) > 0, lit(true)))
  }

  private def stripCode(n: JsonNode): JsonNode =
    if (n.isObject && n.has("$code")) {
      val o = n.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
      o.remove("$code"); o
    } else n

  private def objOf(field: String, cond: JsonNode): JsonNode = {
    val o = Js.obj()
    o.set[JsonNode](field, cond)
    o
  }
}
