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

  /** Resolve a validator spec: filename → load (relative to the including
    * file, `cur`); `include` files merge their conditions into the
    * including validator (docs/validator.md:76+).
    */
  def resolve(spec: JsonNode, scripts: String => String,
      cur: String = ""): JsonNode = {
    val (node, base) =
      if (spec.isTextual) {
        val full = Js.relativeTo(cur, spec.asText())
        (graft.json.Js.parseYaml(scripts(full)), full)
      } else (spec, cur)
    if (!node.has("include")) node
    else {
      val out = graft.json.Js.obj()
      val conds = graft.json.Js.arr()
      graft.json.Js.elems(node.get("include")).foreach { inc =>
        val sub = resolve(inc, scripts, base)
        Option(sub.get("conditions"))
          .foreach(cs => graft.json.Js.elems(cs).foreach(conds.add))
      }
      Option(node.get("conditions"))
        .foreach(cs => graft.json.Js.elems(cs).foreach(conds.add))
      out.set[JsonNode]("conditions", conds)
      out
    }
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
