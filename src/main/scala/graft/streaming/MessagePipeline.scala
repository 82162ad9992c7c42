package graft.streaming

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.json.Js
import graft.expr.{Ctx, ExprCompiler, QueryCompiler, VariantDoc}
import graft.op.{Env, Stages}

/** Pipeline compiler for SCHEMALESS message streams — `(key string,
  * value string-JSON)` columns, the reference's native model. Fields are
  * reached through a VariantType parse of the value (Spark 4
  * parse_json/variant_get); `$match` predicates extract typed values
  * directed by their literals, so the filter stays columnar. Structural
  * stages that would need a schema ($group, $project, ...) tell the user
  * to either declare one for the topic or use `$jq` (schema-free by
  * construction).
  */
object MessagePipeline {

  def isMessageShaped(df: DataFrame): Boolean =
    df.columns.toSet == Set("key", "value") &&
      df.schema("value").dataType == StringType

  def compile(pipeline: JsonNode, env: Env): DataFrame => DataFrame = {
    val stages: Seq[DataFrame => DataFrame] =
      Js.elems(pipeline).map { stageObj =>
        val (name, spec) = Js.asOp(stageObj).getOrElse(
          throw new IllegalArgumentException("stage must be a single-key object"))
        compileStage(name, spec, env)
      }
    df => stages.foldLeft(df)((d, s) => s(d))
  }

  private def ctxOf(df: DataFrame): Ctx = {
    val v = call_function("parse_json", col("value"))
    Ctx(new VariantDoc(v),
      typeOf = c =>
        try df.select(c).schema.head.dataType
        catch { case _: Exception => NullType })
  }

  private def compileStage(name: String, spec: JsonNode, env: Env)
      : DataFrame => DataFrame = name match {
    case "$match" =>
      df => df.filter(QueryCompiler.compile(spec, ctxOf(df)))
    case "$setKey" =>
      df => df.withColumn("key",
        ExprCompiler.compile(spec, ctxOf(df)).cast(StringType))
    case "$send" =>
      df => df.withColumn("_topic",
        ExprCompiler.compile(spec.get("topic"), ctxOf(df)).cast(StringType))
    case "$jq" => // schema-free whole-message transform
      df => {
        val script =
          if (spec.isTextual) {
            val s = spec.asText()
            if (s.contains("\n") || s.trim.startsWith(".") ||
              s.trim.startsWith("{")) s
            else env.scripts(s)
          } else spec.get("script").asText()
        val program = graft.jq.MiniJq.compile(script, env.scripts)
        val apply = udf((json: String) => Js.render(program(Js.parse(json))))
        df.withColumn("value", apply(col("value")))
          .withColumn("key",
            coalesce(get_json_object(col("value"), "$._id"), col("key")))
      }
    case "$trace" | "$log" | "$throttle" => df => df
    case "$per" => df => PerStage(df, spec)
    case "$deduplicate" =>
      df => {
        val e = ExprCompiler.compile(spec.get("expression"), ctxOf(df))
        df.withColumn("__dedup", e.cast(StringType))
          .dropDuplicates("__dedup").drop("__dedup")
      }
    case other =>
      throw new IllegalArgumentException(
        s"stage $other needs a typed schema: declare one for the topic " +
          "or transform with $jq")
  }
}
