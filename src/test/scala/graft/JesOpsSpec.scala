package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.op.{Env, Pipeline}

/** $jes-* state-management operators over event streams
  * (docs/aggregation_operators.md:1231-1337) + parameter substitution
  * (docs/parameters.md) + pipeline file inlining.
  */
class JesOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val env = Env(spark)

  private def events = Seq(
    ("e1", Seq(("add", "/myfield", "1")), 10, 20),
    ("e2", Seq(("replace", "/myfield", "2")), 0, 1),
    ("e3", Seq(("remove", "/other", null)), 5, 5))
    .toDF("_id", "_ops_raw", "bval", "aval")
    .withColumn("_ops", expr(
      "transform(_ops_raw, x -> named_struct('op', x._1, 'path', x._2, 'value', x._3))"))
    .withColumn("_before", struct(col("bval").as("myfield")))
    .withColumn("_after", struct(col("aval").as("myfield")))
    .drop("_ops_raw", "bval", "aval")

  test("$jes-added / $jes-removed match on the _ops patch") {
    val added = Pipeline.run(events,
      """[{"$match":{"$expr":{"$jes-added":"/myfield"}}}]""", env)
    assert(added.select("_id").as[String].collect().toSeq == Seq("e1"))
    val removed = Pipeline.run(events,
      """[{"$match":{"$expr":{"$jes-removed":"/other"}}}]""", env)
    assert(removed.select("_id").as[String].collect().toSeq == Seq("e3"))
  }

  test("$jes-changed with and without from/to") {
    val changed = Pipeline.run(events,
      """[{"$match":{"$expr":{"$jes-changed":{"pointer":"/myfield"}}}}]""",
      env)
    assert(changed.select("_id").as[String].collect().sorted.toSeq ==
      Seq("e1", "e2"))
    val transition = Pipeline.run(events,
      """[{"$match":{"$expr":{"$jes-changed":
           {"pointer":"/myfield","from":0,"to":1}}}}]""", env)
    assert(transition.select("_id").as[String].collect().toSeq == Seq("e2"))
  }

  test("$jes-href and $jes-name-uuid") {
    val df = Seq(("x", "42")).toDF("_id", "other")
    val out = Pipeline.run(df,
      """[{"$set":{
           "href":{"$jes-href":{"app":"myapp","type":"mytype","id":"$other"}},
           "nuid":{"$jes-name-uuid":{"scope":"myentity","key":"$other"}}}}]""",
      env).collect().head
    assert(out.getAs[String]("href") == "/myapp/mytype/42")
    assert(out.getAs[String]("nuid") ==
      java.util.UUID.nameUUIDFromBytes("myentity:42".getBytes("UTF-8")).toString)
  }

  test("parameters substitute with prefix:NAME:suffix and object values") {
    val in = Seq(("a", 5)).toDF("_id", "v")
    val io = new TestIo(Map("cmds-prod" -> in))
    val streams = new graft.streaming.AppRunner(spark, io, env,
      config = Map("environment" -> "prod")).run(
      """{"application":"p1","version":"1.0",
         "parameters":{"LIMIT":3,"TOPIC":"cmds"},
         "parts":[
           {"type":"stream","name":"s","fromTopic":"${TOPIC}${-:ENV}",
            "toTopic":"out_p1",
            "pipeline":[{"$match":{"v":{"$gt":"${LIMIT}"}}}]}]}""")
    assert(io.sinks("out_p1").count() == 1)
  }
}
