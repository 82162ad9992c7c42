package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.op.Env
import graft.streaming.{AppRunner, Io}

object SparkSpec {
  // NOT a lazy val: every suite shares this session, so a context that
  // dies mid-run (OOM-killed executor thread, an errant stop()) must
  // not cascade-fail every later suite with "SparkContext was shut
  // down" — the accessor re-creates the session when the cached one's
  // context is stopped (driver-red round 17 was exactly this cascade).
  private var cached: SparkSession = null
  def spark: SparkSession = synchronized {
    if (cached == null || cached.sparkContext.isStopped) cached = build()
    cached
  }
  private def build(): SparkSession = {
    // a stopped context leaves the default-session slots pointing at
    // the dead session; clear them or builder().getOrCreate() may hand
    // the corpse back
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      // JSON documents are case-sensitive (content-type vs Content-Type
      // are DIFFERENT fields in the reference's world)
      .config("spark.sql.caseSensitive", "true")
      // Mongo map semantics: a later duplicate key wins (mirrors
      // Q.session; Spark's default policy throws on duplicates)
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.expr.catalyst.GraftFunctions.register(s)
    s
  }
}

/** Batch-mode Io: named in-memory tables as sources, a map of captured
  * sinks — the golden-file convention shrunk to a unit test.
  */
final class TestIo(tables: Map[String, DataFrame]) extends Io {
  var sinks = Map.empty[String, DataFrame]
  def source(spark: SparkSession, kind: String, name: String,
      options: Map[String, String] = Map.empty): DataFrame =
    tables.getOrElse(name,
      throw new IllegalArgumentException(s"no test source $name"))
  def sink(kind: String, name: String, df: DataFrame,
      asString: Boolean, partId: String = "",
      options: Map[String, String] = Map.empty): Unit = sinks += name -> df
}

class AppRunnerSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def runner(io: TestIo) =
    new AppRunner(spark, io, Env(spark))

  test("stream part: $match pipeline from topic to topic") {
    val in = Seq(("a", 1, true), ("b", 2, false), ("c", 3, true))
      .toDF("_id", "value", "flag")
    val io = new TestIo(Map("in" -> in))
    runner(io).run(
      """{"application":"t1","version":"1.0","parts":[
           {"type":"stream","name":"s","fromTopic":"in","toTopic":"out",
            "pipeline":[{"$match":{"flag":true}}]}]}""")
    val out = io.sinks("out").collect()
    assert(out.map(_.getString(0)).sorted.toSeq == Seq("a", "c"))
  }

  test("merge part unions sources with missing columns") {
    val a = Seq(("a", 1)).toDF("_id", "x")
    val b = Seq(("b", 2.5)).toDF("_id", "y")
    val io = new TestIo(Map("ta" -> a, "tb" -> b))
    runner(io).run(
      """{"application":"t2","version":"1.0","parts":[
           {"type":"merge","name":"m","fromTopics":["ta","tb"],"toTopic":"out"}]}""")
    val out = io.sinks("out")
    assert(out.count() == 2)
    assert(out.columns.toSet == Set("_id", "x", "y"))
  }

  test("join part: on-expression equi-join with {_id, left, right} shape") {
    val l = Seq(("l1", "k1", 10), ("l2", "k2", 20)).toDF("_id", "k", "lv")
    val r = Seq(("r1", "k1", 99), ("r3", "k3", 30)).toDF("_id", "k", "rv")
    val io = new TestIo(Map("tl" -> l, "tr" -> r))
    val streams = runner(io).run(
      """{"application":"t3","version":"1.0","parts":[
           {"type":"join","name":"j","window":5000,
            "left":{"fromTopic":"tl","on":"$k"},
            "right":{"fromTopic":"tr","on":"$k"},
            "toTopic":"out"}]}""")
    val out = io.sinks("out").collect()
    assert(out.length == 1)
    val row = out.head
    assert(row.getAs[String]("_id") == "k1")
    assert(row.getAs[org.apache.spark.sql.Row]("left").getAs[String]("_id") == "l1")
    assert(row.getAs[org.apache.spark.sql.Row]("right").getAs[String]("_id") == "r1")
  }

  test("chained parts: fromStream resolves across order") {
    val in = Seq(("a", 5), ("b", 50)).toDF("_id", "v")
    val io = new TestIo(Map("in" -> in))
    runner(io).run(
      """{"application":"t4","version":"1.0","parts":[
           {"type":"stream","name":"second","fromStream":"first",
            "toTopic":"out","pipeline":[{"$match":{"v":{"$gt":10}}}]},
           {"type":"stream","name":"first","fromTopic":"in"}]}""")
    assert(io.sinks("out").collect().map(_.getString(0)).toSeq == Seq("b"))
  }

  test("aggregate part: put/patch/delete through batch reduction") {
    val cmds = Seq(
      ("x", "put", null, 1L, 7),
      ("x", "patch", """[{"op":"replace","path":"/v","value":9}]""", 2L, 0),
      ("y", "put", null, 3L, 5),
      ("x", "delete", null, 4L, 0))
      .toDF("_id", "_command", "_opsJson", "__ord", "v")
      .withColumn("_jwt", struct(lit("system").as("sub")))
      .withColumn("_ops", from_json(col("_opsJson"),
        org.apache.spark.sql.types.DataType.fromDDL(
          "array<struct<op:string,path:string,value:int>>")))
      .withColumn("_corr", concat(lit("c"), col("__ord")))
      .drop("_opsJson")
      .withColumn("v", when(col("v") === 0, lit(null)).otherwise(col("v")))
    val io = new TestIo(Map("acc-counter-command" -> cmds))
    val streams = runner(io).run(
      """{"application":"acc","version":"1.0","parts":[
           {"type":"aggregate","aggregateType":"acc-counter"}]}""")
    // x: put v=7 → patch v=9 → delete; final aggregate emission has _deleted
    val events = streams("acc-counter-event")
      .select("key", "value").as[(String, String)].collect()
    assert(events.count(_._1 == "x") == 3)
    assert(events.count(_._1 == "y") == 1)
    val xFinal = graft.json.Js.parse(
      streams("acc-counter-aggregate").where($"key" === "x")
        .select("value").as[String].collect().last)
    assert(xFinal.get("_seq").asLong() == 2)
    assert(xFinal.get("_deleted").asBoolean())
    val replies = streams("acc-counter-reply").count()
    assert(replies == 4)
  }
}
