package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.json.Js
import graft.op.{Env, HttpResult, HttpTransport}
import graft.streaming.MessagePipeline

/** The message-mode stages added in round 2: $jslt, $unwind, $count,
  * $validate, $delay, $http — all over schemaless (key, value) frames.
  */
object MsgEchoHttp extends HttpTransport {
  def apply(m: String, u: String, h: String, b: String): HttpResult =
    if (u.endsWith("/boom")) HttpResult(500, """{"err":1}""")
    else if (u.endsWith("/text")) HttpResult(200, "plain, not json")
    else HttpResult(200, s"""{"echo":"$u"}""")
}

class MessagePipelineSpec2 extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def msgs(docs: String*) =
    docs.toSeq.toDF("value")
      .select(get_json_object(col("value"), "$._id").as("key"), col("value"))

  private def run(pipeline: String, df: org.apache.spark.sql.DataFrame,
      env: Env = Env(spark)) =
    MessagePipeline.compile(Js.parse(pipeline), env)(df)

  test("$jslt transforms the whole message") {
    val out = run(
      """[{"$jslt":{"script":"{ \"_id\": ._id, \"v2\": .v * 3, * : . }"}}]""",
      msgs("""{"_id":"a","v":7,"w":1}""")).collect().head
    val v = Js.parse(out.getAs[String]("value"))
    assert(v.get("v2").asLong() == 21 && v.get("w").asInt() == 1)
  }

  test("$unwind explodes an array path; empty/missing drops") {
    val out = run("""[{"$unwind":"$items"}]""",
      msgs("""{"_id":"a","items":[1,2],"t":"x"}""",
        """{"_id":"b","items":[]}""", """{"_id":"c"}"""))
      .select("value").as[String].collect().map(Js.parse)
    assert(out.length == 2)
    assert(out.map(_.get("items").asInt()).sorted.toSeq == Seq(1, 2))
    assert(out.forall(_.get("t").asText() == "x"))
  }

  test("$count emits one counting message") {
    val out = run("""[{"$count":"n"}]""",
      msgs("""{"_id":"a"}""", """{"_id":"b"}""")).collect()
    assert(out.length == 1)
    assert(Js.parse(out.head.getAs[String]("value")).get("n").asLong() == 2)
  }

  test("$validate annotates failing messages in place") {
    val out = run(
      """[{"$validate":{"conditions":[{"v":{"$gte":0},"$code":"NEG"}]}}]""",
      msgs("""{"_id":"a","v":1}""", """{"_id":"b","v":-4}"""))
      .select("value").as[String].collect().map(Js.parse)
    val bad = out.find(_.get("_id").asText() == "b").get
    assert(bad.get("_error").asBoolean())
    assert(bad.get("errors").get(0).get("code").asText() == "NEG")
    assert(!out.find(_.get("_id").asText() == "a").get.has("_error"))
  }

  test("$delay stamps routing columns on message frames") {
    val out = run("""[{"$delay":{"duration":250,"topic":"later"}}]""",
      msgs("""{"_id":"a"}""")).collect().head
    assert(out.getAs[String]("_topic") == "later")
    assert(out.getAs[Long]("_delay_ms") == 250L)
  }

  test("$http splices the response (or httpError) into the message") {
    val env = Env(spark, http = MsgEchoHttp)
    val out = run(
      """[{"$http":{"url":{"$concat":["http://h/","$p"]},
                    "method":"GET","as":"resp"}}]""",
      msgs("""{"_id":"a","p":"ok"}""", """{"_id":"b","p":"boom"}"""), env)
      .select("value").as[String].collect().map(Js.parse)
    val good = out.find(_.get("_id").asText() == "a").get
    assert(good.get("resp").get("echo").asText() == "http://h/ok")
    val bad = out.find(_.get("_id").asText() == "b").get
    assert(bad.get("httpError").get("statusCode").asInt() == 500)
    assert(!bad.has("resp"))
  }

  test("$first/$last/$mergeObjects rank by __ord, not partition order") {
    // The frame's row order deliberately disagrees with __ord (the
    // transport arrival stamp) and the rows are scattered across
    // partitions: bare first()/last()/unsorted-merge would pick the
    // sequence head / tail instead of the __ord winner.
    val docs = (63 to 0 by -1).map { i =>
      val extra =
        if (i == 0) ""","b":"x"""" else if (i == 63) ""","c":"z"""" else ""
      (i.toLong,
        s"""{"_id":"d$i","g":"k","v":"v$i","m":{"a":$i$extra}}""")
    }
    val df = docs.toDF("__ord", "value").repartition(8)
      .select(get_json_object(col("value"), "$._id").as("key"),
        col("value"), col("__ord"))
    val out = run(
      """[{"$group":{"_id":"$g",
                     "f":{"$first":"$v"},
                     "l":{"$last":"$v"},
                     "m":{"$mergeObjects":"$m"}}}]""", df)
      .select("value").as[String].collect().map(Js.parse)
    assert(out.length == 1)
    val v = out.head
    assert(v.get("f").asText() == "v0")
    assert(v.get("l").asText() == "v63")
    assert(v.get("m").get("a").asInt() == 63) // highest __ord wins
    assert(v.get("m").get("b").asText() == "x") // earliest-only field kept
    assert(v.get("m").get("c").asText() == "z")
  }

  test("$http non-JSON 2xx body degrades to a string, not a batch failure") {
    val env = Env(spark, http = MsgEchoHttp)
    val out = run(
      """[{"$http":{"url":{"$concat":["http://h/","$p"]},
                    "method":"GET","as":"resp"}}]""",
      msgs("""{"_id":"a","p":"text"}""", """{"_id":"b","p":"ok"}"""), env)
      .select("value").as[String].collect().map(Js.parse)
    val textual = out.find(_.get("_id").asText() == "a").get
    assert(textual.get("resp").asText() == "plain, not json")
    val good = out.find(_.get("_id").asText() == "b").get
    assert(good.get("resp").get("echo").asText() == "http://h/ok")
  }
}

/** Message-mode $redact and $bucket (round-2 additions). */
class MessagePipelineSpec3 extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def msgs(docs: String*) =
    docs.toSeq.toDF("value")
      .select(get_json_object(col("value"), "$._id").as("key"), col("value"))

  private def run(pipeline: String, df: org.apache.spark.sql.DataFrame) =
    MessagePipeline.compile(Js.parse(pipeline), Env(spark))(df)

  test("$redact prunes subtrees by per-level condition") {
    val out = run(
      """[{"$redact":{"$cond":{"if":{"$eq":["$level","public"]},
                               "then":"$$DESCEND","else":"$$PRUNE"}}}]""",
      msgs(
        """{"_id":"a","level":"public","x":1,
            "sub":{"level":"secret","y":2},
            "open":{"level":"public","z":3}}""",
        """{"_id":"b","level":"secret","x":9}"""))
      .select("value").as[String].collect().map(Js.parse)
    assert(out.length == 1) // doc b pruned at the root
    val a = out.head
    assert(a.get("x").asInt() == 1)
    assert(!a.has("sub")) // secret subtree pruned
    assert(a.get("open").get("z").asInt() == 3)
  }

  test("$bucket groups by boundaries with accumulators") {
    val out = run(
      """[{"$bucket":{"groupBy":"$v","boundaries":[0,10,100],
                      "default":"other",
                      "output":{"n":{"$count":{}},"s":{"$sum":"$v"}}}}]""",
      msgs("""{"_id":"a","v":3}""", """{"_id":"b","v":7}""",
        """{"_id":"c","v":55}""", """{"_id":"d","v":-1}"""))
      .select("value").as[String].collect().map(Js.parse)
      .map(n => n.get("_id").asText() -> n).toMap
    assert(out("0.0").get("n").asLong() == 2)
    assert(out("0.0").get("s").asDouble() == 10.0)
    assert(out("10.0").get("n").asLong() == 1)
    assert(out("other").get("n").asLong() == 1)
  }
}

/** $type/$isArray are per-row over variant (schemaless) values. */
class VariantTypeSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  test("variant $type and $isArray resolve at runtime") {
    val df = Seq(
      """{"_id":"a","v":[1,2]}""",
      """{"_id":"b","v":"text"}""",
      """{"_id":"c","v":5}""",
      """{"_id":"d","v":{"x":1}}""")
      .toDF("value")
      .select(get_json_object(col("value"), "$._id").as("key"), col("value"))
    val out = MessagePipeline.compile(Js.parse(
      """[{"$addFields":{"t":{"$type":"$v"},"ia":{"$isArray":"$v"}}}]"""),
      Env(spark))(df)
      .select("value").as[String].collect().map(Js.parse)
      .map(n => n.get("_id").asText() -> n).toMap
    assert(out("a").get("t").asText() == "array" && out("a").get("ia").asBoolean())
    assert(out("b").get("t").asText() == "string" && !out("b").get("ia").asBoolean())
    assert(out("c").get("t").asText() == "long")
    assert(out("d").get("t").asText() == "object")
  }
}
