package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.jq.MiniJslt
import graft.json.Js
import graft.op.{Env, HttpResult, HttpTransport, ObjectStore, Pipeline}

/** Top-level so task-deserialized copies readResolve to this singleton and
  * writes stay visible to the test.
  */
object JsltFakes {
  object store extends ObjectStore {
    val data = new java.util.concurrent.ConcurrentHashMap[String, String]()
    def get(bucket: String, key: String): String = data.get(s"$bucket/$key")
    def put(bucket: String, key: String, content: String): Unit =
      data.put(s"$bucket/$key", content)
  }
  object http extends HttpTransport {
    @volatile var lastBody: String = _
    def apply(m: String, u: String, h: String, b: String): HttpResult = {
      if (m == "POST") { lastBody = b; HttpResult(200, """{"ok":true}""") }
      else HttpResult(200, s"content-of-$u")
    }
  }
}

class JsltAndS3Spec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  test("MiniJslt: spread matcher, defs with params, imports") {
    val lib = "def decr(value) $value - 1\ndef incr(value) $value + 1"
    val f = MiniJslt.compile(
      """import "op.jslt" as op
        |.state | { "value" : op:decr(.value), * : . }""".stripMargin
        .replace(".state | ", ""), // subset: apply to .state via input
      load = { case "op.jslt" => lib })
    // JSLT fixtures pipe .state into the object; here the caller passes state
    val out = f(Js.parse("""{"value":5,"_id":"a","other":true}"""))
    assert(out.get("value").asLong() == 4)
    assert(out.get("_id").asText() == "a")
    assert(out.get("other").asBoolean())
  }

  test("$jslt expression operator and stage") {
    val df = Seq(("a", 3L)).toDF("_id", "v")
    val out = Pipeline.run(df,
      """[{"$jslt":{"script":"{ \"_id\": ._id, \"v2\": .v * 7, \"tag\": \"t\", * : . }",
                    "schema":"_id string, v2 long, tag string, v long"}}]""",
      Env(spark))
    val r = out.collect().head
    assert(r.getAs[Long]("v2") == 21L)
    assert(r.getAs[String]("tag") == "t")
    assert(r.getAs[Long]("v") == 3L)
  }


  test("$s3Transfer fetches the url into the store") {
    val env = Env(spark, http = JsltFakes.http, store = JsltFakes.store)
    val df = Seq(("m1", "f1")).toDF("_id", "file")
    val out = Pipeline.run(df,
      """[{"$s3Transfer":{"url":{"$concat":["http://src/","$file"]},
           "bucket":"tb","key":"$file","as":"s3url"}}]""", env).collect()
    assert(out.head.getAs[String]("s3url") == "s3://tb/f1")
    assert(JsltFakes.store.get("tb", "f1") == "content-of-http://src/f1")
  }

  test("$s3Attachments posts multipart bodies from the store") {
    JsltFakes.store.put("ab", "doc1", "HELLO")
    val env = Env(spark, http = JsltFakes.http, store = JsltFakes.store)
    val df = Seq(Tuple1("m1")).toDF("_id")
      .withColumn("attachments", org.apache.spark.sql.functions.expr(
        """array(named_struct('bucket','ab','key','doc1','x-h','v1'))"""))
    val out = Pipeline.run(df,
      """[{"$s3Attachments":{"url":"http://dst","attachments":"$attachments"}}]""",
      env).collect()
    assert(out.head.getAs[org.apache.spark.sql.Row]("httpError") == null)
    assert(JsltFakes.http.lastBody.contains("HELLO"))
    assert(JsltFakes.http.lastBody.contains("x-h: v1"))
  }

  test("$lag attaches the provider snapshot") {
    val env = Env(spark, lag = () => """{"grp":{"t1":{"0":5}}}""")
    val df = Seq(Tuple1("m1")).toDF("_id")
    val out = Pipeline.run(df, """[{"$lag":{"as":"messageLag"}}]""", env)
    assert(out.collect().head.getAs[String]("messageLag")
      .contains("\"t1\""))
  }
}
