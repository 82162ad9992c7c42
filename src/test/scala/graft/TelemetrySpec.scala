package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.json.Js
import graft.op.{Env, HttpResult, HttpTransport}
import graft.streaming.{AppRunner, Telemetry}

/** OTel-shaped telemetry (docs/telemetry.md): OTLP/HTTP log export
  * through the pluggable HttpTransport, and the reference's flat
  * event-trace messages onto a traces topic.
  */
class TelemetrySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("OtlpLogSink posts an OTLP/HTTP logs request per entry") {
    var posts = Seq.empty[(String, String, String)]
    val http: HttpTransport = (method, url, _, body) => {
      posts :+= ((method, url, body)); HttpResult(200, "{}")
    }
    val sink = new Telemetry.OtlpLogSink("http://collector:4318", "app1", http)
    sink("graft.streams", "WARNING", "'boom'",
      "aaaaaaaabbbbccccddddeeeeeeeeeeee", "aaaaaaaabbbbcccc",
      """{"k":"v"}""")
    assert(posts.length == 1)
    val (method, url, body) = posts.head
    assert(method == "POST" && url == "http://collector:4318/v1/logs")
    val n = Js.parse(body)
    val rec = n.get("resourceLogs").get(0)
    assert(rec.get("resource").get("attributes").get(0)
      .get("value").get("stringValue").asText() == "app1")
    val lr = rec.get("scopeLogs").get(0).get("logRecords").get(0)
    assert(lr.get("severityNumber").asInt() == 13)
    assert(lr.get("severityText").asText() == "WARN")
    assert(lr.get("body").get("stringValue").asText() == "'boom'")
    assert(lr.get("traceId").asText() == "aaaaaaaabbbbccccddddeeeeeeeeeeee")
    assert(lr.get("spanId").asText() == "aaaaaaaabbbbcccc")
    assert(lr.get("timeUnixNano").asText().toLong > 0)
  }

  test("eventTraces emits one trace message per UUID-_corr message") {
    import spark.implicits._
    val msgs = Seq(
      """{"_id":"a","_corr":"0f8fad5b-d9cb-469f-a165-70867728950e","_jwt":{"sub":"u1"},"v":1}""",
      """{"_id":"b","v":2}""", // no _corr: no trace
      """{"_id":"c","_corr":"not-a-uuid","v":3}""").toDF("value")
      .select(get_json_object(col("value"), "$._id").as("key"), col("value"))
    val traces = Telemetry.eventTraces(msgs, "app2", "p1", "p1.out",
      "ns", "1.2").collect()
    assert(traces.length == 1)
    val t = Js.parse(traces.head.getAs[String]("value"))
    assert(t.get("attributes").get("application").asText() == "app2")
    assert(t.get("attributes").get("part").asText() == "p1")
    assert(t.get("attributes").get("profile.frame.type").asText()
      == "json-streams")
    assert(t.get("name").asText() == "p1.out")
    assert(t.get("serviceNamespace").asText() == "ns")
    assert(t.get("serviceName").asText() == "app2")
    assert(t.get("serviceVersion").asText() == "1.2")
    assert(t.get("traceId").asText()
      == "0f8fad5b-d9cb-469f-a165-70867728950e")
    assert(t.get("username").asText() == "u1")
    assert(t.get("timestampNanos").asLong() > 0)
  }

  test("tracesTopic config wires a per-part event-trace side sink") {
    import spark.implicits._
    val in = Seq(
      """{"_id":"a","_corr":"0f8fad5b-d9cb-469f-a165-70867728950e","v":1}""")
      .toDF("value")
      .select(get_json_object(col("value"), "$._id").as("key"), col("value"))
    val io = new TestIo(Map("tin" -> in))
    new AppRunner(spark, io, Env(spark),
      config = Map("tracesTopic" -> "traces", "namespace" -> "prod")).run(
      """{"application":"tr","version":"2.0","parts":[
           {"type":"stream","name":"s","fromTopic":"tin",
            "toTopic":"tout"}]}""")
    val traces = io.sinks("traces").collect()
    assert(traces.length == 1)
    val t = Js.parse(traces.head.getAs[String]("value"))
    assert(t.get("name").asText() == "s.out")
    assert(t.get("serviceNamespace").asText() == "prod")
    assert(t.get("serviceVersion").asText() == "2.0")
    assert(io.sinks.contains("tout"))
  }
}
