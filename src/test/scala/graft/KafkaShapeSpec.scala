package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.json.Js
import graft.op.{Env, Pipeline}
import graft.streaming.KafkaIo

/** The Kafka sink projection (no broker needed — pure plan): key from
  * `_key`/`_id`, value = JSON of business fields, per-row `topic` from
  * `$send`'s `_topic` column.
  */
class KafkaShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val io = new KafkaIo("unused:9092")

  test("key comes from _key when present, else _id") {
    val df = Seq(("a", 1)).toDF("_id", "v")
    val shaped = io.toKafkaShape(df, asString = false).collect().head
    assert(shaped.getAs[String]("key") == "a")
    assert(Js.parse(shaped.getAs[String]("value")).get("v").asInt() == 1)

    val rekeyed = Pipeline.run(df,
      """[{"$setKey":{"$concat":["k-","$_id"]}}]""", Env(spark))
    val shaped2 = io.toKafkaShape(rekeyed, asString = false).collect().head
    assert(shaped2.getAs[String]("key") == "k-a")
    // _key is transport metadata, not payload
    assert(!Js.parse(shaped2.getAs[String]("value")).has("_key"))
  }

  test("$send's _topic column becomes the per-row kafka topic") {
    val df = Seq(("a", "orders"), ("b", "alerts")).toDF("_id", "dest")
    val routed = Pipeline.run(df,
      """[{"$send":{"topic":{"$concat":["t-","$dest"]}}}]""", Env(spark))
    val shaped = io.toKafkaShape(routed, asString = false)
    assert(shaped.columns.contains("topic"))
    val rows = shaped.collect().map(r =>
      r.getAs[String]("key") -> r.getAs[String]("topic")).toMap
    assert(rows == Map("a" -> "t-orders", "b" -> "t-alerts"))
  }
}

/** Real-broker smoke path: one produce→consume round trip through the
  * actual `format("kafka")` reader instead of the reflective shim. Runs
  * ONLY when KAFKA_BOOTSTRAP is set (and kafka-clients + the Spark Kafka
  * connector are on the classpath); otherwise the test is CANCELED —
  * visibly skipped, never silently passed.
  */
class KafkaSmokeSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("produce→consume round trip through format(\"kafka\")") {
    val bootstrap = sys.env.get("KAFKA_BOOTSTRAP")
    assume(bootstrap.isDefined,
      "KAFKA_BOOTSTRAP not set — no broker in this environment")
    val topic = "graft-smoke-" +
      java.util.UUID.randomUUID().toString.take(8)
    // the real producer (reflective kafka-clients, confirmed send) —
    // since round 13 it writes the gzip-CBOR wire format, so this
    // round trip also proves the decode chain against a real broker
    new graft.streaming.DelayedDelivery.KafkaTransport(bootstrap.get)(
      topic, "k1", """{"_id":"k1","v":42}""")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-kafka-smoke").toString
    val io = new KafkaIo(bootstrap.get, checkpointRoot = ckpt)
    val q = io.source(spark, "topic", topic)
      .writeStream.format("memory").queryName("kafka_smoke")
      .option("checkpointLocation", s"$ckpt/q").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("kafka_smoke").collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[String]("key") == "k1")
      assert(Js.parse(rows.head.getAs[String]("value"))
        .get("v").asInt() == 42)
    } finally q.stop()
  }
}

/** Lag snapshot computation over a fake admin (the reflective
  * kafka-clients path needs a broker; the shape and math are here).
  */
class KafkaLagSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.streaming.KafkaLag

  test("snapshot renders {group: {topic: {partition: lag}}}") {
    val admin = new KafkaLag.Admin {
      def groups(): Seq[String] = Seq("g1")
      def committed(group: String): Map[(String, Int), Long] =
        Map(("t1", 0) -> 5L, ("t1", 1) -> 7L, ("t2", 0) -> 2L)
      def endOffsets(tps: Seq[(String, Int)]): Map[(String, Int), Long] =
        Map(("t1", 0) -> 9L, ("t1", 1) -> 7L, ("t2", 0) -> 1L)
    }
    val json = graft.json.Js.parse(KafkaLag.snapshot(admin))
    assert(json.get("g1").get("t1").get("0").asLong() == 4L)
    assert(json.get("g1").get("t1").get("1").asLong() == 0L)
    assert(json.get("g1").get("t2").get("0").asLong() == 0L) // never negative
  }

  test("sample passes at most once per interval") {
    assert(KafkaLag.sample("s1", 1000L, 10000L))
    assert(!KafkaLag.sample("s1", 1000L, 10500L))
    assert(KafkaLag.sample("s1", 1000L, 11000L))
  }
}

/** CDC envelope unwrapping for the production fromCollection bridge. */
class CdcSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  test("unwrap handles payload-wrapped, flat, and delete envelopes") {
    val envelopes = Seq(
      // Debezium payload wrapper, create with embedded after
      ("k1", """{"payload":{"op":"c","after":{"_id":"a1","v":1}}}"""),
      // flat update
      ("k2", """{"op":"u","before":{"_id":"a2","v":1},"after":{"_id":"a2","v":2}}"""),
      // delete: only before
      ("k3", """{"payload":{"op":"d","before":{"_id":"a3","v":9}}}"""),
      // mongo-connector string-valued after
      ("k4", """{"op":"r","after":"{\"_id\":\"a4\",\"v\":4}"}"""))
      .toDF("key", "value")
    val out = graft.streaming.Cdc.unwrap(envelopes)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(graft.json.Js.parse(out("a1")).get("v").asInt() == 1)
    assert(graft.json.Js.parse(out("a2")).get("v").asInt() == 2)
    val del = graft.json.Js.parse(out("a3"))
    assert(del.get("_id").asText() == "a3" && del.get("_deleted").asBoolean())
    assert(graft.json.Js.parse(out("a4")).get("v").asInt() == 4)
  }
}

/** Schemaless message frames must NOT double-encode through the sink. */
class KafkaMessageShapeSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  test("message-shaped (key,value) frames pass the value through") {
    val io = new graft.streaming.KafkaIo("unused:9092")
    val df = Seq(("a", """{"_id":"a","v":1}""")).toDF("key", "value")
    val shaped = io.toKafkaShape(df, asString = false).collect().head
    assert(shaped.getAs[String]("key") == "a")
    assert(graft.json.Js.parse(shaped.getAs[String]("value"))
      .get("v").asInt() == 1) // not {"key":...,"value":"{...}"}
  }
}
