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
