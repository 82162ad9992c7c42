package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.types.{StructType, DataType}
import org.scalatest.funsuite.AnyFunSuite
import graft.json.Js
import graft.op.Env
import graft.streaming.{AppRunner, FileStreamIo}

/** End-to-end Structured Streaming: file-stream sources (one file per
  * micro-batch), memory sinks, state carried across micro-batches — the
  * Spark equivalent of the reference's golden-file test harness
  * (docs/testing.md).
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def ddl(s: String): StructType =
    DataType.fromDDL(s).asInstanceOf[StructType]

  private def write(dir: String, topic: String, name: String,
      json: String): Unit = {
    Files.createDirectories(Paths.get(s"$dir/$topic"))
    Files.writeString(Paths.get(s"$dir/$topic/$name.json"), json)
  }

  test("streaming $match app: file source to memory sink") {
    val dir = Files.createTempDirectory("graft-stream").toString
    write(dir, "in", "m1", """{"_id":"a","value":5}""")
    write(dir, "in", "m2", """{"_id":"b","value":50}""")
    val io = new FileStreamIo(dir,
      Map("in" -> ddl("_id string, value int")))
    new AppRunner(spark, io, Env(spark)).run(
      """{"application":"s1","version":"1.0","parts":[
           {"type":"stream","name":"s","fromTopic":"in","toTopic":"out_s1",
            "pipeline":[{"$match":{"value":{"$gt":10}}}]}]}""")
    io.processAll()
    val got = spark.table("out_s1").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("b"))
    io.stopAll()
  }

  test("streaming aggregate: state persists across micro-batches") {
    val dir = Files.createTempDirectory("graft-agg").toString
    val topic = "sapp-counter-command"
    val schema = ddl(
      "_id string, _command string, _corr string, __ord long, v int, _jwt struct<sub string>, " +
        "_ops array<struct<op:string,path:string,value:int>>")
    write(dir, topic, "b1",
      """{"_id":"x","_command":"put","_corr":"c1","__ord":1,"v":7,"_jwt":{"sub":"system"}}""")
    val io = new FileStreamIo(dir, Map(topic -> schema))
    val streams = new AppRunner(spark, io, Env(spark)).run(
      """{"application":"sapp","version":"1.0","parts":[
           {"type":"aggregate","aggregateType":"sapp-counter"}]}""")
    io.start("agg_out", streams("sapp-counter-aggregate"))
    io.start("event_out", streams("sapp-counter-event"))
    io.processAll()
    // second micro-batch: patch arrives later, state must carry _seq=0
    write(dir, topic, "b2",
      """{"_id":"x","_command":"patch","_corr":"c2","__ord":2,"_ops":[{"op":"replace","path":"/v","value":9}],"_jwt":{"sub":"system"}}""")
    io.processAll()
    val aggs = spark.table("agg_out").collect()
      .map(r => Js.parse(r.getString(1)))
    assert(aggs.length == 2)
    val last = aggs.maxBy(_.get("_seq").asLong())
    assert(last.get("_seq").asLong() == 1)
    assert(last.get("v").asInt() == 9)
    val events = spark.table("event_out").collect()
      .map(r => Js.parse(r.getString(1)))
    assert(events.map(_.get("_seq").asLong()).sorted.toSeq == Seq(0L, 1L))
    io.stopAll()
  }

  test("streaming $lookup joins a static collection") {
    val dir = Files.createTempDirectory("graft-slookup").toString
    write(dir, "lin", "m1", """{"_id":"m1","dim":"d1"}""")
    write(dir, "lin", "m2", """{"_id":"m2","dim":"d9"}""")
    val io = new FileStreamIo(dir,
      Map("lin" -> ddl("_id string, dim string")))
    import spark.implicits._
    val dims = Seq(("d1", "first")).toDF("k", "label")
    val env = Env(spark, collection = { case "dims" => dims })
    new AppRunner(spark, io, env).run(
      """{"application":"sl","version":"1.0","parts":[
           {"type":"stream","name":"s","fromTopic":"lin","toTopic":"out_sl",
            "pipeline":[
              {"$lookup":{"from":"dims","localField":"dim","foreignField":"k",
                          "as":"d","unwind":true}},
              {"$project":{"_id":1,"label":"$d.label"}}]}]}""")
    io.processAll()
    val rows = spark.table("out_sl").collect()
      .map(r => (r.getString(0), r.getString(1)))
    // inner join: the unmatched message drops
    assert(rows.toSeq == Seq(("m1", "first")))
    io.stopAll()
  }

  test("streaming merge + chained stream parts") {
    val dir = Files.createTempDirectory("graft-merge").toString
    write(dir, "t1", "m1", """{"_id":"a","v":1}""")
    write(dir, "t2", "m2", """{"_id":"b","v":2}""")
    val s = ddl("_id string, v int")
    val io = new FileStreamIo(dir, Map("t1" -> s, "t2" -> s))
    new AppRunner(spark, io, Env(spark)).run(
      """{"application":"s3","version":"1.0","parts":[
           {"type":"merge","name":"m","fromTopics":["t1","t2"]},
           {"type":"stream","name":"s","fromStream":"m","toTopic":"out_s3",
            "pipeline":[{"$addFields":{"v2":{"$multiply":["$v",10]}}}]}]}""")
    io.processAll()
    val got = spark.table("out_s3").collect()
      .map(r => (r.getAs[String]("_id"), r.getAs[Int]("v2"))).sorted
    assert(got.toSeq == Seq(("a", 10), ("b", 20)))
    io.stopAll()
  }
}
