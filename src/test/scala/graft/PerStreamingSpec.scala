package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.json.Js
import graft.op.Env
import graft.streaming.{AppRunner, FileStreamIo}

/** Streaming $per batches messages with state carried across
  * micro-batches (docs/aggregation_stages.md:393-411).
  */
class PerStreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("$per emits full batches and buffers the remainder across batches") {
    val dir = Files.createTempDirectory("graft-per").toString
    def write(name: String, json: String): Unit = {
      Files.createDirectories(Paths.get(s"$dir/pin"))
      Files.writeString(Paths.get(s"$dir/pin/$name.json"), json)
    }
    write("m1", """{"_id":"a","v":1}""")
    write("m2", """{"_id":"b","v":2}""")
    write("m3", """{"_id":"c","v":3}""")
    val io = new FileStreamIo(dir, Map.empty)
    new AppRunner(spark, io, Env(spark)).run(
      """{"application":"per","version":"1.0","parts":[
           {"type":"stream","name":"p","fromTopic":"pin","toTopic":"out_per",
            "pipeline":[{"$per":{"amount":2,"as":"batch"}}]}]}""")
    io.processAll()
    val after3 = spark.table("out_per").collect()
      .map(r => Js.parse(r.getAs[String]("value")))
    assert(after3.length == 1)
    assert(after3.head.get("batch").size() == 2)
    // the buffered remainder completes a batch when a 4th message arrives
    write("m4", """{"_id":"d","v":4}""")
    io.processAll()
    val after4 = spark.table("out_per").collect()
      .map(r => Js.parse(r.getAs[String]("value")))
    assert(after4.length == 2)
    assert(after4.forall(_.get("batch").size() == 2))
    io.stopAll()
  }
}
