package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.types.{DataType, StructType}
import org.scalatest.funsuite.AnyFunSuite
import graft.op.Env
import graft.streaming.{AppRunner, FileStreamIo}

/** Streaming $group emits incremental aggregation state per micro-batch —
  * the reference's incremental-emission contract
  * (docs/aggregation_stages.md:29-37) in Spark's update output mode.
  */
class StreamGroupSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("streaming $group emits updated aggregates across micro-batches") {
    val dir = Files.createTempDirectory("graft-sgroup").toString
    def write(name: String, json: String): Unit = {
      Files.createDirectories(Paths.get(s"$dir/gin"))
      Files.writeString(Paths.get(s"$dir/gin/$name.json"), json)
    }
    write("b1", """{"_id":"m1","item":"a","qty":2}""")
    val schema = DataType.fromDDL("_id string, item string, qty int")
      .asInstanceOf[StructType]
    val io = new FileStreamIo(dir, Map("gin" -> schema))
    new AppRunner(spark, io, Env(spark)).run(
      """{"application":"sg","version":"1.0","parts":[
           {"type":"stream","name":"g","fromTopic":"gin","toTopic":"out_sg",
            "pipeline":[{"$group":{"_id":"$item","total":{"$sum":"$qty"}}}]}]}""")
    io.processAll()
    // second batch updates the same group
    write("b2", """{"_id":"m2","item":"a","qty":3}""")
    io.processAll()
    val rows = spark.table("out_sg").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // incremental emission: total=2 after batch 1, total=5 after batch 2
    assert(rows.contains(("a", 2L)))
    assert(rows.contains(("a", 5L)))
    io.stopAll()
  }
}
