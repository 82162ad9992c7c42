package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.op.Env
import graft.streaming.{AppRunner, FileStreamIo, ParquetCollectionIo}

/** File-backed collections: upsert-by-_id parquet dirs, streaming writers
  * through foreachBatch, readable back as $lookup targets.
  */
class CollectionIoSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  test("batch upsert keeps the last write per _id across calls") {
    val root = Files.createTempDirectory("graft-coll").toString
    val io = new ParquetCollectionIo(spark, root,
      new TestIo(Map.empty))
    io.upsert("c1", Seq(("a", 1), ("b", 2)).toDF("_id", "v"))
    io.upsert("c1", Seq(("a", 9), ("c", 3)).toDF("_id", "v"))
    val state = io.source(spark, "collection", "c1")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(state == Map("a" -> 9, "b" -> 2, "c" -> 3))
  }

  test("streaming toCollection upserts across micro-batches") {
    val dir = Files.createTempDirectory("graft-coll-app").toString
    val collRoot = Files.createTempDirectory("graft-coll-store").toString
    def write(name: String, json: String): Unit = {
      Files.createDirectories(java.nio.file.Paths.get(s"$dir/cin"))
      Files.writeString(java.nio.file.Paths.get(s"$dir/cin/$name.json"), json)
    }
    write("m1", """{"_id":"k1","v":1}""")
    val fileIo = new FileStreamIo(dir,
      Map("cin" -> org.apache.spark.sql.types.DataType
        .fromDDL("_id string, v int")
        .asInstanceOf[org.apache.spark.sql.types.StructType]))
    val io = new ParquetCollectionIo(spark, collRoot, fileIo)
    new AppRunner(spark, io, Env(spark)).run(
      """{"application":"coll","version":"1.0","parts":[
           {"type":"stream","name":"w","fromTopic":"cin",
            "toCollection":"state"}]}""")
    fileIo.processAll()
    spark.streams.active.foreach(_.processAllAvailable())
    write("m2", """{"_id":"k1","v":7}""")
    fileIo.processAll()
    spark.streams.active.foreach(_.processAllAvailable())
    val state = io.source(spark, "collection", "state")
      .collect().map(r => (r.getAs[String]("_id"), r.getAs[Int]("v")))
    assert(state.toSeq == Seq(("k1", 7)))
    spark.streams.active.foreach(_.stop())
    fileIo.stopAll()
  }
}
