package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.op.{Env, Pipeline}
import graft.streaming.ParquetCollectionIo

/** $delete: remove collection docs matching the incoming messages'
  * `on` fields; passthrough output (docs/aggregation_stages.md:161-178).
  */
class CollectionIoSpec2 extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  test("$delete removes matching docs, passes messages through") {
    val root = Files.createTempDirectory("graft-del").toString
    val io = new ParquetCollectionIo(spark, root, new TestIo(Map.empty))
    io.upsert("dc", Seq(("a", 1, "x"), ("b", 2, "x"), ("c", 3, "y"))
      .toDF("_id", "v", "grp"))

    val env = Env(spark, delete = (n, df, on) => io.delete(n, df, on))
    val messages = Seq(("m1", "x")).toDF("_id", "grp")
    val out = Pipeline.run(messages,
      """[{"$delete":{"from":"dc","on":"grp"}}]""", env)
    assert(out.collect().length == 1) // passthrough

    val left = io.source(spark, "collection", "dc")
      .select("_id").as[String].collect().toSet
    assert(left == Set("c")) // grp=x docs deleted
  }
}
