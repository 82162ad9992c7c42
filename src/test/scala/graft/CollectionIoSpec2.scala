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

  test("upsert refuses a batch with mixed $merge modes") {
    // __when_matched/__when_not_matched are planted as literals per
    // $merge stage — a batch that somehow mixes two modes must fail
    // loudly instead of applying row 0's mode to every row
    val root = Files.createTempDirectory("graft-mixed").toString
    val io = new ParquetCollectionIo(spark, root, new TestIo(Map.empty))
    import org.apache.spark.sql.functions.lit
    val a = Seq(("a", 1)).toDF("_id", "v")
      .withColumn("__when_matched", lit("replace"))
      .withColumn("__when_not_matched", lit("insert"))
    val b = Seq(("b", 2)).toDF("_id", "v")
      .withColumn("__when_matched", lit("keepExisting"))
      .withColumn("__when_not_matched", lit("insert"))
    val e = intercept[IllegalArgumentException](
      io.upsert("mx", a.unionByName(b)))
    assert(e.getMessage.contains("mixed"))
  }

  test("schemaless whenMatched:merge folds JSON documents in the sink") {
    // one opaque JSON value column: the merge is a document merge — later
    // non-null fields win, incoming null/missing keep the stored field
    // (Mongo's ignore-null merge), new _ids insert
    val root = Files.createTempDirectory("graft-jmerge").toString
    val io = new ParquetCollectionIo(spark, root, new TestIo(Map.empty))
    import org.apache.spark.sql.functions.lit
    io.upsert("jm", Seq(
      (Some("a"), """{"_id":"a","x":1,"y":2}""")).toDF("key", "value"))
    io.upsert("jm", Seq(
      (Some("a"), """{"_id":"a","y":9,"z":3,"x":null}"""),
      (Some("b"), """{"_id":"b","v":7}""")).toDF("key", "value")
      .withColumn("__when_matched", lit("merge"))
      .withColumn("__when_not_matched", lit("insert")))
    val got = io.source(spark, "collection", "jm")
      .select("key", "value").as[(String, String)].collect().toMap
    assert(graft.json.Js.render(graft.json.Js.parse(got("a"))) ==
      graft.json.Js.render(graft.json.Js.parse(
        """{"_id":"a","x":1,"y":9,"z":3}""")))
    assert(graft.json.Js.parse(got("b")).get("v").asInt() == 7)
  }

  test("upsert names the null-_id cause instead of an NPE") {
    // schemaless fallback: null message key AND no _id in the value
    val root = Files.createTempDirectory("graft-nullid").toString
    val io = new ParquetCollectionIo(spark, root, new TestIo(Map.empty))
    val batch = Seq((Option.empty[String], """{"v":1}"""),
      (Some("k1"), """{"v":2}""")).toDF("key", "value")
    val e = intercept[IllegalArgumentException](io.upsert("ni", batch))
    assert(e.getMessage.contains("null _id"))
  }
}
