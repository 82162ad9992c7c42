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

  test("schemaless (key,value) frames upsert by key, stay message-shaped") {
    val root = Files.createTempDirectory("graft-coll-msg").toString
    val io = new ParquetCollectionIo(spark, root, new TestIo(Map.empty))
    // __ord transport metadata must not pollute the stored document
    io.upsert("mc",
      Seq(("a", """{"_id":"a","v":1}""", 0L),
        ("b", """{"_id":"b","v":2}""", 1L)).toDF("key", "value", "__ord"))
    io.upsert("mc",
      Seq(("a", """{"_id":"a","v":9}""", 2L)).toDF("key", "value", "__ord"))
    val back = io.source(spark, "collection", "mc")
    assert(back.columns.sorted.toSeq == Seq("key", "value"))
    val state = back.collect().map(r => r.getAs[String]("key") ->
      graft.json.Js.parse(r.getAs[String]("value")).get("v").asInt()).toMap
    assert(state == Map("a" -> 9, "b" -> 2))
  }

  test("$merge whenMatched/whenNotMatched modes through the sink") {
    import org.apache.spark.sql.functions.{lit, col}
    def stamped(df: org.apache.spark.sql.DataFrame, wm: String,
        wnm: String) =
      df.withColumn("__when_matched", lit(wm))
        .withColumn("__when_not_matched", lit(wnm))
    val root = Files.createTempDirectory("graft-coll-modes").toString
    val io = new ParquetCollectionIo(spark, root, new TestIo(Map.empty))

    // keepExisting: stored row wins on match; new ids still insert
    io.upsert("m1", Seq(("a", 1)).toDF("_id", "v"))
    io.upsert("m1",
      stamped(Seq(("a", 9), ("b", 2)).toDF("_id", "v"),
        "keepExisting", "insert"))
    assert(io.source(spark, "collection", "m1")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap ==
      Map("a" -> 1, "b" -> 2))

    // merge: latest non-null per FIELD — null incoming keeps stored
    io.upsert("m2",
      Seq(("a", Some(5), "S")).toDF("_id", "total", "status"))
    io.upsert("m2",
      stamped(Seq(("a", None: Option[Int], "X"),
        ("b", Some(7), "N")).toDF("_id", "total", "status"),
        "merge", "insert"))
    val m2 = io.source(spark, "collection", "m2").collect()
      .map(r => r.getString(0) -> (r.get(1), r.getString(2))).toMap
    assert(m2("a") == ((5, "X"))) // total kept, status replaced
    assert(m2("b") == ((7, "N")))

    // discard: unmatched incoming rows are dropped
    io.upsert("m3", Seq(("a", 1)).toDF("_id", "v"))
    io.upsert("m3",
      stamped(Seq(("a", 9), ("zz", 2)).toDF("_id", "v"),
        "replace", "discard"))
    assert(io.source(spark, "collection", "m3")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap ==
      Map("a" -> 9))

    // fail policies raise
    io.upsert("m4", Seq(("a", 1)).toDF("_id", "v"))
    intercept[IllegalArgumentException](io.upsert("m4",
      stamped(Seq(("a", 9)).toDF("_id", "v"), "fail", "insert")))
    intercept[IllegalArgumentException](io.upsert("m4",
      stamped(Seq(("zz", 9)).toDF("_id", "v"), "replace", "fail")))
    // and the collection is untouched after both failures
    assert(io.source(spark, "collection", "m4")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap ==
      Map("a" -> 1))
  }

  test("upsert rewrites only the buckets the batch touches") {
    val root = Files.createTempDirectory("graft-coll-bkt").toString
    val io = new ParquetCollectionIo(spark, root, new TestIo(Map.empty))
    io.upsert("c2",
      (0 until 64).map(i => (s"id$i", i)).toDF("_id", "v"))
    val dir = java.nio.file.Paths.get(s"$root/c2")
    import scala.jdk.CollectionConverters._
    def filesPerBucket: Map[String, Set[String]] =
      Files.list(dir).iterator().asScala.toSeq
        .filter(p => p.getFileName.toString.startsWith("__bucket="))
        .map(p => p.getFileName.toString ->
          Files.list(p).iterator().asScala
            .map(_.getFileName.toString).toSet)
        .toMap
    val before = filesPerBucket
    assert(before.size > 1, "expected several bucket dirs")
    // single-doc upsert: exactly one bucket dir's files may change
    io.upsert("c2", Seq(("id0", 99)).toDF("_id", "v"))
    val after = filesPerBucket
    val changed = before.keySet.union(after.keySet)
      .filter(b => before.get(b) != after.get(b))
    assert(changed.size == 1, s"changed buckets: $changed")
    val state = io.source(spark, "collection", "c2")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(state("id0") == 99 && state.size == 64)
  }

  test("$throttle plumbs maxPerSecond to source admission") {
    val dir = Files.createTempDirectory("graft-throttle").toString
    def write(name: String, json: String): Unit = {
      Files.createDirectories(java.nio.file.Paths.get(s"$dir/tin"))
      Files.writeString(java.nio.file.Paths.get(s"$dir/tin/$name.json"), json)
    }
    (0 until 3).foreach(i => write(s"m$i", s"""{"_id":"k$i","v":$i}"""))
    // harness default would admit all files in ONE batch; the $throttle
    // stage caps admission to 1 per trigger → 3 separate micro-batches
    val io = new FileStreamIo(dir, Map.empty, maxFilesPerTrigger = 10000)
    new AppRunner(spark, io, Env(spark)).run(
      """{"application":"thr","version":"1.0","parts":[
           {"type":"stream","name":"s","fromTopic":"tin","toTopic":"tout",
            "pipeline":[{"$throttle":{"maxPerSecond":1}}]}]}""")
    io.processAll()
    val q = io.queries.values.head
    assert(q.recentProgress.count(_.numInputRows > 0) >= 3)
    assert(spark.table(io.tables("tout").head).count() == 3)
    io.stopAll()
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
    io.started.foreach(_.processAllAvailable())
    write("m2", """{"_id":"k1","v":7}""")
    fileIo.processAll()
    io.started.foreach(_.processAllAvailable())
    val state = io.source(spark, "collection", "state")
      .collect().map(r => (r.getAs[String]("_id"), r.getAs[Int]("v")))
    assert(state.toSeq == Seq(("k1", 7)))
    io.started.foreach(_.stop())
    fileIo.stopAll()
  }
}
