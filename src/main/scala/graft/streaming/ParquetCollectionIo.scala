package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Collections as parquet directories with upsert-by-`_id` writes — the
  * file-backed stand-in for the reference's MongoDB collections
  * (docs/streams.md:45-50): `toCollection` upserts each message by `_id`,
  * `fromCollection`/`$lookup` read the current state. Streaming writers go
  * through foreachBatch (the idempotent-upsert sink pattern; a Delta MERGE
  * replaces the read-union-rewrite at real scale). Topics delegate to the
  * wrapped transport Io.
  */
final class ParquetCollectionIo(spark: SparkSession, root: String, inner: Io)
    extends Io {

  private def dir(name: String) = s"$root/$name"

  def source(spark: SparkSession, kind: String, name: String): DataFrame =
    kind match {
      case "collection" => spark.read.parquet(dir(name))
      case _            => inner.source(spark, kind, name)
    }

  def sink(kind: String, name: String, df: DataFrame,
      asString: Boolean, partId: String = ""): Unit = kind match {
    case "collection" =>
      if (df.isStreaming)
        df.writeStream
          // stable identity: several parts may upsert one collection
          .option("checkpointLocation",
            s"$root/.checkpoints/$name${if (partId.isEmpty) "" else s"-$partId"}")
          .foreachBatch((batch: DataFrame, _: Long) => upsert(name, batch))
          .start()
      else upsert(name, df)
    case _ => inner.sink(kind, name, df, asString, partId)
  }

  /** Read-union-rewrite upsert: incoming rows win over stored rows with
    * the same `_id`; within one batch the last row wins.
    */
  def upsert(name: String, batch: DataFrame): Unit = synchronized {
    val incoming = batch
      .withColumn("__gen", lit(1))
      .withColumn("__ord", monotonically_increasing_id())
    val merged =
      if (Files.exists(Paths.get(dir(name)))) {
        val existing = spark.read.parquet(dir(name))
          .withColumn("__gen", lit(0)).withColumn("__ord", lit(0L))
        existing.unionByName(incoming, allowMissingColumns = true)
      } else incoming
    val w = Window.partitionBy("_id")
      .orderBy(col("__gen").desc, col("__ord").desc)
    val latest = merged
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__gen", "__ord", "__rn")
    writeSwap(name, latest)
  }

  /** `$delete` support (docs/aggregation_stages.md:161-178): drop stored
    * docs whose `on` fields equal any incoming message's values
    * (left-anti join on the key columns), then rewrite. A Delta DELETE
    * replaces the read-anti-join-rewrite at real scale.
    */
  def delete(name: String, matches: DataFrame, on: Seq[String]): Unit =
    synchronized {
      if (Files.exists(Paths.get(dir(name)))) {
        val existing = spark.read.parquet(dir(name))
        val keys = matches.select(on.map(col): _*).distinct()
        writeSwap(name, existing.join(keys, on, "left_anti"))
      }
    }

  private def writeSwap(name: String, df: DataFrame): Unit = {
    val tmp = dir(name) + ".__tmp"
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    // swap: the rewrite must not read and overwrite the same files
    val target = Paths.get(dir(name))
    if (Files.exists(target)) {
      val old = Paths.get(dir(name) + ".__old")
      Files.move(target, old)
      Files.move(Paths.get(tmp), target)
      deleteRecursively(old)
    } else Files.move(Paths.get(tmp), target)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.toSeq.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
