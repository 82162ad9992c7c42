package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.op.Env

/** TESTDATA table loader (see /root/repo/TESTDATA.md). The `Env` resolves
  * `$lookup`/`$merge` collection names to these tables.
  */
object Tables {
  val names = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def env(spark: SparkSession, sfDir: String): Env =
    Env(spark, collection = name => load(spark, sfDir, name))
}
