package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import graft.op.Env

/** TESTDATA table loader (see /root/repo/TESTDATA.md). The `Env` resolves
  * `$lookup`/`$merge` collection names to these tables.
  */
object Tables {
  val names = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The generator has written `events.ts` as int64 epoch-nanos, parquet
    * `timestamp[ns]` (surfacing as LONG under
    * `spark.sql.legacy.parquet.nanosAsLong`), and `timestamp[us]`
    * (surfacing as TIMESTAMP/TIMESTAMP_NTZ) across rounds. Queries must not
    * assume the physical type: these two views are the canonical forms.
    * With the session timezone pinned to UTC (Q.session), the NTZ→TZ cast
    * is the identity instant-wise, matching DuckDB's naive parquet read.
    */
  def tsNanos(df: DataFrame, name: String = "ts"): Column =
    df.schema(name).dataType match {
      case LongType => col(name)
      case TimestampType | TimestampNTZType =>
        unix_micros(col(name).cast(TimestampType)) * 1000L
      case other =>
        throw new IllegalArgumentException(
          s"column $name: expected epoch-nanos LONG or TIMESTAMP, got $other")
    }

  /** Timestamp view of the same column; nanos truncate to micros exactly
    * (integer `div`, not a double division — nanos since 2024 exceed 2^53).
    */
  def tsTimestamp(df: DataFrame, name: String = "ts"): Column =
    df.schema(name).dataType match {
      case LongType => timestamp_micros(expr(s"`$name` div 1000"))
      case TimestampType => col(name)
      case TimestampNTZType => col(name).cast(TimestampType)
      case other =>
        throw new IllegalArgumentException(
          s"column $name: expected epoch-nanos LONG or TIMESTAMP, got $other")
    }

  def env(spark: SparkSession, sfDir: String): Env =
    Env(spark, collection = name => load(spark, sfDir, name))
}
