package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events.ts physical type has changed under the engine across testdata
  * regenerations (int64-nanos → timestamp[us]); these pin the canonical
  * views Tables.tsNanos/tsTimestamp produce for every shape the parquet
  * writer can emit, including the exactness of the nanos→micros truncation
  * beyond 2^53 (where a double round-trip would drift).
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  // 2024-01-01T00:00:00.000000123Z in nanos: > 2^53, sub-micro tail
  private val nanos = 1704067200000000123L
  private val micros = 1704067200000000L // truncated, not rounded

  test("tsNanos/tsTimestamp on an epoch-nanos LONG column") {
    import spark.implicits._
    val df = Seq(nanos).toDF("ts")
    val out = df.select(
      Tables.tsNanos(df).as("ns"), Tables.tsTimestamp(df).as("t"))
    assert(out.schema("ns").dataType == LongType)
    assert(out.schema("t").dataType == TimestampType)
    val row = out.select(col("ns"), unix_micros(col("t")).as("us")).head()
    assert(row.getLong(0) == nanos)
    assert(row.getLong(1) == micros, "nanos→micros must truncate exactly")
  }

  test("tsNanos/tsTimestamp on a TIMESTAMP column") {
    import spark.implicits._
    val df = Seq(0L).toDF("x")
      .select(timestamp_micros(lit(micros)).as("ts"))
    assert(df.schema("ts").dataType == TimestampType)
    val row = df.select(Tables.tsNanos(df).as("ns"),
      unix_micros(Tables.tsTimestamp(df)).as("us")).head()
    assert(row.getLong(0) == micros * 1000L)
    assert(row.getLong(1) == micros)
  }

  test("tsNanos/tsTimestamp on a TIMESTAMP_NTZ column (UTC session)") {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val df = spark.sql(
      s"SELECT CAST(timestamp_micros(${micros}L) AS TIMESTAMP_NTZ) AS ts")
    assert(df.schema("ts").dataType == TimestampNTZType)
    val row = df.select(Tables.tsNanos(df).as("ns"),
      unix_micros(Tables.tsTimestamp(df)).as("us")).head()
    assert(row.getLong(0) == micros * 1000L)
    assert(row.getLong(1) == micros)
  }

  test("non-time column is rejected loudly") {
    import spark.implicits._
    val df = Seq("x").toDF("ts")
    intercept[IllegalArgumentException] { Tables.tsNanos(df) }
    intercept[IllegalArgumentException] { Tables.tsTimestamp(df) }
  }
}
