package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.op.{Env, Pipeline}

/** Edge behaviors of the reference's custom ISO-8601 operator family
  * (docs/aggregation_operators.md:514-615): epoch round-trips, leap days,
  * zone-offset inputs, date-only strings, and native-timestamp inputs —
  * the UTC-session invariants a pipeline depends on.
  */
class DateEdgeSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val env = Env(spark)

  private def one(df: org.apache.spark.sql.DataFrame, pipe: String): Row =
    Pipeline.run(df, pipe, env).collect().head

  test("epoch round-trips are exact at every granularity") {
    val df = Seq(Tuple1(1754483753622L)).toDF("ms")
    val out = one(df,
      """[{"$project":{
           "ms2":{"$toEpochMillis":{"$fromEpochMillis":"$ms"}},
           "s2":{"$toEpochSeconds":{"$fromEpochSeconds":1754483753}},
           "ns2":{"$toEpochNanos":{"$fromEpochNanos":1754483753622243000}}}}]""")
    assert(out.getLong(0) == 1754483753622L)
    assert(out.getLong(1) == 1754483753L)
    // nanos carry micro precision through the ISO string (the engine's
    // timestamps are micro-grained, documented in SURVEY §1.4)
    assert(out.getLong(2) == 1754483753622243000L)
  }

  test("calendar parts: leap day, year boundaries, date-only input") {
    val df = Seq(Tuple1("2024-02-29T23:59:59.999Z")).toDF("t")
    val out = one(df,
      """[{"$project":{
           "d":{"$toDay":"$t"},
           "m":{"$toMonth":"$t"},
           "y":{"$toYear":"$t"},
           "date":{"$toDate":"$t"},
           "eve":{"$toDay":"2023-12-31T23:59:59Z"},
           "dayOnly":{"$toYear":"2024-02-29"}}}]""")
    assert(out.getInt(0) == 29)
    assert(out.getInt(1) == 2)
    assert(out.getInt(2) == 2024)
    assert(out.getString(3) == "2024-02-29")
    assert(out.getInt(4) == 31, "UTC session: no zone drift at midnight")
    assert(out.getInt(5) == 2024, "date-only strings parse")
  }

  test("zone offsets normalize to UTC epochs") {
    val df = Seq(Tuple1("2025-08-06T14:35:53.622+02:00")).toDF("t")
    val out = one(df,
      """[{"$project":{
           "ms":{"$toEpochMillis":"$t"},
           "utcMs":{"$toEpochMillis":"2025-08-06T12:35:53.622Z"},
           "day":{"$toDay":"$t"}}}]""")
    // +02:00 at 14:35 == 12:35Z — identical epoch
    assert(out.getLong(0) == out.getLong(1))
    assert(out.getInt(2) == 6)
  }

  test("native timestamp columns skip the string parse") {
    val df = Seq(Tuple1(java.sql.Timestamp.from(
      java.time.Instant.parse("2025-08-06T12:35:53.622243Z")))).toDF("ts")
    val out = one(df,
      """[{"$project":{
           "ms":{"$toEpochMillis":"$ts"},
           "ns":{"$toEpochNanos":"$ts"},
           "d":{"$toDate":"$ts"}}}]""")
    assert(out.getLong(0) == 1754483753622L)
    assert(out.getLong(1) == 1754483753622243000L)
    assert(out.getString(2) == "2025-08-06")
  }

  test("unparseable date strings answer null, not an error") {
    val df = Seq(Tuple1("not-a-date")).toDF("t")
    val out = one(df,
      """[{"$project":{"ms":{"$toEpochMillis":"$t"},
                       "y":{"$toYear":"$t"}}}]""")
    assert(out.isNullAt(0))
    assert(out.isNullAt(1))
  }
}
