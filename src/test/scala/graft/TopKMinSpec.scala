package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `top_k_min` bounded top-k aggregate: result must equal the window
  * row_number reference it replaces (graft.expr.catalyst.TopKMin), with
  * map-side combine + serialized merge exercised by a real shuffle.
  */
class TopKMinSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("keeps the k smallest structs ascending; merge across partitions") {
    graft.queries.Q.session(spark)
    import spark.implicits._
    // many groups, scrambled scores, 8 input partitions so partial
    // buffers genuinely serialize/merge across the exchange
    val df = spark.range(0, 5000)
      .select((col("id") % 31).as("g"),
        ((col("id") * 131) % 197).as("score"), col("id"))
      .repartition(8)
      .select(col("g"), struct(col("score"), col("id")).as("s"))
    val got = df.groupBy("g")
      .agg(call_function("top_k_min", col("s"), lit(5)).as("t"))
      .select(col("g"), posexplode(col("t")))
      .select(col("g"), col("pos"), col("col.score").as("score"),
        col("col.id").as("id"))
    val w = Window.partitionBy("g")
      .orderBy(col("s.score").asc, col("s.id").asc)
    val ref = df.withColumn("r", row_number().over(w))
      .where(col("r") <= 5)
      .select(col("g"), (col("r") - 1).as("pos"),
        col("s.score").as("score"), col("s.id").as("id"))
    assert(got.count() == 31 * 5)
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  test("k larger than the group returns the whole group sorted") {
    graft.queries.Q.session(spark)
    val df = spark.range(0, 3)
      .select(lit(0).as("g"), struct((lit(2) - col("id")).as("v")).as("s"))
    val got = df.groupBy("g")
      .agg(call_function("top_k_min", col("s"), lit(10)).as("t"))
      .select(col("t.v")).collect().head.getSeq[Int](0)
    assert(got == Seq(0, 1, 2))
  }

  test("invalid k or value type fails at ANALYSIS, not on an executor") {
    graft.queries.Q.session(spark)
    val df = spark.range(0, 3)
      .select(lit(0).as("g"), struct(col("id")).as("s"))
    def analyze(agg: org.apache.spark.sql.Column): Unit =
      df.groupBy("g").agg(agg.as("t")).queryExecution.analyzed
    for (k <- Seq(lit(0), lit(-1), lit(null).cast("int"), col("g")))
      intercept[org.apache.spark.sql.AnalysisException] {
        analyze(call_function("top_k_min", col("s"), k))
      }
    // non-struct value is equally an analysis error
    intercept[org.apache.spark.sql.AnalysisException] {
      analyze(call_function("top_k_min", col("g"), lit(2)))
    }
    // sanity: a proper call still analyzes
    analyze(call_function("top_k_min", col("s"), lit(2)))
  }
}
