package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.Quantiles

/** Frequency-table quantiles: the integer rank rule must reproduce the
  * sorted-array discrete lower order statistic (the definition DuckDB's
  * replay uses), survive duplicates and skew, exclude nulls, and be
  * partition-invariant.
  */
class QuantilesSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def got(df: org.apache.spark.sql.DataFrame,
      qs: Seq[Int]): Map[Int, Long] =
    Quantiles.frequencyQuantiles(df, col("v"), Nil, qs)
      .as[(Int, Long)].collect().toMap

  test("hand-computed: 1..10, p0/p50/p90/p100") {
    val df = (1 to 10).toDF("v")
    assert(got(df, Seq(0, 500, 900, 1000)) ===
      Map(0 -> 1L, 500 -> 5L, 900 -> 9L, 1000 -> 10L))
  }

  test("duplicates and skew: the rank walks the cumulative counts") {
    // 1 x5, 7 x3, 9 x2 -> cum: 1->5, 7->8, 9->10 (n=10)
    val df = (Seq.fill(5)(1) ++ Seq.fill(3)(7) ++ Seq.fill(2)(9)).toDF("v")
    assert(got(df, Seq(500, 700, 900)) ===
      Map(500 -> 1L, 700 -> 7L, 900 -> 9L))
  }

  test("matches the sorted-array lower order statistic on md5-spread data") {
    val vals = (1 to 257).map(i =>
      java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils
          .md5Hex(s"q$i").take(4), 16))
    val df = vals.toDF("v")
    val qs = Seq(1, 250, 333, 500, 750, 999, 1000)
    val sorted = vals.sorted
    val expect = qs.map { q =>
      // rank = ceil(q * n / 1000), 1-based; q=0 would be the min
      val rank = math.max(1, (q.toLong * vals.size + 999) / 1000)
      q -> sorted(rank.toInt - 1)
    }.toMap
    assert(got(df, qs) === expect)
  }

  test("per-group quantiles, null exclusion, partition invariance") {
    val df = (1 to 100).map(i => (i % 2, Some(i)))
      .toDF("g", "v")
      .union(Seq((0, None: Option[Int]), (1, None: Option[Int]))
        .toDF("g", "v"))
    def run(d: org.apache.spark.sql.DataFrame): Seq[(Int, Int, Long)] =
      Quantiles.frequencyQuantiles(d, col("v"), Seq("g"), Seq(500, 1000))
        .orderBy("g", "q_permille").as[(Int, Int, Long)].collect().toSeq
    val base = run(df.coalesce(1))
    // group 0: evens 2..100 (n=50): p50 = 25th even = 50, max = 100
    // group 1: odds 1..99: p50 = 25th odd = 49, max = 99
    assert(base === Seq((0, 500, 50L), (0, 1000, 100L),
      (1, 500, 49L), (1, 1000, 99L)))
    assert(run(df.repartition(17)) === base)
  }
}
