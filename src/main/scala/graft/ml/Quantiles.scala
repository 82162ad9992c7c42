package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT distributed quantiles over integer-valued columns via
  * frequency aggregation — the 100 TB answer to "p50/p90/p99 document
  * length per language" that neither sorts the corpus nor approximates:
  * the corpus collapses to the (group, value, frequency) table in ONE
  * hash-aggregate (its size is the VALUE DOMAIN — distinct lengths,
  * token counts, scores — not the row count), a cumulative sum runs
  * over that bounded table, and the q-quantile is the smallest value
  * whose cumulative frequency reaches the integer rank
  * `⌈q‰·n/1000⌉ = (q‰·n + 999) div 1000`.
  *
  * Everything is integer arithmetic on exact counts — no interpolation,
  * no double ranks — so results replay bit-for-bit in DuckDB and are
  * partition-invariant by construction. The quantile definition is the
  * discrete LOWER order statistic (SQL's `quantile_disc` /
  * PERCENTILE_DISC): the actual corpus value at rank ⌈q·n⌉, which is
  * what length-distribution monitoring wants (a length that exists).
  *
  * Scale shape: one corpus hash-aggregate; the window runs over the
  * frequency table (partition size = distinct values per group,
  * bounded by the value domain — NEVER corpus cardinality); the probe
  * expansion is |quantiles| rows per frequency row. Contrast with
  * `percentile_approx` (a lossy sketch) and `ORDER BY` (a corpus
  * sort): at a bounded value domain this is both exact and cheaper.
  */
object Quantiles {

  /** Exact per-group quantiles of an integral column:
    * (group..., q_permille INT, quantile BIGINT) — one row per group
    * per requested per-mille point (e.g. 500/900/990 for p50/p90/p99;
    * 0 → min, 1000 → max). Null values are excluded (they have no
    * rank), like SQL aggregates.
    */
  def frequencyQuantiles(df: DataFrame, valueCol: Column,
      groupCols: Seq[String], qPermille: Seq[Int]): DataFrame = {
    require(qPermille.nonEmpty, "frequencyQuantiles: no quantiles")
    require(qPermille.forall(q => q >= 0 && q <= 1000),
      s"frequencyQuantiles: per-mille points must be in [0, 1000]")
    val freq = df
      .select(groupCols.map(col) :+ valueCol.cast("long").as("value"): _*)
      .where(col("value").isNotNull)
      .groupBy(groupCols.map(col) :+ col("value"): _*)
      .agg(count(lit(1)).as("__f"))
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy("value")
    val cum = freq
      .withColumn("__cum", sum(col("__f")).over(w))
      .withColumn("__n",
        sum(col("__f")).over(Window.partitionBy(groupCols.map(col): _*)))
    cum
      .select(groupCols.map(col) ++ Seq(col("value"), col("__cum"),
        col("__n"),
        explode(array(qPermille.distinct.sorted.map(q => lit(q)): _*))
          .as("q_permille")): _*)
      .where(col("__cum") * 1000 >= col("q_permille") * col("__n"))
      .groupBy(groupCols.map(col) :+ col("q_permille"): _*)
      .agg(min(col("value")).as("quantile"))
  }
}
