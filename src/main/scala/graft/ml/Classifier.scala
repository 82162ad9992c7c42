package graft.ml

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import Fns._

/** A learned quality classifier over hashed bag-of-words features — the
  * curation step the heuristic filters (Gopher/C4 rules, stopword ratios)
  * cannot replace: train a linear model on a labeled seed set (curated
  * positives vs crawl negatives, the GPT-3/CCNet recipe) and score the
  * whole corpus with it.
  *
  * The model is logistic-style regression over `buckets` hashed binary
  * token features, trained by full-batch gradient steps. Every quantity
  * that crosses an aggregation is FIXED-POINT (weights 1e-12 quanta,
  * per-doc gradient contributions 1e-9 quanta), so training is
  * partition-order-independent and replays bit-for-bit in the DuckDB
  * oracle. The link is the "fast sigmoid" p = 0.5 + 0.5·(m / (1 + |m|)) —
  * rational IEEE ops only, because `exp` differs across libm
  * implementations by an ulp, which a multi-step training loop would
  * amplify across engines. It has the same fixed point (p = y on a
  * separable margin) and the (p − y) full-batch update is the standard
  * surrogate gradient.
  *
  * 100 TB shape: the model is `buckets + 1` longs — constant-size, a
  * broadcast literal map, never a shuffled frame (the DSIR design). Per
  * step the corpus-sized work is: one per-doc partial aggregate over the
  * pinned (doc, bucket) feature frame, one co-partitioned join back on
  * the doc id, one `buckets`-row gradient aggregate. Driver traffic per
  * step is exactly `buckets + 1` longs.
  */
object Classifier {

  /** Fixed-point scale of the weights/bias (1e-12 quanta). */
  val WeightScale = 1e12

  /** Fixed-point scale of per-doc gradient contributions (1e-9 quanta). */
  val GradScale = 1e9

  /** Learned model: `weights(b)` is the 1e12-scaled weight of hashed
    * bucket `b`; `bias` likewise. Constant-size (buckets + 1 longs) —
    * ships to executors as a literal map, independent of corpus size.
    */
  final case class QualityModel(weights: Array[Long], bias: Long,
      buckets: Int) {
    require(weights.length == buckets, "weights.length must equal buckets")
  }

  /** Deterministic squashing link: p = 0.5 + 0.5·(m / (1 + |m|)).
    * Division/abs/add/multiply are exactly specified by IEEE-754, so the
    * value is bit-identical in any engine — unlike exp-based sigmoid.
    */
  def fastSigmoid(m: Column): Column =
    lit(0.5) + lit(0.5) * (m / (lit(1.0) + abs(m)))

  /** Distinct (id, bucket) binary features: bucket = h32(token) mod
    * `buckets`. One explode + one distinct (partial-aggregated shuffle on
    * the pair) — linear in token volume.
    */
  def hashedFeatures(df: DataFrame, textCol: String, idCol: String,
      buckets: Int): DataFrame =
    df.select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
      .select(col(idCol), (h32(col("__tok")) % buckets).cast("int").as("bucket"))
      .distinct()

  /** round-half-away-from-zero on the EXACT binary value of `d` — the
    * same ties rule as Spark's `round(col, 0)` and DuckDB's `round`, so
    * the driver-side weight updates replay identically in the oracle.
    */
  private def roundAway(d: Double): Long =
    new JBigDecimal(d).setScale(0, RoundingMode.HALF_UP).longValueExact

  /** Train by `steps` full-batch gradient steps at learning rate `lr`
    * from zero weights. `labelCol` must be 0/1. Per step: margins are an
    * exact integer sum of the literal-map weights over each doc's
    * buckets, p the fast-sigmoid link, and the gradient the integer sum
    * of round((p − y)·1e9) per bucket; the update subtracts
    * round(lr·1000·g / n) from each 1e12-scaled weight. The ONLY driver
    * collects are the `buckets`-row gradient frame and the bias sum —
    * bounded by construction (`buckets` ≤ 4096 enforced).
    */
  def train(df: DataFrame, textCol: String, labelCol: String,
      idCol: String, buckets: Int = 64, steps: Int = 3,
      lr: Double = 0.5): QualityModel = {
    require(buckets >= 1 && buckets <= 4096,
      s"train: buckets must be in [1, 4096], got $buckets")
    require(steps >= 1, s"train: steps must be >= 1, got $steps")
    require(lr > 0, s"train: lr must be > 0, got $lr")
    // co-partition everything by the doc id at pin time: the per-step
    // margin aggregate, label join and gradient join then all reuse the
    // cached partitioning, leaving ONE exchange per step (the
    // buckets-row gradient aggregate) instead of four
    val feats = CacheLifecycle.pin(
      hashedFeatures(df, textCol, idCol, buckets).repartition(col(idCol)))
    val labels = CacheLifecycle.pin(
      df.select(col(idCol), col(labelCol).cast("int").as("__y"))
        .repartition(col(idCol)))
    val n = labels.count()
    require(n > 0, "train: empty training set")
    // bucket -1 = the bias "feature" (present on every doc): ONE join +
    // ONE aggregate + ONE collect per step covers all buckets and the bias
    val withBias = CacheLifecycle.pin(
      feats.select(col(idCol), col("bucket"))
        .union(labels.select(col(idCol), lit(-1).cast("int").as("bucket")))
        .repartition(col(idCol)))
    val w = Array.fill(buckets)(0L)
    var bias = 0L
    (0 until steps).foreach { _ =>
      val contrib = contributions(feats, labels, idCol,
        QualityModel(w.clone(), bias, buckets))
      val grads = withBias.join(contrib, idCol)
        .groupBy("bucket").agg(sum(col("__c")).as("__g"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      def delta(g: Long): Long = roundAway(g * (lr * 1000.0) / n)
      (0 until buckets).foreach { b =>
        w(b) -= delta(grads.getOrElse(b, 0L))
      }
      bias -= delta(grads.getOrElse(-1, 0L))
    }
    QualityModel(w, bias, buckets)
  }

  /** Per-doc 1e9-scaled (p − y) — the shared core of the gradient pass. */
  private def contributions(feats: DataFrame, labels: DataFrame,
      idCol: String, model: QualityModel): DataFrame =
    labels.join(marginInt(feats, idCol, model), Seq(idCol), "left")
      .withColumn("__p", fastSigmoid(marginOf(col("__mi"), model)))
      .withColumn("__c",
        round((col("__p") - col("__y")) * lit(GradScale), 0).cast("long"))
      .select(col(idCol), col("__c"))

  /** Exact integer margin per doc: sum of the literal-map weights over
    * the doc's buckets (partial-aggregated; O(1) map probe per row).
    */
  private def marginInt(feats: DataFrame, idCol: String,
      model: QualityModel): DataFrame = {
    val wmap = typedLit(
      model.weights.zipWithIndex.map { case (v, i) => i -> v }.toMap)
    feats.select(col(idCol), element_at(wmap, col("bucket")).as("__w"))
      .groupBy(idCol).agg(sum(col("__w")).as("__mi"))
  }

  private def marginOf(mi: Column, model: QualityModel): Column =
    (coalesce(mi, lit(0L)) + lit(model.bias)).cast("double") /
      lit(WeightScale)

  /** Operating-point selection: the score cut that maximizes accuracy on
    * a labeled set (ties to the lowest cut). The search space is the
    * BOUNDED per-mil histogram of rounded scores — one corpus pass into
    * a ≤ 1001-row aggregate, then driver math over the histogram; never
    * a per-doc sort or collect. Returns (cutBucket, correct, n): predict
    * positive iff floor(score·1000) ≥ cutBucket. cutBucket ∈ [0, 1001]
    * (0 = everything positive, 1001 = nothing).
    */
  final case class ThresholdPick(cutBucket: Int, correct: Long, n: Long)

  def tuneThreshold(df: DataFrame, textCol: String, labelCol: String,
      idCol: String, model: QualityModel): ThresholdPick = {
    val scored = score(df, textCol, idCol, model)
      .join(df.select(col(idCol), col(labelCol).cast("int").as("__y")),
        idCol)
    val hist = scored
      .groupBy(floor(col("score") * 1000).cast("int").as("__b"))
      .agg(sum(col("__y")).cast("long").as("__pos"),
        count(lit(1)).as("__tot"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val totalPos = hist.map(_._2).sum
    val total = hist.map(_._3).sum
    // correct(cut) = negatives below the cut + positives at/above it;
    // sweep the 1001-bucket histogram once
    var negBelow = 0L
    var best = ThresholdPick(0, totalPos, total) // cut 0: all positive
    (0 to 1001).foreach { cut =>
      if (cut > 0) hist.filter(_._1 == cut - 1).foreach { case (_, p, t) =>
        negBelow += (t - p)
      }
      val posAtOrAbove = totalPos -
        hist.filter(_._1 < cut).map(_._2).sum
      val correct = negBelow + posAtOrAbove
      if (correct > best.correct) best = ThresholdPick(cut, correct, total)
    }
    best
  }

  /** Score a corpus with a trained model: (idCol, score, pred) where
    * score = round(p, 6) and pred = p ≥ 0.5.
    *
    * Scoring is the 100 TB-sized pass, so unlike training it is a
    * NARROW per-row map — one projection, no explode, no distinct
    * shuffle, no aggregate, no join — and the margin is the native
    * whole-stage-codegen [[graft.expr.catalyst.HashedMarginInt]]
    * expression (a HOF fold would interpret every element, md5
    * included). The margin is the same exact integer sum the training
    * pass aggregates — order-independent, so the exploded and native
    * forms are value-identical (the oracle replays the exploded form).
    */
  def score(df: DataFrame, textCol: String, idCol: String,
      model: QualityModel): DataFrame =
    df.select(col(idCol), rawP(col(textCol), model).as("__p"))
      .select(col(idCol), round(col("__p"), 6).as("score"),
        (col("__p") >= 0.5).as("pred"))

  /** The un-rounded probability as a composable Column (native margin +
    * fast sigmoid) — for callers that keep their own columns alongside
    * the score (e.g. [[domainQualityReport]]).
    */
  def rawP(text: Column, model: QualityModel): Column =
    fastSigmoid(marginOf(
      call_function("hashed_margin", tokens(text),
        typedLit(model.weights)), model))

  /** The stats → operating point → report composition: per registrable
    * domain (derived from `urlCol` in the same narrow map), document
    * count, documents KEPT at the `cutBucket` operating point
    * (floor(score·1000) ≥ cut — [[tuneThreshold]]'s contract) and the
    * exact 1e-6-quanta score sum (an integer — partition-order-safe,
    * unlike a double mean). One codegen'd projection into one partial
    * hash aggregate; docs with no parseable host report under the null
    * domain rather than vanishing.
    */
  def domainQualityReport(df: DataFrame, urlCol: String, textCol: String,
      model: QualityModel, cutBucket: Int): DataFrame = {
    val score6 = round(rawP(col(textCol), model), 6)
    df.select(
        Curation.registrableDomain(Curation.extractHost(col(urlCol)))
          .as("domain"),
        score6.as("__s"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        sum((floor(col("__s") * 1000).cast("int") >= lit(cutBucket))
          .cast("long")).as("n_kept"),
        sum(round(col("__s") * 1e6, 0).cast("long")).as("sum_score6"))
  }
}
