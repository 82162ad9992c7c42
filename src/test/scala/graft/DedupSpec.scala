package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.Dedup

/** Dedup operators' scale guards: the LSH hot-band cap (a cluster of exact
  * duplicates puts its whole size into one band bucket) and the banded
  * simhashPairs join (must equal the quadratic definition).
  */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  test("lshCandidates maxBandFreq drops hot-band pairs, keeps cool pairs") {
    // 10 identical docs (one hot bucket per band) + 2 identical docs
    val docs =
      (1 to 10).map(i => (i.toLong, "the quick brown fox jumps over the lazy dog again and again")) ++
        Seq((21L, "an entirely different second document about spark plans and shuffles"),
          (22L, "an entirely different second document about spark plans and shuffles"))
    val df = docs.toDF("doc_id", "text")

    val uncapped = Dedup.lshCandidates(df, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.size == 45 + 1) // C(10,2) hot-cluster pairs + the cool pair

    val capped = Dedup.lshCandidates(df, "text", "doc_id",
      maxBandFreq = Some(5))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((21L, 22L))) // hot buckets dropped, cool pair kept
  }

  test("banded simhashPairs equals the quadratic definition") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"), // near-dup of 1
      (3L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup of 1
      (4L, "one two three four five six seven eight nine ten"),
      (5L, "completely unrelated words nothing shared here at all"))
    val df = docs.toDF("doc_id", "text")
    val maxDist = 10

    val banded = Dedup.simhashPairs(df, "text", "doc_id", maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    // quadratic reference: all-pairs over the same signatures
    val sigs = Dedup.simhash(df, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val quad = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      d = java.lang.Long.bitCount(sa ^ sb) if d <= maxDist
    } yield (ia, ib, d)).toSet

    assert(banded == quad)
    assert(banded.exists { case (a, b, d) => a == 1L && b == 3L && d == 0 })
  }

  test("components label every cluster with its minimum id") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta"),
      (4L, "one two three four five six seven eight nine ten"),
      (5L, "completely unrelated words nothing shared here at all"))
    val pairs = Dedup.simhashPairs(docs.toDF("doc_id", "text"),
      "text", "doc_id", maxDist = 10)
    val got = Dedup.components(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1,2,3 are mutual near-dups; 4 and 5 have no edges (absent)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("components propagate across a long chain") {
    val edges = (0L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.components(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 9L).map(_ -> 0L).toMap)
  }

  test("exact all-pairs baselines refuse oversized inputs") {
    val big = spark.range(50).select(col("id").as("doc_id"),
      array(lit(1f), lit(0f)).as("emb"))
    val e = intercept[IllegalArgumentException](
      Dedup.embeddingPairs(big, "emb", "doc_id", 0.9, maxExactRows = 10))
    assert(e.getMessage.contains("embeddingPairsCelled"))
    val e2 = intercept[IllegalArgumentException](
      graft.ml.Similarity.bruteForceTopK(big, big, "emb", "doc_id", 3,
        maxExactWork = 100))
    assert(e2.getMessage.contains("ivfTopK"))
  }
}
