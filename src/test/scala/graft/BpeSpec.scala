package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.Bpe

/** BPE merge learning on the classic low/lower/newest corpus: the merge
  * sequence is fully determined by the published algorithm plus the
  * (count DESC, l, r) tie-break, so the expected table is exact.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower"),
    (3L, "newest newest newest"),
    (4L, null.asInstanceOf[String]))
    .toDF("doc_id", "text")

  test("bpeTrain: exact merge sequence with deterministic tie-breaks") {
    val merges = Bpe.bpeTrain(docs, "text", numMerges = 3)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    // pair counts round 1: (l,o)=7 and (o,w)=7 tie -> l < o picks (l,o);
    // round 2: (lo,w)=7; round 3: five pairs tie at 3 -> (e,s) smallest
    assert(merges.toSeq ==
      Seq((1, "l", "o"), (2, "lo", "w"), (3, "e", "s")),
      merges.toSeq.toString)
    val again = Bpe.bpeTrain(docs, "text", numMerges = 3)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(again.toSeq == merges.toSeq, "training must be deterministic")
  }

  test("bpeEncode: per-doc piece counts under the learned merges") {
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "s"))
    val out = Bpe.bpeEncode(docs, "text", "doc_id", merges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // low -> [low] (1 piece); lower -> [low, e, r] (3);
    // newest -> [n, e, w, es, t] (5)
    assert(out(1L) == ((5L, 5L)), out.toString)
    assert(out(2L) == ((2L, 6L)))
    assert(out(3L) == ((3L, 15L)))
    assert(out(4L) == ((0L, 0L)), "null text keeps a zero row")
  }
}
