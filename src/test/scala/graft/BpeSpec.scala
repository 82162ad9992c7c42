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

  test("bpeEncodeIdsLarge: code-point + first-producing-rank ids in " +
    "token order; duplicate-output merges share one id") {
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "s"),
      // a duplicate-output pair: both concatenate to "es"
      ("e", "s"))
    val docs = Seq((1L, "low lower zz"), (2L, ""))
      .toDF("doc_id", "text")
    val out = Bpe.bpeEncodeIdsLarge(docs, "text", "doc_id", merges)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[Long](2).toList)
      .toMap
    val base = 0x110000L
    // lo -> rank 1, low -> rank 2, es -> min(3, 4) = 3
    assert(out((1L, 0L)) == List(base + 2), out.toString)       // low
    assert(out((1L, 1L)) ==
      List(base + 2, 'e'.toLong, 'r'.toLong))                   // low e r
    assert(out((1L, 2L)) == List('z'.toLong, 'z'.toLong),
      "unknown chars fall back to code points")
    assert(out.size == 3, "empty docs emit no rows")
    // the duplicate-output table still encodes "es" pieces as base+3
    val withEs = Bpe.bpeEncodeIdsLarge(
      Seq((3L, "eses")).toDF("doc_id", "text"), "text", "doc_id", merges)
      .collect().map(r => r.getSeq[Long](2).toList)
    assert(withEs.head == List(base + 3, base + 3), withEs.toString)
  }

  test("property: the armed-rank pass simulation equals the literal " +
    "pass-by-rank sweep on random words and merge tables") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // ground truth: one left-to-right non-overlapping sweep per rank,
    // in rank order — the chained replace-all contract, literally
    def reference(word: String,
        merges: Seq[(String, String)]): Seq[String] = {
      var syms: Array[String] = word.toCharArray.map(_.toString)
      merges.foreach { case (l, r) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
            out += l + r; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toArray
      }
      syms.toSeq
    }
    val symGen = for {
      n <- Gen.choose(1, 3)
      cs <- Gen.listOfN(n, Gen.oneOf("a", "b"))
    } yield cs.mkString
    val tableGen = for {
      m <- Gen.choose(1, 12)
      ps <- Gen.listOfN(m, Gen.zip(symGen, symGen))
    } yield ps
    val wordGen = for {
      n <- Gen.choose(0, 10)
      cs <- Gen.listOfN(n, Gen.oneOf("a", "b"))
    } yield cs.mkString
    var seed = Seed(42L)
    (0 until 300).foreach { _ =>
      val w = wordGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val merges = tableGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val ranks = merges.zipWithIndex.groupBy(_._1)
        .map { case (p, xs) => p -> xs.map(_._2 + 1).sorted.toArray }
      val got =
        Bpe.encodePieceStrings(w, merges.toArray, ranks).toSeq
      val want = reference(w, merges)
      assert(got == want, s"word=$w merges=$merges got=$got want=$want")
    }
  }

  test("bpeEncodeLarge == bpeEncode on learned merges (equivalence)") {
    val richer = docs.union(Seq(
      (5L, "lowest newest lowest slowest"),
      (6L, "we sew news lower")).toDF("doc_id", "text"))
    val merges = Bpe.bpeTrain(richer, "text", numMerges = 12)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
    val chain = rows(Bpe.bpeEncode(richer, "text", "doc_id", merges))
    val large = rows(Bpe.bpeEncodeLarge(richer, "text", "doc_id", merges))
    assert(large == chain,
      s"pass-by-rank simulation must match the replace chain: " +
        s"$large vs $chain")
  }

  test("bpeEncodeLarge: PASS semantics, not min-rank-first — an " +
    "earlier pass never fires on a pair a later pass creates") {
    // merges: rank 1 (ab, c), rank 2 (a, b). Chain: pass 1 no-op (no
    // 'ab' symbol yet), pass 2 -> [ab, c] = 2 pieces. A min-rank-first
    // encoder would then merge (ab, c) -> 1 piece — wrong.
    val one = Seq((1L, "abc")).toDF("doc_id", "text")
    val merges = Seq(("ab", "c"), ("a", "b"))
    val chain = Bpe.bpeEncode(one, "text", "doc_id", merges)
      .collect().head.getLong(2)
    val large = Bpe.bpeEncodeLarge(one, "text", "doc_id", merges)
      .collect().head.getLong(2)
    assert(chain == 2L, s"chain ground truth: $chain")
    assert(large == 2L,
      "bpeEncodeLarge must not revisit a pass whose turn is gone")
    // and a pair CREATED by an earlier pass must fire a later pass:
    // rank 1 (a, b), rank 2 (ab, c) -> abc collapses to 1 piece
    val fwd = Seq(("a", "b"), ("ab", "c"))
    assert(Bpe.bpeEncodeLarge(one, "text", "doc_id", fwd)
      .collect().head.getLong(2) == 1L)
    // duplicate pair in the table: each occurrence is its own pass.
    // ranks: 1 (a,b), 2 (c,ab), 3 (a,b) on "cabab": pass 1 merges both
    // (a,b) L-to-R -> [c, ab, ab]; pass 2 -> [cab, ab]; pass 3 no-op
    // (no bare a,b left) -> 2 pieces.
    val dup = Seq((1L, "cabab")).toDF("doc_id", "text")
    val dm = Seq(("a", "b"), ("c", "ab"), ("a", "b"))
    assert(Bpe.bpeEncodeLarge(dup, "text", "doc_id", dm)
      .collect().head.getLong(2) ==
      Bpe.bpeEncode(dup, "text", "doc_id", dm)
        .collect().head.getLong(2))
  }

  test("bpeEncode refuses >256 merges and names the scale path") {
    val merges = (1 to 257).map(i => (s"x$i", "y"))
    val e = intercept[IllegalArgumentException](
      Bpe.bpeEncode(docs, "text", "doc_id", merges))
    assert(e.getMessage.contains("bpeEncodeLarge"))
    // bpeEncodeLarge takes the same list without complaint
    assert(Bpe.bpeEncodeLarge(docs, "text", "doc_id", merges)
      .count() == 4)
  }
}
