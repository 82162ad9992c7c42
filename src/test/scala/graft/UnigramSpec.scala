package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.Unigram

/** Unigram-LM tokenizer: the Viterbi DP must reproduce the brute-force
  * argmax under the FULL tie-broken total order (exact rational score,
  * then fewer pieces, then lexicographically smaller path) — that
  * equivalence is what lets the DuckDB oracle replay encoding by
  * enumerating every segmentation.
  */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val P = BigInt(1000000)

  /** All vocab-valid segmentations of `w`, best-first under the exact
    * order: score `prod(p)/P^k` desc (cross-multiplied), k asc, path
    * asc. Single chars missing from the vocab count as probability 0.
    */
  private def bruteBest(w: String, vocab: Map[String, Long],
      maxLen: Int): Seq[String] = {
    def segs(s: String): Seq[List[String]] =
      if (s.isEmpty) Seq(Nil)
      else (1 to math.min(maxLen, s.length)).flatMap { l =>
        val piece = s.take(l)
        val ok = if (l == 1) true else vocab.contains(piece)
        if (ok) segs(s.drop(l)).map(piece :: _) else Seq.empty
      }
    def score(seg: List[String]): BigInt =
      seg.map(p => BigInt(vocab.getOrElse(p, 0L))).product
    segs(w).minBy(seg => seg)(Ordering.fromLessThan { (a, b) =>
      val (sa, sb) = (score(a), score(b))
      val (l, r) = (sa * P.pow(b.length), sb * P.pow(a.length))
      if (l != r) l > r
      else if (a.length != b.length) a.length < b.length
      else a.mkString(" ") < b.mkString(" ")
    })
  }

  test("viterbi == brute force over a piece-rich vocabulary") {
    val vocab = Map[String, Long](
      "a" -> 300000, "b" -> 200000, "c" -> 100000, "d" -> 50000,
      "ab" -> 120000, "bc" -> 90000, "cd" -> 60000, "abc" -> 40000,
      "bcd" -> 20000, "aa" -> 10000, "e" -> 0, "de" -> 15000)
    val words = Seq("abcd", "aabcde", "abcabc", "dcba", "a", "e",
      "abcde", "ddddd", "bcdbcd", "aaaa", "edcba", "cab")
    words.foreach { w =>
      val got = Unigram.viterbi(w, vocab, 3)
      val want = bruteBest(w, vocab, 3)
      assert(got == want, s"word=$w got=$got want=$want")
    }
  }

  test("exact tie-breaks: equal products resolve to fewer pieces, then path") {
    // p(ab)*p(c) == p(a)*p(bc) == 6e9: same k (2) -> path order decides
    // ("a bc" < "ab c")
    val tied = Map[String, Long](
      "a" -> 100000, "b" -> 1, "c" -> 60000, "ab" -> 100000,
      "bc" -> 60000)
    assert(Unigram.viterbi("abc", tied, 3) == Seq("a", "bc"))
    assert(bruteBest("abc", tied, 3) == Seq("a", "bc"))
    // p(ab) == p(a)*p(b) impossible in integers here, so force the
    // all-zero case: every path scores 0 -> fewest pieces wins
    val zeros = Map[String, Long]("a" -> 0, "b" -> 0, "ab" -> 0)
    assert(Unigram.viterbi("abab", zeros, 3) == Seq("ab", "ab"))
  }

  test("unknown single characters segment as probability-0 fallbacks") {
    val vocab = Map[String, Long]("a" -> 500000, "ab" -> 400000)
    // 'x' and 'q' are not in the vocabulary: encoding is still total
    assert(Unigram.viterbi("axb", vocab, 3) == Seq("a", "x", "b"))
    assert(Unigram.viterbi("qq", vocab, 3) == Seq("q", "q"))
  }

  test("unigramTrain: seed + hard-EM rounds on a tiny exact corpus") {
    val docs = Seq(
      (1L, "abab abab cd"), (2L, "abab cd cd"), (3L, "ab"))
      .toDF("doc_id", "text")
    val v = Unigram.unigramTrain(docs, "text", maxPieceLen = 2,
      seedSize = 3, minCount = 2, emRounds = 1)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // word freqs: abab=3, cd=3, ab=1. Seed substring-occurrence counts
    // (freq-weighted): a=7, b=7, c=3, d=3, ab=7, ba=3, cd=3 -> top-3
    // multi-char >= 2: ab(7), then the (3,'ba') < (3,'cd') tie ->
    // vocab = {a,b,c,d} ∪ {ab,ba,cd}, seed total 33.
    // EM round 1 viterbi: "abab" -> [ab,ab] (cross-multiplied exact
    // compare beats [a,ba,b] and char paths), "cd" -> [cd], "ab" ->
    // [ab]. Counts: ab = 2*3+1 = 7, cd = 3, rest 0; total 10.
    assert(v("ab") == ((7L, 700000L)), v.toString)
    assert(v("cd") == ((3L, 300000L)))
    assert(v("a") == ((0L, 0L)))
    assert(v("ba") == ((0L, 0L)))
    assert(v.size == 7)
  }

  test("unigramEncode: per-doc counts and replayable path checksum") {
    val docs = Seq(
      (1L, "abab cd"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val vocab = Seq("a" -> 0L, "b" -> 0L, "c" -> 0L, "d" -> 0L,
      "ab" -> 625000L, "cd" -> 375000L)
    val out = Unigram.unigramEncode(docs, "text", "doc_id", vocab, 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val expHash = Unigram.h32s("abab:ab ab") + Unigram.h32s("cd:cd")
    assert(out(1L) == ((2L, 3L, expHash)), out.toString)
    assert(out(2L) == ((0L, 0L, 0L)))
    assert(out(3L) == ((0L, 0L, 0L)))
  }

  test("pruneTo: the shrink loop keeps top multi-char pieces and " +
    "renormalizes over the survivors") {
    val docs = Seq(
      (1L, "abab abab cd"), (2L, "abab cd cd"), (3L, "ab"))
      .toDF("doc_id", "text")
    val v = Unigram.unigramTrain(docs, "text", maxPieceLen = 2,
      seedSize = 3, minCount = 2, emRounds = 2, pruneTo = Some(1))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // round 1 counts: ab=7, cd=3 (see the unpruned test); prune to the
    // single best multi-char piece -> {a,b,c,d, ab}, total 7, so
    // p(ab)=1000000. Round 2: "abab"->[ab,ab], "cd"->[c,d] (the cd
    // piece is GONE), "ab"->[ab]; counts ab=7, c=3, d=3, total 13.
    assert(v.size == 5, v.toString)
    assert(v("ab") == ((7L, 538461L)), v.toString)  // 7e6/13
    assert(v("c") == ((3L, 230769L)))               // 3e6/13
    assert(v("d") == ((3L, 230769L)))
    assert(v("a") == ((0L, 0L)))
    assert(!v.contains("cd"), "pruned piece must leave the vocabulary")
  }

  test("unigramEncodeIds: lexicographic piece ids in token order, " +
    "unknown fallback is -1, empty docs emit no rows") {
    val docs = Seq(
      (1L, "abab cd"), (2L, "axb"), (3L, ""))
      .toDF("doc_id", "text")
    val vocab = Seq("a" -> 0L, "b" -> 0L, "c" -> 0L, "d" -> 0L,
      "ab" -> 625000L, "cd" -> 375000L)
    // lexicographic ids: a=0, ab=1, b=2, c=3, cd=4, d=5
    val out = Unigram.unigramEncodeIds(docs, "text", "doc_id", vocab, 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[Long](2).toList)
      .toMap
    assert(out((1L, 0L)) == List(1L, 1L), out.toString) // abab -> ab ab
    assert(out((1L, 1L)) == List(4L))                   // cd
    assert(out((2L, 0L)) == List(0L, -1L, 2L))          // a <unk:x> b
    assert(out.size == 3, "the empty doc must emit no rows")
  }

  test("fertilityByDomain: exact per-domain sums, fixed-point ratio, " +
    "null-domain and zero-token groups, PSL keying changes grouping") {
    val docs = Seq(
      (1L, "abab cd", "https://a.ex.com/1"),
      (2L, "abab abab abab", "https://b.ex.com/2"),
      (3L, "", "https://a.ex.com/3"),
      (4L, "cd", null.asInstanceOf[String]),
      (5L, "abab", "https://user.github.io/x"))
      .toDF("doc_id", "text", "url")
    val vocab = Seq("a" -> 0L, "b" -> 0L, "c" -> 0L, "d" -> 0L,
      "ab" -> 625000L, "cd" -> 375000L)
    val out = Unigram.fertilityByDomain(docs, "text", "doc_id", "url",
      vocab, 2)
      .collect().map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // ex.com: docs 1,2,3 -> tokens 1+1 + 3 + 0 = 5, pieces
    // (2+1) + 3*2 + 0 = 9 -> fert 1800000; github.io doc 5: 1 tok,
    // 2 pieces; null-url doc 4: 1 tok 1 piece under the null domain
    assert(out(Some("ex.com")) == ((3L, 5L, 9L, 1800000L)), out.toString)
    assert(out(Some("github.io")) == ((1L, 1L, 2L, 2000000L)))
    assert(out(None) == ((1L, 1L, 1L, 1000000L)))
    // full-PSL keying: user.github.io is its own registrable domain
    val psl = Unigram.fertilityByDomain(docs, "text", "doc_id", "url",
      vocab, 2, psl = Some(graft.ml.Curation.publicSuffixList(spark)))
      .collect().map(r => Option(r.getString(0))).toSet
    assert(psl.contains(Some("user.github.io")) &&
      !psl.contains(Some("github.io")),
      s"vendored PSL must re-key the github.io group, got $psl")
  }

  test("expectedCounts: forward-backward marginals equal brute-force " +
    "path sums; zero-mass words contribute nothing") {
    def bruteExpected(w: String, vocab: Map[String, Long],
        maxLen: Int): Map[String, Long] = {
      def segs(s: String): Seq[List[String]] =
        if (s.isEmpty) Seq(Nil)
        else (1 to math.min(maxLen, s.length)).flatMap { l =>
          val piece = s.take(l)
          val ok = if (l == 1) true else vocab.contains(piece)
          if (ok) segs(s.drop(l)).map(piece :: _) else Seq.empty
        }
      val paths = segs(w)
      def snorm(seg: List[String]): BigInt =
        seg.map(p => BigInt(vocab.getOrElse(p, 0L))).product *
          P.pow(w.length - seg.length)
      val den = paths.map(snorm).sum
      if (den.signum == 0) Map.empty
      else paths.flatMap(seg => seg.map(_ -> snorm(seg)))
        .groupBy(_._1)
        .map { case (p, xs) =>
          p -> ((xs.map(_._2).sum * P) / den).toLong }
        .filter(_._2 != 0L)
    }
    val vocab = Map[String, Long](
      "a" -> 300000, "b" -> 200000, "c" -> 100000, "ab" -> 120000,
      "bc" -> 90000, "abc" -> 40000, "d" -> 0, "cd" -> 60000)
    for (w <- Seq("abc", "abcab", "aabc", "cdcd", "dd", "a", "bcbca")) {
      assert(Unigram.expectedCounts(w, vocab, 3) ==
        bruteExpected(w, vocab, 3), s"word=$w")
    }
    // hand case: p(a)=p(aa)=0.5 over "aa" — paths [aa] (norm 5e11)
    // and [a,a] (2.5e11): E[aa] = 5/7.5, E[a] = 2·2.5/7.5
    val uni = Map[String, Long]("a" -> 500000, "aa" -> 500000)
    assert(Unigram.expectedCounts("aa", uni, 2) ==
      Map("aa" -> 666666L, "a" -> 666666L))
    // all-zero vocabulary: no mass to distribute
    assert(Unigram.expectedCounts("ab",
      Map[String, Long]("a" -> 0, "b" -> 0), 2) == Map.empty)
  }

  test("saveVocab/loadVocab round-trips the artifact; persisted encode " +
    "equals live encode") {
    val docs = Seq(
      (1L, "abab abab cd"), (2L, "abab cd cd"), (3L, "ab"))
      .toDF("doc_id", "text")
    val trained = Unigram.unigramTrain(docs, "text", maxPieceLen = 2,
      seedSize = 3, minCount = 2, emRounds = 1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-unigram-vocab").toString
    Unigram.saveVocab(spark, trained, maxPieceLen = 2, dir)
    val (vocab, maxLen) = Unigram.loadVocab(spark, dir)
    assert(maxLen == 2)
    assert(vocab == vocab.sortBy(_._1), "loadVocab order is pinned")
    assert(vocab.toMap == trained.collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows(Unigram.encodeWithVocabDir(spark, dir, docs, "text",
        "doc_id")) ==
      rows(Unigram.unigramEncode(docs, "text", "doc_id",
        trained.collect().map(r => r.getString(0) -> r.getLong(2)).toSeq,
        2)))
  }

  test("property: viterbi == brute force over random words and " +
    "vocabularies (ties, zeros, unknowns included)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val alpha = Seq("a", "b", "c")
    val wordGen = for {
      n <- Gen.choose(0, 7)
      cs <- Gen.listOfN(n, Gen.oneOf(alpha))
    } yield cs.mkString
    // probabilities from a tiny palette so exact ties are COMMON
    val pGen = Gen.oneOf(0L, 1L, 250000L, 500000L)
    val vocabGen = for {
      // single chars: a/b always known, c sometimes missing (unknown
      // fallback path); multi-char pieces over the alphabet
      pa <- pGen; pb <- pGen
      withC <- Gen.oneOf(true, false); pc <- pGen
      nMulti <- Gen.choose(0, 6)
      multi <- Gen.listOfN(nMulti, for {
        l <- Gen.choose(2, 3)
        cs <- Gen.listOfN(l, Gen.oneOf(alpha))
        p <- pGen
      } yield (cs.mkString, p))
    } yield (Map("a" -> pa, "b" -> pb) ++
      (if (withC) Map("c" -> pc) else Map.empty) ++ multi.toMap)
    var seed = Seed(20260815L)
    var checked = 0
    (0 until 300).foreach { _ =>
      val w = wordGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val v = vocabGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      if (w.nonEmpty) {
        val got = Unigram.viterbi(w, v, 3)
        val want = bruteBest(w, v, 3)
        assert(got == want, s"word=$w vocab=$v got=$got want=$want")
        checked += 1
      }
    }
    assert(checked > 200, s"generator starved: $checked")
  }

  test("training is deterministic across invocations and partitionings") {
    val docs = Seq((1L, "the cat sat on the mat"),
      (2L, "the bat and the rat"), (3L, "that cat that mat"))
      .toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Unigram.unigramTrain(df, "text", maxPieceLen = 3,
        seedSize = 10, minCount = 2, emRounds = 2)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    assert(run(docs) == run(docs))
    assert(run(docs.repartition(7)) == run(docs.coalesce(1)),
      "vocabulary must not depend on the partition layout")
    def runSoft(df: org.apache.spark.sql.DataFrame) =
      Unigram.unigramTrainSoft(df, "text", maxPieceLen = 3,
        seedSize = 10, minCount = 2, emRounds = 2)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    assert(runSoft(docs.repartition(5)) == runSoft(docs.coalesce(1)))
  }
}
