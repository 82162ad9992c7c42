package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.WordPiece

/** WordPiece tokenizer: training's exact likelihood-ratio argmax must
  * be hand-verifiable on a tiny corpus, MaxMatch must honour the
  * published greedy no-backtracking contract (a word can be [UNK]
  * even when a non-greedy segmentation exists), and training must be
  * partition-invariant — the property that makes the DuckDB replay
  * possible at all.
  */
class WordPieceSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  // ---------------------------------------------------------------
  // MaxMatch
  // ---------------------------------------------------------------

  test("maxMatch: greedy longest-match-first with ## continuations") {
    val vocab = Set("a", "ab", "abc", "##b", "##c", "##bc", "##d")
    // longest first at pos 0: "abc" wins over "ab"/"a"
    assert(WordPiece.maxMatch("abcd", vocab, 3) ===
      Some(Seq("abc", "##d")))
    // after pos 0 only ## pieces match: "ab" then "##c" (##bc loses
    // to nothing here; at pos 2 longest is ##c? no — pos 2 suffix "cd":
    // ##cd not in vocab, ##c matches)
    assert(WordPiece.maxMatch("abcd", vocab - "abc", 3) ===
      Some(Seq("ab", "##c", "##d")))
  }

  test("maxMatch: no backtracking — greedy dead-end makes [UNK]") {
    // "ab" + "##c" segments "abc", but greedy takes "abc"... remove it:
    // vocab where greedy at pos 0 takes "ab", then suffix "c" has no
    // "##c" — yet "a" + "##bc" would have worked. Published MaxMatch
    // does NOT backtrack: the word is [UNK].
    val vocab = Set("a", "ab", "##bc")
    assert(WordPiece.maxMatch("abc", vocab, 2) === None)
  }

  test("maxMatch: word-initial lookup never lands on a continuation piece") {
    // a corpus word literally starting with "##": at pos 0 the 3-char
    // candidate core "##x" textually EQUALS the continuation piece
    // "##x" in the vocabulary, but a word-initial match must be a BARE
    // piece — the guard forces the fall-through to "#", then the
    // continuations "###" and "##x"
    val vocab = Set("abc", "##x", "#", "###")
    assert(WordPiece.maxMatch("##x", vocab, 3) ===
      Some(Seq("#", "###", "##x")))
  }

  test("maxMatch: empty word and single-char words") {
    assert(WordPiece.maxMatch("", Set("a"), 1) === Some(Seq.empty))
    assert(WordPiece.maxMatch("a", Set("a"), 1) === Some(Seq("a")))
    assert(WordPiece.maxMatch("z", Set("a"), 1) === None)
  }

  // ---------------------------------------------------------------
  // Training
  // ---------------------------------------------------------------

  test("wordpieceTrain: likelihood-ratio argmax, hand-computed") {
    // corpus: "aab" x3, "ab" x2, "bb" x1 (as documents)
    val docs = Seq((1L, "aab aab aab ab ab bb")).toDF("id", "text")
    // initial rendering: aab -> " a  ##a  ##b ", ab -> " a  ##b ",
    // bb -> " b  ##b "
    // symbol counts: a=5, ##a=3, ##b=6, b=1
    // pair counts: (a,##a)=3, (##a,##b)=3, (a,##b)=2, (b,##b)=1
    // scores: 3/(5*3)=1/5, 3/(3*6)=1/6, 2/(5*6)=1/15, 1/(1*6)=1/6
    // argmax: (a,##a) at 1/5 -> merge 1 = ("a","##a") minting "aa"
    val merges = WordPiece.wordpieceTrain(docs, "text", 2)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3)))
    assert(merges(0) === ((1, "a", "##a", "aa")))
    // after merge 1: aab -> " aa  ##b ", ab -> " a  ##b ", bb -> " b  ##b "
    // symbols: aa=3, ##b=6, a=2, b=1
    // pairs: (aa,##b)=3, (a,##b)=2, (b,##b)=1
    // scores: 3/18=1/6, 2/12=1/6, 1/6 — three-way tie -> (l,r) asc:
    // "a" < "aa" < "b" -> merge 2 = ("a","##b") minting "ab"
    assert(merges(1) === ((2, "a", "##b", "ab")))
  }

  test("wordpieceTrain: early exhaustion stops minting") {
    // single distinct word "ab": merge 1 fuses it to one symbol;
    // no pair remains, so asking for 5 merges yields exactly 1
    val docs = Seq((1L, "ab ab AB")).toDF("id", "text")
    val merges = WordPiece.wordpieceTrain(docs, "text", 5).collect()
    assert(merges.length === 1)
    assert(merges(0).getString(3) === "ab")
  }

  test("wordpieceTrain: partition-adversarial determinism") {
    val docs = Seq(
      (1L, "banana bandana ban"), (2L, "banana anna nab"),
      (3L, "abba banana band"), (4L, "anna ana nab ban"))
      .toDF("id", "text")
    def run(df: org.apache.spark.sql.DataFrame): Seq[(Int, String)] =
      WordPiece.wordpieceTrain(df, "text", 6).orderBy("rank")
        .collect().map(r => (r.getInt(0), r.getString(3))).toSeq
    val base = run(docs.coalesce(1))
    assert(run(docs.repartition(7)) === base)
    assert(run(docs.repartition(32, $"id")) === base)
  }

  // ---------------------------------------------------------------
  // Encoding over a trained vocabulary
  // ---------------------------------------------------------------

  test("persisted vocabulary artifact: live == loaded, order re-derived") {
    val docs = Seq((1L, "aab aab aab ab ab bb")).toDF("doc_id", "text")
    val merges = WordPiece.wordpieceTrain(docs, "text", 2)
    val vocab = WordPiece.wordpieceVocabulary(docs, "text", merges)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-wp-spec").toString
    // save SHUFFLED: load must re-sort (ids reproducible from the
    // artifact alone, not from the writer's row order)
    WordPiece.saveVocab(spark, vocab.reverse, dir)
    assert(WordPiece.loadVocab(spark, dir) === vocab)
    val enc = Seq((1L, "aab ab axb")).toDF("doc_id", "text")
    val live = WordPiece.wordpieceEncode(enc, "text", "doc_id", vocab)
      .collect().toSeq
    val loaded = WordPiece
      .encodeWithVocabDir(spark, dir, enc, "text", "doc_id")
      .collect().toSeq
    assert(live === loaded)
  }

  test("wordpieceEncode + encodeIds: counts, [UNK], ids round-trip") {
    val docs = Seq((1L, "aab aab aab ab ab bb")).toDF("doc_id", "text")
    val merges = WordPiece.wordpieceTrain(docs, "text", 2)
    val vocab = WordPiece.wordpieceVocabulary(docs, "text", merges)
    // alphabet {a, b, ##a, ##b} ∪ minted {aa, ab}, sorted
    assert(vocab === Seq("##a", "##b", "a", "aa", "ab", "b"))
    // encode corpus with a word containing an out-of-alphabet char:
    // "axb" matches "a" then dead-ends on 'x' -> [UNK]
    val enc = Seq((1L, "aab ab axb"), (2L, "")).toDF("doc_id", "text")
    val got = WordPiece.wordpieceEncode(enc, "text", "doc_id", vocab)
      .orderBy("doc_id").collect()
    // doc 1: aab -> aa ##b (2), ab -> ab (1), axb -> [UNK] (1 piece)
    assert(got(0).getLong(1) === 3L)  // n_tokens
    assert(got(0).getLong(2) === 4L)  // n_pieces
    assert(got(0).getLong(3) === 1L)  // n_unk
    assert(got(1).getLong(1) === 0L)
    assert(got(1).getLong(2) === 0L)

    val ids = WordPiece.wordpieceEncodeIds(enc, "text", "doc_id", vocab)
      .orderBy("doc_id", "tok_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
    assert(ids.toSeq === Seq(
      (1L, 0L, Seq(3L, 1L)),   // aa=3, ##b=1
      (1L, 1L, Seq(4L)),       // ab=4
      (1L, 2L, Seq(-1L))))     // [UNK]
  }
}
