package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.{Unigram, WordPiece}

/** The byte-fallback contract (SentencePiece `--byte_fallback`): with
  * fallback on, NO token ever encodes as −1 — out-of-vocabulary
  * characters become their raw UTF-8 bytes (ids 0..255) and vocabulary
  * ranks shift by 256; the id spaces never collide. Supplementary-plane
  * characters whose surrogate halves the UTF-16-indexed DP splits into
  * adjacent unknown pieces must re-unite into their true byte sequence.
  */
class ByteFallbackSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val emoji = new String(Character.toChars(0x1F600)) // 😀

  private def corpus = Seq(
    (1L, "abc ab abc"),
    (2L, "ab abc ab"),
    (3L, "abc abc ab")).toDF("doc_id", "text")

  // bait: digits, '#', and an emoji — none appear in training
  private def bait = Seq(
    (1L, s"abc a3b $emoji"),
    (2L, s"x7 ab${emoji}c")).toDF("doc_id", "text")

  test("unigram: no -1 survives with fallback on; bytes are real UTF-8") {
    val vocab = Unigram.unigramTrain(corpus, "text", 3, 10, 1, 2)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toSeq
    val enc = Unigram.unigramEncodeIds(bait, "text", "doc_id", vocab,
      3, byteFallback = true)
      .select(col("doc_id"), col("tok_pos"),
        explode(col("piece_ids")).as("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(enc.nonEmpty)
    assert(enc.forall(_._3 >= 0), "an id < 0 survived byte fallback")
    // the emoji-only token must encode as exactly its UTF-8 bytes
    // F0 9F 98 80 (the surrogate run re-united) — doc 1, token 2
    val emojiIds = enc.filter(e => e._1 == 1L && e._2 == 2L).map(_._3)
    assert(emojiIds.toSeq === Seq(0xF0L, 0x9FL, 0x98L, 0x80L))
    // byte ids and vocab ids occupy disjoint ranges
    val (bytes, vocabIds) = enc.map(_._3).partition(_ < 256)
    assert(bytes.forall(b => b >= 0 && b <= 255))
    assert(vocabIds.forall(_ >= 256))
    // without fallback the same corpus DOES produce -1 (the bait works)
    val plain = Unigram.unigramEncodeIds(bait, "text", "doc_id", vocab, 3)
      .select(explode(col("piece_ids")).as("id"))
      .where(col("id") === -1).count()
    assert(plain > 0)
  }

  test("wordpiece: dead-end words emit whole-word bytes, never -1") {
    val merges = WordPiece.wordpieceTrain(corpus, "text", 4)
    val vocab = WordPiece.wordpieceVocabulary(corpus, "text", merges)
    val enc = WordPiece.wordpieceEncodeIds(bait, "text", "doc_id",
      vocab, byteFallback = true)
      .select(col("doc_id"), col("tok_pos"),
        col("piece_ids"))
      .as[(Long, Long, Seq[Long])].collect()
    assert(enc.forall(_._3.forall(_ >= 0)))
    // "x7" (doc 2, token 0) dead-ends immediately → bytes of the word
    val x7 = enc.find(e => e._1 == 2L && e._2 == 0L).get._3
    assert(x7 === Seq('x'.toLong, '7'.toLong))
    // the emoji inside "ab<emoji>c" dead-ends the word → its bytes
    // appear contiguously in the whole-word byte encoding
    val abec = enc.find(e => e._1 == 2L && e._2 == 1L).get._3
    assert(abec === Seq('a'.toLong, 'b'.toLong, 0xF0L, 0x9FL, 0x98L,
      0x80L, 'c'.toLong))
    // without fallback the bait yields -1
    val plain = WordPiece.wordpieceEncodeIds(bait, "text", "doc_id",
      vocab).select(explode(col("piece_ids")).as("id"))
      .where(col("id") === -1).count()
    assert(plain > 0)
  }

  test("bpe byte-level: total by construction; emoji stays raw bytes") {
    import graft.ml.Bpe
    val merges = Seq(("a", "b"), ("ab", "c"))
    val enc = Bpe.bpeEncodeIdsBytes(bait, "text", "doc_id", merges)
      .select(col("doc_id"), col("tok_pos"),
        col("piece_ids"))
      .as[(Long, Long, Seq[Long])].collect()
    assert(enc.nonEmpty)
    assert(enc.forall(_._3.forall(_ >= 0)), "byte-level BPE is total")
    // "abc" (doc 1, token 0) merges fully: ab+c fires at rank 2 →
    // id 256 + 2
    assert(enc.find(e => e._1 == 1L && e._2 == 0L).get._3 ===
      Seq(258L))
    // "a3b": '3' (byte 0x33) blocks the merge → raw bytes
    assert(enc.find(e => e._1 == 1L && e._2 == 1L).get._3 ===
      Seq('a'.toLong, '3'.toLong, 'b'.toLong))
    // the emoji-only token is exactly its UTF-8 bytes F0 9F 98 80
    assert(enc.find(e => e._1 == 1L && e._2 == 2L).get._3 ===
      Seq(0xF0L, 0x9FL, 0x98L, 0x80L))
    // "ab<emoji>c": the merge fires on the ASCII prefix, the emoji
    // bytes pass through, 'c' cannot join across them
    assert(enc.find(e => e._1 == 2L && e._2 == 1L).get._3 ===
      Seq(257L, 0xF0L, 0x9FL, 0x98L, 0x80L, 'c'.toLong))
    // byte ids and merge ids occupy disjoint ranges
    val ids = enc.flatMap(_._3)
    assert(ids.filter(_ < 256).forall(i => i >= 0 && i <= 255))
    assert(ids.filter(_ >= 256).forall(_ >= 257))
    // a non-byte-representable merge table is refused loudly
    val err = intercept[IllegalArgumentException] {
      Bpe.bpeEncodeIdsBytes(bait, "text", "doc_id",
        Seq(("Ā", "b")))
    }
    assert(err.getMessage.contains("byte-representable"))
  }

  test("bpe byte-level equals char-level ids modulo layout on ASCII") {
    import graft.ml.Bpe
    val merges = Seq(("a", "b"), ("ab", "c"), ("b", "c"))
    val byteIds = Bpe.bpeEncodeIdsBytes(corpus, "text", "doc_id", merges)
      .orderBy("doc_id", "tok_pos")
      .as[(Long, Long, Seq[Long])].collect()
    val charIds = Bpe.bpeEncodeIdsLarge(corpus, "text", "doc_id", merges)
      .orderBy("doc_id", "tok_pos")
      .as[(Long, Long, Seq[Long])].collect()
    // on a pure-ASCII corpus the segmentations coincide; only the id
    // layout differs (code point vs byte is identity below 128;
    // 0x110000 + rank vs 256 + rank for merged pieces)
    assert(byteIds.length === charIds.length)
    byteIds.zip(charIds).foreach { case ((bd, bt, bi), (cd, ct, ci)) =>
      assert(bd === cd); assert(bt === ct)
      assert(bi === ci.map(i => if (i >= 0x110000L) i - 0x110000L + 256L
                                else i))
    }
  }

  test("bpe persisted merges reproduce the live ids in both layouts") {
    import graft.ml.Bpe
    val merges = Seq(("a", "b"), ("ab", "c"), ("b", "c"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bf-bpe").toString
    Bpe.saveMerges(merges.zipWithIndex
      .map { case ((l, r), i) => (i + 1, l, r) }
      .toDF("rank", "lhs", "rhs"), dir)
    assert(Bpe.loadMerges(spark, dir) === merges)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id", "tok_pos").collect().map(_.toString).toSeq
    assert(rows(Bpe.encodeIdsWithMergesDir(spark, dir, bait, "text",
        "doc_id")) ===
      rows(Bpe.bpeEncodeIdsLarge(bait, "text", "doc_id", merges)))
    assert(rows(Bpe.encodeIdsWithMergesDir(spark, dir, bait, "text",
        "doc_id", byteLevel = true)) ===
      rows(Bpe.bpeEncodeIdsBytes(bait, "text", "doc_id", merges)))
  }

  test("persisted artifacts reproduce the live byte-fallback ids") {
    val uVocab = Unigram.unigramTrain(corpus, "text", 3, 10, 1, 2)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toSeq
    val uDir = java.nio.file.Files
      .createTempDirectory("graft-bf-uni").toString
    Unigram.saveVocab(spark, Unigram.unigramTrain(corpus, "text", 3,
      10, 1, 2), 3, uDir)
    val live = Unigram.unigramEncodeIds(bait, "text", "doc_id", uVocab,
      3, byteFallback = true)
      .orderBy("doc_id", "tok_pos").collect().map(_.toString).toSeq
    val persisted = Unigram.encodeIdsWithVocabDir(spark, uDir, bait,
      "text", "doc_id", byteFallback = true)
      .orderBy("doc_id", "tok_pos").collect().map(_.toString).toSeq
    assert(live === persisted)

    val merges = WordPiece.wordpieceTrain(corpus, "text", 4)
    val wVocab = WordPiece.wordpieceVocabulary(corpus, "text", merges)
    val wDir = java.nio.file.Files
      .createTempDirectory("graft-bf-wp").toString
    WordPiece.saveVocab(spark, wVocab, wDir)
    val wLive = WordPiece.wordpieceEncodeIds(bait, "text", "doc_id",
      wVocab, byteFallback = true)
      .orderBy("doc_id", "tok_pos").collect().map(_.toString).toSeq
    val wPersisted = WordPiece.encodeIdsWithVocabDir(spark, wDir, bait,
      "text", "doc_id", byteFallback = true)
      .orderBy("doc_id", "tok_pos").collect().map(_.toString).toSeq
    assert(wLive === wPersisted)
  }
}
