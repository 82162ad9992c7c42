package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-16 gates: byte-level BPE, the one-pass recipe reports, the
  * signed quantile sketch, and the all-sketch corpus report.
  */
object Round16Queries {

  /** `bpeEncodeIdsBytes` replayed end to end: the bait corpus appends
    * a per-doc ` v<digit>#q` token (digits and `#` sit outside the
    * merge alphabet, so they stay raw single bytes — totality without
    * a sentinel); the replay is the SAME chained-replace ground truth
    * as the char-level encoder (the corpus is pure ASCII, where the
    * char rendering IS the byte rendering — guarded by the error()
    * branch below, the unicode()-equals-byte assumption can never
    * silently rot), with the byte-level id layout: a single-byte
    * piece's id is its byte value, a merged piece's id is 256 + the
    * first producing rank.
    */
  private lazy val bpeBytesOracle = {
    import Round13Queries.largeMerges
    val groups = largeMerges.grouped(20).toSeq
    val ctes = groups.zipWithIndex.map { case (g, gi) =>
      val inner = g.foldLeft("s") { case (acc, (l, r)) =>
        s"replace($acc, ' $l  $r ', ' $l$r ')"
      }
      s"bb${gi + 1} AS (SELECT doc_id, tok_pos, $inner AS s FROM bb$gi)"
    }
    val last = s"bb${groups.size}"
    val mergeVals = largeMerges.zipWithIndex.map { case ((l, r), i) =>
      s"('${l + r}', ${i + 1})"
    }.mkString(", ")
    s"""WITH bbait AS (
         SELECT doc_id,
           text || ' v' || CAST(doc_id % 10 AS VARCHAR) || '#q' AS text
         FROM documents),
       bb0 AS (
         SELECT doc_id, ord - 1 AS tok_pos,
           array_to_string(list_transform(range(1, len(word) + 1),
             i -> ' '||word[i]||' '), '') AS s
         FROM (SELECT doc_id,
                 unnest(range(1, len(tl) + 1)) AS ord,
                 unnest(tl) AS word
               FROM (SELECT doc_id, list_filter(
                       string_split(lower(text), ' '), t -> t <> '')
                       AS tl
                     FROM bbait))),
       ${ctes.mkString(",\n       ")},
       bbm(piece, rnk) AS (VALUES $mergeVals),
       bbmid AS (SELECT piece, 256 + min(rnk) AS pid
                 FROM bbm GROUP BY 1),
       bbpcs AS (SELECT doc_id, tok_pos,
                   unnest(range(1, len(pl) + 1)) AS ord2,
                   unnest(pl) AS piece
                 FROM (SELECT doc_id, tok_pos, list_filter(
                         string_split(s, ' '), x -> x <> '') AS pl
                       FROM $last)),
       bbids AS (SELECT p.doc_id, p.tok_pos, p.ord2,
                   CASE WHEN len(p.piece) = 1 THEN
                     CASE WHEN unicode(p.piece) < 128
                       THEN unicode(p.piece)
                       ELSE error('bpeBytesOracle: non-ASCII char — ' ||
                         'unicode() equals the UTF-8 byte only below ' ||
                         '128; replay real byte expansion before ' ||
                         'widening the corpus')
                       END
                   ELSE m.pid END AS pid
                 FROM bbpcs p LEFT JOIN bbmid m USING (piece))
      SELECT doc_id, CAST(tok_pos AS BIGINT) AS tok_pos,
        CAST(ord2 - 1 AS BIGINT) AS piece_pos,
        CAST(pid AS BIGINT) AS piece_id
      FROM bbids"""
  }

  val all: Seq[Q] = Seq(
    // BYTE-LEVEL BPE (the GPT-2 layout): bytes are the base alphabet,
    // so no token is ever <unk> by construction — ids 0..255 are raw
    // UTF-8 bytes, merged pieces are 256 + first-producing rank; the
    // planted ` v<digit>#q` bait stays split into its raw bytes
    Q.fn("q_bpe_bytes", bpeBytesOracle) { (spark, sf) =>
      val bait = Tables.load(spark, sf, "documents")
        .withColumn("text", concat(col("text"), lit(" v"),
          pmod(col("doc_id"), lit(10)).cast("string"), lit("#q")))
      Q.explodePieceIds(graft.ml.Bpe.bpeEncodeIdsBytes(
        bait, "text", "doc_id", Round13Queries.largeMerges))
    }
  )
}
