package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ml.{Bpe, Curation, Dedup, Graphs}

/** Round-13 driver-gate queries: the production-scale BPE encoder
  * (pass-by-rank simulation beyond the 256-merge expression-chain cap),
  * plus the round's composition oracles. Merge fixtures are built
  * deterministically from the documents fixture vocabulary so the
  * DuckDB replay applies the IDENTICAL merge list.
  */
object Round13Queries {

  /** 16 fixture-vocabulary words spelled out merge-by-merge; the other
    * 15 corpus words stay partially mergeable (shared prefixes only),
    * so per-document piece counts vary.
    */
  private val spelledWords = Seq("scan", "column", "window", "order",
    "sort", "part", "value", "line", "join", "merge", "group", "query",
    "vector", "stream", "filter", "customer")

  /** A deterministic WELL-FORMED merge table above the 256-merge
    * expression-chain cap: prefix spell-outs (each side is a char or an
    * earlier merge's output — the shape `bpeTrain` learns) padded past
    * the cap with full-word compound pairs (rank machinery at scale;
    * they never fire inside a single word, exactly like the long tail
    * of a real tokenizer's merges on any one document).
    */
  private[queries] lazy val largeMerges: Seq[(String, String)] = {
    val prefixes =
      scala.collection.mutable.LinkedHashSet.empty[(String, String)]
    spelledWords.foreach { w =>
      (1 until w.length).foreach(i =>
        prefixes += ((w.substring(0, i), w.substring(i, i + 1))))
    }
    val base = spelledWords.take(14)
    val compounds = for (a <- base; b <- base) yield (a, b)
    val all = prefixes.toSeq ++ compounds
    require(all.size > 256,
      s"largeMerges must exceed the expression-chain cap, got ${all.size}")
    all
  }

  /** `bpeEncodeLarge` replayed in DuckDB: the identical merge list
    * applied as chained `replace` passes in rank order over the spaced
    * symbol rendering — the ground-truth semantics the pass-by-rank
    * simulation must reproduce. 20 merges nest per CTE (bounded parser
    * depth), one CTE chain, each referenced once.
    */
  private lazy val bpeLargeOracle = {
    val groups = largeMerges.grouped(20).toSeq
    val ctes = groups.zipWithIndex.map { case (g, gi) =>
      val inner = g.foldLeft("s") { case (acc, (l, r)) =>
        s"replace($acc, ' $l  $r ', ' $l$r ')"
      }
      s"e${gi + 1} AS (SELECT doc_id, $inner AS s FROM e$gi)"
    }
    val last = s"e${groups.size}"
    s"""WITH e0 AS (SELECT doc_id, array_to_string(list_transform(
              range(1, len(word) + 1), i -> ' '||word[i]||' '), '') AS s
            FROM (SELECT doc_id, unnest(list_filter(
                    string_split(lower(text), ' '), t -> t <> ''))
                    AS word
                  FROM documents)),
         ${ctes.mkString(",\n         ")},
         enc AS (SELECT doc_id, count(*) AS n_tokens,
                   CAST(sum(len(list_filter(string_split(s, ' '),
                     x -> x <> ''))) AS BIGINT) AS n_bpe_pieces
                 FROM $last GROUP BY 1)
        SELECT d.doc_id, coalesce(enc.n_tokens, 0) AS n_tokens,
          coalesce(enc.n_bpe_pieces, 0) AS n_bpe_pieces
        FROM documents d LEFT JOIN enc USING (doc_id)"""
  }

  /** `q_cbor_pipeline` replay: the wire chain is a lossless identity on
    * JSON documents, so the oracle is the downstream pipeline over the
    * plain table — any wire defect (lost field, mangled number, dropped
    * row) breaks the compare.
    */
  private val cborOracle =
    """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
       FROM documents WHERE regexp_matches(text, 'spark')"""

  val all: Seq[Q] = Seq(
    Q.fn("q_bpe_encode_large", bpeLargeOracle) { (spark, sf) =>
      Bpe.bpeEncodeLarge(Tables.load(spark, sf, "documents"),
        "text", "doc_id", largeMerges)
    },

    // the reference's Kafka wire format end to end: every fixture row
    // serializes to gzip-CBOR (docs/serialisation.md:3), rides the
    // decode fallback chain back to JSON, and feeds a normal
    // aggregation pipeline — proving a json-streams deployment's
    // topics are readable byte-for-byte
    Q.fn("q_cbor_pipeline", cborOracle) { (spark, sf) =>
      import graft.streaming.KafkaIo
      val docs = Tables.load(spark, sf, "documents")
      val decoded = docs
        .select(KafkaIo.wireDecode(KafkaIo.wireEncode(
          to_json(struct(col("doc_id"), col("text"))))).as("j"))
        .select(from_json(col("j"),
          org.apache.spark.sql.types.DataType.fromDDL(
            "doc_id BIGINT, text STRING"))
          .as("v"))
        .select("v.*")
      graft.op.Pipeline.run(decoded,
        """[{"$match":{"text":{"$regex":"spark"}}},
            {"$project":{"doc_id":1,
              "n_chars":{"$toLong":{"$strLenCP":"$text"}}}}]""",
        Tables.env(spark, sf))
    }
  )
}
