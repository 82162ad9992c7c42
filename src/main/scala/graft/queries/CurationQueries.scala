package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ml.Curation

/** Corpus-curation operators (round 6): benchmark decontamination,
  * concat-then-chunk sequence packing, domain-mix resampling — each
  * replayed exactly by a DuckDB oracle over the same parquet.
  */
object CurationQueries {

  private val toks = "string_split(lower(text),' ')"
  // k=3 word shingles, distinct per document (same as MlQueries)
  private val sh3 =
    "list_distinct(list_transform(range(0, len(t)-2), " +
      "i -> t[i+1]||' '||t[i+2]||' '||t[i+3]))"

  val all: Seq[Q] = Seq(
    // -- benchmark contamination: docs sharing >= 2 distinct 3-gram
    // shingles with the benchmark set (every 10th doc stands in for the
    // benchmark). Inverted-index equi-join, no product.
    Q.fn("q_contamination",
      s"""WITH tokd AS (SELECT doc_id, $toks AS t FROM documents
                        WHERE doc_id % 10 <> 0),
               tokb AS (SELECT $toks AS t FROM documents
                        WHERE doc_id % 10 = 0),
               ds AS (SELECT doc_id, unnest($sh3) AS sh FROM tokd),
               bs AS (SELECT DISTINCT unnest($sh3) AS sh FROM tokb)
          SELECT doc_id, count(*) AS shared_ngrams
          FROM ds JOIN bs USING (sh)
          GROUP BY 1 HAVING count(*) >= 2""") { (spark, sf) =>
      val docs = Tables.load(spark, sf, "documents")
      Curation.contamination(
        docs.where(col("doc_id") % 10 =!= 0),
        docs.where(col("doc_id") % 10 === 0),
        "text", "doc_id", k = 3, minShared = 2)
    },

    // -- concat-then-chunk packing: documents concatenated in doc_id
    // order, cut into 64-token chunks; one row per (doc, chunk) overlap
    // with the doc-local token slice. The Spark plan computes the global
    // prefix sum via the two-level bucket scan (no single-partition
    // window over the corpus).
    Q.fn("q_pack_chunks",
      """WITH d AS (SELECT doc_id,
                           CAST(len(string_split(lower(text),' ')) AS BIGINT)
                             AS n
                    FROM documents WHERE doc_id < 300),
              c AS (SELECT doc_id, n,
                           CAST(sum(n) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS e
                    FROM d WHERE n > 0),
              x AS (SELECT doc_id, n, e - n AS s, e,
                           unnest(range((e - n) // 64, (e - 1) // 64 + 1))
                             AS chunk_id
                    FROM c)
         SELECT doc_id, chunk_id,
                greatest(s, chunk_id * 64) - s AS tok_from,
                least(e, (chunk_id + 1) * 64) - s AS tok_to
         FROM x""") { (spark, sf) =>
      Curation.packChunks(
        Tables.load(spark, sf, "documents").where(col("doc_id") < 300),
        "text", "doc_id", chunkTokens = 64, bucketSize = 50)
    },

    // -- token-budget selection: highest-quality docs first (the
    // q_text_quality score, trunc6 on both engines), greedy prefix under
    // a 5000-token budget; the Spark plan's running sum is the two-level
    // quality-bucket scan (no corpus-wide single-partition window)
    Q.fn("q_select_budget",
      """WITH t AS (SELECT *, string_split(lower(text),' ') AS toks
                    FROM documents),
              m AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
                trunc((length(text) / len(toks))*1000000.0)/1000000.0 AS cpt,
                trunc(((length(text) - length(regexp_replace(text,'[^a-zA-Z0-9 ]','','g'))) / length(text))*1000000.0)/1000000.0 AS pr,
                trunc((len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is'], x))) / len(toks))*1000000.0)/1000000.0 AS sr
              FROM t),
              q AS (SELECT doc_id, n_tokens,
                trunc((1.0 - abs(cpt - 5.0)/10.0 - pr + sr)*1000000.0)/1000000.0 AS quality
              FROM m),
              c AS (SELECT doc_id, n_tokens, quality,
                CAST(sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_tokens
              FROM q)
         SELECT doc_id, n_tokens, quality, cum_tokens FROM c
         WHERE cum_tokens <= 5000""") { (spark, sf) =>
      Curation.selectByBudget(
        Tables.load(spark, sf, "documents"), "text", "doc_id",
        tokenBudget = 5000)
    },

    // -- domain-mix resampling: hit {src0: 0.5, src1: 0.3, src2: 0.2}
    // exactly at the largest feasible output size; per-source keepers are
    // the lowest-hash rows (deterministic mix, any topology).
    Q.fn("q_domain_mix",
      """WITH listed AS (SELECT doc_id, source FROM documents
                         WHERE source IN ('src0','src1','src2')),
              cnt AS (SELECT source, CAST(count(*) AS DOUBLE) AS c
                      FROM listed GROUP BY 1),
              sc AS (SELECT min(c / (CASE source WHEN 'src0' THEN 0.5
                                     WHEN 'src1' THEN 0.3
                                     ELSE 0.2 END)) AS scale FROM cnt),
              keep AS (SELECT source,
                              CAST(floor((CASE source WHEN 'src0' THEN 0.5
                                          WHEN 'src1' THEN 0.3
                                          ELSE 0.2 END) * scale) AS BIGINT)
                                AS k
                       FROM cnt CROSS JOIN sc),
              r AS (SELECT doc_id, source,
                           row_number() OVER (PARTITION BY source
                             ORDER BY ('0x'||substr(md5('mix'||
                               CAST(doc_id AS VARCHAR)),1,8))::BIGINT,
                               doc_id) AS rn
                    FROM listed)
         SELECT doc_id, source FROM r JOIN keep USING (source)
         WHERE rn <= k""") { (spark, sf) =>
      Curation.domainMix(
        Tables.load(spark, sf, "documents"), "doc_id", "source",
        Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
        .select(col("doc_id"), col("source"))
    })
}
