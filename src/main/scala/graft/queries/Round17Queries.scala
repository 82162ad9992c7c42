package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-17 gates: order-n stupid-backoff LM scoring (+ persisted
  * n-gram count state), training-shard manifests over the packed
  * layout, the incremental all-sketch data card, and the cross-modal
  * caption-embedding consistency filter.
  */
object Round17Queries {

  // --------------------------------------------------------------------
  // Stupid-backoff LM scoring (Brants et al. 2007): trigram model on
  // docs < 250, scored on docs >= 250 — the same real train/score
  // split as q_lm_score, so OOV smoothing and every backoff branch
  // are exercised. The oracle replays the count joins and the
  // backoff CASE in full.
  // --------------------------------------------------------------------

  private val LmN = 3
  private val LmAlpha = 0.4
  /** α^j for j = 0..n−1, computed ONCE on the driver and interpolated
    * into the oracle — both engines must see bit-identical penalty
    * factors (math.pow(0.4, 2) is 0.16000000000000002, not 0.16).
    */
  private val LmPows = (0 until LmN).map(j => math.pow(LmAlpha, j))

  private val lmBackoffOracle = {
    val p0 = LmPows(0); val p1 = LmPows(1); val p2 = LmPows(2)
    s"""WITH ref AS (SELECT lower(text) AS text FROM documents
                     WHERE doc_id < 250),
            sc AS (SELECT doc_id, string_split(lower(text), ' ') AS t
                   FROM documents WHERE doc_id >= 250),
            rt AS (SELECT string_split(text, ' ') AS t FROM ref),
            rg AS (SELECT g, CAST(count(*) AS DOUBLE) AS c FROM (
               SELECT unnest(flatten(list_transform(range(1, len(t)+1),
                 p -> list_transform(range(1, least(p, $LmN)+1), k ->
                   array_to_string(t[p-k+1:p], ' '))))) AS g
               FROM rt) GROUP BY 1),
            nv AS (SELECT CAST(count(*) AS DOUBLE) AS nn,
                     CAST(count(DISTINCT w) AS DOUBLE) AS vv
                   FROM (SELECT unnest(t) AS w FROM rt)),
            pos AS (SELECT doc_id, unnest(range(2, len(t)+1)) AS p, t
                    FROM sc WHERE len(t) >= 2),
            gr AS (SELECT doc_id, p, least(p, $LmN) AS top,
                     t[p] AS g1,
                     t[p-1] || ' ' || t[p] AS g2,
                     CASE WHEN p >= 3
                       THEN array_to_string(t[p-2:p], ' ') END AS g3,
                     t[p-1] AS c2,
                     CASE WHEN p >= 3
                       THEN t[p-2] || ' ' || t[p-1] END AS c3
                   FROM pos),
            jj AS (SELECT g.doc_id, g.top,
                     u1.c AS cg1, u2.c AS cg2, u3.c AS cg3,
                     v2.c AS cc2, v3.c AS cc3
                   FROM gr g
                   LEFT JOIN rg u1 ON u1.g = g.g1
                   LEFT JOIN rg u2 ON u2.g = g.g2
                   LEFT JOIN rg u3 ON u3.g = g.g3
                   LEFT JOIN rg v2 ON v2.g = g.c2
                   LEFT JOIN rg v3 ON v3.g = g.c3),
            ps AS (SELECT doc_id,
                     CASE
                       WHEN cg3 > 0 THEN $p0 * (cg3 / cc3)
                       WHEN cg2 > 0 THEN
                         (CASE WHEN top = 2 THEN $p0 ELSE $p1 END)
                           * (cg2 / cc2)
                       ELSE
                         (CASE WHEN top = 2 THEN $p1 ELSE $p2 END)
                           * ((coalesce(cg1, 0) + 1) / (nn + vv))
                     END AS s
                   FROM jj CROSS JOIN nv),
            agg AS (SELECT doc_id, count(*) AS n_scored,
                      CAST(trunc(avg(-ln(s)) * 1000000) AS BIGINT)
                        / 1000000.0 AS lm_backoff
                    FROM ps GROUP BY 1)
       SELECT d.doc_id, coalesce(a.n_scored, 0) AS n_scored,
              a.lm_backoff
       FROM (SELECT doc_id FROM documents WHERE doc_id >= 250) d
       LEFT JOIN agg a USING (doc_id)"""
  }

  /** Standing n-gram count state dirs per scale factor — built once,
    * reused by the loop gate's later passes (the histLoopDirs pattern).
    */
  private val lmStateDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]

  val all: Seq[Q] = Seq(
    // order-n stupid backoff: the higher-order form of q_lm_score's
    // CCNet-style signal (the production perplexity filter uses a
    // 5-gram model; this gate pins n=3 so the oracle CASE stays
    // readable while every branch — full trigram hit, bigram backoff,
    // doc-start top=2 positions, OOV unigram floor — carries mass)
    Q.fn("q_lm_backoff", lmBackoffOracle) { (spark, sf) =>
      val d = Tables.load(spark, sf, "documents")
      graft.ml.TextAnalysis.lmBackoffScore(
        d.where(col("doc_id") >= 250).select("doc_id", "text"),
        d.where(col("doc_id") < 250), "text", "doc_id",
        n = LmN, alpha = LmAlpha)
    },

    // ... and its STANDING STATE: three reference batches append their
    // n-gram count deltas (meta pins n), the read-time per-gram fold
    // scores — identical to the one-shot model by the merge law
    // (counts are additive), so the same oracle checks it
    Q.fn("q_lm_backoff_loop", lmBackoffOracle) { (spark, sf) =>
      val d = Tables.load(spark, sf, "documents")
      val dir = lmStateDirs.computeIfAbsent(sf, { _ =>
        val dd = java.nio.file.Files
          .createTempDirectory("graft-ngram-state").toString
        (0L to 2L).foreach { r =>
          graft.ml.TextAnalysis.appendNgramState(
            d.where(col("doc_id") < 250 &&
              pmod(col("doc_id"), lit(3L)) === r),
            "text", LmN, dd)
        }
        dd
      })
      graft.ml.TextAnalysis.lmBackoffScoreFromState(spark, dir,
        d.where(col("doc_id") >= 250).select("doc_id", "text"),
        "text", "doc_id", n = LmN, alpha = LmAlpha)
    }
  )
}
