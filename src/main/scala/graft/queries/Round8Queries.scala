package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8 oracle coverage: the event-time `$delay` dead-letter router
  * (`deadLetterTopic` — the engine extension that preserves a late row's
  * payload instead of watermark-dropping it; the reference's delay is
  * lossy by its own docs, docs/aggregation_stages.md:118-159).
  *
  * The streaming router (StatefulOps.LateRouter) is exercised end-to-end
  * in LateDelaySpec; this oracle replays its late/on-time judgment in
  * batch via StatefulOps.routeLateBatch, which DuckDB can mirror with a
  * running max. The events table is time-ordered by event_id, so a
  * deterministic LCG permutation plays the disordered arrival: both
  * sides compute ord = (event_id * 48271) % 65537.
  */
object Round8Queries {

  val all: Seq[Q] = Seq(
    Q.fn("q_delay_deadletter",
      """WITH t AS (SELECT event_id, (event_id * 48271) % 65537 AS ord,
                epoch_ms(ts) + 5000 AS at_ms
           FROM events WHERE event_id < 2000),
         m AS (SELECT *, max(at_ms) OVER (ORDER BY ord
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx
               FROM t)
         SELECT event_id,
                CASE WHEN mx IS NOT NULL AND at_ms <= mx - 259200000
                     THEN 'dlq' ELSE 'retry' END AS _topic,
                at_ms
           FROM m""") { (spark, sf) =>
      val ev0 = Tables.load(spark, sf, "events")
        .where(col("event_id") < 2000)
      // the packed delay frame the streaming sink would see, plus the
      // arrival permutation; 72 h lateness on a 30-day event spread makes
      // both outcomes non-vacuous (~half the rows land late)
      val packed = ev0.select(
        col("event_id"),
        lit("retry").as("topic"),
        Tables.tsTimestamp(ev0).as("deliverAt"))
        .withColumn("deliverAt",
          timestamp_millis(unix_millis(col("deliverAt")) + 5000))
      graft.streaming.StatefulOps
        .routeLateBatch(packed, latenessMs = 259200000L, dlqTopic = "dlq",
          ord = (col("event_id") * 48271) % 65537)
        .select(col("event_id"), col("topic").as("_topic"),
          unix_millis(col("deliverAt")).as("at_ms"))
    })
}
