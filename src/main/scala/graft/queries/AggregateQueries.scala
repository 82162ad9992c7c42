package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.{AggregateLogic, AggregatePart}

/** Oracle coverage for the aggregate part (SURVEY §2.10, reference
  * docs/state.md:44-131): a deterministic command stream is folded through
  * the REAL `AggregatePart`/`AggregateLogic` reducer chain (groupByKey →
  * flatMapGroupsWithState → put/patch/delete reducers → `_seq` discipline →
  * RFC-6902 event diff), and the final snapshots plus per-key event counts
  * are checked against a DuckDB window-function oracle.
  *
  * Command stream: for each customer, its orders (ordered by `o_orderkey`)
  * become a repeating put → patch → delete cycle carrying `value =
  * o_orderkey` (all distinct, so every command changes state and is
  * accepted). The closed form the oracle checks:
  *   - every command increments `_seq` once → final `_seq` = n_orders - 1
  *   - `value` = the `o_orderkey` of the last put/patch (the last command,
  *     or the one before it when the last is a delete)
  *   - `_deleted` = true iff the last command in the cycle is a delete
  *     (n % 3 == 0) — a later put clears it (put replaces all business
  *     fields, docs/state.md:95)
  *   - one event per accepted command → n_events = n_orders
  */
object AggregateQueries {

  val all: Seq[Q] = Seq(
    Q.fn("q_aggregate_fold",
      """WITH c AS (
           SELECT CAST(o_custkey AS VARCHAR) AS _id, o_orderkey AS v,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderkey) AS rn,
                  count(*) OVER (PARTITION BY o_custkey) AS n
           FROM orders)
         SELECT _id,
                CAST(n - 1 AS BIGINT) AS _seq,
                CAST(v AS BIGINT) AS value,
                (n % 3 = 0) AS _deleted,
                CAST(n AS BIGINT) AS n_events
         FROM c
         WHERE rn = CASE WHEN n % 3 = 0 THEN n - 1 ELSE n END""") {
      (spark, sf) =>
        val orders = Tables.load(spark, sf, "orders")
        val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
        // Commands as raw JSON (the __raw column wins in AggregatePart, so
        // reducers see exactly these documents); __ord pins fold order.
        val cmds = orders
          .withColumn("rn", row_number().over(w))
          .select(
            col("o_custkey").cast("string").as("_id"),
            col("rn").cast("long").as("__ord"),
            when(col("rn") % 3 === 1, format_string(
              """{"_id":"%s","_command":"put","_jwt":{"sub":"system"},"value":%d}""",
              col("o_custkey"), col("o_orderkey")))
            .when(col("rn") % 3 === 2, format_string(
              """{"_id":"%s","_command":"patch","_jwt":{"sub":"system"},"_ops":[{"op":"add","path":"/value","value":%d}]}""",
              col("o_custkey"), col("o_orderkey")))
            .otherwise(format_string(
              """{"_id":"%s","_command":"delete","_jwt":{"sub":"system"}}""",
              col("o_custkey")))
            .as("__raw"))

        val out = graft.ml.CacheLifecycle.pin(AggregatePart(cmds,
          AggregateLogic.Config(appName = "verify", aggType = "verify-order")))

        // Final snapshot per key = the aggregate-stream record with the
        // highest _seq (the stream re-emits the snapshot on every accepted
        // command, like the reference's aggregate topic).
        val finals = out.where(col("dest") === "aggregate")
          .select(col("key").as("_id"),
            get_json_object(col("value"), "$._seq").cast("long").as("_seq"),
            get_json_object(col("value"), "$.value").cast("long").as("value"),
            coalesce(
              get_json_object(col("value"), "$._deleted").cast("boolean"),
              lit(false)).as("_deleted"))
          .groupBy("_id")
          .agg(max(struct(col("_seq"), col("value"), col("_deleted")))
            .as("s"))
          .select(col("_id"), col("s._seq").as("_seq"),
            col("s.value").as("value"), col("s._deleted").as("_deleted"))

        val events = out.where(col("dest") === "event")
          .groupBy(col("key").as("_id"))
          .agg(count(lit(1)).as("n_events"))

        finals.join(events, "_id")
    }
  )
}
