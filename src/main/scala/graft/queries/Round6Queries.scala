package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.json.Js
import graft.op.{LogOp, LogSink}

/** Round-6 oracle coverage: the `$trace` stage and `$trace` operator —
  * the two remaining logger-side-channel surfaces (previously spec-only).
  * Each run captures the engine-logger emissions per row and re-emits them
  * as deterministic {_id, traced} rows the DuckDB oracle can replay
  * (docs/aggregation_stages.md:804-824).
  */
object Round6Queries {

  /** Run-scoped driver-side collector: entries funnel through the
    * JVM-global queue (executors share the JVM at local[*] — the same
    * contract as LogSink.Capture) but each query filters by its own tag,
    * so concurrent suites can't cross-pollute.
    */
  private def tagged(entries: Seq[String], tag: String): Seq[Long] =
    entries.flatMap { m0 =>
      // the stage path quotes messages (escapeFormatting); the operator
      // path logs the raw single-element-array JSON of the traced value
      val m1 = if (m0.startsWith("'") && m0.endsWith("'"))
        m0.substring(1, m0.length - 1) else m0
      val m = if (m1.startsWith("[") && m1.endsWith("]"))
        m1.substring(1, m1.length - 1) else m1
      val n = Js.parse(m)
      if (n != null && n.isObject &&
        Option(n.get("tag")).exists(_.asText() == tag))
        Option(n.get("id")).map(_.asLong())
      else None
    }

  val all: Seq[Q] = Seq(
    // -- event traces (docs/telemetry.md:46-67): one flat trace message
    // per UUID-_corr message. Deterministic _corr values derived from
    // the region key; the wall-clock timestampNanos is projected away.
    Q.fn("q_trace_events",
      """SELECT printf('00000000-0000-4000-8000-%012d', r_regionkey)
                  AS traceId,
                'p.out' AS name, 'graft' AS serviceName,
                'ns' AS serviceNamespace, r_name AS username
         FROM region ORDER BY 1""") { (spark, sf) =>
      val msgs = Tables.load(spark, sf, "region")
        .select(col("r_regionkey").cast("string").as("key"),
          to_json(struct(
            format_string("00000000-0000-4000-8000-%012d",
              col("r_regionkey")).as("_corr"),
            struct(col("r_name").as("sub")).as("_jwt"),
            col("r_regionkey").as("_id"))).as("value"))
      graft.streaming.Telemetry
        .eventTraces(msgs, "graft", "p", "p.out", "ns", "1.0")
        .select(
          get_json_object(col("value"), "$.traceId").as("traceId"),
          get_json_object(col("value"), "$.name").as("name"),
          get_json_object(col("value"), "$.serviceName").as("serviceName"),
          get_json_object(col("value"), "$.serviceNamespace")
            .as("serviceNamespace"),
          get_json_object(col("value"), "$.username").as("username"))
    },

    // -- $trace stage: every message is logged whole to the engine logger
    // "graft.streams". Capture the emissions, parse the ids back out, and
    // emit {_id, traced} — this oracles the SIDE CHANNEL (one entry per
    // row through the stage), not just the passthrough.
    Q.fn("q_trace_stage",
      "SELECT CAST(r_regionkey AS BIGINT) AS _id, true AS traced " +
        "FROM region ORDER BY 1") {
      (spark, sf) =>
        val out = graft.op.Pipeline.run(
          Tables.load(spark, sf, "region")
            .select(col("r_regionkey").cast("long").as("id"),
              lit("q_trace_stage").as("tag")),
          """[{"$trace":true}]""",
          Tables.env(spark, sf).copy(logger = LogSink.Capture))
        out.queryExecution.toRdd.count() // force the executor-side emits
        val msgs = LogSink.Capture.entries
          .filter(_.logger == LogOp.traceLogger).map(_.message)
        import spark.implicits._
        tagged(msgs, "q_trace_stage").distinct.sorted
          .toDF("_id").withColumn("traced", lit(true))
    },

    // -- $trace operator: the traced VALUE flows through unchanged and is
    // logged per evaluation (reference pincette-mongo trace()); the
    // capture goes through the global LogSink.jslt hook the compiler
    // logs to (it has no Env to thread, like the JSLT trace builtin).
    Q.fn("q_trace_op",
      "SELECT CAST(r_regionkey AS BIGINT) AS _id, true AS traced " +
        "FROM region ORDER BY 1") {
      (spark, sf) =>
        val prev = LogSink.jslt
        LogSink.jslt = LogSink.Capture
        try {
          val out = graft.op.Pipeline.run(
            Tables.load(spark, sf, "region")
              .select(col("r_regionkey").cast("long").as("id")),
            """[{"$addFields":{"t":{"$trace":
                 {"tag":{"$literal":"q_trace_op"},"id":"$id"}}}}]""",
            Tables.env(spark, sf))
          out.queryExecution.toRdd.count()
        } finally LogSink.jslt = prev
        val msgs = LogSink.Capture.entries
          .filter(_.logger == LogOp.traceLogger).map(_.message)
        import spark.implicits._
        tagged(msgs, "q_trace_op").distinct.sorted
          .toDF("_id").withColumn("traced", lit(true))
    },

    // -- event-time join (extension beyond the reference's arrival-time
    // window): sides with `timestamp` join on the DATA's clock — the
    // window becomes replay-deterministic, which also makes it the one
    // join variant a SQL oracle can replay exactly. Signup events joined
    // to error events of the same user within 30 minutes.
    // Tables.tsTimestamp normalizes whatever physical type the generator
    // wrote (int64-nanos / timestamp[ns] / timestamp[us]) to a TIMESTAMP,
    // truncating nanos to micros exactly — matching DuckDB's parquet read.
    Q.fn("q_join_eventtime",
      """SELECT CAST(a.user_id AS VARCHAR) AS _id,
                a.event_id AS signup_ev, b.event_id AS error_ev
         FROM events a JOIN events b ON a.user_id = b.user_id
         WHERE a.event_type = 'signup' AND b.event_type = 'error'
           AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 1800000000""") {
      (spark, sf) =>
        val ev0 = Tables.load(spark, sf, "events")
        val ev = ev0.select(col("event_id"), col("user_id"),
          Tables.tsTimestamp(ev0).as("ts_t"), col("event_type"))
        val tables = Map(
          "ev_signup" -> ev.where(col("event_type") === "signup"),
          "ev_error" -> ev.where(col("event_type") === "error"))
        val io = new graft.streaming.Io {
          def source(s: org.apache.spark.sql.SparkSession, kind: String,
              name: String, options: Map[String, String]) = tables(name)
          def sink(kind: String, name: String,
              df: org.apache.spark.sql.DataFrame, asString: Boolean,
              partId: String, options: Map[String, String]): Unit = ()
        }
        val streams = new graft.streaming.AppRunner(spark, io,
          graft.op.Env(spark)).run(
          """{"application":"jet","version":"1.0","parts":[
               {"type":"join","name":"j","window":1800000,
                "left":{"fromTopic":"ev_signup","on":"$user_id",
                        "timestamp":"$ts_t"},
                "right":{"fromTopic":"ev_error","on":"$user_id",
                         "timestamp":"$ts_t"}}]}""")
        streams("j").select(col("_id"),
          col("left.event_id").as("signup_ev"),
          col("right.event_id").as("error_ev"))
    },

    // -- event-time $delay (extension beyond the reference's wall-clock
    // `duration`): `deliverAt` is an expression over the MESSAGE, so the
    // delivery instant comes from the data (the streaming sink drives it
    // with watermark timers — StatefulOpsSpec covers that side; this
    // oracles the stage's stamping + epoch round-trip).
    Q.fn("q_delay_eventtime",
      """SELECT event_id, 'retry' AS _topic,
                epoch_ms(ts) + 5000 AS at_ms
         FROM events WHERE event_id < 500""") { (spark, sf) =>
      val ev0 = Tables.load(spark, sf, "events")
        .where(col("event_id") < 500)
      // physical-type-agnostic timestamp view (see q_join_eventtime)
      val ev = ev0.select(col("event_id"), Tables.tsTimestamp(ev0).as("ts_t"))
      graft.op.Pipeline.run(ev,
        """[{"$delay":{"topic":"retry",
              "deliverAt":{"$add":[{"$toEpochMillis":"$ts_t"},5000]}}},
            {"$project":{"event_id":1,"_topic":1,
              "at_ms":{"$toEpochMillis":"$_deliver_at"}}}]""",
        Tables.env(spark, sf))
    })
}
