package graft.streaming

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import graft.json.Js

/** Arbitrary-state streaming operators on Spark 4's `transformWithState`:
  * native per-key processing-time timers and TTL state in the RocksDB
  * state store, replacing the `flatMapGroupsWithState` timeouts and the
  * in-JVM timer pool the round-5 engine used.
  *
  *  - `$deduplicate` keeps one TTL'd value per dedup key — `cacheWindow`
  *    (docs/aggregation_stages.md:104) becomes real state TTL, so the
  *    store expires entries by wall clock exactly like the reference's
  *    cache, instead of riding an ingestion-time watermark.
  *  - `$per` buffers the partial batch in `ListState` and flushes it from
  *    a native timer.
  *  - `$delay` parks each stamped row in keyed state with a timer at
  *    now+delay: the delayed redelivery now lives in the CHECKPOINT, so a
  *    crash mid-delay redelivers after restart — operationally stronger
  *    than the reference's in-memory scheduled re-produce, which its docs
  *    flag as lossy (docs/aggregation_stages.md:118-159).
  */
object StatefulOps {

  /** `transformWithState` needs a multi-column-family store — RocksDB
    * (also the right call at 100 TB: off-heap state, incremental
    * checkpoints). Set as the session's streaming state backend when the
    * user hasn't configured one EXPLICITLY — an explicit choice is
    * respected (an incompatible one fails the transformWithState query
    * with Spark's own error, rather than us silently flipping the
    * backend under checkpoints that were written with it).
    *
    * `AppRunner.run` calls this once at entry, so every query of a run
    * uses ONE provider regardless of which parts use timers and in what
    * order they compile — a mid-run flip would strand earlier queries'
    * checkpoints on a different state format than a restart would pick.
    */
  def ensureRocksDb(spark: SparkSession): Unit = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    // RuntimeConfig.get with a fallback returns the EXPLICIT value only
    // (the registered default doesn't shadow the fallback)
    if (spark.conf.get(key, "").isEmpty)
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
  }

  /** Does this plan contain a processing-time transformWithState stage?
    * Such queries NEVER latch `processAllAvailable`'s no-new-data flag —
    * the engine keeps running micro-batches to evaluate timers/TTL — so
    * drain-style callers must use `awaitQuiesced` on them instead.
    */
  def usesProcessingTimers(df: DataFrame): Boolean =
    df.queryExecution.analyzed.collectFirst {
      case t: org.apache.spark.sql.catalyst.plans.logical.TransformWithState
          if t.timeMode == TimeMode.ProcessingTime() => t
      // an aggregate part with `stateExpiry` (snapshot TTL) keeps
      // triggering batches for its group timeouts the same way
      case f: org.apache.spark.sql.catalyst.plans.logical
          .FlatMapGroupsWithState
          if f.timeout == org.apache.spark.sql.streaming.GroupStateTimeout
            .ProcessingTimeTimeout => f
    }.isDefined

  /** Drain a timer-driven query: two consecutive empty micro-batches ⇒
    * the sources are caught up (batches run continuously, so this
    * converges within a couple of batch intervals).
    */
  def awaitQuiesced(q: org.apache.spark.sql.streaming.StreamingQuery,
      timeoutMs: Long = 60000): Unit = {
    var empties = 0
    var lastBatch = -1L
    val deadline = System.currentTimeMillis() + timeoutMs
    while (empties < 2 && q.isActive &&
        System.currentTimeMillis() < deadline) {
      val p = q.lastProgress
      if (p != null && p.batchId != lastBatch) {
        lastBatch = p.batchId
        if (p.numInputRows == 0) empties += 1 else empties = 0
      }
      Thread.sleep(25)
    }
  }

  /** Streaming `$deduplicate`: first row per key passes, the rest drop
    * while the key's state entry lives. Schema-preserving: rows ride
    * through a JSON pack/unpack around the stateful shuffle.
    */
  def deduplicate(df: DataFrame, key: Column,
      cacheWindowMs: Option[Long]): DataFrame = {
    val spark = df.sparkSession
    ensureRocksDb(spark)
    import spark.implicits._
    val schema = df.schema
    val out = df
      .select(key.cast("string").as("__k"),
        to_json(struct(df.columns.map(col): _*)).as("__row"))
      .as[(String, String)]
      .groupByKey(_._1)
      .transformWithState(new DedupProcessor(cacheWindowMs),
        // TTL state is wall-clock based and needs ProcessingTime mode
        if (cacheWindowMs.isDefined) TimeMode.ProcessingTime()
        else TimeMode.None(),
        OutputMode.Append())
    out.toDF("__row")
      .select(from_json(col("__row"), schema).as("__r"))
      .select("__r.*")
  }

  /** Streaming `$per` over (key, value) message payloads: emit one message
    * per `amount` buffered values; `timeoutMs` flushes the remainder via a
    * native per-key timer.
    */
  def per(payload: DataFrame, amount: Int, as: String,
      timeoutMs: Option[Long]): DataFrame = {
    val spark = payload.sparkSession
    ensureRocksDb(spark)
    import spark.implicits._
    payload.as[String]
      .groupByKey(_ => 0)
      .transformWithState(new PerProcessor(amount, as, timeoutMs),
        if (timeoutMs.isDefined) TimeMode.ProcessingTime()
        else TimeMode.None(),
        OutputMode.Append())
      .toDF("value")
      .select(lit(null).cast("string").as("key"), col("value"))
  }

  /** `$delay` rows (topic, delayMs, key, json) → (topic, key, json)
    * emitted once their delay elapses. Each row gets its own state key, a
    * parked payload, and a timer; the caller's sink delivers immediately.
    */
  def delayViaTimers(packed: DataFrame): DataFrame = {
    val spark = packed.sparkSession
    ensureRocksDb(spark)
    import spark.implicits._
    packed
      .select(expr("uuid()").as("__uid"), col("topic"), col("delayMs"),
        col("key"), col("json"))
      .as[(String, String, Long, String, String)]
      .groupByKey(_._1)
      .transformWithState(new DelayProcessor,
        TimeMode.ProcessingTime(), OutputMode.Append())
      .toDF("topic", "key", "json")
  }

  /** Event-time `$delay` (`deliverAt` comes from the DATA): timers fire
    * when the WATERMARK passes each row's deliverAt, so a replay of the
    * same input redelivers identically — processing-time delay is
    * wall-clock and drifts between runs. The watermark rides the
    * deliverAt column itself; rows whose deliverAt lags the max seen by
    * more than `latenessMs` are late data (event-time semantics, dropped
    * like any event-time operator would).
    */
  def delayViaEventTimers(packed: DataFrame, latenessMs: Long): DataFrame = {
    val spark = packed.sparkSession
    ensureRocksDb(spark)
    import spark.implicits._
    packed
      .select(expr("uuid()").as("__uid"), col("topic"),
        col("deliverAt").cast("timestamp").as("deliverAt"),
        col("key"), col("json"))
      .withWatermark("deliverAt", s"$latenessMs milliseconds")
      .as[(String, String, java.sql.Timestamp, String, String)]
      .groupByKey(_._1)
      .transformWithState(new EventDelayProcessor,
        TimeMode.EventTime(), OutputMode.Append())
      .toDF("topic", "key", "json")
  }
}

/** One boolean per dedup key; `cacheWindow` becomes state TTL (entries
  * expire from insert time — duplicates within the window are suppressed
  * WITHOUT refreshing it, like a cache entry's fixed lifetime).
  */
final class DedupProcessor(ttlMs: Option[Long])
    extends StatefulProcessor[String, (String, String), String] {
  @transient private var seen: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    val ttl = ttlMs.map(ms => TTLConfig(java.time.Duration.ofMillis(ms)))
      .getOrElse(TTLConfig.NONE)
    seen = getHandle.getValueState("seen", Encoders.scalaBoolean, ttl)
  }

  override def handleInputRows(key: String, rows: Iterator[(String, String)],
      tv: TimerValues): Iterator[String] =
    if (seen.exists()) Iterator.empty
    else {
      seen.update(true)
      rows.take(1).map(_._2)
    }
}

/** The `$per` accumulator: ListState buffer, native flush timer. One
  * logical key (batching is a serial point, like the reference's single
  * consumer) — the stage is for request-coalescing, not bulk throughput.
  */
final class PerProcessor(amount: Int, as: String, timeoutMs: Option[Long])
    extends StatefulProcessor[Int, String, String] {
  @transient private var buf: ListState[String] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    buf = getHandle.getListState("buf", Encoders.STRING, TTLConfig.NONE)

  private def render(batch: Seq[String]): String = {
    val o = Js.obj()
    val arr = Js.arr()
    batch.foreach(b => arr.add(Js.parse(b)))
    o.set[JsonNode](as, arr)
    Js.render(o)
  }

  override def handleInputRows(key: Int, rows: Iterator[String],
      tv: TimerValues): Iterator[String] = {
    val all = buf.get().toSeq ++ rows
    val batches = all.grouped(amount).toSeq
    val (full, rest) =
      if (batches.nonEmpty && batches.last.size < amount)
        (batches.init, batches.last)
      else (batches, Seq.empty[String])
    buf.clear()
    if (rest.nonEmpty) buf.put(rest.toArray)
    timeoutMs.foreach { t =>
      // one live flush timer per key: re-arm on every batch that leaves a
      // remainder, disarm when the buffer emptied
      getHandle.listTimers()
        .foreach(ts => getHandle.deleteTimer(ts.asInstanceOf[Long]))
      if (rest.nonEmpty)
        getHandle.registerTimer(tv.getCurrentProcessingTimeInMs() + t)
    }
    full.map(render).iterator
  }

  override def handleExpiredTimer(key: Int, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[String] = {
    val rest = buf.get().toSeq
    buf.clear()
    if (rest.nonEmpty) Iterator.single(render(rest)) else Iterator.empty
  }
}

/** `$delay` parking state: payload per unique row key, one timer at
  * now+delay, emit-and-clear on expiry. State and timers are in the
  * checkpoint — redelivery survives restarts.
  */
final class DelayProcessor extends StatefulProcessor[
  String, (String, String, Long, String, String), (String, String, String)] {
  @transient private var pending: ValueState[(String, String, String)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    pending = getHandle.getValueState("pending",
      Encoders.tuple(Encoders.STRING, Encoders.STRING, Encoders.STRING),
      TTLConfig.NONE)

  override def handleInputRows(key: String,
      rows: Iterator[(String, String, Long, String, String)],
      tv: TimerValues): Iterator[(String, String, String)] = {
    rows.foreach { case (_, topic, delayMs, k, json) =>
      pending.update((topic, k, json))
      getHandle.registerTimer(tv.getCurrentProcessingTimeInMs() + delayMs)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: String, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[(String, String, String)] = {
    val out =
      if (pending.exists()) Iterator.single(pending.get())
      else Iterator.empty
    pending.clear()
    out
  }
}

/** Event-time `$delay` parking state: payload per unique row key, one
  * EVENT-TIME timer at the row's own deliverAt — it fires when the
  * watermark passes that instant, which depends only on the DATA.
  */
final class EventDelayProcessor extends StatefulProcessor[
  String, (String, String, java.sql.Timestamp, String, String),
  (String, String, String)] {
  @transient private var pending: ValueState[(String, String, String)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    pending = getHandle.getValueState("pending",
      Encoders.tuple(Encoders.STRING, Encoders.STRING, Encoders.STRING),
      TTLConfig.NONE)

  override def handleInputRows(key: String,
      rows: Iterator[(String, String, java.sql.Timestamp, String, String)],
      tv: TimerValues): Iterator[(String, String, String)] = {
    rows.foreach { case (_, topic, at, k, json) =>
      pending.update((topic, k, json))
      getHandle.registerTimer(at.getTime)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: String, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[(String, String, String)] = {
    val out =
      if (pending.exists()) Iterator.single(pending.get())
      else Iterator.empty
    pending.clear()
    out
  }
}
