package graft.streaming

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.json.Js

/** Streaming `$per` (docs/aggregation_stages.md:393-411): accumulate
  * `amount` messages into one message whose `as` field is the array;
  * `timeout` ms flushes partial batches via a processing-time timer.
  *
  * Like the reference, batching is a serial point in the stream (one
  * accumulator); the stage is meant for request-coalescing, not bulk
  * throughput.
  */
object PerStage {

  def apply(df: DataFrame, spec: JsonNode): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val amount = spec.get("amount").asInt()
    val as = spec.get("as").asText()
    val timeoutMs =
      if (spec.has("timeout")) Some(spec.get("timeout").asLong()) else None

    val payload =
      if (df.columns.toSet == Set("key", "value")) df.select(col("value"))
      else df.select(to_json(struct(df.columns.map(col): _*)).as("value"))

    // ProcessingTimeTimeout makes the engine trigger continuously to
    // evaluate timers — only pay that when a flush timeout is configured
    val timeoutMode =
      if (timeoutMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    payload.as[String]
      .groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Append, timeoutMode) {
        (_: Int, it: Iterator[String], state: GroupState[Seq[String]]) =>
          val buffered = state.getOption.getOrElse(Seq.empty) ++ it
          val batches = buffered.grouped(amount).toSeq
          val (full, rest) =
            if (batches.nonEmpty && batches.last.size < amount)
              (batches.init, batches.last)
            else (batches, Seq.empty)
          val flushRest = state.hasTimedOut && rest.nonEmpty
          val emit = if (flushRest) full :+ rest else full
          val keep = if (flushRest) Seq.empty else rest
          state.update(keep)
          timeoutMs.foreach { t =>
            if (keep.nonEmpty) state.setTimeoutDuration(t)
          }
          emit.map { batch =>
            val o = Js.obj()
            val arr = Js.arr()
            batch.foreach(b => arr.add(Js.parse(b)))
            o.set[JsonNode](as, arr)
            Js.render(o)
          }.iterator
      }
      .toDF("value")
      .select(lit(null).cast("string").as("key"), col("value"))
  }
}
