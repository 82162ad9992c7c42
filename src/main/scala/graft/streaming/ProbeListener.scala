package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import scala.jdk.CollectionConverters._

/** Forwards `$probe` observed metrics (docs/aggregation_stages.md:413-466)
  * out of streaming queries: each micro-batch's per-probe row count is
  * delivered to `forward(probeName, minute, count)` — production wires a
  * Kafka producer to the probe topic, tests capture in memory. Counts are
  * per-partition-group slices exactly like the reference's per-instance
  * probes; the documented downstream $group sums them.
  */
final class ProbeListener(forward: (String, Long, Long) => Unit)
    extends StreamingQueryListener {

  override def onQueryStarted(
      event: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
      event: StreamingQueryListener.QueryProgressEvent): Unit = {
    val minute = event.progress.timestamp match {
      case ts if ts != null =>
        java.time.Instant.parse(ts).toEpochMilli / 60000L
      case _ => 0L
    }
    event.progress.observedMetrics.asScala.foreach { case (name, row) =>
      val idx = row.schema.fieldNames.indexOf("count")
      if (idx >= 0) forward(name, minute, row.getLong(idx))
    }
  }

  override def onQueryTerminated(
      event: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}
