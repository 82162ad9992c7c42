package graft

import org.scalatest.funsuite.AnyFunSuite

/** Event-time `$delay` late-data contract: a row whose deliverAt is
  * already more than `lateness` behind the max seen deliverAt is LATE —
  * the watermark filter drops it before the stateful operator, exactly
  * like any event-time operator (it is neither parked nor delivered).
  * `lateness` is therefore the loss bound: size it to the maximum
  * backward skew deliverAt can have in the stream (for the retry
  * pattern deliverAt = own event time + positive delta, so source
  * disorder is the skew). The drop is OBSERVABLE: the batch's
  * `numRowsDroppedByWatermark` lands in query progress, and the
  * metrics listener exports it as the `late.dropped` OTLP counter.
  */
class LateDelaySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("a deliverAt behind the watermark is dropped, visibly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = 1700000000000L // fixed epoch ms — nothing reads the clock
    def ts(s: Long) = new java.sql.Timestamp(t0 + s * 1000)
    val in = MemoryStream[(String, java.sql.Timestamp, String, String)]
    DelayCapture.buf.clear()
    val q = graft.streaming.StatefulOps.delayViaEventTimers(
      in.toDF().toDF("topic", "deliverAt", "key", "json"),
      latenessMs = 60000)
      .writeStream
      .foreach(new graft.streaming.DelayedDelivery.ImmediateWriter(
        // resolve the singleton ON the executor: capturing the queue in
        // a local val would serialize a COPY into the writer
        (t, k, j) => DelayCapture.buf.add((t, k, j))))
      .start()
    def got: Set[String] = {
      import scala.jdk.CollectionConverters._
      DelayCapture.buf.iterator().asScala.toSeq
        .filter(_._1 == "lp").map(_._2).toSet
    }
    try {
      in.addData(("lp", ts(300), "HEAD", "{}"))
      q.processAllAvailable() // watermark +240s
      // LATE: due +100s, 140 s behind the watermark → dropped, and the
      // drop is counted in progress
      in.addData(("lp", ts(100), "LATE", "{}"))
      q.processAllAvailable()
      val dropped = q.recentProgress.toSeq
        .flatMap(_.stateOperators.toSeq)
        .map(_.numRowsDroppedByWatermark).sum
      assert(dropped == 1, s"late row not counted as dropped: $dropped")
      // later data delivers HEAD and TAIL; LATE never surfaces
      in.addData(("lp", ts(500), "TAIL", "{}"))
      q.processAllAvailable()
      in.addData(("lp", ts(600), "T2", "{}"))
      q.processAllAvailable()
      assert(got == Set("HEAD", "TAIL"),
        s"late row should be dropped, not delivered: $got")
    } finally q.stop()
  }
}
