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

  test("with deadLetterTopic, a late row reroutes with payload intact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = 1700000000000L
    def ts(s: Long) = new java.sql.Timestamp(t0 + s * 1000)
    val in = MemoryStream[(String, java.sql.Timestamp, String, String)]
    DelayCapture.buf.clear()
    val q = graft.streaming.StatefulOps.delayViaEventTimers(
      in.toDF().toDF("topic", "deliverAt", "key", "json"),
      latenessMs = 60000, deadLetterTopic = Some("dlq"))
      .writeStream
      .foreach(new graft.streaming.DelayedDelivery.ImmediateWriter(
        (t, k, j) => DelayCapture.buf.add((t, k, j))))
      .start()
    def got: Seq[(String, String, String)] = {
      import scala.jdk.CollectionConverters._
      DelayCapture.buf.iterator().asScala.toSeq
    }
    try {
      in.addData(("lp", ts(300), "HEAD", """{"payload":42}"""))
      q.processAllAvailable() // max seen 300s, watermark +240s
      // due +100s = 140s behind the watermark: the router must reroute it
      // BEFORE the watermark node — nothing may count as dropped
      in.addData(("lp", ts(100), "LATE", """{"payload":7}"""))
      q.processAllAvailable()
      val dropped = q.recentProgress.toSeq
        .flatMap(_.stateOperators.toSeq)
        .map(_.numRowsDroppedByWatermark).sum
      assert(dropped == 0,
        s"late row must dead-letter, not silently drop: $dropped")
      // advancing the watermark past maxSeen delivers both HEAD and the
      // rerouted LATE
      in.addData(("lp", ts(500), "TAIL", "{}"))
      q.processAllAvailable()
      in.addData(("lp", ts(600), "T2", "{}"))
      q.processAllAvailable()
      val dlq = got.filter(_._1 == "dlq")
      assert(dlq.map(_._2) == Seq("LATE"), s"dead letters: $dlq")
      // payload preserved, original routing recorded
      val n = graft.json.Js.parse(dlq.head._3)
      assert(n.get("payload").asInt() == 7, dlq.head._3)
      assert(n.get("_dlq").get("topic").asText() == "lp", dlq.head._3)
      assert(n.get("_dlq").get("deliverAtMs").asLong() == t0 + 100000L,
        dlq.head._3)
      // on-time rows still deliver on their own topic
      assert(got.filter(_._1 == "lp").map(_._2).toSet == Set("HEAD", "TAIL"),
        s"on-time deliveries: $got")
    } finally q.stop()
  }

  test("router max tracks OUTPUTS: the watermark-boundary row is " +
      "dead-lettered, never watermark-dropped") {
    // A dead-lettered row is rewritten to maxSeen+1ms, which raises the
    // DOWNSTREAM max above the router's input max. If the router tracked
    // inputs, a later row at exactly (maxSeen+1ms − lateness) would pass
    // its late test yet be dropped by the watermark filter (eventTime <=
    // watermark) — lost payload, the one thing dead-lettering promises
    // cannot happen. The router must judge with the max over what it
    // EMITS.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = 1700000000000L
    val in = MemoryStream[(String, java.sql.Timestamp, String, String)]
    DelayCapture.buf.clear()
    val q = graft.streaming.StatefulOps.delayViaEventTimers(
      in.toDF().toDF("topic", "deliverAt", "key", "json"),
      latenessMs = 60000, deadLetterTopic = Some("dlq2"))
      .writeStream
      .foreach(new graft.streaming.DelayedDelivery.ImmediateWriter(
        (t, k, j) => DelayCapture.buf.add((t, k, j))))
      .start()
    def ts(ms: Long) = new java.sql.Timestamp(t0 + ms)
    try {
      in.addData(("lp2", ts(300000), "HEAD", "{}"))
      q.processAllAvailable() // router max 300s; wm 240s
      in.addData(("lp2", ts(100000), "LATE", "{}"))
      q.processAllAvailable() // dead-lettered -> emitted at 300.001s
      // the boundary row: due exactly 300.001s - 60s = 240.001s. The
      // downstream watermark is 240.001s, so only dead-lettering saves it
      in.addData(("lp2", ts(240001), "EDGE", "{}"))
      q.processAllAvailable()
      val dropped = q.recentProgress.toSeq
        .flatMap(_.stateOperators.toSeq)
        .map(_.numRowsDroppedByWatermark).sum
      assert(dropped == 0, s"boundary row watermark-dropped: $dropped")
      // advance far enough to flush all timers
      in.addData(("lp2", ts(600000), "TAIL", "{}"))
      q.processAllAvailable()
      in.addData(("lp2", ts(700000), "T2", "{}"))
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val got = DelayCapture.buf.iterator().asScala.toSeq
        .filter(r => r._1 == "lp2" || r._1 == "dlq2")
      assert(got.filter(_._1 == "dlq2").map(_._2).toSet ==
        Set("LATE", "EDGE"), s"dead letters: $got")
      assert(got.filter(_._1 == "lp2").map(_._2).toSet ==
        Set("HEAD", "TAIL"), s"deliveries: $got")
    } finally q.stop()
  }

  test("router maxSeen survives a restart: post-restart late rows still " +
      "dead-letter") {
    // the router's watermark mirror lives in the checkpoint like any
    // transformWithState state: a restart that forgot maxSeen would see
    // prior=None and PASS a late row into the watermark filter, which
    // drops it — lost payload after every recovery
    import org.apache.spark.sql.functions.col
    val work = java.nio.file.Files.createTempDirectory("graft-router-restart")
    val src = work.resolve("in").toString
    val ckpt = work.resolve("ckpt").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    DelayCapture.buf.clear()
    def startQ() = graft.streaming.StatefulOps.delayViaEventTimers(
      spark.readStream
        .schema("topic string, deliverAt timestamp, key string, json string")
        .json(src)
        .select(col("topic"), col("deliverAt"), col("key"), col("json")),
      latenessMs = 60000, deadLetterTopic = Some("dlq3"))
      .writeStream
      .foreach(new graft.streaming.DelayedDelivery.ImmediateWriter(
        (t, k, j) => DelayCapture.buf.add((t, k, j))))
      .option("checkpointLocation", ckpt)
      .start()
    def got(t: String): Set[String] = {
      import scala.jdk.CollectionConverters._
      DelayCapture.buf.iterator().asScala.toSeq
        .filter(_._1 == t).map(_._2).toSet
    }
    val q1 = startQ()
    try {
      // HEAD at 00:05 -> maxSeen 00:05 lands in the checkpoint
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$src/m1.json"),
        """{"topic":"lp3","deliverAt":"2024-01-01T00:05:00Z","key":"HEAD","json":"{}"}""")
      q1.processAllAvailable()
    } finally { q1.stop(); q1.awaitTermination() }
    val q2 = startQ()
    try {
      // LATE at 00:00 ≤ 00:05 − 60s: only a RESTORED maxSeen routes it
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$src/m2.json"),
        """{"topic":"lp3","deliverAt":"2024-01-01T00:00:00Z","key":"LATE","json":"{}"}""")
      q2.processAllAvailable()
      // advance the watermark far enough to flush HEAD and the dlq row
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$src/m3.json"),
        """{"topic":"lp3","deliverAt":"2024-01-01T01:00:00Z","key":"TAIL","json":"{}"}""")
      q2.processAllAvailable()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$src/m4.json"),
        """{"topic":"lp3","deliverAt":"2024-01-01T02:00:00Z","key":"T2","json":"{}"}""")
      q2.processAllAvailable()
      val dropped = q2.recentProgress.toSeq
        .flatMap(_.stateOperators.toSeq)
        .map(_.numRowsDroppedByWatermark).sum
      assert(dropped == 0, s"late row dropped after restart: $dropped")
      assert(got("dlq3") == Set("LATE"), s"dead letters: ${got("dlq3")}")
      assert(got("lp3").contains("HEAD"), s"deliveries: ${got("lp3")}")
    } finally { q2.stop(); q2.awaitTermination() }
  }

  test("parking state keys are deterministic and collision-separated") {
    import graft.streaming.StatefulOps.uidOf
    // a recompute (task retry) walks the same rows at the same positions
    // with the same batch timestamp — the key is a pure function of those
    assert(uidOf(Seq("t", "1000", "k", "{}"), 3, 7, 99L) ==
      uidOf(Seq("t", "1000", "k", "{}"), 3, 7, 99L))
    // identical payloads in one batch: distinct positions, distinct keys
    assert(uidOf(Seq("t", "1000", "k", "{}"), 0, 0, 99L) !=
      uidOf(Seq("t", "1000", "k", "{}"), 0, 1, 99L))
    // identical payloads at identical positions in different batches
    assert(uidOf(Seq("t", "1000", "k", "{}"), 0, 0, 99L) !=
      uidOf(Seq("t", "1000", "k", "{}"), 0, 0, 100L))
    // field boundaries preserved; null and empty fields separated
    assert(uidOf(Seq("ab", "c"), 0, 0, 0L) != uidOf(Seq("a", "bc"), 0, 0, 0L))
    assert(uidOf(Seq(null, "x"), 0, 0, 0L) != uidOf(Seq("", "x"), 0, 0, 0L))
  }
}
