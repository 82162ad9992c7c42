package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.GoldenTest

/** The topic-shaped reference fixture apps again, but under REAL
  * Structured Streaming (file-stream sources, one file per micro-batch,
  * memory sinks) — the engine path a Kafka deployment exercises. The
  * batch harness (GoldenTestSpec) proves the semantics; this proves the
  * streaming plans: stream parts, merges, stream-stream joins with
  * watermarks + duplicate suppression, and the $lookup broadcast.
  */
class GoldenStreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val root = "src/test/resources/goldapps"

  // every ported app except the aggregates below; aggregates run
  // schemaless
  private val topicApps =
    (1 to 7) ++ (9 to 31) ++ Seq(32, 33, 34, 40)

  topicApps.foreach { n =>
    test(s"reference app$n matches under Structured Streaming") {
      val results = GoldenTest.runStreaming(spark, s"$root/app$n")
      assert(results.nonEmpty, s"no expectations for app$n")
      results.foreach(r => assert(r.ok, s"app$n/${r.topic}: ${r.detail}"))
    }
  }

  // engine-extension fixtures: $deduplicateNear's store-always verdicts
  // and dupTopic routing under real streaming (arrival order rides the
  // filename-derived __ord, so the matrix entry is deterministic)
  Seq("s3csv", "s3out", "s3attachments", "s3csv-resumable", "neardedup")
    .foreach { a =>
    test(s"reference $a app matches under Structured Streaming") {
      val results = GoldenTest.runStreaming(spark, s"$root/$a")
      assert(results.nonEmpty, s"no expectations for $a")
      results.foreach(r => assert(r.ok, s"$a/${r.topic}: ${r.detail}"))
    }
  }

  // aggregate (event-sourcing) apps run schemaless: raw (key, value)
  // commands keep document field order through the stateful reduce.
  // app36's {href} refs resolve through the run-scoped HrefStore (the
  // streaming analog of the batch harness's two-pass state collect).
  private val aggregateApps = Seq(8, 35, 36, 37, 38, 39)

  aggregateApps.foreach { n =>
    test(s"reference app$n aggregate matches under Structured Streaming") {
      val results =
        GoldenTest.runStreaming(spark, s"$root/app$n", schemaless = true)
      assert(results.nonEmpty, s"no expectations for app$n")
      results.foreach(r => assert(r.ok, s"app$n/${r.topic}: ${r.detail}"))
    }
  }
}
