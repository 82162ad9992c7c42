package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.GoldenTest

/** Run the golden-folder applications under src/test/resources/goldapps —
  * the same fixture convention as the reference's `test` command
  * (docs/testing.md): stream+$match, aggregate with a JQ reducer, join
  * part, and $lookup with a preloaded collection.
  */
class GoldenTestSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val root = "src/test/resources/goldapps"

  private def check(app: String, strict: Boolean = false): Unit = {
    val results = GoldenTest.run(spark, s"$root/$app", strict)
    assert(results.nonEmpty, s"no expectations found for $app")
    results.foreach(r => assert(r.ok, s"$app/${r.topic}: ${r.detail}"))
  }

  test("filter app matches golden outputs (strict)") {
    check("filter", strict = true)
  }

  test("counter aggregate app matches golden outputs (lenient)") {
    check("counter")
  }

  test("join app matches golden outputs (strict)") {
    check("joined", strict = true)
  }

  test("lookup app with preloaded collection matches (strict)") {
    check("lookup", strict = true)
  }

  test("toCollection writes flow to the change stream (lenient)") {
    // final-state upsert semantics are covered by CollectionIoSpec; the
    // golden harness, like the reference's, observes every written doc
    check("upsert")
  }

  test("merge + validate + dynamic $send routing (lenient)") {
    check("mergesend")
  }

  test("$group rollup app matches golden outputs (strict)") {
    check("grouped", strict = true)
  }

  test("$redact app matches golden outputs (strict)") {
    check("redacted", strict = true)
  }

  test("$jq file-script transform app matches golden outputs (strict)") {
    check("transformed", strict = true)
  }

  test("validator macros + ref through an aggregate app (lenient)") {
    check("validmacro")
  }

  test("custom JSLT function set app matches (strict)") {
    check("jsltcustom", strict = true)
  }

  test("round-4 jq/jslt language surface through stream parts (strict)") {
    check("r4lang", strict = true)
  }

  test("$deduplicateNear app: near twin re-routes via dupTopic (strict)") {
    check("neardedup", strict = true)
  }

  // The reference's own fixture applications, ported verbatim
  // (reference src/test/resources/appN; Test.java runs them lenient).
  private val ported = (1 to 40)

  ported.foreach { n =>
    test(s"reference app$n matches its golden outputs") {
      check(s"app$n")
    }
  }

  // the reference's s3* fixture apps (TestApp also runs these); objects
  // come from the fixture `objects/` tree, HTTP is a 200 stub
  Seq("s3csv", "s3out", "s3attachments", "s3csv-resumable").foreach { a =>
    test(s"reference $a app matches its golden outputs") {
      check(a)
    }
  }
}
