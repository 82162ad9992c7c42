package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.op.Env
import graft.streaming.{AppRunner, FileStreamIo}

/** transformWithState-backed operators (StatefulOps): `$deduplicate`'s
  * cacheWindow is real state TTL — entries expire by wall clock and the
  * key is re-admitted afterwards, with the state row count dropping in
  * `lastProgress.stateOperators` (ROADMAP #6 / round-5 verdict item 3).
  */
class StatefulOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("$deduplicate cacheWindow expires state and re-admits the key") {
    val dir = Files.createTempDirectory("graft-ttl").toString
    def write(name: String, json: String): Unit = {
      Files.createDirectories(Paths.get(s"$dir/ttlin"))
      Files.writeString(Paths.get(s"$dir/ttlin/$name.json"), json)
    }
    write("m1", """{"_id":"a","corr":"c1"}""")
    write("m2", """{"_id":"b","corr":"c1"}""")
    val io = new FileStreamIo(dir, Map.empty)
    new AppRunner(spark, io, Env(spark)).run(
      """{"application":"ttl","version":"1.0","parts":[
           {"type":"stream","name":"s","fromTopic":"ttlin",
            "toTopic":"out_ttl",
            "pipeline":[{"$deduplicate":{"expression":"$corr",
                                         "cacheWindow":10000}}]}]}""")
    io.processAll()
    // duplicate inside the window is suppressed
    assert(spark.table("out_ttl").count() == 1)
    val q = io.queries.values.find(q =>
      Option(q.lastProgress).exists(_.stateOperators.nonEmpty))
      .getOrElse(io.queries.values.head)
    def stateRows: Long = Option(q.lastProgress).toSeq
      .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
    assert(stateRows >= 1, "dedup entry should be in the state store")
    // TTL expiry: the engine keeps running micro-batches (processing-time
    // mode), each cleaning expired entries — the row count must DROP
    // without any new input
    val deadline = System.currentTimeMillis() + 30000
    while (stateRows > 0 && System.currentTimeMillis() < deadline)
      Thread.sleep(250)
    assert(stateRows == 0,
      s"dedup state did not expire after cacheWindow: $stateRows rows")
    // an expired key is re-admitted: the same corr passes again (poll —
    // the continuously-triggering engine picks the file up on its own
    // schedule, so a single quiescence wait can race the new file)
    write("m3", """{"_id":"c","corr":"c1"}""")
    val d2 = System.currentTimeMillis() + 20000
    while (spark.table("out_ttl").count() < 2 &&
        System.currentTimeMillis() < d2) {
      Thread.sleep(250)
      io.processAll()
    }
    assert(spark.table("out_ttl").count() == 2)
    io.stopAll()
  }
}
