package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.json.Js
import graft.op.Env
import graft.streaming.{AppRunner, FileStreamIo}

/** `stateExpiry` on an aggregate part (ROADMAP round-7 #1): an instance
  * whose snapshot saw no command for the window is evicted from the state
  * store — the state row count drops with no new input, and the next
  * command for that id reduces against EMPTY state (`_seq` restarts at 0).
  * Event-sourced state stays immortal when the knob is unset.
  */
class AggregateTtlSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("stateExpiry evicts idle snapshots; next command starts fresh") {
    val dir = Files.createTempDirectory("graft-aggttl").toString
    val cmdDir = s"$dir/sess-command"
    Files.createDirectories(Paths.get(cmdDir))
    def write(name: String, json: String): Unit =
      Files.writeString(Paths.get(s"$cmdDir/$name.json"), json)
    write("m0001",
      """{"_id":"a","_command":"put","_jwt":{"sub":"t"},"v":1}""")
    val io = new FileStreamIo(dir, Map.empty)
    val streams = new AppRunner(spark, io, Env(spark)).run(
      """{"application":"at","version":"1.0","parts":[
           {"type":"aggregate","aggregateType":"sess",
            "stateExpiry":10000}]}""")
    val q = io.start("agg_ttl", streams("sess-aggregate"))
    io.processAll()
    def docs = spark.table("agg_ttl").collect()
      .map(r => Js.parse(r.getAs[String]("value"))).toSeq
    assert(docs.map(_.get("_seq").asLong()) == Seq(0L))
    def stateRows: Long = Option(q.lastProgress).toSeq
      .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
    assert(stateRows >= 1, "snapshot should be in the state store")
    // expiry without input: the engine keeps triggering batches for the
    // group timeouts (usesProcessingTimers now covers fMGWS timeouts),
    // each evicting idle snapshots
    val d1 = System.currentTimeMillis() + 60000
    while (stateRows > 0 && System.currentTimeMillis() < d1)
      Thread.sleep(250)
    assert(stateRows == 0,
      s"aggregate snapshot did not expire after stateExpiry: $stateRows")
    // a post-expiry command reduces against empty state: _seq restarts
    write("m0002",
      """{"_id":"a","_command":"put","_jwt":{"sub":"t"},"v":2}""")
    val d2 = System.currentTimeMillis() + 20000
    while (docs.size < 2 && System.currentTimeMillis() < d2) {
      Thread.sleep(250)
      io.processAll()
    }
    val seqs = docs.map(_.get("_seq").asLong())
    assert(seqs == Seq(0L, 0L),
      s"expected a fresh instance after expiry, got _seq $seqs")
    io.stopAll()
  }
}
