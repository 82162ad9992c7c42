package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.op.Env
import graft.streaming.{AppRunner, FileStreamIo, StatefulOps}

/** `$deduplicateNear` — the SimHash near-dedup engine extension: a
  * message drops when an earlier message is within maxDistance Hamming
  * bits; store-always banding keeps the rule order-deterministic and
  * chain-stable (see StatefulOps scaladoc).
  */
class NearDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val base =
    (0 until 40).map(i => s"w$i").mkString(" ")
  private val near = // one token edited: a handful of majority bits flip
    ((0 until 39).map(i => s"w$i") :+ "changed").mkString(" ")
  private val other =
    (0 until 40).map(i => s"x$i").mkString(" ")

  private def sigOf(t: String): Long = {
    import spark.implicits._
    Seq(t).toDF("t")
      .select(StatefulOps.simhash64(col("t"))).collect()(0).getLong(0)
  }

  test("the test corpus separates: near within 8 bits, other beyond") {
    val (sb, sn, so) = (sigOf(base), sigOf(near), sigOf(other))
    def d(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(d(sb, sn) <= 8, s"near distance ${d(sb, sn)}")
    assert(d(sb, so) > 8, s"other distance ${d(sb, so)}")
    assert(d(sn, so) > 8, s"near-other distance ${d(sn, so)}")
  }

  test("batch $deduplicateNear keeps first occurrences, drops near/exact") {
    import spark.implicits._
    val df = Seq(
      (1L, base), (2L, near), (3L, other), (4L, base))
      .toDF("__ord", "text")
    val out = graft.op.Pipeline.run(df,
      """[{"$deduplicateNear":{"expression":"$text","maxDistance":8}}]""",
      Env(spark))
    assert(out.select("__ord").collect().map(_.getLong(0)).toSet
      == Set(1L, 3L),
      "the near twin and the exact copy drop; base and other survive")
    // exact ties at the same ord: exactly one copy survives
    val ties = Seq((1L, base), (1L, base), (1L, other))
      .toDF("__ord", "text")
    val out2 = graft.op.Pipeline.run(ties,
      """[{"$deduplicateNear":{"expression":"$text","maxDistance":8}}]""",
      Env(spark))
    assert(out2.count() == 2)
  }

  test("dupTopic routes dropped near-duplicates instead of losing them") {
    import spark.implicits._
    val df = Seq((1L, base), (2L, near), (3L, other))
      .toDF("__ord", "text")
    val out = graft.op.Pipeline.run(df,
      """[{"$deduplicateNear":{"expression":"$text","maxDistance":8,
                               "dupTopic":"near-dups"}}]""",
      Env(spark))
    val rows = out.select("__ord", "_topic").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(rows.keySet == Set(1L, 2L, 3L), "no row is lost")
    assert(rows(2L) == Some("near-dups"),
      "the dropped near twin re-routes to the dup topic")
    assert(rows(1L).isEmpty && rows(3L).isEmpty,
      "survivors carry no routing override")
  }

  test("$deduplicateNear band state survives a crash/restart") {
    import java.nio.file.{Files => F, Paths => P}
    import graft.json.Js
    val work = F.createTempDirectory("graft-near-restart")
    val srcDir = work.resolve("in/nearrin")
    F.createDirectories(srcDir)
    val app =
      """{"application":"nearr","version":"1.0","parts":[
           {"type":"stream","name":"s","fromTopic":"nearrin",
            "toTopic":"out_nearr",
            "pipeline":[{"$deduplicateNear":{"expression":"$text",
                                             "maxDistance":8}}]}]}"""
    def runPhase(): Unit = {
      val io = new ResumableIo(work.resolve("in"), work.resolve("out"),
        work.resolve("ckpt"))
      val streams = new AppRunner(spark, io, Env(spark)).run(app)
      streams.get("out_nearr").foreach(io.start("out_nearr", _))
      io.drainAndStop()
    }
    // phase 1: the base message only, then the crash
    F.writeString(srcDir.resolve("m0000.json"),
      s"""{"_id":"a","text":"$base"}""")
    runPhase()
    // phase 2, NEW runner over the same checkpoint: a near message must
    // STILL drop — its only near predecessor lives in restored band
    // state — while unrelated content passes
    F.writeString(srcDir.resolve("m0001.json"),
      s"""{"_id":"b","text":"$near"}""")
    F.writeString(srcDir.resolve("m0002.json"),
      s"""{"_id":"c","text":"$other"}""")
    runPhase()
    val ids = spark.read.schema("key string, value string")
      .json(work.resolve("out/out_nearr").toString)
      .select("value").collect()
      .map(r => Js.parse(r.getString(0)).get("_id").asText()).toSet
    assert(ids == Set("a", "c"),
      s"restored state must still suppress the near twin: $ids")
  }

  test("streaming $deduplicateNear drops near messages across batches") {
    val dir = Files.createTempDirectory("graft-near").toString
    // one file per micro-batch; the file source orders same-mtime files
    // by LISTING order (not name), so arrival order needs explicit
    // ascending mtimes to be deterministic
    var mtime = System.currentTimeMillis() - 60000
    def write(name: String, json: String): Unit = {
      Files.createDirectories(Paths.get(s"$dir/nearin"))
      val p = Paths.get(s"$dir/nearin/$name.json")
      Files.writeString(p, json)
      mtime += 2000
      p.toFile.setLastModified(mtime)
    }
    write("m1", s"""{"_id":"a","text":"$base"}""")
    write("m2", s"""{"_id":"b","text":"$near"}""")
    write("m3", s"""{"_id":"c","text":"$other"}""")
    val io = new FileStreamIo(dir, Map.empty)
    new AppRunner(spark, io, Env(spark)).run(
      """{"application":"near","version":"1.0","parts":[
           {"type":"stream","name":"s","fromTopic":"nearin",
            "toTopic":"out_near",
            "pipeline":[{"$deduplicateNear":{"expression":"$text",
                                             "maxDistance":8}}]}]}""")
    io.processAll()
    def ids: Set[String] = spark.table("out_near")
      .select(get_json_object(col("value"), "$._id"))
      .collect().map(_.getString(0)).toSet
    assert(ids == Set("a", "c"), s"first batch: $ids")
    // a later batch's near message still drops — band state persists
    write("m4", s"""{"_id":"d","text":"$near"}""")
    write("m5", s"""{"_id":"e","text":"fresh and unrelated content"}""")
    io.processAll()
    assert(ids == Set("a", "c", "e"), s"second batch: $ids")
    io.stopAll()
  }

  test("maxPerBand caps per-band signature state, verdicts intact") {
    val dir = Files.createTempDirectory("graft-near-cap").toString
    var mtime = System.currentTimeMillis() - 60000
    def write(name: String, json: String): Unit = {
      Files.createDirectories(Paths.get(s"$dir/capin"))
      val p = Paths.get(s"$dir/capin/$name.json")
      Files.writeString(p, json)
      mtime += 2000
      p.toFile.setLastModified(mtime)
    }
    // a flood of exact copies lands every signature on the SAME band
    // keys: the hot-band scenario the cap exists for
    (0 until 6).foreach(i => write(s"m$i", s"""{"_id":"c$i","text":"$base"}"""))
    val io = new FileStreamIo(dir, Map.empty)
    new AppRunner(spark, io, Env(spark)).run(
      """{"application":"nearcap","version":"1.0","parts":[
           {"type":"stream","name":"s","fromTopic":"capin",
            "toTopic":"out_nearcap",
            "pipeline":[{"$deduplicateNear":{"expression":"$text",
                                             "maxDistance":8,
                                             "maxPerBand":1,
                                             "dupTopic":"cap-dups"}}]}]}""")
    io.processAll()
    def rows: Map[String, Option[String]] = {
      val t = spark.table("out_nearcap")
      val topicCol =
        if (t.columns.contains("_topic")) col("_topic")
        else get_json_object(col("value"), "$._topic")
      t.select(get_json_object(col("value"), "$._id"), topicCol)
        .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    }
    assert(rows.keySet == (0 until 6).map(i => s"c$i").toSet,
      s"dupTopic loses nothing: ${rows.keySet}")
    assert(rows.count(_._2.contains("cap-dups")) == 5,
      "every copy after the first is flagged — the retained most-recent " +
        "signature per band still answers the near test")
    // state stays bounded: maxDist 8 → 9 bands, each trimmed to ONE
    // signature; without the cap the six copies would hold 9×6 entries
    val q = io.queries.values.find(q =>
      Option(q.lastProgress).exists(_.stateOperators.nonEmpty))
      .getOrElse(io.queries.values.head)
    val stateRows = Option(q.lastProgress).toSeq
      .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
    assert(stateRows <= 9,
      s"per-band lists must trim to maxPerBand=1: $stateRows state rows")
    // the retained window still suppresses later near arrivals and
    // passes unrelated content
    write("m6", s"""{"_id":"n","text":"$near"}""")
    write("m7", s"""{"_id":"o","text":"$other"}""")
    io.processAll()
    val r2 = rows
    assert(r2("n").contains("cap-dups"), s"near after trim: $r2")
    assert(r2("o").isEmpty, s"unrelated after trim: $r2")
    io.stopAll()
  }
}
