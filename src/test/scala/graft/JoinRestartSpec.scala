package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.json.Js
import graft.op.Env
import graft.streaming.AppRunner

/** Crash/resume for the JOIN part: the stream-stream join buffers an
  * unmatched left row in the state store; after stopping every query
  * (the crash) a brand-new runner over the same checkpoints must
  * (a) NOT re-emit the pair already joined in phase 1, and (b) join the
  * phase-2 right row against the phase-1 LEFT ROW RESTORED FROM STATE —
  * the part that only works if join state survives the restart. The
  * 10-minute window keeps ingestion-time matching deterministic across
  * the restart gap.
  */
class JoinRestartSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val appYaml =
    """---
      |application: "r4join-restart"
      |version: "1.0"
      |parts:
      |  - type: "join"
      |    name: "joined"
      |    toTopic: "jout"
      |    window: 600000
      |    left:
      |      fromTopic: "lt"
      |      on: "$corr"
      |    right:
      |      fromTopic: "rt"
      |      on: "$corr"
      |""".stripMargin

  private def put(dir: Path, name: String, json: String): Unit = {
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(name), json)
  }

  private val schemas = {
    import org.apache.spark.sql.types._
    val lt = StructType(Seq(StructField("_id", StringType),
      StructField("corr", StringType), StructField("lv", LongType)))
    val rt = StructType(Seq(StructField("_id", StringType),
      StructField("corr", StringType), StructField("rv", LongType)))
    Map("lt" -> lt, "rt" -> rt)
  }

  private def runPhase(io: ResumableIo): Unit = {
    val streams = new AppRunner(spark, io, Env(spark)).run(appYaml)
    streams.get("jout").foreach(io.start("jout", _))
    io.drainAndStop()
  }

  test("join part resumes: buffered left row joins after the restart") {
    val work = Files.createTempDirectory("graft-join-restart")
    val (srcRoot, outRoot, ckptRoot) =
      (work.resolve("in"), work.resolve("out"), work.resolve("ckpt"))

    // phase 1: c1 joins immediately; c3's left side stays buffered
    put(srcRoot.resolve("lt"), "m0001.json",
      """{"_id":"L1","corr":"c1","lv":1}""")
    put(srcRoot.resolve("rt"), "m0002.json",
      """{"_id":"R1","corr":"c1","rv":2}""")
    put(srcRoot.resolve("lt"), "m0003.json",
      """{"_id":"L3","corr":"c3","lv":3}""")
    runPhase(new ResumableIo(srcRoot, outRoot, ckptRoot, schemas))

    // the crash: everything stopped; state lives only in checkpoints.
    // phase 2: only c3's right partner arrives
    put(srcRoot.resolve("rt"), "m0004.json",
      """{"_id":"R3","corr":"c3","rv":4}""")
    runPhase(new ResumableIo(srcRoot, outRoot, ckptRoot, schemas))

    val out = spark.read
      .schema("_id string, left struct<key:string,_id:string,corr:string,lv:bigint>, " +
        "right struct<key:string,_id:string,corr:string,rv:bigint>")
      .json(outRoot.resolve("jout").toString)
      .collect()
    val byId = out.groupBy(_.getString(0))
    assert(byId.keySet == Set("c1", "c3"),
      s"expected pairs c1+c3, got ${byId.keySet}")
    // no duplicate emission of the phase-1 pair after the resume
    assert(byId.values.forall(_.length == 1),
      s"duplicate join output after resume: ${out.toSeq}")
    val c3 = byId("c3").head
    assert(c3.getStruct(1).getAs[Long]("lv") == 3L)
    assert(c3.getStruct(2).getAs[Long]("rv") == 4L)
  }
}
