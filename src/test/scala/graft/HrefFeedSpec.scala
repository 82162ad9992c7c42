package graft

import java.nio.file.{Files, Path, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.json.Js
import graft.op.Env
import graft.streaming.{AppRunner, HrefStore}
import scala.jdk.CollectionConverters._

/** Streaming self-feed of the shared-dir href store: with
  * `config("href.store")` set, draining the `<type>-aggregate` purpose
  * stream must keep the store current (latest `_seq` per instance) with
  * no extra wiring — the Spark analog of the reference resolving refs
  * against the Mongo aggregate collection its own sinks maintain
  * (reference app36, docs/state.md).
  */
class HrefFeedSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val appDir = Paths.get("src/test/resources/goldapps/app35")
  private val commandTopic = "plusminus2-counter-command"

  test("draining the aggregate purpose stream feeds href.store") {
    val work = Files.createTempDirectory("graft-hreffeed")
    val srcDir = work.resolve("in").resolve(commandTopic)
    Files.createDirectories(srcDir)
    val inputs = Files.list(appDir.resolve(s"test/topics/from/$commandTopic"))
      .iterator().asScala.toSeq.sortBy(_.getFileName.toString)
    inputs.zipWithIndex.foreach { case (f, i) =>
      Files.writeString(srcDir.resolve(f"m$i%04d.json"),
        Js.render(Js.parse(Files.readString(f))))
    }

    val storeDir = work.resolve("hrefs")
    val io = new ResumableIo(work.resolve("in"), work.resolve("out"),
      work.resolve("ckpt"))
    val env = Env(spark,
      scripts = name => Files.readString(appDir.resolve(name).normalize()))
    val streams = new AppRunner(spark, io, env,
      config = Map("href.store" -> storeDir.toString))
      .run(Files.readString(appDir.resolve("application.yaml")))

    // sink ONLY the aggregate purpose stream (the reference always routes
    // it to its topic); draining it must publish every state
    io.start("plusminus2-counter-aggregate",
      streams("plusminus2-counter-aggregate"))
    io.drainAndStop()

    // the store holds the LATEST state per instance: highest _seq wins
    val store = HrefStore.FileStore(storeDir.toString)
    val sunk = spark.read.schema("key string, value string")
      .json(work.resolve("out/plusminus2-counter-aggregate").toString)
      .collect().map(r => (r.getString(0), Js.parse(r.getString(1))))
    assert(sunk.nonEmpty, "fixture produced no aggregate states")
    val latest = sunk.groupBy(_._1).map { case (k, vs) =>
      k -> vs.map(_._2).maxBy(v => v.get("_seq").asLong())
    }
    latest.foreach { case (id, want) =>
      val got = store(id)
      assert(got.isDefined, s"store is missing instance $id")
      assert(Js.parse(got.get).get("_seq").asLong()
        == want.get("_seq").asLong(),
        s"store holds a stale state for $id")
    }
  }
}
