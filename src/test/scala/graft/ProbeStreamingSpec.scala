package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.op.Env
import graft.streaming.{AppRunner, FileStreamIo, ProbeListener}

/** Streaming $probe: per-micro-batch counts surface through observe() +
  * ProbeListener.
  */
class ProbeStreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("$probe counts reach the listener per micro-batch") {
    val dir = Files.createTempDirectory("graft-probe").toString
    def write(name: String, json: String): Unit = {
      Files.createDirectories(Paths.get(s"$dir/pin"))
      Files.writeString(Paths.get(s"$dir/pin/$name.json"), json)
    }
    write("m1", """{"_id":"a","v":1}""")
    write("m2", """{"_id":"b","v":2}""")
    val captured =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    val listener = new ProbeListener((name, _, count) =>
      captured.add(name -> count))
    spark.streams.addListener(listener)
    try {
      val io = new FileStreamIo(dir, Map.empty)
      new AppRunner(spark, io, Env(spark)).run(
        """{"application":"pr","version":"1.0","parts":[
             {"type":"stream","name":"s","fromTopic":"pin","toTopic":"out_pr",
              "pipeline":[{"$probe":{"name":"flowrate","topic":"probe-t"}}]}]}""")
      io.processAll()
      // listener events are async; wait briefly for delivery
      val deadline = System.currentTimeMillis() + 10000
      while (captured.asScala.filter(_._1 == "flowrate").map(_._2).sum < 2 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      val total = captured.asScala.filter(_._1 == "flowrate").map(_._2).sum
      assert(total == 2, s"captured: $captured")
      io.stopAll()
    } finally spark.streams.removeListener(listener)
  }

  private implicit class QueueOps[A](
      q: java.util.concurrent.ConcurrentLinkedQueue[A]) {
    def asScala: Seq[A] = {
      import scala.jdk.CollectionConverters._
      q.iterator().asScala.toSeq
    }
  }
}
