package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.ParquetCollectionIo
import org.apache.spark.sql.functions.col

/** Cross-JVM writer coordination on bucketed collections (ROADMAP
  * round-7 #2): a per-collection lock file serializes the
  * read-merge-swap across engine instances. Two Io INSTANCES stand in
  * for two JVMs — the JVM-local `synchronized` is per instance, so only
  * the file lock orders them.
  */
class CollectionLockSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import scala.concurrent.{Await, Future}
  import scala.concurrent.duration._
  import scala.concurrent.ExecutionContext.Implicits.global

  test("two writer instances interleave without losing updates") {
    val root = Files.createTempDirectory("graft-lock").toString
    val a = new ParquetCollectionIo(spark, root, new TestIo(Map.empty))
    val b = new ParquetCollectionIo(spark, root, new TestIo(Map.empty))
    import spark.implicits._
    def ups(io: ParquetCollectionIo, ids: Seq[Int]): Future[Unit] =
      Future {
        ids.foreach(i =>
          io.upsert("c", Seq((s"id$i", i)).toDF("_id", "v")))
      }
    // interleaved read-merge-swap cycles from both instances: without
    // the lock, a swap can clobber the other writer's just-written
    // buckets (both merged against the same stored generation)
    Await.result(
      Future.sequence(Seq(ups(a, 0 to 4), ups(b, 5 to 9))), 5.minutes)
    val got = a.source(spark, "collection", "c")
      .select("_id").as[String].collect().toSet
    assert(got == (0 to 9).map(i => s"id$i").toSet)
    assert(!Files.exists(Paths.get(s"$root/c.__lock")), "lock released")
  }

  test("a stale lock (dead writer) is stolen, not waited out") {
    val root = Files.createTempDirectory("graft-stale").toString
    val lock = Paths.get(s"$root/c.__lock")
    Files.createDirectories(lock.getParent)
    Files.writeString(lock, "dead-writer-token")
    Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 3600_000))
    val io = new ParquetCollectionIo(spark, root, new TestIo(Map.empty))
    import spark.implicits._
    io.upsert("c", Seq(("a", 1)).toDF("_id", "v")) // must not block
    assert(io.source(spark, "collection", "c").where(col("_id") === "a")
      .count() == 1)
    assert(!Files.exists(lock))
  }

  test("a live peer's lock is honored until lockWaitMs, then fails loudly") {
    val root = Files.createTempDirectory("graft-held").toString
    val lock = Paths.get(s"$root/c.__lock")
    Files.createDirectories(lock.getParent)
    Files.writeString(lock, "live-peer-token") // fresh mtime = live
    val io = new ParquetCollectionIo(spark, root, new TestIo(Map.empty),
      lockWaitMs = 500)
    import spark.implicits._
    val e = intercept[IllegalStateException](
      io.upsert("c", Seq(("a", 1)).toDF("_id", "v")))
    assert(e.getMessage.contains("writer lock held"))
    assert(Files.readString(lock) == "live-peer-token",
      "the peer's lock must survive")
  }
}
