package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

/** The shared-fixture cache boundary, pinned.
  *
  * Three gate families serve config-scale rows collected from ONE
  * engine pass per scale factor (tokenizer vocabularies, recipe
  * reports, pagerank rollups). That is correctness-sound — every
  * oracle still replays its full chain in DuckDB — but it means the
  * consumer gates' bench rows time a driver-side `toDF`, i.e.
  * nothing. The adjudicated boundary: each family keeps exactly one
  * LIVE carrier whose bench row carries the family's honest engine
  * cost, and a new family lands live-first. These tests pin the
  * carrier set: a refactor that quietly turns a carrier into a
  * cached serve collapses its plan to a driver-local scan with no
  * file read and no checkpointed stage frame — caught here even when
  * the family's cache is already warm.
  */
class CarrierSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sf = "/root/testdata/sf0.001"

  private def gate(name: String): DataFrame = {
    graft.queries.Q.session(spark)
    SparkEntry.queries(name)(spark, sf)
  }

  /** A cached serve of collected rows plans as LocalTableScan only; a
    * live carrier reads the corpus (FileScan) or its checkpointed
    * stage frames (Scan ExistingRDD). `warm` names a consumer gate
    * built FIRST so the family cache is populated — the carrier must
    * stay live even then.
    */
  private def assertLive(name: String, warm: Seq[String]): Unit = {
    warm.foreach(w => gate(w).queryExecution.executedPlan)
    val p = gate(name).queryExecution.executedPlan.toString
    assert(p.contains("FileScan") || p.contains("ExistingRDD"),
      s"$name must stay its family's LIVE bench carrier — its plan " +
        s"reads no files even with the family cache warm:\n" +
        p.take(1200))
  }

  test("q_pagerank stays the pagerank family's live carrier") {
    // q_domain_authority populates the per-sf (node, pr_rank) cache;
    // the fixpoint carrier must not consume it
    assertLive("q_pagerank", Seq("q_domain_authority"))
  }

  test("q_recipe_reports stays the recipe family's live carrier") {
    // q_recipe_funnel populates the one-shot report cache (and
    // incrStateFor's standing fixture is itself memoized) — the
    // combined one-pass entry point must still run the staged chain
    assertLive("q_recipe_reports", Seq("q_recipe_funnel"))
  }

  test("tokenizer train gates stay the vocabulary families' live " +
    "carriers") {
    // a trainer's RETURNED frame is legitimately a driver-assembled
    // config-scale table (the engine work happens in the per-step
    // jobs while building it), so the plan-shape probe above can't
    // pin these. What distinguishes a live trainer from a cached
    // serve is that building + touching it launches Spark jobs even
    // with every vocabulary cache warm — a warm cached serve launches
    // none (LocalTableScan take is driver-local).
    Seq("q_unigram_encode", "q_wordpiece_encode").foreach(w =>
      gate(w).queryExecution.executedPlan)
    Seq("q_bpe_train", "q_unigram_train", "q_wordpiece_train")
      .foreach { name =>
        val jobs = new java.util.concurrent.atomic.AtomicInteger
        val l = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              js: org.apache.spark.scheduler.SparkListenerJobStart)
            : Unit = jobs.incrementAndGet()
        }
        spark.sparkContext.addSparkListener(l)
        try gate(name).take(1)
        finally {
          // the listener bus is async — poll before detaching
          val deadline = System.currentTimeMillis + 10000
          while (jobs.get == 0 && System.currentTimeMillis < deadline)
            Thread.sleep(50)
          spark.sparkContext.removeSparkListener(l)
        }
        assert(jobs.get > 0,
          s"$name launched no Spark jobs with the vocabulary caches " +
            "warm — it must stay the family's LIVE trainer, not a " +
            "cached serve")
      }
  }
}
