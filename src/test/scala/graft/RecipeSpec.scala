package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.Recipes

/** The end-to-end curation recipe: every stage must drop exactly the
  * rows its operator is responsible for, the funnel must be
  * nonincreasing, and the whole run must be partition-order
  * deterministic.
  */
class RecipeSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  // three DISTINCT long pages (near-dedup must not cluster them) that
  // all pass C4 (terminal punctuation, >= 3 words per line) and Gopher
  // (>= 50 words, stopwords present, varied vocabulary)
  private val page1 =
    "The harbour town wakes early when the fishing boats return. " +
      "Crates of silver herring slide across the wet stone pier. " +
      "Merchants call their prices while gulls argue over the scraps. " +
      "By noon the market square smells of salt and fresh bread. " +
      "Children chase hoops between the stalls until the bells ring. " +
      "In the evening the lighthouse sweeps its beam across the bay."
  private val page2 =
    "A mountain railway climbs through larch forest above the valley. " +
      "Each switchback reveals another view of the glacier below. " +
      "Engineers carved these tunnels by hand more than a century ago. " +
      "Passengers lean toward the windows as marmots scatter from the track. " +
      "At the summit station the air is thin and astonishingly clear. " +
      "Hikers refill their bottles from a spring beside the platform."
  private val page6 =
    "The observatory sits alone on a plateau far from city light. " +
      "Astronomers sleep through the day and work beneath the dome at night. " +
      "Their instruments measure the faint breathing of distant stars. " +
      "A log book records every exposure with patient careful handwriting. " +
      "When storms roll in they seal the shutters and process old data. " +
      "Morning finds the telescope parked and the coffee pot empty."

  // corpus: good docs, a blocked-domain doc, a markup-only doc, a junk
  // page (fails the rules), an exact URL twin, and a near-dup text twin
  private def corpus = Seq(
    (1L, s"<p>$page1</p>", "https://good.com/a"),
    (2L, s"<p>$page2</p>", "https://fine.org/b"),
    (3L, s"<p>$page1</p>", "https://spam.bad.com/x"), // blocked
    (4L, "<script>var x;</script><style>p{}</style>", "https://good.com/e"), // empty after strip
    (5L, "<p>buy buy buy buy buy buy buy buy buy buy buy buy.</p>",
      "https://fine.org/j"), // junk: passes C4, fails the Gopher rules
    (6L, s"<p>$page6</p>", "https://good.com/a?utm_source=x"), // url twin of 1
    (7L, s"<p>$page1 Some extra tail words sit here.</p>",
      "https://fine.org/n")) // near-dup of 1
    .toDF("id", "html", "url")

  private def seed = Seq(
    (1L, 1), (2L, 1), (5L, 0)).toDF("id", "y")

  test("funnel drops the right rows at the right stages") {
    val bl = Seq("bad.com").toDF("entry")
    val (kept, funnel) = Recipes.curate(corpus, "id", "html", "url",
      bl, seed, "y", minJaccard = 0.5)
    val f = funnel.collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(f("input") == 7)
    assert(f("html_to_text") == 6, "the markup-only doc dies here")
    assert(f("blocklist") == 5, "spam.bad.com dies here")
    assert(f("quality_rules") == 4, "the repetition page dies here")
    assert(f("classifier") == 4, "seeded positives pass the tuned cut")
    assert(f("url_dedup") == 3, "the canonical url twin dies here")
    assert(f("near_dedup") == 2, "the near-dup text twin dies here")
    val ids = kept.select("id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L), ids.toString)
    // funnel is nonincreasing
    val counts = funnel.orderBy("step").collect().map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a })
    graft.ml.CacheLifecycle.releaseAll()
  }

  test("curateFunnelByDomain: per-domain docs sum to the funnel per " +
    "stage, and losses attribute to the right domains") {
    val bl = Seq("bad.com").toDF("entry")
    val byDomain = Recipes.curateFunnelByDomain(corpus, "id", "html",
      "url", bl, seed, "y", minJaccard = 0.5)
    val rows = byDomain.collect().map(r =>
      (r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    // stage sums == the global funnel (7,6,5,4,4,3,2)
    val sums = byDomain.groupBy("step").agg(sum("docs").as("s"))
      .orderBy("step").collect().map(_.getLong(1)).toSeq
    assert(sums == Seq(7L, 6L, 5L, 4L, 4L, 3L, 2L), sums.toString)
    // the blocklist loss lands on spam.bad.com's registrable domain
    assert(rows(("html_to_text", "bad.com")) == 1L)
    assert(!rows.contains(("blocklist", "bad.com")),
      "the blocked domain must vanish AT the blocklist stage")
    // the url twin dies on good.com, the near-dup on fine.org
    assert(rows(("classifier", "good.com")) == 2L)
    assert(rows(("url_dedup", "good.com")) == 1L)
    assert(rows(("url_dedup", "fine.org")) == 2L)
    assert(rows(("near_dedup", "fine.org")) == 1L)
    graft.ml.CacheLifecycle.releaseAll()
  }

  test("the recipe is partition-order deterministic") {
    val bl = Seq("bad.com").toDF("entry")
    def run(df: org.apache.spark.sql.DataFrame) = {
      val (kept, _) = Recipes.curate(df, "id", "html", "url", bl,
        seed, "y", minJaccard = 0.5)
      val ids = kept.select("id").collect().map(_.getLong(0)).toSet
      graft.ml.CacheLifecycle.releaseAll()
      ids
    }
    assert(run(corpus.repartition(5)) == run(corpus.coalesce(1)))
  }
}
