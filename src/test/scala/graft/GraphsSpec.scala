package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.Graphs

/** Link-graph operators: PageRank's exact integer iterations must rank
  * hubs above leaves, survive dangling nodes, and be partition-order
  * independent; href extraction must handle both quote forms and any
  * attribute case.
  */
class GraphsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  test("pageRank: the pointed-at hub outranks the pointers") {
    // a, b, c, d all link to hub; hub links to a (so it isn't dangling)
    val edges = Seq(
      ("a", "hub"), ("b", "hub"), ("c", "hub"), ("d", "hub"),
      ("hub", "a")).toDF("src", "dst")
    val r = Graphs.pageRank(edges, "src", "dst", iters = 5)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r.size == 5)
    assert(Seq("a", "b", "c", "d").forall(v => r("hub") > r(v)),
      r.toString)
    // a receives the hub's whole mass, so it outranks b/c/d
    assert(r("a") > r("b") && r("b") == r("c") && r("c") == r("d"))
  }

  test("pageRank: dangling sinks keep and redistribute mass") {
    // sink has no outlinks: its mass must re-enter the graph instead of
    // silently accumulating or erroring
    val edges = Seq(("a", "sink"), ("b", "sink")).toDF("src", "dst")
    val r = Graphs.pageRank(edges, "src", "dst", iters = 3)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("sink") > r("a"), r.toString)
    assert(r.values.forall(_ > 0), "every node keeps positive rank")
  }

  test("pageRank: exact integers make topology irrelevant") {
    val edges = (1 to 60).map(i => (s"n${i % 12}", s"n${(i * 7) % 12}"))
      .toDF("src", "dst")
    def run(df: org.apache.spark.sql.DataFrame) =
      Graphs.pageRank(df, "src", "dst", iters = 4)
        .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(run(edges.repartition(13)) == run(edges.coalesce(1)))
  }

  test("extractAnchors pairs hrefs with their text; index sorts + caps") {
    val html = Seq(
      (1L, """<a class=l href="http://a.com/x">Alpha</a>""" +
        """ <A HREF='http://b.org'>Beta</A> <a href="http://a.com/y">Zed</a>"""),
      (2L, """<a href="http://sub.a.com">Gamma</a> <a href="junk">j</a>"""))
      .toDF("id", "html")
    val anchors = Graphs.extractAnchors(html, "html", "id")
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(anchors == Set(
      ("http://a.com/x", "Alpha"), ("http://b.org", "Beta"),
      ("http://a.com/y", "Zed"), ("http://sub.a.com", "Gamma"),
      ("junk", "j")), anchors.toString)
    val idx = Graphs.anchorIndex(
      Graphs.extractAnchors(html, "html", "id"), "href", "anchor",
      maxAnchors = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getSeq[String](2).toList))).toMap
    // subdomain rolls into the registrable domain; unparseable href drops
    assert(idx("a.com") == ((3L, List("Alpha", "Gamma"))),
      s"sorted and capped at 2: $idx")
    assert(idx("b.org") == ((1L, List("Beta"))))
    assert(!idx.contains("junk") || idx.get("junk").isEmpty)
  }

  test("extractLinks: both quote forms, any case, multiple per doc") {
    val html = Seq((1L,
      """<a href="x.com">1</a> <A HREF='y.org'>2</A> href=z notattr""" +
        """ <a data-href="no">n</a> <a href="">empty</a>"""))
      .toDF("id", "html")
    val links = Graphs.extractLinks(html, "html", "id")
      .collect().map(_.getString(1)).toSeq
    assert(links.sorted == Seq("", "x.com", "y.org"),
      s"got $links: bare href= and data-href must not match; " +
        "empty quoted values do")
  }

  test("domainLinkQuality: diversity is distinct whitespace terms per " +
    "link; unranked domains score zero quality") {
    // spam.org: 4 in-links, one repeated phrase (2 distinct terms) ->
    // diversity 500000 ppm. good.com: 2 in-links, 6 distinct terms ->
    // diversity 3000000 ppm. noauth.net is absent from the authority
    // table -> authority 0, quality 0.
    val links = Seq(
      ("https://www.spam.org/a", "buy cheap"),
      ("https://spam.org/b", "buy cheap"),
      ("https://spam.org/c", "buy  cheap"), // runs mint no empty terms
      ("https://spam.org/d", "Buy CHEAP"), // case folds
      ("https://good.com/x", "rust compiler internals"),
      ("https://good.com/y", "borrow checker notes"),
      ("https://noauth.net/z", "one link"))
      .toDF("href", "anchor")
    val auth = Seq(("spam.org", 2000000L), ("good.com", 8000000L))
      .toDF("domain", "authority")
    val out = Graphs.domainLinkQuality(links, "href", "anchor", auth)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(out("spam.org") ==
      ((4L, 2L, 500000L, 2000000L, (2000L * 500000L) / 1000L)))
    assert(out("good.com") ==
      ((2L, 6L, 3000000L, 8000000L, (8000L * 3000000L) / 1000L)))
    assert(out("noauth.net") == ((1L, 2L, 2000000L, 0L, 0L)))
    graft.ml.CacheLifecycle.releaseAll()
  }

  test("domainLinkQuality: degenerate mega-anchor diversity clamps at " +
    "1e7 ppm — quality never wraps negative at the 1e12 rank scale") {
    // one in-link whose anchor carries 10,001 distinct terms: unclamped
    // diversity would read ~1e10 ppm and (1e12 div 1000) * 1e10 would
    // overflow 2^63 into a negative quality
    val megaAnchor = (0 until 10001).map(i => s"t$i").mkString(" ")
    val links = Seq(("https://stuffed.com/x", megaAnchor))
      .toDF("href", "anchor")
    val auth = Seq(("stuffed.com", Graphs.RankScale)) // full 1e12 scale
      .toDF("domain", "authority")
    val r = Graphs.domainLinkQuality(links, "href", "anchor", auth)
      .collect().head
    assert(r.getAs[Long]("diversity_ppm") == 10000000L,
      "diversity clamps at 1e7 ppm")
    val q = r.getAs[Long]("quality")
    assert(q == (Graphs.RankScale / 1000L) * 10000000L / 1000L)
    assert(q > 0 && q < (1L << 53),
      s"quality $q must stay positive and Double-exact")
    graft.ml.CacheLifecycle.releaseAll()
  }

  test("mixByLinkQuality: keeps documents in proportion to quality; " +
    "zero-quality domains drop") {
    // quality A=200, B=100, C=0; corpus 10 A + 10 B + 5 C.
    // scale = min(10/200, 10/100) = 0.05 -> keep 10 A, 5 B, 0 C.
    val quality = Seq(
      ("a.com", 20L, 40L, 2000000L, 100000L, 200L),
      ("b.org", 10L, 10L, 1000000L, 100000L, 100L),
      ("c.net", 5L, 5L, 1000000L, 0L, 0L))
      .toDF("domain", "n_links", "n_anchor_terms", "diversity_ppm",
        "authority", "quality")
    val corpus = ((1 to 10).map(i => (i.toLong, "a.com")) ++
      (11 to 20).map(i => (i.toLong, "b.org")) ++
      (21 to 25).map(i => (i.toLong, "c.net")))
      .toDF("doc_id", "domain")
    val sel = Graphs.mixByLinkQuality(corpus, "doc_id", "domain",
      quality).groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sel == Map("a.com" -> 10L, "b.org" -> 5L), sel.toString)
    // all-zero quality must refuse loudly, not select nothing
    val e = intercept[IllegalArgumentException](
      Graphs.mixByLinkQuality(corpus, "doc_id", "domain",
        quality.where(col("domain") === "c.net")))
    assert(e.getMessage.contains("no positive-quality"))
  }
}
