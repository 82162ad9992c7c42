package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.Curation

/** Unit coverage for the curation ops beyond their DuckDB oracles: the
  * contamination skew cap and the packing tiling invariants.
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("contamination cap drops stop-phrase shingles from the join") {
    import spark.implicits._
    // "a b c" appears in EVERY doc (a stop phrase); "x y z" only in doc 1
    // and the benchmark
    val docs = Seq(
      (1L, "a b c x y z"),
      (2L, "a b c q r s"),
      (3L, "a b c t u v")).toDF("doc_id", "text")
    val bench = Seq("a b c x y z").toDF("text")
    // uncapped: every doc shares 'a b c' → all three hit at minShared=1
    val uncapped = Curation.contamination(docs, bench, "text", "doc_id",
      k = 3, minShared = 1)
    assert(uncapped.count() == 3)
    // capped at df<=2: 'a b c' (df=3) is dropped; only doc 1 still
    // shares the rare shingles of 'x y z'
    val capped = Curation.contamination(docs, bench, "text", "doc_id",
      k = 3, minShared = 1, maxShingleDocs = 2)
    assert(capped.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("packChunks tiles every document exactly, in order") {
    import spark.implicits._
    val docs = (0L until 40L)
      .map(i => (i, Seq.fill(7 + (i % 5).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = Curation
      .packChunks(docs, "text", "doc_id", chunkTokens = 16, bucketSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3)))
    // every token of every doc is covered exactly once
    val covered = chunks.groupBy(_._1).view.mapValues(
      _.map(c => c._4 - c._3).sum).toMap
    val expected = (0L until 40L).map(i => i -> (7 + (i % 5))).toMap
    assert(covered == expected)
    // chunk capacities are never exceeded and every chunk id in the
    // covered range appears (the stream is gapless)
    val perChunk = chunks.groupBy(_._2).view.mapValues(
      _.map(c => c._4 - c._3).sum).toMap
    val maxChunk = perChunk.keys.max
    (0L until maxChunk).foreach(c =>
      assert(perChunk(c) == 16L, s"chunk $c not full: ${perChunk.get(c)}"))
    assert(perChunk(maxChunk) <= 16L)
  }

  test("domainMix bucketed selection equals the per-domain rank spec") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // skewed domains: a (60 rows), b (30), c (10) — targets 0.5/0.3/0.2
    // → scale = min(60/.5, 30/.3, 10/.2) = 50 → keep 25/15/10
    val docs = ((0L until 60L).map(i => (i, "a")) ++
      (60L until 90L).map(i => (i, "b")) ++
      (90L until 100L).map(i => (i, "c"))).toDF("doc_id", "source")
    val targets = Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)
    // the spec: each source keeps its keepN lowest-(h32, id) rows
    val h = graft.ml.Fns.h32(
      concat(lit("mix"), col("doc_id").cast("string")))
    val ranked = docs.withColumn("__r", row_number().over(
      Window.partitionBy("source").orderBy(h, col("doc_id"))))
    val expected = ranked
      .where(col("__r") <= when(col("source") === "a", 25)
        .when(col("source") === "b", 15).otherwise(10))
      .select("doc_id").as[Long].collect().toSet
    assert(expected.size == 50)
    // the two-level bucketed implementation must select the SAME set,
    // at any bucket granularity (4 forces rows across bucket boundaries)
    for (buckets <- Seq(4, 1024)) {
      val got = Curation.domainMix(docs, "doc_id", "source", targets,
        hashBuckets = buckets).select("doc_id").as[Long].collect()
      assert(got.length == 50, s"buckets=$buckets kept ${got.length}")
      assert(got.toSet == expected, s"buckets=$buckets selected wrong set")
    }
    // a non-positive bucket count would silently reverse bucket order —
    // it must fail loudly instead
    for (bad <- Seq(0, -4))
      intercept[IllegalArgumentException] {
        Curation.domainMix(docs, "doc_id", "source", targets,
          hashBuckets = bad)
      }
  }

  test("filterCascade attributes drops to the FIRST failing gate") {
    import spark.implicits._
    val docs = Seq(
      (1L, Some(10)),  // passes both gates
      (2L, Some(-5)),  // fails gate a (and would fail b — a must win)
      (3L, Some(100)), // passes a, fails b
      (4L, None)       // null score: both predicates are SQL null → fail a
    ).toDF("id", "score")
    val out = Curation.filterCascade(docs, "id", Seq(
      "a" -> (col("score") >= 0),
      "b" -> (col("score") <= 50)))
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), Option(r.getString(2)))))
      .toMap
    assert(out(1L) == ((true, None)))
    assert(out(2L) == ((false, Some("a"))),
      "a doc failing several gates is attributed to the first")
    assert(out(3L) == ((false, Some("b"))))
    assert(out(4L) == ((false, Some("a"))),
      "an unscorable (null) document must fail the gate, not slip past")
    val dup = intercept[IllegalArgumentException] {
      Curation.filterCascade(docs, "id", Seq("x" -> lit(true),
        "x" -> lit(false)))
    }
    assert(dup.getMessage.contains("unique"))
  }

  test("chunkByContent: exact tiling, and an early edit stays local") {
    import spark.implicits._
    val words = (0 until 200).map(i => s"tok$i")
    val base = words.mkString(" ")
    val edited = (words.take(3) ++ Seq("inserted") ++ words.drop(3))
      .mkString(" ")
    val df = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val out = Curation.chunkByContent(df, "text", "doc_id",
      targetTokens = 8)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getString(3)))
    val bc = out.filter(_._1 == 1L).map(_._2)
    val ec = out.filter(_._1 == 2L).map(_._2)
    assert(bc.mkString(" ") == base, "chunks must tile the text exactly")
    assert(ec.mkString(" ") == edited)
    assert(bc.length > 10, s"expected many ~8-token chunks, got ${bc.length}")
    // the CDC property packChunks lacks: boundaries depend only on local
    // 2-grams, so everything past the edit re-aligns — the common chunk
    // SUFFIX covers all but the few chunks touching the insertion
    val common = bc.reverse.zip(ec.reverse).takeWhile { case (a, b) => a == b }
      .length
    assert(common >= bc.length - 2,
      s"an edit at token 3 disturbed ${bc.length - common} of ${bc.length} " +
        "chunks — boundaries must be content-local")
  }

  test("dedupChunks: min-id canonical keeps, twins lose shared chunks") {
    import spark.implicits._
    val words = (0 until 200).map(i => s"tok$i")
    val base = words.mkString(" ")
    val edited = "edited intro " + base
    val df = Seq((1L, base), (2L, edited), (3L, base),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Curation.dedupChunks(df, "text", "doc_id", targetTokens = 8)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L), "no row may be lost")
    // the canonical (min-id) document keeps its full text
    assert(out(1L)._1 == base)
    assert(out(1L)._3 == 0L)
    // an exact twin loses every chunk but keeps its row
    assert(out(3L)._1 == "")
    assert(out(3L)._3 == out(3L)._2 && out(3L)._2 > 0)
    // the edited twin keeps exactly the chunks doc 1 does not own —
    // CDC re-aligns after the insertion, so that is the head region only
    def chunksOf(id: Long, text: String): Seq[String] =
      Curation.chunkByContent(Seq((id, text)).toDF("doc_id", "text"),
        "text", "doc_id", targetTokens = 8)
        .orderBy("chunk_idx").collect().map(_.getString(3)).toSeq
    val c1 = chunksOf(1L, base).toSet
    val expected2 = chunksOf(2L, edited).filterNot(c1).mkString(" ")
    assert(out(2L)._1 == expected2)
    assert(out(2L)._3 > 0 && out(2L)._1.nonEmpty)
    // null text: survives with zero chunks (curation never loses rows)
    assert(out(4L) == (("", 0L, 0L)))
  }

  test("packBins: whole documents, next-fit bins, bounded overflow") {
    import spark.implicits._
    // token counts 5, 7, 4, 6, 9, 3 against binTokens = 10 (null text
    // has no tokens and is excluded, like packChunks)
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e f g"), (3L, "a b c d"),
      (4L, "a b c d e f"), (5L, "a b c d e f g h i"), (6L, "a b c"),
      (7L, null.asInstanceOf[String])).toDF("id", "text")
    val out = Curation.packBins(docs, "text", "id", binTokens = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    // starts: 0,5,12,16,22,31 -> bins 0,0,1,1,2,3
    assert(out.map(t => t._1 -> t._2).toSeq ==
      Seq(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 2L, 6L -> 3L))
    assert(out.map(_._3).toSeq == Seq(0L, 5L, 12L, 16L, 22L, 31L))
    // a doc is never split: one row per tokenized document
    assert(out.length == 6)
    // next-fit overflow is bounded by one document: bin 0 carries 12
    // tokens (5 + 7) against capacity 10 — by design, never more than
    // capacity + the overflowing doc
    val binTotals = out.groupBy(_._2).view.mapValues(_.map(_._4).sum)
    assert(binTotals(0L) == 12L)
    intercept[IllegalArgumentException](
      Curation.packBins(docs, "text", "id", binTokens = 0))
  }

  test("assignSplits: stable hash intervals, loud weight validation") {
    import spark.implicits._
    val docs = (0L until 2000L).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Curation.assignSplits(docs, "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val byName = out.values.groupBy(identity).view.mapValues(_.size)
    // rates are hash-binomial around the weights
    assert(math.abs(byName("train") - 1600) < 120, byName.toString)
    assert(math.abs(byName("val") - 200) < 70, byName.toString)
    assert(math.abs(byName("test") - 200) < 70, byName.toString)
    // STABILITY under corpus growth: a document's split never changes
    // when more documents arrive (the point vs rank-based splitting)
    val grown = Curation.assignSplits((0L until 4000L).toDF("id"), "id",
      splits).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.forall { case (id, s) => grown(id) == s })
    intercept[IllegalArgumentException](
      Curation.assignSplits(docs, "id", Seq("a" -> 0.5, "b" -> 0.4)))
    intercept[IllegalArgumentException](
      Curation.assignSplits(docs, "id", Seq("a" -> 0.5, "a" -> 0.5)))
    intercept[IllegalArgumentException](
      Curation.assignSplits(docs, "id", Seq("a" -> 1.5, "b" -> -0.5)))
  }

  test("shuffleOrder: exact permutation equal to the global hash sort") {
    import spark.implicits._
    val docs = (0L until 500L).toDF("id")
    val out = Curation.shuffleOrder(docs, "id", buckets = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a permutation: every position 0..n-1 exactly once
    assert(out.values.toSeq.sorted == (0L until 500L))
    // equals the rank in the global md5 order (what the two-level scan
    // must reproduce without a corpus-wide window)
    val expected = docs
      .select(col("id"), md5(concat(lit("shuffle"), col("id").cast("string"))).as("h"))
      .orderBy("h", "id").collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> i.toLong }.toMap
    assert(out == expected)
    // bucket count is a parallelism knob, never a semantics knob
    val one = Curation.shuffleOrder(docs, "id", buckets = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == out)
    // a different salt reshuffles
    val other = Curation.shuffleOrder(docs, "id", salt = "epoch2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(other != out)
    assert(other.values.toSeq.sorted == (0L until 500L))
    // past 2^20 buckets the range assignment would lose double
    // precision — refuse loudly
    intercept[IllegalArgumentException](
      Curation.shuffleOrder(docs, "id", buckets = (1 << 20) + 1))
  }

  test("domainMixTemperature flattens toward uniform as t shrinks") {
    import spark.implicits._
    // heavy skew: big (800 rows) vs small (50)
    val docs = ((0L until 800L).map(i => (i, "big")) ++
      (800L until 850L).map(i => (i, "small"))).toDF("doc_id", "source")
    def mix(t: Double, f: Double): Map[String, Long] =
      Curation.domainMixTemperature(docs, "doc_id", "source", t, f)
        .groupBy("source").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // t = 1 keeps natural proportions: every domain's keep rate is
    // exactly outputFraction (hash-binomial noise around f*n)
    val nat = mix(1.0, 0.5)
    assert(math.abs(nat("big") - 400.0) < 60, nat.toString)
    assert(math.abs(nat("small") - 25.0) < 15, nat.toString)
    // t = 0.25 upweights the small domain: its keep RATE must exceed
    // the big domain's (clamped at 1 — never upsampled past its size)
    val flat = mix(0.25, 0.5)
    assert(flat("small").toDouble / 50 > flat("big").toDouble / 800,
      flat.toString)
    assert(flat("small") <= 50)
    // determinism: same inputs, same selection
    assert(mix(0.25, 0.5) == flat)
    // t > 1 (upsampling) and degenerate fractions fail loudly
    intercept[IllegalArgumentException] {
      Curation.domainMixTemperature(docs, "doc_id", "source", 1.5)
    }
    intercept[IllegalArgumentException] {
      Curation.domainMixTemperature(docs, "doc_id", "source", 0.5, 0.0)
    }
  }

  test("extractHost normalizes and never throws on crawl junk") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      "https://www.Example.COM/path?q=1" -> "www.example.com",
      "http://user:pw@host.org:8080/x" -> "host.org",
      "HTTP://SITE.NET./a#frag" -> "site.net",
      "ftp+ssh://files.example.org/f" -> "files.example.org",
      "no-scheme.example.com/path" -> "no-scheme.example.com",
      "https://192.168.0.1:443/admin" -> "192.168.0.1",
      "://" -> null,
      "" -> null,
      null.asInstanceOf[String] -> null)
    val out = cases.map(_._1).toDF("url")
      .select(Curation.extractHost(col("url"))).collect().map(r =>
        if (r.isNullAt(0)) null else r.getString(0))
    cases.map(_._2).zip(out).foreach { case (want, got) =>
      assert(got == want, s"want $want got $got")
    }
  }

  test("registrableDomain: two labels, known multi-label suffixes pass-through") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      "www.example.com" -> "example.com",
      "a.b.news.co.uk" -> "news.co.uk",
      "blog.site7.com.au" -> "site7.com.au",
      "example.org" -> "example.org",
      "localhost" -> "localhost",
      null.asInstanceOf[String] -> null)
    val out = cases.map(_._1).toDF("host")
      .select(Curation.registrableDomain(col("host"))).collect().map(r =>
        if (r.isNullAt(0)) null else r.getString(0))
    cases.map(_._2).zip(out).foreach { case (want, got) =>
      assert(got == want, s"want $want got $got")
    }
  }

  test("canonicalizeUrl collapses page-identity noise, keeps real params") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      "HTTP://User@WWW.Shop.COM:80/a/b/?utm_source=x&b=2&a=1#frag"
        -> "http://www.shop.com/a/b?a=1&b=2",
      "https://shop.com:443/x" -> "https://shop.com/x",
      "https://shop.com:8443/x" -> "https://shop.com:8443/x",
      "http://shop.com:443/x" -> "http://shop.com:443/x",
      "https://shop.com/p?ref=home&gclid=123&fbclid=9"
        -> "https://shop.com/p",
      "https://shop.com/p?b=2&a=1" -> "https://shop.com/p?a=1&b=2",
      "shop.com/p/" -> "shop.com/p",
      "https://shop.com" -> "https://shop.com",
      null.asInstanceOf[String] -> null)
    val out = cases.map(_._1).toDF("url")
      .select(Curation.canonicalizeUrl(col("url"))).collect().map(r =>
        if (r.isNullAt(0)) null else r.getString(0))
    cases.map(_._2).zip(out).foreach { case (want, got) =>
      assert(got == want, s"want $want got $got")
    }
  }

  test("dedupUrls keeps the min id per canonical url, null urls keep") {
    import spark.implicits._
    val docs = Seq(
      (1L, "https://shop.com/p?utm_source=a"),
      (2L, "https://shop.com/p/#top"),
      (3L, "https://shop.com/q"),
      (4L, null.asInstanceOf[String]),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "url")
    val out = Curation.dedupUrls(docs, "url", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> true,
      4L -> true, 5L -> true), s"$out")
  }

  test("domainStats groups by registrable domain with distinct hosts") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "https://www.shop.com/a", 10),
      (2L, "https://blog.shop.com/b", 20),
      (3L, "http://www.shop.com/c", 30),
      (4L, "https://other.org/d", 5),
      (5L, "not a url at all ://", 7)).toDF("doc_id", "url", "w")
    val out = Curation.domainStats(docs, "url", Some("w"))
      .collect().map(r => (Option(r.getString(0)),
        r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out.contains((Some("shop.com"), 3L, 2L, 60L)),
      s"shop.com: $out")
    assert(out.contains((Some("other.org"), 1L, 1L, 5L)))
    // unparseable urls group under null rather than vanishing
    assert(out.exists(t => t._1.isEmpty && t._2 == 1L && t._4 == 7L),
      s"null-domain row: $out")
  }

  test("extractHost nulls IPv6 literals instead of a bogus '[' host") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // the generic capture stops at the first ':' of '[::1]' — a bracket
    // in the capture means the URL used an IPv6 literal and the host
    // must be null (a non-null '[' would poison per-domain quotas)
    val cases = Seq(
      "https://[::1]:8080/x" -> null,
      "http://[2001:db8::1]/a" -> null,
      "https://user@[fe80::2]:443/p?q=1" -> null,
      // a bracket elsewhere never reaches the capture group
      "https://ok.example.com/a[1]" -> "ok.example.com")
    val out = cases.map(_._1).toDF("url")
      .select(Curation.extractHost(col("url"))).collect().map(r =>
        if (r.isNullAt(0)) null else r.getString(0))
    cases.map(_._2).zip(out).foreach { case (want, got) =>
      assert(got == want, s"want $want got $got")
    }
  }

  test("registrableDomainFromTable: longest suffix wins, fallback holds") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      // two-label suffix from the table
      "blog.site1.co.uk" -> "site1.co.uk",
      "a.b.news.co.uk" -> "news.co.uk",
      // deeper suffixes: 3-label k12.ma.us beats us; 4-label
      // pvt.k12.ma.us beats both
      "x.k12.ma.us" -> "x.k12.ma.us",
      "a.x.pvt.k12.ma.us" -> "x.pvt.k12.ma.us",
      // the private-section style entry
      "foo.github.io" -> "foo.github.io",
      // a host that IS a public suffix maps to itself
      "github.io" -> "github.io",
      "k12.ma.us" -> "k12.ma.us",
      // no suffix in the table → last-two-labels fallback
      "a.b.weird.zz" -> "weird.zz",
      "weird.zz" -> "weird.zz",
      // pass-throughs
      "localhost" -> "localhost",
      null.asInstanceOf[String] -> null)
    val out = Curation.registrableDomainFromTable(
      cases.map(_._1).toDF("host"), "host",
      Curation.fixtureSuffixes(spark))
      .select(col("domain")).collect().map(r =>
        if (r.isNullAt(0)) null else r.getString(0))
    cases.map(_._2).zip(out).foreach { case (want, got) =>
      assert(got == want, s"want $want got $got")
    }
    // on hosts whose suffixes are all in the built-in set, the table
    // form must agree with the heuristic registrableDomain
    val hosts = Seq("www.example.com", "a.b.news.co.uk",
      "blog.site7.com.au", "example.org", "localhost").toDF("host")
    val table = Curation.registrableDomainFromTable(hosts, "host",
      Curation.fixtureSuffixes(spark)).select("host", "domain")
    val heur = hosts.select(col("host"),
      Curation.registrableDomain(col("host")).as("domain"))
    assert(table.collect().toSeq.sortBy(_.getString(0)) ==
      heur.collect().toSeq.sortBy(_.getString(0)))
  }

  test("url index: build, probe, append-only update, rebuild") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-url-index-spec").toString
    val prior = Seq(
      (1L, "https://shop.com/p?utm_source=a"), // canonical shop.com/p
      (2L, "https://shop.com/p/#top"),         // same page, id 1 keeps
      (3L, "https://shop.com/q")).toDF("doc_id", "url")
    Curation.buildUrlIndex(prior, "url", "doc_id", dir)
    val idx1 = spark.read.parquet(s"$dir/urls").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(idx1 == Map("https://shop.com/p" -> 1L,
      "https://shop.com/q" -> 3L), s"$idx1")
    val batch = Seq(
      (10L, "https://shop.com/p?fbclid=z"), // dup of the index → drop
      (11L, "https://shop.com/r"),          // new page → keep
      (12L, "https://shop.com/r/"),         // batch-internal dup of 11
      (13L, null.asInstanceOf[String]))     // no url → keep
      .toDF("doc_id", "url")
    val keep = Curation
      .dedupUrlsAgainstIndex(spark, dir, batch, "url", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(keep == Map(10L -> false, 11L -> true, 12L -> false,
      13L -> true), s"$keep")
    // append-only update: the collision keeps the FIRST crawl's id; the
    // new canonical lands with the batch-minimum id; null urls never
    // index
    Curation.updateUrlIndex(spark, dir, batch, "url", "doc_id")
    val idx2 = spark.read.parquet(s"$dir/urls").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(idx2 == Map("https://shop.com/p" -> 1L,
      "https://shop.com/q" -> 3L, "https://shop.com/r" -> 11L), s"$idx2")
    // a batch row colliding with the just-appended url now drops
    val again = Curation.dedupUrlsAgainstIndex(spark, dir,
      Seq((20L, "https://shop.com/r?utm_source=x")).toDF("doc_id", "url"),
      "url", "doc_id").collect()
    assert(again.length == 1 && !again(0).getBoolean(2))
    // rebuild overwrites: the index is exactly the new corpus
    Curation.buildUrlIndex(
      Seq((50L, "https://other.org/a")).toDF("doc_id", "url"),
      "url", "doc_id", dir)
    val idx3 = spark.read.parquet(s"$dir/urls").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(idx3 == Map("https://other.org/a" -> 50L), s"$idx3")
  }

  test("domainMixFromUrls = derive domain + temperature mix, null urls drop") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = (0L until 200L).map { i =>
      val url =
        if (i % 50 == 49) null
        else if (i % 4 == 0) s"https://www.big.com/p/$i"
        else if (i % 4 == 1) s"https://a.big.com/q/$i"
        else if (i % 4 == 2) s"https://small.org/r/$i"
        else s"http://tiny.net/s/$i"
      (i, url)
    }.toDF("doc_id", "url")
    val composed = Curation
      .domainMixFromUrls(docs, "url", "doc_id", temperature = 0.5,
        outputFraction = 0.5)
      .select("doc_id", "domain").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val manual = Curation.domainMixTemperature(
      docs.withColumn("domain",
        Curation.registrableDomain(
          Curation.extractHost(col("url")))),
      "doc_id", "domain", temperature = 0.5, outputFraction = 0.5)
      .select("doc_id", "domain").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(composed == manual)
    assert(composed.nonEmpty)
    assert(composed.values.toSet.subsetOf(
      Set("big.com", "small.org", "tiny.net")), s"${composed.values.toSet}")
  }

  test("domainMixTemperature survives many domains on a derived column") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, concat, lit, pmod}
    // regression: the per-domain thresholds must ship as ONE literal
    // map, not a chained CASE — with a DERIVED source expression the
    // optimizer inlines the expression into every CASE branch, and at
    // a few hundred domains the generated code blew the driver heap
    val docs = (0L until 600L).toDF("doc_id")
      .withColumn("src",
        concat(lit("domain-"), pmod(col("doc_id"), lit(300L))))
    val kept = Curation.domainMixTemperature(docs, "doc_id", "src",
      temperature = 0.5, outputFraction = 0.5)
    assert(kept.count() > 0)
  }

  test("dsirWeights pull toward the target style; gram counts exact") {
    import spark.implicits._
    val docs = ((1L to 4L).map(i =>
      (i, s"alpha beta gamma delta epsilon zeta run $i")) ++
      (5L to 8L).map(i => (i, s"omega psi chi phi upsilon tau run $i")) ++
      Seq((9L, null.asInstanceOf[String])))
      .toDF("doc_id", "text")
    val target = docs.where(col("doc_id") <= 4)
    val out = Curation.dsirWeights(docs, target, "text", "doc_id",
      buckets = 256).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.toString.toDouble))))
      .toMap
    assert(out.keySet == (1L to 9L).toSet, "no row may be lost")
    // 8 tokens → 8 unigrams + 7 bigrams
    assert((1L to 8L).forall(i => out(i)._1 == 15L), s"$out")
    assert(out(9L) == ((0L, None)),
      "null text keeps a row with 0 grams and a null weight")
    val a = (1L to 4L).map(out(_)._2.get)
    val b = (5L to 8L).map(out(_)._2.get)
    assert(a.min > b.max,
      s"target-style docs must outweigh off-style docs: $a vs $b")
  }

  test("domainQualityStats: per-domain doc and keep counts, null " +
    "domain groups too") {
    import spark.implicits._
    val good = ("the quick brown fox jumps over the lazy dog and " +
      "that sentence repeats with fresh words every time so the " +
      "fifty word floor is cleared by ") + (1 to 30)
      .map(i => s"word$i").mkString(" ")
    val rows = Seq(
      (1L, "https://a.example.com/x", good),
      (2L, "https://b.example.com/y", good),
      (3L, "https://a.example.com/z", "too short"),
      (4L, "https://shop.site.co.uk/p", good),
      (5L, "not a url at all", good))
      .toDF("doc_id", "url", "text")
    val out = Curation.domainQualityStats(rows, "url", "text")
      .collect()
      .map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(Some("example.com")) == ((3L, 2L)), out.toString)
    assert(out(Some("site.co.uk")) == ((1L, 1L)))
    assert(out(None) == ((1L, 1L)),
      "unparseable urls aggregate under the null domain")
  }

  test("tokenHistogram: exact power-of-two buckets, zero docs at -1") {
    import spark.implicits._
    val rows = Seq(
      (1L, null.asInstanceOf[String]),
      (2L, ""),
      (3L, "one"),
      (4L, "one two"),
      (5L, "one two three"),
      (6L, "a b c d"),
      (7L, (1 to 8).map("t" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val out = Curation.tokenHistogram(rows, "text").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(-1) == ((2L, 0L)), out.toString)   // null + empty
    assert(out(0) == ((1L, 1L)))                  // 1 token
    assert(out(1) == ((2L, 5L)))                  // 2 and 3 tokens
    assert(out(2) == ((1L, 4L)))                  // exactly 4 → bucket 2
    assert(out(3) == ((1L, 8L)))                  // exactly 8 → bucket 3
  }

  test("qualityPipeline: C4 cleans first, Gopher families judge the " +
    "cleaned text, keep is the conjunction") {
    import spark.implicits._
    // 10 genuinely varied sentences (no shared 5-gram stems — a
    // templated "good" doc would rightly fail the duplicate-5-gram
    // rule) with stopwords → passes all three families
    val good = Seq(
      "The researchers walked along the shore and recorded every " +
        "tide with care.",
      "A quiet library can hold more ideas than any crowded market " +
        "square.",
      "Some of the oldest maps show rivers that have long since " +
        "moved away.",
      "Bright copper kettles whistled softly while the evening meal " +
        "was prepared.",
      "Children often ask questions that the wisest teachers cannot " +
        "answer quickly.",
      "The harvest came early this year because the spring rains " +
        "were generous.",
      "Engineers tested the bridge for weeks before anyone was " +
        "allowed to cross.",
      "Music from the old radio drifted through the open kitchen " +
        "window.",
      "Travelers who learn a few local words are welcomed almost " +
        "everywhere.",
      "That small bakery on the corner still uses its original " +
        "stone oven.").mkString("\n")
    val rows = Seq(
      (1L, good),
      // same prose but with boilerplate junk lines C4 must strip
      // BEFORE the repetition rules run (order matters)
      (2L, good + "\nshort line\n" +
        "Please enable JavaScript to view this content now."),
      (3L, good + "\nLorem ipsum dolor sit amet today."),  // c4 fails
      (4L, (1 to 10).map(_ =>
        "The same exact sentence repeats in this document always.")
        .mkString("\n")))                                  // rep fails
      .toDF("doc_id", "text")
    val out = Curation.qualityPipeline(rows, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"), out(1L).toString)
    assert(out(2L).getAs[Boolean]("keep"),
      "junk lines must be stripped before the repetition verdict")
    assert(out(2L).getAs[String]("text_clean") == good)
    assert(!out(3L).getAs[Boolean]("c4_keep") &&
      !out(3L).getAs[Boolean]("keep"))
    assert(!out(4L).getAs[Boolean]("rep_keep") &&
      !out(4L).getAs[Boolean]("keep"))
  }

  test("perplexityBuckets: per-group terciles, unscoreable docs → tail") {
    import spark.implicits._
    // reference corpus: fluent bigrams "w1 w2 ... w8" style
    val ref = (1L to 20L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    // group A: 3 fluency tiers (exact ref phrase / half on-model /
    // gibberish); group B: all on-model; plus a 1-token doc (no bigram)
    val docs = ((100L to 109L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta theta", "ga")) ++
      (110L to 119L).map(i =>
        (i, "alpha beta gamma delta x" + i + " y" + i, "ga")) ++
      (120L to 129L).map(i =>
        (i, s"q$i r$i s$i t$i u$i v$i", "ga")) ++
      (200L to 205L).map(i =>
        (i, "alpha beta gamma delta epsilon zeta eta theta", "gb")) ++
      Seq((300L, "solo", "ga")))
      .toDF("doc_id", "text", "grp")
    val out = Curation.perplexityBuckets(docs, ref, "text", "doc_id",
      "grp").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("grp"), r.getAs[String]("ppl_bucket"))))
      .toMap
    assert(out.size == 37, "every input doc keeps a row")
    assert((100L to 109L).forall(out(_)._2 == "head"),
      "on-model docs are the head tercile: " + out.toString)
    assert((110L to 119L).forall(out(_)._2 == "middle"))
    assert((120L to 129L).forall(out(_)._2 == "tail"))
    assert(out(300L) == (("ga", "tail")),
      "a doc with no bigrams cannot be scored and lands in tail")
    assert((200L to 205L).forall(out(_)._2 == "head"),
      "a uniform group has identical scores in one bucket; " +
        "cum*3 >= tot makes that bucket head for everyone")
  }

  test("dsirSelect: Gumbel-top-k is deterministic and favors the target") {
    import spark.implicits._
    val docs = ((1L to 10L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta theta")) ++
      (11L to 20L).map(i =>
        (i, "omega psi chi phi upsilon tau sigma rho")))
      .toDF("doc_id", "text")
    val target = docs.where(col("doc_id") <= 10)
    def pick() = Curation.dsirSelect(docs, target, "text", "doc_id",
      k = 6, buckets = 256).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val sel = pick()
    assert(sel.size == 6)
    assert(pick() == sel, "the same salt must select the same set")
    assert(sel.count(_ <= 10L) > sel.count(_ > 10L),
      s"selection must lean toward the target style: $sel")
  }

  test("packChunksBySize: caller-supplied sizes place documents exactly; " +
    "zero-size docs occupy no window") {
    import spark.implicits._
    val sizes = Seq((1L, 10L), (2L, 0L), (3L, 7L), (4L, 5L))
      .toDF("id", "sz")
    val out = Curation.packChunksBySize(sizes, "id", "sz",
      chunkTokens = 8, bucketSize = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // virtual stream: doc1 [0,10), doc3 [10,17), doc4 [17,22)
    assert(out == Set(
      (1L, 0L, 0L, 8L), (1L, 1L, 8L, 10L),
      (3L, 1L, 0L, 6L), (3L, 2L, 6L, 7L),
      (4L, 2L, 0L, 5L)), out.toString)
    // packChunks is the whitespace-token instance of the same scan
    val docs = Seq((1L, "a b c"), (2L, "x y")).toDF("id", "text")
    val viaText = Curation.packChunks(docs, "text", "id", 4, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaSize = Curation.packChunksBySize(
      Seq((1L, 3L), (2L, 2L)).toDF("id", "sz"), "id", "sz", 4, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaText == viaSize)
  }

  test("packTokenIds: the flattened id stream agrees with the window " +
    "assignment, positions are dense and in-range") {
    import spark.implicits._
    // doc 1: tokens at pos 0,1 with 3+2 pieces; doc 2: empty arrays
    // only (occupies no window); doc 3: 4 pieces
    val enc = Seq(
      (1L, 0L, Seq(10L, 11L, 12L)), (1L, 1L, Seq(13L, 14L)),
      (2L, 0L, Seq.empty[Long]),
      (3L, 0L, Seq(20L, 21L)), (3L, 1L, Seq(22L, 23L)))
      .toDF("doc_id", "tok_pos", "piece_ids")
    val out = Curation.packTokenIds(enc, "doc_id", chunkTokens = 4,
      bucketSize = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._2, t._3))
    // stream: doc1 ids 10..14 at gpos 0..4, doc3 ids 20..23 at 5..8
    assert(out.toSeq === Seq(
      (1L, 0L, 0L, 10L), (1L, 0L, 1L, 11L), (1L, 0L, 2L, 12L),
      (1L, 0L, 3L, 13L),
      (1L, 1L, 0L, 14L), (3L, 1L, 1L, 20L), (3L, 1L, 2L, 21L),
      (3L, 1L, 3L, 22L),
      (3L, 2L, 0L, 23L)), out.mkString(","))
    // agreement with the window assignment over the same sizes
    val sizes = Seq((1L, 5L), (3L, 4L)).toDF("id", "sz")
    val ranges = Curation.packChunksBySize(sizes, "id", "sz", 4, 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(3) - r.getLong(2))).toMap
    val counts = out.groupBy(t => (t._1, t._2))
      .view.mapValues(_.length.toLong).toMap
    assert(counts === ranges)
  }

  test("packTokenIds with sepId: one trailing separator per non-empty " +
    "doc, sizes grow in lockstep, empty docs emit none") {
    import spark.implicits._
    val enc = Seq(
      (1L, 0L, Seq(10L, 11L, 12L)), (1L, 1L, Seq(13L, 14L)),
      (2L, 0L, Seq.empty[Long]),
      (3L, 0L, Seq(20L, 21L)), (3L, 1L, Seq(22L, 23L)))
      .toDF("doc_id", "tok_pos", "piece_ids")
    val out = Curation.packTokenIds(enc, "doc_id", chunkTokens = 4,
      bucketSize = 2, sepId = Some(99L))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._2, t._3))
    // stream: doc1 ids 10..14 + SEP at gpos 0..5, doc3 20..23 + SEP
    // at 6..10 — the separator shifts every later doc's placement
    assert(out.toSeq === Seq(
      (1L, 0L, 0L, 10L), (1L, 0L, 1L, 11L), (1L, 0L, 2L, 12L),
      (1L, 0L, 3L, 13L),
      (1L, 1L, 0L, 14L), (1L, 1L, 1L, 99L), (3L, 1L, 2L, 20L),
      (3L, 1L, 3L, 21L),
      (3L, 2L, 0L, 22L), (3L, 2L, 1L, 23L), (3L, 2L, 2L, 99L)),
      out.mkString(","))
    // exactly one separator per non-empty doc; doc 2 (empty) none
    val seps = out.filter(_._4 == 99L)
    assert(seps.map(_._1).toSeq.sorted === Seq(1L, 3L))
    // each doc's separator is its LAST placed piece
    val lastByDoc = out.groupBy(_._1).view
      .mapValues(_.maxBy(t => (t._2, t._3))).toMap
    assert(lastByDoc(1L)._4 == 99L && lastByDoc(3L)._4 == 99L)
  }

  test("packMultimodalIds: slots splice after their anchor token as " +
    "boi/img×n/eoi runs; media-only docs pack; separators trail") {
    import spark.implicits._
    val enc = Seq(
      (1L, 0L, Seq(10L, 11L)), (1L, 1L, Seq(12L)))
      .toDF("doc_id", "tok_pos", "piece_ids")
    // doc 1: one slot anchored after token 0 (2 placeholders);
    // doc 2: no text at all, one slot — a pure-image document
    val media = Seq((1L, 0L, 2L), (2L, 0L, 1L))
      .toDF("doc_id", "media_pos", "n_media_tokens")
    val out = Curation.packMultimodalIds(enc, media, "doc_id",
      chunkTokens = 4, imgId = 91L, boiId = 90L, eoiId = 92L,
      bucketSize = 2, sepId = Some(99L))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._2, t._3))
    // doc1 stream: 10,11 | 90,91,91,92 | 12 | 99 — the run sits
    // BETWEEN token 0's and token 1's pieces; doc2: 90,91,92,99
    assert(out.toSeq === Seq(
      (1L, 0L, 0L, 10L), (1L, 0L, 1L, 11L), (1L, 0L, 2L, 90L),
      (1L, 0L, 3L, 91L),
      (1L, 1L, 0L, 91L), (1L, 1L, 1L, 92L), (1L, 1L, 2L, 12L),
      (1L, 1L, 3L, 99L),
      (2L, 2L, 0L, 90L), (2L, 2L, 1L, 91L), (2L, 2L, 2L, 92L),
      (2L, 2L, 3L, 99L)), out.mkString(","))
  }

  test("curriculumOrder: phase-major dense positions, within-phase " +
    "hash order, unbounded phases refused") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, i % 3)).toDF("id", "ph")
    val out = Curation.curriculumOrder(docs, "id", "ph", buckets = 4)
      .select("id", "phase", "pos").as[(Long, Long, Long)]
      .collect().sortBy(_._3)
    // dense 0..n-1 and phase-monotone: every phase-p row precedes
    // every phase-(p+1) row
    assert(out.map(_._3).toSeq === (0L until 40L))
    assert(out.map(_._2).toSeq === out.map(_._2).toSeq.sorted)
    // within a phase the order is exactly (md5(salt||id), id)
    def h(i: Long) = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"curriculum$i".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val phase0 = out.filter(_._2 == 0L).map(_._1)
    assert(phase0.toSeq === phase0.sortBy(i => (h(i), i)).toSeq)
    // a negative phase refuses loudly
    intercept[IllegalArgumentException] {
      Curation.curriculumOrder(
        Seq((1L, -1L)).toDF("id", "ph"), "id", "ph")
    }
    // a phase table too wide for the bounded broadcast refuses
    intercept[IllegalArgumentException] {
      Curation.curriculumOrder(
        (0L until 3L).map(i => (i, i)).toDF("id", "ph"), "id", "ph",
        buckets = 1 << 20)
    }
  }

  test("languagePlan: langid labels key the water-filling, unknown drops") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat and the dog it is"),
      (2L, "der hund ist und bleibt zu"),
      (3L, "zzz qqq biz"),
      (4L, "the fish and it of the sea"))
      .toDF("id", "text")
    val plan = Curation.languagePlan(docs, "text", budgetTokens = 20,
      maxEpochs = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // en: 14 tokens (w6 3741657), de: 6 (w6 2449490); shares
    // floor(20·w/Σw) = 12 and 7 — both under their 2-epoch caps
    assert(plan.keySet == Set("en", "de"),
      s"unknown must drop before planning: $plan")
    assert(plan("en") == ((14L, 12L, 857142L)), plan.toString)
    assert(plan("de") == ((6L, 7L, 1166666L)), plan.toString)
  }

  test("epochPlan: caps bind, surplus redistributes, budget met") {
    import spark.implicits._
    // sqrt weighting over-asks the tiny sources; they cap at 2 epochs
    // and the surplus water-fills back to the big one
    val docs = ((1 to 100).map(i => (s"d$i", "big", ("w " * 20).trim)) ++
      (1 to 5).map(i => (s"s$i", "tiny1", ("w " * 10).trim)) ++
      (1 to 5).map(i => (s"t$i", "tiny2", ("w " * 10).trim)))
      .toDF("id", "source", "text")
    def planOf(df: org.apache.spark.sql.DataFrame) =
      Curation.epochPlan(df, "source", "text", budgetTokens = 1000,
        maxEpochs = 2).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val plan = planOf(docs)
    plan.foreach { case (_, (n, take, ppm)) =>
      assert(take <= 2 * n, "no source beyond the epoch cap")
      assert(ppm == take * 1000000L / n)
    }
    assert(plan("tiny1")._2 == 100 && plan("tiny2")._2 == 100,
      "over-asked tiny sources take exactly cap x tokens")
    assert(plan("big")._2 == 800, "the surplus redistributes")
    assert(plan.values.map(_._2).sum == 1000, "budget met exactly here")
    // infeasible budget: every source caps, plan reports the achievable
    val all = Curation.epochPlan(docs, "source", "text",
      budgetTokens = 100000, maxEpochs = 2).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(all.forall { case (n, take) => take == 2 * n })
    // partition-order independence (exact integer arithmetic)
    assert(planOf(docs.repartition(7)) == plan)
  }

  test("epochPlan: budget x weight beyond 2^63 must not wrap " +
    "(BigInt share numerator)") {
    import spark.implicits._
    // 10,000-token source -> w6 = 1e8; budget 1e11 -> the share
    // numerator is 1e19 > Long.MaxValue. 64-bit arithmetic wraps it
    // negative (negative takes, empty cap set); the BigInt numerator
    // yields the exact floor shares.
    val docs = Seq(
      ("a", "A", ("w " * 10000).trim),
      ("b", "B", ("w " * 2500).trim)).toDF("id", "source", "text")
    val plan = Curation.epochPlan(docs, "source", "text",
      budgetTokens = 100000000000L, maxEpochs = 10000000)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // round 1 shares (1e19-numerator products): B's 1e11·5e7/1.5e8 =
    // 3.33e10 exceeds its 2.5e10 cap -> B caps, the 7.5e10 surplus
    // water-fills to A. The wrapped 64-bit product would find NO cap
    // and emit negative takes.
    assert(plan("A") == ((10000L, 75000000000L, 7500000000000L)))
    assert(plan("B") == ((2500L, 25000000000L, 10000000000000L)))
    // same budget with a binding cap: everything caps, takes stay
    // positive and exact (the wrapped product would skip every cap)
    val capped = Curation.epochPlan(docs, "source", "text",
      budgetTokens = 100000000000L, maxEpochs = 4)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(capped == Map("A" -> 40000L, "B" -> 10000L))
  }

  test("htmlToText: scripts drop with content, entities decode once") {
    import spark.implicits._
    val rows = Seq(
      (1L, "<html><body><p>Hello <b>world</b></p></body></html>"),
      (2L, "<SCRIPT>if (a < b && c > d) alert('x');</SCRIPT>text"),
      (3L, "<style>p{color:red}</style>styled"),
      (4L, "<!-- a\nmultiline comment -->kept"),
      (5L, "&amp;lt; stays literal; &lt;i&gt; decodes; a&nbsp;b"),
      (6L, "no markup at   all"),
      (7L, null.asInstanceOf[String]))
      .toDF("id", "html")
    val out = rows.select(col("id"),
        graft.ml.Curation.htmlToText(col("html")).as("t"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L) == Some("Hello world"))
    assert(out(2L) == Some("text"),
      "script CONTENT (with < > inside) must drop, any tag case")
    assert(out(3L) == Some("styled"))
    assert(out(4L) == Some("kept"), "comments drop across newlines")
    assert(out(5L) == Some("&lt; stays literal; <i> decodes; a b"),
      "&amp;-last ordering: double-encoded entities never re-decode")
    assert(out(6L) == Some("no markup at all"), "whitespace collapses")
    assert(out(7L).isEmpty, "null in, null out")
  }

  test("applyDomainBlocklist: subdomain-inclusive, longest entry wins") {
    import spark.implicits._
    val hosts = Seq(
      (1L, "example.com"),          // exact entry hit
      (2L, "a.b.example.com"),      // subdomain of an entry
      (3L, "ads.example.com"),      // deeper entry beats the shallower one
      (4L, "notexample.com"),       // label boundary: NOT a suffix match
      (5L, "clean.org"),            // no entry
      (6L, null.asInstanceOf[String])) // junk host: never blocked
      .toDF("id", "host")
    val bl = Seq("example.com", "ads.example.com").toDF("entry")
    val out = Curation.applyDomainBlocklist(hosts, "host", bl)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(r.fieldIndex("blocked")),
          Option(r.getString(r.fieldIndex("blocked_by"))))).toMap
    assert(out(1L) == (true, Some("example.com")))
    assert(out(2L) == (true, Some("example.com")))
    assert(out(3L) == (true, Some("ads.example.com")),
      "the most specific entry must win provenance")
    assert(out(4L) == (false, None),
      "suffix matching must respect label boundaries")
    assert(out(5L) == (false, None))
    assert(out(6L) == (false, None), "null hosts are never blocked")
    // empty blocklist: everything clean, schema intact
    val none = Curation.applyDomainBlocklist(hosts, "host",
      spark.emptyDataFrame.select(lit("x").as("entry")).where(lit(false)))
    assert(none.where(col("blocked")).count() == 0)
  }

  test("publicSuffixList: the vendored real snapshot loads with " +
    "literal, wildcard and exception rules") {
    val psl = Curation.publicSuffixList(spark)
    val byKind = psl.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind("literal") > 9000,
      s"the real PSL has ~9.6k literal rules: $byKind")
    assert(byKind("wildcard") > 10 && byKind("exception") > 2, byKind)
    val rules = psl.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rules.contains(("com", "literal")))
    assert(rules.contains(("co.uk", "literal")))
    assert(rules.contains(("ck", "wildcard")), "*.ck")
    assert(rules.contains(("www.ck", "exception")), "!www.ck")
    assert(rules.contains(("github.io", "literal")),
      "private-section rules load too")
    // IDN rules normalize to punycode at parse time (the publicsuffix
    // .org algorithm matches on punycode labels; crawl hosts carry
    // xn-- forms, so a Unicode rule kept verbatim could never fire)
    assert(rules.contains(("xn--55qx5d.cn", "literal")),
      "公司.cn must load as its punycode form")
    assert(!rules.exists(_._1.exists(_ >= 128)),
      "no Unicode rule may survive parsing un-normalized")
  }

  test("languageMix: langId predictions key per-language quotas; " +
    "unknown and untargeted languages drop") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 8 clearly-English docs, 4 German, 2 un-identifiable
    val docs = ((1 to 8).map(i => (i.toLong, s"the of and it doc$i")) ++
      (9 to 12).map(i => (i.toLong, s"der und ist zu doc$i")) ++
      Seq((13L, "zz qq"), (14L, "mmm nnn")))
      .toDF("id", "text")
    val out = Curation.languageMix(docs, "text", "id",
      Map("en" -> 0.5, "de" -> 0.5))
    val byLang = out.groupBy("lang_pred").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // scale = min(8/0.5, 4/0.5) = 8 -> keep 4 en + 4 de, drop unknown
    assert(byLang == Map("en" -> 4L, "de" -> 4L), byLang.toString)
    // deterministic: same selection both runs
    val ids1 = out.select("id").collect().map(_.getLong(0)).toSet
    val ids2 = Curation.languageMix(docs, "text", "id",
      Map("en" -> 0.5, "de" -> 0.5))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    graft.ml.CacheLifecycle.releaseAll()
  }

  test("domainStats through the vendored PSL: exotic hosts group " +
    "correctly where the heuristic is provably wrong") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // *.kawasaki.jp: a.city... and b.city... belong to ONE registrable
    // domain (city.kawasaki.jp via the !city exception); user.github.io
    // and other.github.io are TWO domains (private-section suffix).
    // The last-two-labels heuristic merges the github.io pair into one
    // and splits the kawasaki pair from its sibling c.x.kawasaki.jp
    // cases entirely differently.
    val docs = Seq(
      (1L, "https://a.city.kawasaki.jp/p"),
      (2L, "https://b.city.kawasaki.jp/q"),
      (3L, "https://user.github.io/r"),
      (4L, "https://other.github.io/s")).toDF("doc_id", "url")
    val psl = Curation.publicSuffixList(spark)
    val viaPsl = Curation.domainStats(docs, "url", None, Some(psl))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaPsl == Map(
      "city.kawasaki.jp" -> 2L,
      "user.github.io" -> 1L,
      "other.github.io" -> 1L), viaPsl.toString)
    val viaHeuristic = Curation.domainStats(docs, "url")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaHeuristic == Map(
      // WRONG both ways: the kawasaki pair loses its city.* registrable
      // level, and two github users collapse into one pseudo-domain
      "kawasaki.jp" -> 2L,
      "github.io" -> 2L),
      viaHeuristic.toString)
    graft.ml.CacheLifecycle.releaseAll()
  }

  test("registrableDomainPsl: punycode hosts resolve through IDN " +
    "rules — the multi-label Unicode suffix fires") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val psl = Curation.publicSuffixList(spark)
    // 公司.cn == xn--55qx5d.cn is a 2-label PSL rule: the registrable
    // domain of shop.example.xn--55qx5d.cn is example.xn--55qx5d.cn —
    // the last-two-labels fallback (what an unconverted Unicode rule
    // would degrade to) answers xn--55qx5d.cn instead
    val hosts = Seq("shop.example.xn--55qx5d.cn",
      "example.xn--55qx5d.cn", "xn--55qx5d.cn").toDF("host")
    val out = Curation.registrableDomainPsl(hosts, "host", psl)
      .select(col("host"), col("domain")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("shop.example.xn--55qx5d.cn") == "example.xn--55qx5d.cn")
    assert(out("example.xn--55qx5d.cn") == "example.xn--55qx5d.cn")
    assert(out("xn--55qx5d.cn") == "xn--55qx5d.cn",
      "a host that IS the suffix maps to itself")
  }

  test("registrableDomainPsl: full PSL semantics — wildcards, " +
    "exceptions, longest match, fallback") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val psl = Curation.publicSuffixList(spark)
    val cases = Seq(
      "foo.bar.com" -> "bar.com", // default literal TLD
      "a.b.co.uk" -> "b.co.uk", // multi-label literal
      "co.uk" -> "co.uk", // host IS a public suffix
      // *.ck wildcard: any.ck is itself a suffix, so one MORE label
      // is the registrable domain
      "x.y.ck" -> "x.y.ck",
      "y.ck" -> "y.ck", // wildcard-matched suffix maps to itself
      // !www.ck exception: suffix is ck, so www.ck registers
      "www.ck" -> "www.ck",
      "foo.www.ck" -> "www.ck",
      // *.kawasaki.jp + !city.kawasaki.jp
      "a.city.kawasaki.jp" -> "city.kawasaki.jp",
      "city.kawasaki.jp" -> "city.kawasaki.jp",
      "a.x.kawasaki.jp" -> "a.x.kawasaki.jp",
      // private-section rule
      "user.github.io" -> "user.github.io",
      // no match: last-two fallback (the spec's implicit * rule)
      "internal.corp" -> "internal.corp",
      "db.internal.corp" -> "internal.corp",
      "localhost" -> "localhost") // single label passes through
    val df = cases.map(_._1).toDF("host")
    val out = Curation.registrableDomainPsl(df, "host", psl)
      .select(col("host"), col("domain")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (h, want) =>
      assert(out(h) == want, s"$h: got ${out(h)}, want $want")
    }
    // null host passes through; partition count does not matter
    val withNull = (cases.map(_._1) :+ null).toDF("host")
    val out2 = Curation.registrableDomainPsl(
      withNull.repartition(5), "host", psl)
    assert(out2.where(col("host").isNull && col("domain").isNull)
      .count() == 1)
    assert(out2.count() == cases.size + 1,
      "broadcast classes must never duplicate corpus rows")
  }

  test("corpusDiff: all four statuses, fingerprints are content-" +
    "sensitive, the only exchange is the id equi-join") {
    import spark.implicits._
    val prev = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val next = Seq((2L, "beta"), (3L, "gamma RERENDERED"), (4L, "delta"))
      .toDF("doc_id", "text")
    val d = Curation.corpusDiff(prev, next, "doc_id", "text")
    val st = d.select("doc_id", "status").as[(Long, String)]
      .collect().toMap
    assert(st === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
    // removed rows carry only prev_fp, added only next_fp
    val r = d.where(col("doc_id") === 1).select("prev_fp", "next_fp")
      .as[(Option[String], Option[String])].head()
    assert(r._1.nonEmpty && r._2.isEmpty)
    val p = d.queryExecution.executedPlan.toString
    assert(!p.contains("Window") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    // summary folds to exactly the four statuses
    val sm = Curation.corpusDiffSummary(prev, next, "doc_id", "text")
      .as[(String, Long)].collect().toMap
    assert(sm === Map("added" -> 1L, "removed" -> 1L,
      "changed" -> 1L, "unchanged" -> 1L))
  }

  test("fp index: latest-batch-wins fold, churn-only deltas, " +
    "index side only ever semi-probed") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-fp-spec").toString
    val snap = Seq((1L, "one"), (2L, "two"), (3L, "three"))
      .toDF("doc_id", "text")
    Curation.buildFpIndex(snap, "doc_id", "text", dir)
    // batch 1: doc 2 re-rendered, doc 4 added, doc 1 unchanged
    Curation.updateFpIndex(spark,
      dir, Seq((1L, "one"), (2L, "two B"), (4L, "four"))
        .toDF("doc_id", "text"), "doc_id", "text")
    // only the churn appended: 3 build rows + 2 delta rows
    assert(spark.read.parquet(s"$dir/fps").count() === 5)
    // probe: doc 2's CURRENT state is 'two B' (the fold must pick the
    // delta over the build row), doc 3 untouched, doc 5 new
    val d = Curation.diffAgainstFpIndex(spark, dir,
      Seq((2L, "two B"), (2L, "two"), (3L, "three"), (5L, "five"))
        .toDF("doc_id", "text").where(col("doc_id") =!= 2 ||
          col("text") === "two B"),
      "doc_id", "text")
    val st = d.select("doc_id", "status").as[(Long, String)]
      .collect().toMap
    assert(st === Map(2L -> "unchanged", 3L -> "unchanged",
      5L -> "added"))
    // a probe against the stale content reads 'changed'
    val stale = Curation.diffAgainstFpIndex(spark, dir,
      Seq((2L, "two")).toDF("doc_id", "text"), "doc_id", "text")
      .select("status").as[String].head()
    assert(stale === "changed")
    val p = d.queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"),
      "the index scan must semi-probe the broadcast batch keys:\n" +
        p.take(1200))
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      p.take(1200))
  }
}
