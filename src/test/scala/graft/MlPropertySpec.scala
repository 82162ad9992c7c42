package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.ml.{Curation, Dedup}

/** Property tests for the curation operators whose CONTRACTS are
  * invariants, not example tables: the winnowing shared-run guarantee
  * and URL-canonicalization idempotence/order-insensitivity.
  * Deterministic ScalaCheck sampling (fixed seed), same convention as
  * `ExprPropertySpec`.
  */
class MlPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def forAll[A](gen: Gen[A], n: Int = 10)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      val seed = Seed(0xA11CEL + i)
      f(gen.pureApply(Gen.Parameters.default, seed))
    }

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa", "mu", "nu", "xi", "pi")
  private val words = Gen.listOfN(14, word).map(_.mkString(" "))

  test("sketch laws hold on arbitrary value multisets") {
    import graft.ml.Sketches
    val multiset =
      Gen.listOfN(60, Gen.zip(Gen.choose(0, 40), Gen.choose(1, 5)))
        .map(_.flatMap { case (v, n) => List.fill(n)(s"val$v") })
    forAll(Gen.zip(multiset, multiset), n = 6) { case (xs, ys) =>
      val a = xs.toDF("v")
      val b = ys.toDF("v")
      // HLL merge law: merge of sketches == sketch of the union,
      // register for register (so estimates are equal too)
      val merged = Sketches.hllMerge(
        Sketches.hllRegisters(a, $"v", Nil, 6),
        Sketches.hllRegisters(b, $"v", Nil, 6), Nil)
        .orderBy("bucket").collect().toSeq
      val direct = Sketches.hllRegisters(a.union(b), $"v", Nil, 6)
        .orderBy("bucket").collect().toSeq
      assert(merged === direct)
      // KMV below-k exactness: k above the value-domain size means the
      // estimate IS the distinct count
      val exact = xs.distinct.size.toLong
      val kmv = Sketches.kmvDistinct(a, $"v", Nil, 64)
        .as[(Long, Long)].head()
      assert(kmv === ((exact, exact)))
      // CMS upper bound: every estimate >= the true count, and exact
      // when the grid is wide enough to avoid all-row collisions
      val freq = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val hh = Sketches.cmsHeavyHitters(a, $"v", 4, 8, 1L)
        .as[(String, Long, Long)].collect()
      assert(hh.length === exact.toInt)
      hh.foreach { case (v, ex, est) =>
        assert(ex === freq(v))
        assert(est >= ex, s"$v: est $est < exact $ex")
      }
    }
  }

  test("winnowing guarantee: any shared w+k-1 run shares a fingerprint") {
    // k=5, w=4 → guarantee window 8 tokens; the run lands at a random
    // offset inside two otherwise-independent documents
    val gen = Gen.zip(words, words, Gen.listOfN(8, word))
    forAll(gen) { case (a, b, runWords) =>
      val run = runWords.mkString(" ")
      val docs = Seq((1L, s"$a $run"), (2L, s"$run $b"))
        .toDF("doc_id", "text")
      val by = Dedup.winnowing(docs, "text", "doc_id")
        .collect().groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getLong(2)).toSet).toMap
      assert(by(1L).intersect(by(2L)).nonEmpty,
        s"guarantee violated for run '$run' in\n  '$a'\n  '$b'")
    }
  }

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "")
    up <- Gen.oneOf("", "user@", "u:p@")
    host <- Gen.oneOf("Site.com", "www.ex.co.uk", "A.B.ORG")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    path <- Gen.oneOf("", "/", "/a/b", "/a/b///")
    qs <- Gen.someOf(Seq("x=1", "utm_source=t", "b=2", "gclid=z", "a=3"))
    frag <- Gen.oneOf("", "#frag", "#")
  } yield {
    val s = if (scheme.isEmpty) "" else s"$scheme://"
    val q = if (qs.isEmpty) "" else qs.mkString("?", "&", "")
    s"$s$up$host$port$path$q$frag"
  }

  test("canonicalizeUrl is idempotent and query-order-insensitive") {
    forAll(Gen.zip(urlGen, Gen.const(())), n = 16) { case (u, _) =>
      val df = Seq(
        Tuple1(u),
        Tuple1(u.replace("x=1&utm_source=t", "utm_source=t&x=1")))
        .toDF("url")
      val rows = df.select(
          Curation.canonicalizeUrl(col("url")).as("c"),
          Curation.canonicalizeUrl(
            Curation.canonicalizeUrl(col("url"))).as("cc"))
        .collect()
      rows.foreach { r =>
        assert(r.getString(0) == r.getString(1),
          s"not idempotent for '$u': ${r.getString(0)} vs ${r.getString(1)}")
      }
      assert(rows.map(_.getString(0)).distinct.length == 1,
        s"query order changed the canonical form for '$u'")
    }
  }
}
