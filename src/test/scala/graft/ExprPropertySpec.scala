package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.op.{Env, Pipeline}

/** Property tests for Mongo expression-operator semantics (SURVEY §7.4
  * ranks "wrong here = silent wrong answers everywhere" as hard part #1).
  * Each property compares the compiled Column against a Scala reference
  * implementation of the documented MongoDB behavior. Deterministic
  * ScalaCheck sampling (fixed seed) keeps runs reproducible.
  */
class ExprPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val env = Env(spark)

  private def one[T](df: org.apache.spark.sql.DataFrame,
      pipeline: String): org.apache.spark.sql.Row =
    Pipeline.run(df, pipeline, env).collect().head

  /** Deterministic forAll: n samples from a fixed seed. */
  private def forAll[A](gen: Gen[A], n: Int = 12)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    (0 until n).foreach { _ =>
      f(gen.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))
  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(
      f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc))(t => f(t._1, t._2, t._3))
  private def whenever(cond: Boolean)(f: => Unit): Unit = if (cond) f

  private val smallArr = Gen.listOfN(6, Gen.choose(-5L, 9L))

  test("$arrayElemAt matches Mongo 0-based/negative indexing") {
    forAll(smallArr, Gen.choose(-8, 8)) { (xs, i) =>
      val df = Seq(Tuple1(xs)).toDF("a")
      val got = one(df,
        s"""[{"$$project":{"r":{"$$arrayElemAt":["$$a",$i]}}}]""")
      val expected =
        if (i >= 0 && i < xs.length) Some(xs(i))
        else if (i < 0 && xs.length + i >= 0) Some(xs(xs.length + i))
        else None
      assert(Option(got.get(0)).map(_.asInstanceOf[Long]) == expected)
    }
  }

  test("$slice matches Mongo [arr,n] and [arr,pos,n] forms") {
    forAll(smallArr, Gen.choose(-7, 7)) { (xs, n) =>
      whenever(n != 0) {
        val df = Seq(Tuple1(xs)).toDF("a")
        val got = one(df,
          s"""[{"$$project":{"r":{"$$slice":["$$a",$n]}}}]""")
          .getSeq[Long](0)
        val expected =
          if (n >= 0) xs.take(n) else xs.takeRight(-n)
        assert(got.toList == expected)
      }
    }
    forAll(smallArr, Gen.choose(-7, 7), Gen.choose(1, 5)) { (xs, pos, n) =>
      val df = Seq(Tuple1(xs)).toDF("a")
      val got = one(df,
        s"""[{"$$project":{"r":{"$$slice":["$$a",$pos,$n]}}}]""")
        .getSeq[Long](0)
      val start = if (pos >= 0) pos else math.max(0, xs.length + pos)
      val expected = xs.slice(start, start + n)
      assert(got.toList == expected)
    }
  }

  test("$indexOfArray returns first index or -1") {
    forAll(smallArr, Gen.choose(-5L, 9L)) { (xs, v) =>
      val df = Seq(Tuple1(xs)).toDF("a")
      val got = one(df,
        s"""[{"$$project":{"r":{"$$indexOfArray":["$$a",$v]}}}]""")
        .getLong(0)
      assert(got == xs.indexOf(v).toLong)
    }
  }

  test("$range matches Mongo exclusive-end semantics") {
    forAll(Gen.choose(-5L, 5L), Gen.choose(-5L, 8L),
      Gen.oneOf(-3L, -1L, 1L, 2L)) { (start, end, step) =>
      val df = Seq(Tuple1(1)).toDF("x")
      val got = one(df,
        s"""[{"$$project":{"r":{"$$range":[$start,$end,$step]}}}]""")
        .getSeq[Long](0)
      val expected = (start until end by step).toList
      assert(got.toList == expected)
    }
  }

  test("set operators behave as sorted sets") {
    forAll(smallArr, smallArr) { (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val union = one(df,
        """[{"$project":{"r":{"$setUnion":["$a","$b"]}}}]""").getSeq[Long](0)
      assert(union.toList == (a ++ b).distinct.sorted)
      val inter = one(df,
        """[{"$project":{"r":{"$setIntersection":["$a","$b"]}}}]""")
        .getSeq[Long](0)
      assert(inter.toList == a.distinct.filter(b.contains).sorted)
      val diff = one(df,
        """[{"$project":{"r":{"$setDifference":["$a","$b"]}}}]""")
        .getSeq[Long](0)
      assert(diff.toList == a.distinct.filterNot(b.contains).sorted)
      val subset = one(df,
        """[{"$project":{"r":{"$setIsSubset":["$a","$b"]}}}]""")
        .getBoolean(0)
      assert(subset == a.forall(b.contains))
    }
  }

  test("$substrCP / $indexOfCP / $split on arbitrary ASCII strings") {
    val asciiStr = Gen.listOfN(8,
      Gen.oneOf(('a' to 'e') ++ Seq(' ', '-'))).map(_.mkString)
    forAll(asciiStr, Gen.choose(0, 9), Gen.choose(0, 9)) { (s, start, len) =>
      val df = Seq(Tuple1(s)).toDF("s")
      val got = one(df,
        s"""[{"$$project":{"r":{"$$substrCP":["$$s",$start,$len]}}}]""")
        .getString(0)
      assert(got == s.drop(start).take(len))
    }
    forAll(asciiStr, Gen.oneOf("a", "b", "-", " ")) { (s, sub) =>
      val df = Seq(Tuple1(s)).toDF("s")
      val got = one(df,
        s"""[{"$$project":{"r":{"$$indexOfCP":["$$s","$sub"]}}}]""")
        .getInt(0)
      assert(got == s.indexOf(sub))
    }
  }

  test("$toBool follows Mongo coercion (strings true, numbers != 0)") {
    forAll(Gen.choose(-3L, 3L)) { n =>
      val df = Seq(Tuple1(n)).toDF("n")
      val got = one(df,
        """[{"$project":{"r":{"$toBool":"$n"}}}]""").getBoolean(0)
      assert(got == (n != 0))
    }
    val df = Seq(Tuple1("false")).toDF("s")
    // any non-null string is true — including "false"
    assert(one(df, """[{"$project":{"r":{"$toBool":"$s"}}}]""").getBoolean(0))
  }

  test("$mod sign follows the dividend (Mongo/Java semantics)") {
    forAll(Gen.choose(-20L, 20L), Gen.oneOf(-7L, -3L, 2L, 5L)) { (a, b) =>
      val df = Seq(Tuple1(a)).toDF("a")
      val got = one(df,
        s"""[{"$$project":{"r":{"$$mod":["$$a",$b]}}}]""").getLong(0)
      assert(got == a % b)
    }
  }

  test("$reduce folds left like the reference") {
    forAll(smallArr) { xs =>
      val df = Seq(Tuple1(xs.map(_.toString))).toDF("a")
      val got = one(df,
        """[{"$project":{"r":{"$reduce":{"input":"$a","initialValue":"",
             "in":{"$concat":["$$value","|","$$this"]}}}}}]""").getString(0)
      assert(got == xs.map(_.toString).foldLeft("")(_ + "|" + _))
    }
  }
}
