package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.Sketches

/** Sketch laws: HLL merge must equal the sketch of the union (register
  * for register), the ln-based small/large-range corrections must match
  * the same JVM formula on hand-built register states, KMV must be
  * EXACT below k, Count-Min must never underestimate, and everything
  * must be partition-invariant — the properties that make the sketches
  * safe to persist and fold across batches.
  */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def values(n: Int, tag: String) =
    spark.range(n).select(concat(lit(tag), col("id")).as("v"))

  test("hll: merge(sketch(A), sketch(B)) == sketch(A union B), register-exact") {
    val a = values(3000, "a")
    val b = values(2000, "b").union(values(500, "a")) // overlap with A
    val ra = Sketches.hllRegisters(a, $"v", Nil, 9)
    val rb = Sketches.hllRegisters(b, $"v", Nil, 9)
    val merged = Sketches.hllMerge(ra, rb, Nil)
      .orderBy("bucket").as[(Int, Int)].collect()
    val union = Sketches.hllRegisters(a.union(b), $"v", Nil, 9)
      .orderBy("bucket").as[(Int, Int)].collect()
    assert(merged.toSeq === union.toSeq)
  }

  test("hll: raw-band estimate within 3 sigma on 5000 distinct") {
    // p=9 -> m=512, stderr ~ 1.04/sqrt(512) ~ 4.6%; n/m ~ 10 is the
    // raw band (no corrections) and 3 sigma ~ 14%
    val est = Sketches.hllDistinct(values(5000, "x"), $"v", Nil, 9)
      .select("hll_est").as[Long].head()
    assert(math.abs(est - 5000) < 700, s"est=$est")
  }

  test("hll: duplicates do not move the estimate") {
    val once = Sketches.hllDistinct(values(2000, "d"), $"v", Nil, 8)
      .select("hll_est").as[Long].head()
    val thrice = Sketches.hllDistinct(
      values(2000, "d").union(values(2000, "d")).union(values(2000, "d")),
      $"v", Nil, 8).select("hll_est").as[Long].head()
    assert(once === thrice)
  }

  test("hll: small-range correction is INTEGER linear counting, replayed") {
    val df = values(20, "s")
    val est = Sketches.hllDistinct(df, $"v", Nil, 8)
      .select("hll_est", "zero_registers").as[(Long, Long)].head()
    val (got, v) = est
    assert(v > 0, "20 values cannot fill 256 buckets")
    // the branch is round(m·ln(m/V)) in 10⁹ FIXED POINT — replayed
    // here step for step (lnPpbScala mirrors the column expression),
    // and within 1 of the double formula and of the true count
    val expect =
      (256L * (8L * Sketches.Ln2Ppb - Sketches.lnPpbScala(v)) +
        500000000L) / 1000000000L
    assert(got === expect)
    assert(math.abs(got - math.round(256d * math.log(256d / v))) <= 1)
    assert(math.abs(got - 20) <= 1, s"est=$got")
  }

  test("hll: lnPpbScala tracks Math.log within fixed-point tolerance") {
    for (v <- Seq(1L, 2L, 3L, 5L, 17L, 100L, 255L, 256L, 4095L, 65536L)) {
      val fixed = Sketches.lnPpbScala(v) / 1e9
      assert(math.abs(fixed - math.log(v.toDouble)) < 2e-6,
        s"v=$v fixed=$fixed true=${math.log(v.toDouble)}")
    }
  }

  test("hll: large-range correction fires on a saturated register state") {
    // hand-built register table (registers ARE the persistable state,
    // so estimating from a crafted one is the supported path): m=16,
    // all registers 24 -> S = 16 * 2^9 = 8192, raw = floor(alpha_16 *
    // 16^2 * 2^33 / 8192) with alpha_16 = 673/1000 — inside
    // (2^32/30, 2^32), so the correction applies
    val regs = (0 until 16).map(b => (b, 24)).toDF("bucket", "register")
    val raw = (BigInt(673) * 16 * 16 * (BigInt(1) << 33) /
      (BigInt(1000) * 8192)).toLong
    assert(raw > (1L << 32) / 30 && raw < (1L << 32))
    val expect = math.round(
      -4294967296d * math.log(1d - raw.toDouble / 4294967296d))
    val got = Sketches.hllEstimate(regs, Nil, 4)
      .select("hll_est").as[Long].head()
    assert(got === expect)
  }

  test("hll: partition-adversarial determinism") {
    val df = values(4000, "p")
    def run(d: org.apache.spark.sql.DataFrame): Long =
      Sketches.hllDistinct(d, $"v", Nil, 9).select("hll_est")
        .as[Long].head()
    val base = run(df.coalesce(1))
    assert(run(df.repartition(13)) === base)
    assert(run(df.repartition(32, $"v")) === base)
  }

  test("hll: standing state folds appended batch deltas to the union sketch") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-hll-spec").toString
    val all = values(3000, "st")
    // three overlapping batches appended out of any "natural" order
    Sketches.appendHllState(
      all.where($"v".substr(3, 9).cast("long") >= 2000), $"v", Nil, 9, dir)
    Sketches.appendHllState(
      all.where($"v".substr(3, 9).cast("long") < 1500), $"v", Nil, 9, dir)
    Sketches.appendHllState(
      all.where($"v".substr(3, 9).cast("long").between(1000, 2500)),
      $"v", Nil, 9, dir)
    val fromState = Sketches.hllEstimateFromState(spark, dir, Nil, 9)
      .as[(Long, Long)].head()
    val direct = Sketches.hllDistinct(all, $"v", Nil, 9)
      .as[(Long, Long)].head()
    assert(fromState === direct)
  }

  test("hll: streaming foreachBatch loop maintains the standing state") {
    // the daily-uniques production shape: each micro-batch appends its
    // register delta; the read-time fold answers "distinct so far"
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files
      .createTempDirectory("graft-hll-stream").toString
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val q = in.toDF().toDF("v").writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
          _: Long) =>
        if (!batch.isEmpty)
          Sketches.appendHllState(batch, col("v"), Nil, 9,
            s"$dir/state")
        ()
      }.start()
    in.addData((0 until 1500).map(i => s"sv$i"): _*)
    q.processAllAvailable()
    in.addData((1000 until 2500).map(i => s"sv$i"): _*) // overlap
    q.processAllAvailable()
    q.stop()
    val fromState = Sketches
      .hllEstimateFromState(spark, s"$dir/state", Nil, 9)
      .as[(Long, Long)].head()
    val direct = Sketches.hllDistinct(
      (0 until 2500).map(i => s"sv$i").toDF("v"), $"v", Nil, 9)
      .as[(Long, Long)].head()
    assert(fromState === direct)
  }

  test("hist: streaming foreachBatch loop maintains the standing state") {
    // the rolling metric-distribution shape: each micro-batch appends
    // its bucket delta; the read-time fold answers "p50/p99 so far"
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files
      .createTempDirectory("graft-hist-stream").toString
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Long]
    val q = in.toDF().toDF("v").writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
          _: Long) =>
        if (!batch.isEmpty)
          Sketches.appendHistState(batch, col("v"), Nil, 6,
            s"$dir/state")
        ()
      }.start()
    in.addData((0L until 3000L).map(i => i * 17 % 50021): _*)
    q.processAllAvailable()
    in.addData((3000L until 5000L).map(i => i * 17 % 50021): _*)
    q.processAllAvailable()
    q.stop()
    val fromState = Sketches.histQuantilesFromState(spark,
      s"$dir/state", Nil, 6, Seq(500, 990))
      .orderBy("q_permille").collect().toSeq
    val direct = Sketches.histQuantilesOf(
      (0L until 5000L).map(i => i * 17 % 50021).toDF("v"), $"v", Nil,
      6, Seq(500, 990)).orderBy("q_permille").collect().toSeq
    assert(fromState === direct)
  }

  test("kmv and cms: streaming foreachBatch loops maintain standing state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files
      .createTempDirectory("graft-kc-stream").toString
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val q = in.toDF().toDF("v").writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
          _: Long) =>
        if (!batch.isEmpty) {
          Sketches.appendKmvState(batch, col("v"), Nil, 32,
            s"$dir/kmv")
          Sketches.appendCmsState(batch, col("v"), 4, 32, s"$dir/cms")
        }
        ()
      }.start()
    in.addData((0 until 800).map(i => s"kv${i % 300}"): _*)
    q.processAllAvailable()
    in.addData((0 until 700).map(i => s"kv${200 + i % 400}"): _*)
    q.processAllAvailable()
    q.stop()
    val all = ((0 until 800).map(i => s"kv${i % 300}") ++
      (0 until 700).map(i => s"kv${200 + i % 400}")).toDF("v")
    assert(Sketches.kmvFromState(spark, s"$dir/kmv", Nil, 32)
      .collect().toSeq ===
      Sketches.kmvDistinct(all, $"v", Nil, 32).collect().toSeq)
    assert(Sketches.cmsFromState(spark, s"$dir/cms", 4, 32)
      .orderBy("row", "col").collect().toSeq ===
      Sketches.cmsCounters(all, $"v", 4, 32)
        .orderBy("row", "col").collect().toSeq)
  }

  test("kmv: exact below k, estimate within 3 sigma above") {
    // 7 distinct values, k=32 -> the EXACT path
    val small = values(7, "k").union(values(7, "k"))
    val ex = Sketches.kmvDistinct(small, $"v", Nil, 32)
      .select("kmv_est", "kmv_kept").as[(Long, Long)].head()
    assert(ex === ((7L, 7L)))
    // 5000 distinct, k=256 -> estimate path; stderr ~ 1/sqrt(k-2) ~ 6.3%
    val big = Sketches.kmvDistinct(values(5000, "k"), $"v", Nil, 256)
      .select("kmv_est", "kmv_kept").as[(Long, Long)].head()
    assert(big._2 === 256L)
    assert(math.abs(big._1 - 5000) < 950, s"est=${big._1}")
  }

  test("kmv: per-group paths and partition invariance") {
    val df = spark.range(3000).select(
      (col("id") % 5).as("g"), concat(lit("v"), col("id")).as("v"))
      .union(Seq((9L, "only")).toDF("g", "v"))
    def run(d: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      Sketches.kmvDistinct(d, $"v", Seq("g"), 64)
        .orderBy("g").as[(Long, Long, Long)].collect().toSeq
    val base = run(df.coalesce(1))
    assert(base.last === ((9L, 1L, 1L))) // singleton group: exact
    assert(base.count(_._3 == 64L) === 5) // 600-distinct groups estimate
    assert(run(df.repartition(11)) === base)
  }

  test("cms: never underestimates; exact when the grid is collision-free") {
    val df = Seq.fill(40)("a").union(Seq.fill(25)("b"))
      .union(Seq.fill(10)("c")).union(Seq("d")).toDF("v")
    // w large enough that 4 values cannot collide across all 4 rows
    val wide = Sketches.cmsHeavyHitters(df, $"v", 4, 1024, 1L)
      .orderBy("value").as[(String, Long, Long)].collect().toSeq
    assert(wide === Seq(("a", 40L, 40L), ("b", 25L, 25L),
      ("c", 10L, 10L), ("d", 1L, 1L)))
    // w=2 forces collisions: estimates stay upper bounds
    val tight = Sketches.cmsHeavyHitters(df, $"v", 4, 2, 1L)
      .as[(String, Long, Long)].collect()
    assert(tight.forall(r => r._3 >= r._2), tight.mkString(","))
  }

  test("kmv: standing state folds per-batch bottom-k deltas exactly") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-kmv-spec").toString
    val all = spark.range(900).select(
      (col("id") % 3).as("g"), concat(lit("kv"), col("id")).as("v"))
    // overlapping batches, appended out of order
    Sketches.appendKmvState(all.where($"v".substr(3, 9).cast("long")
      >= 500), $"v", Seq("g"), 64, dir)
    Sketches.appendKmvState(all.where($"v".substr(3, 9).cast("long")
      < 350), $"v", Seq("g"), 64, dir)
    Sketches.appendKmvState(all.where($"v".substr(3, 9).cast("long")
      .between(300, 600)), $"v", Seq("g"), 64, dir)
    val fromState = Sketches.kmvFromState(spark, dir, Seq("g"), 64)
      .orderBy("g").collect().toSeq
    val direct = Sketches.kmvDistinct(all, $"v", Seq("g"), 64)
      .orderBy("g").collect().toSeq
    assert(fromState === direct)
  }

  test("cms: standing state folds per-batch grids by cell-wise sum") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-cms-spec").toString
    val all = (Seq.fill(40)("x") ++ Seq.fill(25)("y") ++
      (1 to 30).map(i => s"t$i")).toDF("v")
    Sketches.appendCmsState(all.limit(50), $"v", 4, 32, dir)
    Sketches.appendCmsState(all.exceptAll(all.limit(50)), $"v", 4, 32,
      dir)
    val fromState = Sketches.cmsFromState(spark, dir, 4, 32)
      .orderBy("row", "col").collect().toSeq
    val direct = Sketches.cmsCounters(all, $"v", 4, 32)
      .orderBy("row", "col").collect().toSeq
    assert(fromState === direct)
  }

  test("cms: counter grid merges by cell-wise sum across batches") {
    val a = Seq.fill(30)("x").union(Seq.fill(5)("y")).toDF("v")
    val b = Seq.fill(10)("x").union(Seq.fill(20)("z")).toDF("v")
    val mergedGrid = Sketches.cmsCounters(a, $"v", 4, 32)
      .unionByName(Sketches.cmsCounters(b, $"v", 4, 32))
      .groupBy("row", "col").agg(sum("counter").as("counter"))
    val unionGrid = Sketches.cmsCounters(a.union(b), $"v", 4, 32)
    assert(mergedGrid.orderBy("row", "col").collect().toSeq ===
      unionGrid.orderBy("row", "col").collect().toSeq)
  }

  test("hist: exact below 2^b — sketched quantiles equal the exact ones") {
    // every value < 2^b has its own bucket, so the sketch degenerates
    // to the exact frequency table and quantile_lo IS the exact
    // lower order statistic
    val df = spark.range(4000)
      .select((pmod(col("id") * 37 + 11, lit(60))).as("v"),
        (col("id") % 3).cast("string").as("g"))
    val sk = Sketches.histQuantilesOf(df, $"v", Seq("g"), 6,
      Seq(500, 900, 990))
      .orderBy("g", "q_permille").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    val ex = graft.ml.Quantiles.frequencyQuantiles(df, $"v", Seq("g"),
      Seq(500, 900, 990))
      .orderBy("g", "q_permille").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(sk === ex)
  }

  test("hist: lower bound within the 2^-b relative error envelope") {
    val b = 6
    val df = spark.range(5000)
      .select((col("id") * col("id") % 999983 + 1).as("v"))
    val sk = Sketches.histQuantilesOf(df, $"v", Nil, b, Seq(500, 900))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val ex = graft.ml.Quantiles.frequencyQuantiles(df, $"v", Nil,
      Seq(500, 900))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    for (q <- Seq(500, 900)) {
      val lo = sk(q); val t = ex(q)
      assert(lo <= t, s"q$q: lower bound $lo above true $t")
      // bucket width = 2^shift <= lo·2^-b (and ≥ 1)
      assert(t - lo <= math.max(1L, lo >> b),
        s"q$q: true $t beyond bucket width above $lo")
    }
  }

  test("hist signed: bucket map is order-preserving and decode is a " +
    "true lower bound") {
    val rnd = new scala.util.Random(4216)
    val vs = (Seq(0L, 1L, -1L, 63L, 64L, -64L, -65L,
      (1L << 61), -(1L << 61), (1L << 62) - 1, -(1L << 62) + 1) ++
      Seq.fill(500)(rnd.nextLong() % (1L << 62))).distinct
    val b = 6
    def bucketOf(v: Long): Long = {
      val df = Seq(v).toDF("v")
      df.select(expr(Sketches.histBucketSignedSql("v", b)).as("bk"))
        .head().getLong(0)
    }
    // batch-evaluate via one frame (per-value frames would be slow)
    val rows = vs.toDF("v")
      .select(col("v"), expr(Sketches.histBucketSignedSql("v", b))
        .as("bk"))
      .withColumn("lo", expr(Sketches.histLowerBoundSignedSql("bk", b)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // order-preserving: sorting by bucket never inverts value order
    // beyond bucket granularity
    val sorted = rows.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((v1, b1, _), (v2, b2, _)) =>
        assert(b1 <= b2, s"bucket order inverted: $v1->$b1, $v2->$b2")
      case _ => ()
    }
    // decode is a true lower bound and within one bucket width
    rows.foreach { case (v, bk, lo) =>
      assert(lo <= v, s"lo $lo above value $v (bucket $bk)")
      val width = math.max(1L, math.abs(lo) >> b)
      assert(v - lo <= width,
        s"value $v beyond bucket width above lo $lo (bucket $bk)")
    }
    assert(bucketOf(0L) == 0L && bucketOf(-1L) < 0L && bucketOf(1L) > 0L)
  }

  test("hist signed: merge law and rank-rule agreement with the exact " +
    "quantile's bucket") {
    val df = spark.range(4000)
      .select(((col("id") * 37 % 2001) - 1000).as("v"),
        (col("id") % 2).cast("string").as("g"))
    // merge law: per-batch signed buckets fold to the union's buckets
    val a = df.where(col("id") % 3 === 0)
    val c = df.where(col("id") % 3 =!= 0)
    val merged = Sketches.histFold(
      Sketches.histBucketsSigned(a, $"v", Seq("g"), 5)
        .unionByName(Sketches.histBucketsSigned(c, $"v", Seq("g"), 5)),
      Seq("g")).orderBy("g", "bucket")
      .as[(String, Long, Long)].collect().toSeq
    val union = Sketches.histBucketsSigned(df, $"v", Seq("g"), 5)
      .orderBy("g", "bucket").as[(String, Long, Long)].collect().toSeq
    assert(merged === union)
    // the reported quantile_lo is the lower bound of the TRUE
    // quantile's bucket (the same rank rule applied exactly)
    val got = Sketches.histQuantilesSignedOf(df, $"v", Seq("g"), 5,
      Seq(100, 500, 900))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    val byG = df.collect().map(r => (r.getString(1), r.getLong(0)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((g, vals) <- byG; q <- Seq(100, 500, 900)) {
      val n = vals.length
      val trueQ = vals.find { v =>
        (vals.count(_ <= v).toLong * 1000) >= q.toLong * n
      }.get
      val expLo = Seq(trueQ).toDF("v")
        .select(expr(Sketches.histBucketSignedSql("v", 5)).as("bk"))
        .select(expr(Sketches.histLowerBoundSignedSql("bk", 5)))
        .head().getLong(0)
      assert(got((g, q)) == expLo,
        s"g=$g q=$q: got ${got((g, q))}, true quantile $trueQ " +
          s"decodes to $expLo")
    }
  }

  test("hist signed: standing state folds to the one-shot sketch; " +
    "signedness is pinned") {
    val df = spark.range(3000)
      .select(col("id"), ((col("id") * 31 % 801) - 400).as("v"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-hist-signed").toString
    (0L to 2L).foreach { r =>
      Sketches.appendHistStateSigned(df.where(col("id") % 3 === r),
        $"v", Nil, 5, dir)
    }
    val fromState = Sketches
      .histQuantilesSignedFromState(spark, dir, Nil, 5, Seq(500, 900))
      .orderBy("q_permille").collect().map(_.toString).toSeq
    val oneShot = Sketches
      .histQuantilesSignedOf(df, $"v", Nil, 5, Seq(500, 900))
      .orderBy("q_permille").collect().map(_.toString).toSeq
    assert(fromState === oneShot)
    // a signed state refuses unsigned reads and appends (and the
    // b pin still holds)
    val e1 = intercept[Exception] {
      Sketches.histQuantilesFromState(spark, dir, Nil, 5, Seq(500))
    }
    assert(e1.getMessage.contains("signed"))
    val e2 = intercept[Exception] {
      Sketches.appendHistState(df, $"v", Nil, 5, dir)
    }
    assert(e2.getMessage.contains("signed"))
    val e3 = intercept[IllegalArgumentException] {
      Sketches.histQuantilesSignedFromState(spark, dir, Nil, 6, Seq(500))
    }
    assert(e3.getMessage.contains("b="))
  }

  test("hist: a pre-signedness LEGACY meta (no 'signed' column) reads " +
    "as unsigned and refuses signed reads loudly") {
    val df = spark.range(500).select((col("id") % 97).as("v"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-hist-legacy").toString
    // hand-write the legacy state: meta pins only b (the pre-round-16
    // layout), buckets as the unsigned sketch wrote them
    spark.range(1).select(lit(6).as("b"))
      .write.mode("overwrite").parquet(s"$dir/meta")
    Sketches.histBuckets(df, $"v", Nil, 6)
      .write.mode("append").parquet(s"$dir/buckets")
    // unsigned read and append still work (missing field ⇔ legacy 0)
    val q = Sketches.histQuantilesFromState(spark, dir, Nil, 6, Seq(500))
      .collect()
    assert(q.length == 1)
    Sketches.appendHistState(df, $"v", Nil, 6, dir)
    // a signed read fails with the DESIGNED pin message, not an
    // opaque schema error
    val e = intercept[IllegalArgumentException] {
      Sketches.histQuantilesSignedFromState(spark, dir, Nil, 6, Seq(500))
    }
    assert(e.getMessage.contains("signed=0"), e.getMessage)
  }

  test("hist signed: values beyond ±(2^62−1) and nulls are excluded") {
    val df = Seq(Some(5L), Some(-5L), None, Some(Long.MaxValue),
      Some(Long.MinValue), Some((1L << 62)), Some(-(1L << 62)))
      .toDF("v")
    val buckets = Sketches.histBucketsSigned(df, $"v", Nil, 4)
    assert(buckets.agg(sum("cnt")).head().getLong(0) == 2L)
  }

  test("hist: merge(buckets(A), buckets(B)) == buckets(A union B)") {
    val a = spark.range(2000).select((col("id") * 7 % 5000).as("v"))
    val b = spark.range(1500).select((col("id") * 13 % 9000).as("v"))
    val merged = Sketches.histFold(
      Sketches.histBuckets(a, $"v", Nil, 5)
        .unionByName(Sketches.histBuckets(b, $"v", Nil, 5)), Nil)
      .orderBy("bucket").as[(Long, Long)].collect().toSeq
    val union = Sketches.histBuckets(a.union(b), $"v", Nil, 5)
      .orderBy("bucket").as[(Long, Long)].collect().toSeq
    assert(merged === union)
  }

  test("hist: negative and null values are excluded; partition-invariant") {
    val df = spark.range(3000)
      .select(when(col("id") % 7 === 0, lit(null))
        .when(col("id") % 11 === 0, -col("id"))
        .otherwise(col("id")).as("v"))
    val q1 = Sketches.histQuantilesOf(df.repartition(1), $"v", Nil, 4,
      Seq(500)).collect().toSeq
    val q17 = Sketches.histQuantilesOf(df.repartition(17), $"v", Nil, 4,
      Seq(500)).collect().toSeq
    assert(q1 === q17)
    // dropping negatives/nulls shifts the rank set: verify against the
    // exact quantile of the FILTERED frame
    val ex = graft.ml.Quantiles.frequencyQuantiles(
      df.where($"v" >= 0), $"v", Nil, Seq(500)).collect()(0).getLong(1)
    val lo = q1(0).getLong(1)
    assert(lo <= ex && ex - lo <= math.max(1L, lo >> 4))
  }

  test("hist: standing state folds appended batch deltas to the union sketch") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-hist-spec").toString
    val all = spark.range(6000)
      .select((col("id") * 31 % 20011).as("v"),
        (col("id") % 2).cast("string").as("g"))
    (0 to 2).foreach { i =>
      Sketches.appendHistState(all.where(col("v") % 3 === i), $"v",
        Seq("g"), 6, dir)
    }
    val fromState = Sketches.histQuantilesFromState(spark, dir,
      Seq("g"), 6, Seq(500, 990)).orderBy("g", "q_permille")
      .collect().toSeq
    val oneShot = Sketches.histQuantilesOf(all, $"v", Seq("g"), 6,
      Seq(500, 990)).orderBy("g", "q_permille").collect().toSeq
    assert(fromState === oneShot)
    // parameter mismatch fails loudly
    val e = intercept[IllegalArgumentException] {
      Sketches.histQuantilesFromState(spark, dir, Seq("g"), 4, Seq(500))
    }
    assert(e.getMessage.contains("b=6"))
  }

  test("kmv overlap: EXACT when the union fits in k") {
    val a = spark.range(30).select(concat(lit("v"), col("id")).as("v"))
    val b = spark.range(20, 45)
      .select(concat(lit("v"), col("id")).as("v"))
    val r = Sketches.kmvOverlap(a, $"v", b, $"v", Nil, 64).collect()(0)
    assert(r.getAs[Long]("a_est") === 30L)
    assert(r.getAs[Long]("b_est") === 25L)
    assert(r.getAs[Long]("union_est") === 45L)
    assert(r.getAs[Long]("inter_est") === 10L)
    assert(r.getAs[Long]("jaccard_ppm") === 10L * 1000000 / 45)
  }

  test("kmv overlap: estimates within 3-sigma-ish bands above k") {
    val k = 256
    val a = values(6000, "s")
    val b = values(9000, "s") // 6000 shared + 3000 b-only
      .union(values(0, "x"))
    val r = Sketches.kmvOverlap(a, $"v", b, $"v", Nil, k).collect()(0)
    // KMV relative error ~ 1/sqrt(k) = 6.25%; allow 3x
    def close(est: Long, truth: Long): Unit =
      assert(math.abs(est - truth) <= truth * 0.19,
        s"est $est vs $truth")
    close(r.getAs[Long]("a_est"), 6000)
    close(r.getAs[Long]("b_est"), 9000)
    close(r.getAs[Long]("union_est"), 9000)
    close(r.getAs[Long]("inter_est"), 6000)
  }

  test("kmv overlap: per-group, disjoint and identical corpora, " +
    "partition invariance") {
    val a = spark.range(500).select(
      (col("id") % 2).cast("string").as("g"),
      concat(lit("a"), col("id")).as("v"))
    val b = spark.range(500).select(
      (col("id") % 2).cast("string").as("g"),
      when(col("id") < 250, concat(lit("a"), col("id")))
        .otherwise(concat(lit("b"), col("id"))).as("v"))
    val r1 = Sketches.kmvOverlap(a.repartition(1), $"v",
      b.repartition(1), $"v", Seq("g"), 64)
      .orderBy("g").collect().map(_.toString).toSeq
    val r13 = Sketches.kmvOverlap(a.repartition(13), $"v",
      b.repartition(13), $"v", Seq("g"), 64)
      .orderBy("g").collect().map(_.toString).toSeq
    assert(r1 === r13)
    // disjoint corpora: zero intersection, zero jaccard
    val disj = Sketches.kmvOverlap(values(100, "p"), $"v",
      values(100, "q"), $"v", Nil, 64).collect()(0)
    assert(disj.getAs[Long]("inter_est") === 0L)
    assert(disj.getAs[Long]("jaccard_ppm") === 0L)
    // identical corpora: intersection == union, jaccard == 1e6
    val same = Sketches.kmvOverlap(values(5000, "s"), $"v",
      values(5000, "s"), $"v", Nil, 64).collect()(0)
    assert(same.getAs[Long]("inter_est") ===
      same.getAs[Long]("union_est"))
    assert(same.getAs[Long]("jaccard_ppm") === 1000000L)
  }

  test("hist: bucket function laws over adversarial values") {
    // engine-evaluated (the formula lives in SQL so the gate replay is
    // the same text): bucket ids are monotone non-decreasing in v, the
    // decoded lower bound brackets v within the 2^-b width, and
    // decode(bucket(v)) is a fixed point of the encode
    for (b <- Seq(0, 4, 6, 12)) {
      val edge = Seq(0L, 1L, 2L, 3L, (1L << b) - 1, 1L << b,
        (1L << b) + 1, 126L, 127L, 128L, 129L, 65535L, 65536L,
        1000000007L, (1L << 40) - 1, 1L << 40, Long.MaxValue / 2,
        Long.MaxValue - 1, Long.MaxValue)
      val rnd = new scala.util.Random(42 + b)
      val vals = (edge ++ Seq.fill(300)(math.abs(rnd.nextLong()))
        ++ Seq.fill(300)(rnd.nextInt(1 << 16).toLong)).distinct
      val rows = vals.toDF("v")
        .withColumn("bucket", expr(Sketches.histBucketSql("v", b)))
        .withColumn("lo", expr(Sketches.histLowerBoundSql("bucket", b)))
        .withColumn("lo2", expr(Sketches.histBucketSql("lo", b)))
        .orderBy("v")
        .as[(Long, Long, Long, Long)].collect()
      rows.foreach { case (v, bucket, lo, lo2) =>
        assert(lo <= v, s"b=$b v=$v: lower bound $lo above v")
        assert(v - lo <= math.max(1L, lo >> b),
          s"b=$b v=$v: outside width above $lo")
        assert(lo2 === bucket,
          s"b=$b v=$v: decode($bucket)=$lo re-encodes to $lo2")
      }
      rows.sliding(2).foreach {
        case Array((v1, b1, _, _), (v2, b2, _, _)) =>
          assert(b1 <= b2, s"b=$b: bucket($v1)=$b1 > bucket($v2)=$b2")
        case _ => ()
      }
    }
  }

  test("kmv overlap: a group present on ONE side only reports zero overlap") {
    val a = spark.range(200).select(
      when(col("id") % 2 === 0, "both").otherwise("onlyA").as("g"),
      concat(lit("a"), col("id")).as("v"))
    val b = spark.range(200).select(lit("both").as("g"),
      concat(lit("a"), col("id") * 2).as("v")) // evens → overlap
    val r = Sketches.kmvOverlap(a, $"v", b, $"v", Seq("g"), 256)
      .orderBy("g").collect()
      .map(x => x.getString(0) -> x).toMap
    val oa = r("onlyA")
    assert(oa.getAs[Long]("b_est") === 0L)
    assert(oa.getAs[Long]("inter_est") === 0L)
    assert(oa.getAs[Long]("jaccard_ppm") === 0L)
    assert(oa.getAs[Long]("a_est") === 100L)
    val both = r("both")
    assert(both.getAs[Long]("a_est") === 100L)
    assert(both.getAs[Long]("b_est") === 200L)
    // A's "both" values are a0,a2,..,a198; B's are a0,a2,..,a398 —
    // A ⊂ B, so the exact intersection is all 100 of A's values
    assert(both.getAs[Long]("inter_est") === 100L)
    assert(both.getAs[Long]("union_est") === 200L)
  }

  test("hist: empty input and boundary permilles") {
    val empty = spark.range(0).select(col("id").as("v"))
    assert(Sketches.histQuantilesOf(empty, $"v", Nil, 6,
      Seq(0, 500, 1000)).collect().isEmpty)
    // q=0 → smallest bucket's lower bound; q=1000 → the bucket holding
    // the max (its lower bound <= max)
    val df = (1L to 1000L).toDF("v")
    val q = Sketches.histQuantilesOf(df, $"v", Nil, 6,
      Seq(0, 1000)).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(q(0) === 1L)
    assert(q(1000) <= 1000L && q(1000) > 1000L - math.max(1L, 1000L >> 6) - 8)
  }

  test("kmv overlap from standing states equals the one-shot report") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ovl-state").toString
    val a = spark.range(4000)
      .select((col("id") % 2).cast("string").as("g"),
        concat(lit("o"), col("id") * 3 % 7001).as("v"))
    val b = spark.range(3000)
      .select((col("id") % 2).cast("string").as("g"),
        concat(lit("o"), col("id") * 5 % 9001).as("v"))
    // each corpus arrives in two batches (overlapping deltas fold)
    Seq(0, 1).foreach { i =>
      Sketches.appendKmvState(a.where(col("v").substr(2, 1) =!= i.toString),
        $"v", Seq("g"), 64, s"$dir/a")
      Sketches.appendKmvState(b.where(col("v").substr(2, 1) =!= i.toString),
        $"v", Seq("g"), 64, s"$dir/b")
    }
    // the batches above cover every row (a value lacks digit '0' or
    // '1' in at least one batch only if it contains both — append the
    // full frames once more so states hold the complete corpora)
    Sketches.appendKmvState(a, $"v", Seq("g"), 64, s"$dir/a")
    Sketches.appendKmvState(b, $"v", Seq("g"), 64, s"$dir/b")
    val fromStates = Sketches.kmvOverlapFromStates(spark, s"$dir/a",
      s"$dir/b", Seq("g"), 64).orderBy("g")
      .collect().map(_.toString).toSeq
    val oneShot = Sketches.kmvOverlap(a, $"v", b, $"v", Seq("g"), 64)
      .orderBy("g").collect().map(_.toString).toSeq
    assert(fromStates === oneShot)
    // k mismatch on either state fails loudly
    val e = intercept[IllegalArgumentException] {
      Sketches.kmvOverlapFromStates(spark, s"$dir/a", s"$dir/b",
        Seq("g"), 32)
    }
    assert(e.getMessage.contains("k=64"))
  }

  test("state reads REQUIRE an existing meta pin — a read never writes it") {
    // A mistyped or pre-meta directory must fail loudly on read; if the
    // read wrote the pin, the READER's parameters would become the
    // permanent truth and every later correct appender would fail
    // against them.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-meta-read").toString
    val eH = intercept[IllegalArgumentException] {
      Sketches.hllEstimateFromState(spark, s"$dir/h", Nil, 9)
    }
    assert(eH.getMessage.contains("no meta pin"))
    val eK = intercept[IllegalArgumentException] {
      Sketches.kmvFromState(spark, s"$dir/k", Nil, 16)
    }
    assert(eK.getMessage.contains("no meta pin"))
    val eC = intercept[IllegalArgumentException] {
      Sketches.cmsFromState(spark, s"$dir/c", 4, 32)
    }
    assert(eC.getMessage.contains("no meta pin"))
    val eQ = intercept[IllegalArgumentException] {
      Sketches.histQuantilesFromState(spark, s"$dir/q", Nil, 6, Seq(500))
    }
    assert(eQ.getMessage.contains("no meta pin"))
    // none of the failed reads may have pinned anything: a correct
    // append with DIFFERENT parameters must now succeed
    Sketches.appendHllState(values(100, "s"), $"v", Nil, 7, s"$dir/h")
    val est = Sketches.hllEstimateFromState(spark, s"$dir/h", Nil, 7)
      .collect()
    assert(est.length == 1)
  }

  test("corpus card state: disjoint-batch fold equals the single-batch " +
    "card; null/negative lengths land in the out-of-domain bucket") {
    // the card's two deltas are additive (doc-bucket counts, register
    // row counts) and max-mergeable (registers), so HOW the corpus was
    // split into appended batches must be invisible at read time —
    // that law is what lets the one-shot sketched report oracle the
    // incremental gate. Unlike histBuckets, the doc side keeps a null
    // bucket so n_docs counts out-of-domain lengths too.
    val docs = spark.range(300).select(
      concat(lit("l"), pmod(col("id"), lit(3))).as("lang"),
      concat(lit("tok"), col("id"), lit(" shared word "),
        lit("tok"), pmod(col("id"), lit(40))).as("text"),
      when(pmod(col("id"), lit(29)) === 0, lit(null))
        .when(pmod(col("id"), lit(31)) === 0, -col("id"))
        .otherwise(col("id") * 7 % 997).as("n_chars"))
    val dirA = java.nio.file.Files
      .createTempDirectory("graft-card-a").toString
    val dirB = java.nio.file.Files
      .createTempDirectory("graft-card-b").toString
    (0 to 2).foreach { r =>
      Sketches.appendCorpusCardState(
        docs.where(pmod(col("id"), lit(3)) === r),
        "text", "lang", col("n_chars"), p = 7, b = 6, dir = dirA)
    }
    Sketches.appendCorpusCardState(
      docs, "text", "lang", col("n_chars"), p = 7, b = 6, dir = dirB)
    def card(d: String) =
      Sketches.corpusReportFromStates(spark, d, "lang", p = 7, b = 6)
        .orderBy("lang").collect().map(_.toString).toSeq
    assert(card(dirA) === card(dirB))
    // every doc counted, including the 10 null-length + out-of-domain
    val nDocs = Sketches.corpusReportFromStates(
        spark, dirA, "lang", p = 7, b = 6)
      .agg(sum("n_docs")).as[Long].head()
    assert(nDocs === 300L)
    // the pin refuses a mismatched register count or bucket grid: a
    // fold across differently-parameterized deltas would silently
    // mis-estimate, never error
    val eP = intercept[IllegalArgumentException] {
      Sketches.corpusReportFromStates(spark, dirA, "lang", p = 8, b = 6)
    }
    assert(eP.getMessage.contains("silently wrong"))
    val eB = intercept[IllegalArgumentException] {
      Sketches.appendCorpusCardState(
        docs, "text", "lang", col("n_chars"), p = 7, b = 5, dir = dirA)
    }
    assert(eB.getMessage.contains("silently wrong"))
    val eNone = intercept[IllegalArgumentException] {
      Sketches.corpusReportFromStates(spark,
        java.nio.file.Files.createTempDirectory("graft-card-x").toString,
        "lang", p = 7, b = 6)
    }
    assert(eNone.getMessage.contains("no meta pin"))
  }
}
