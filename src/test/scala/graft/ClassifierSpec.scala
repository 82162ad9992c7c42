package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.Classifier

/** The learned quality classifier: it must actually LEARN (separable
  * classes → separated scores), train deterministically (fixed-point
  * aggregation — no partition-order dependence), and keep its driver
  * traffic bounded.
  */
class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  // token-disjoint classes: positives talk about quality, negatives are
  // boilerplate junk — linearly separable on hashed bag-of-words
  private def seedSet = (0 until 40).map { i =>
    if (i % 2 == 0)
      (i.toLong, "curated prose with careful structure and clear citations", 1)
    else
      (i.toLong, "click here buy now free offer winner winner", 0)
  }.toDF("id", "text", "y")

  test("separable classes are fully separated after training") {
    val m = Classifier.train(seedSet, "text", "y", "id", steps = 8, lr = 4.0)
    val scored = Classifier.score(seedSet, "text", "id", m)
      .join(seedSet.select(col("id"), col("y")), "id")
      .select(col("y"), col("pred"), col("score")).collect()
    assert(scored.forall(r => r.getBoolean(1) == (r.getInt(0) == 1)),
      "every seed doc must be classified correctly")
    val posMin = scored.filter(_.getInt(0) == 1).map(_.getDouble(2)).min
    val negMax = scored.filter(_.getInt(0) == 0).map(_.getDouble(2)).max
    assert(posMin > 0.5 && negMax < 0.5, s"posMin=$posMin negMax=$negMax")
  }

  test("training is deterministic: identical model across runs") {
    val a = Classifier.train(seedSet, "text", "y", "id", steps = 3)
    val b = Classifier.train(seedSet, "text", "y", "id", steps = 3)
    assert(a.weights.toSeq == b.weights.toSeq && a.bias == b.bias)
  }

  test("repartitioning the training set does not change the model") {
    // fixed-point gradient sums are partition-order-independent; a
    // double-sum formulation would fail this
    val a = Classifier.train(seedSet.repartition(7), "text", "y", "id",
      steps = 3)
    val b = Classifier.train(seedSet.coalesce(1), "text", "y", "id",
      steps = 3)
    assert(a.weights.toSeq == b.weights.toSeq && a.bias == b.bias)
  }

  test("pred is exactly score >= 0.5 and unseen-vocab docs get the bias") {
    val m = Classifier.train(seedSet, "text", "y", "id", steps = 3)
    val out = Classifier.score(
      Seq((100L, "tokens never seen in training xyzzy")).toDF("id", "text"),
      "text", "id", m).head()
    // unseen tokens still hash into buckets; the score is finite in (0,1)
    assert(out.getDouble(1) > 0 && out.getDouble(1) < 1)
    assert(out.getBoolean(2) == (out.getDouble(1) >= 0.5))
  }

  test("tuneThreshold finds a perfect cut on separable data; ties low") {
    val m = Classifier.train(seedSet, "text", "y", "id", steps = 8,
      lr = 4.0)
    val pick = Classifier.tuneThreshold(seedSet, "text", "y", "id", m)
    assert(pick.n == 40)
    assert(pick.correct == 40, s"separable data must cut perfectly: $pick")
    assert(pick.cutBucket > 0 && pick.cutBucket <= 1000, pick.toString)
    // degenerate all-positive labels: cut 0 (everything positive) is
    // already perfect, and the tie rule keeps the LOWEST such cut
    val allPos = seedSet.withColumn("y", lit(1))
    val pick0 = Classifier.tuneThreshold(allPos, "text", "y", "id", m)
    assert(pick0.cutBucket == 0 && pick0.correct == 40, pick0.toString)
  }

  test("scoring rides Structured Streaming unchanged (narrow map)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val m = Classifier.train(seedSet, "text", "y", "id", steps = 3)
    val doc = (1L, "curated prose with careful structure and clear citations")
    val input = MemoryStream[(Long, String)]
    val q = Classifier.score(input.toDF().toDF("id", "text"), "text", "id", m)
      .writeStream.format("memory").queryName("clf_stream")
      .outputMode("append").start()
    try {
      input.addData(doc)
      q.processAllAvailable()
      val got = spark.table("clf_stream")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
      val want = Classifier.score(Seq(doc).toDF("id", "text"), "text", "id", m)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
      assert(got.toSeq == want.toSeq,
        "streaming scores must equal the batch scores")
    } finally q.stop()
  }

  test("guards: bucket bounds, step bounds, empty training set") {
    intercept[IllegalArgumentException] {
      Classifier.train(seedSet, "text", "y", "id", buckets = 0)
    }
    intercept[IllegalArgumentException] {
      Classifier.train(seedSet, "text", "y", "id", buckets = 5000)
    }
    intercept[IllegalArgumentException] {
      Classifier.train(seedSet, "text", "y", "id", steps = 0)
    }
    intercept[IllegalArgumentException] {
      Classifier.train(seedSet.where(lit(false)), "text", "y", "id")
    }
  }
}
