package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ml.Similarity

/** ANN quality guard for the trained IVF codebook (farthest-first seeding +
  * Lloyd iterations, Similarity.scala). Two data regimes:
  *
  *  - skewed corpus (a dominant near-duplicate cluster, the shape web-scale
  *    training data actually has): training must BEAT the id-prefix
  *    codebook's recall — near-identical id-prefix centroids shred the
  *    cluster across cells on 6th-decimal cosine noise, losing neighbors.
  *  - uniform corpus (the synthetic embeddings table, no cluster
  *    structure): there is nothing to learn, so parity within tolerance is
  *    the correct expectation, not a win.
  */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val sfDir = "/root/testdata/sf0.001"
  private val K = 5
  private val Nprobe = 2
  private val Nlist = 8

  private def recallOf(corpus: DataFrame, queries: DataFrame,
      cents: DataFrame): Double = {
    val exact = Similarity
      .bruteForceTopK(corpus, queries, "embedding", "vec_id", K)
      .select("query_id", "nb_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity
      .ivfTopKWith(corpus, queries, cents, "embedding", "vec_id", K, Nprobe)
      .select("query_id", "nb_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got.intersect(exact).size.toDouble / exact.size
  }

  private def trainedOn(corpus: DataFrame): DataFrame =
    Similarity.kmeansCentroids(corpus, "embedding", "vec_id", Nlist,
      iters = 2,
      init = Some(Similarity.seedFarthestFirst(corpus, "embedding",
        "vec_id", Nlist, rounds = 4)))

  private def idPrefixOn(corpus: DataFrame): DataFrame =
    corpus.orderBy(col("vec_id")).limit(Nlist)
      .select(col("vec_id"), col("embedding"))

  test("skewed corpus: trained codebook recall beats id-prefix") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    // 200 deterministic jitters of vector 0 at low ids + 100 distinct
    // vectors: the id-prefix codebook becomes 8 near-identical centroids
    val cluster = emb.where(col("vec_id") === 0)
      .select(col("embedding")).crossJoin(spark.range(0, 200).toDF("j"))
      .select(col("j").as("vec_id"),
        expr("""transform(embedding,
                 (x, p) -> CAST(x + 0.001*((j*31+p)%7-3) AS FLOAT))""")
          .as("embedding"))
    val others = emb.where(col("vec_id") >= 100 && col("vec_id") < 200)
      .select((col("vec_id") + 100).as("vec_id"), col("embedding"))
    val corpus = cluster.unionByName(others).cache()
    val queries = corpus.where(col("vec_id") % 17 === 3)

    val rTrained = recallOf(corpus, queries, trainedOn(corpus))
    val rPrefix = recallOf(corpus, queries, idPrefixOn(corpus))
    info(f"skewed recall@$K trained=$rTrained%.3f id-prefix=$rPrefix%.3f")
    assert(rTrained > rPrefix,
      s"training must beat id-prefix under skew: $rTrained <= $rPrefix")
    corpus.unpersist()
  }

  test("uniform corpus: trained codebook holds recall parity") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val corpus = emb.where(col("vec_id") < 300).cache()
    val queries = emb.where(col("vec_id") < 30)

    val rTrained = recallOf(corpus, queries, trainedOn(corpus))
    val rPrefix = recallOf(corpus, queries, idPrefixOn(corpus))
    info(f"uniform recall@$K trained=$rTrained%.3f id-prefix=$rPrefix%.3f")
    assert(rTrained >= rPrefix - 0.1,
      s"trained codebook recall $rTrained fell >0.1 below id-prefix $rPrefix")
    corpus.unpersist()
  }
}
