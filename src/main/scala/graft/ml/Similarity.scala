package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Fns._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - `bruteForceTopK` is the exact baseline: query×corpus join, window
  *    top-k per query. Fine when |queries| is small; the corpus side stays
  *    partitioned, ranks are computed per-query partition.
  *  - `ivfTopK` is the scale path: a deterministic IVF — centroids are a
  *    fixed id-prefix sample (a stand-in for k-means; the assignment and
  *    search plumbing is identical), vectors are assigned to their nearest
  *    centroid cell, queries probe only the best `nprobe` cells. Search
  *    cost drops by ~nlist/nprobe; everything stays an equi-join on
  *    cell id (shuffle by cell), never an all-pairs product.
  */
object Similarity {

  /** Exact top-k neighbors for each query row (excluding self). Rank by
    * rounded cosine desc then id asc — fully deterministic.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, embCol: String,
      idCol: String, k: Int): DataFrame = {
    val c = normalized(corpus, embCol, idCol, "vc")
      .withColumnRenamed(idCol, "nb_id")
    val q = normalized(queries, embCol, idCol, "vq")
      .withColumnRenamed(idCol, "query_id")
    val scored = q.join(c, col("query_id") =!= col("nb_id"))
      .withColumn("cos", ndot6(col("vq"), col("vc")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("nb_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nb_id"), col("cos"))
  }

  /** Deterministic cell assignment: nearest centroid by rounded cosine,
    * ties to the lowest centroid id.
    */
  def assignCells(corpus: DataFrame, centroids: DataFrame, embCol: String,
      idCol: String): DataFrame = {
    val c = normalized(centroids, embCol, idCol, "vcent")
      .withColumnRenamed(idCol, "cell")
    val v = normalized(corpus, embCol, idCol, "v")
    val w = Window.partitionBy(idCol)
      .orderBy(col("ccos").desc, col("cell").asc)
    v.crossJoin(broadcast(c))
      .withColumn("ccos", ndot6(col("v"), col("vcent")))
      .withColumn("r", row_number().over(w))
      .where(col("r") === 1)
      .select(col(idCol), col("cell"), col("v"))
  }

  /** IVF ANN: probe the best `nprobe` cells per query, exact search within.
    * Centroids = the `nlist` lowest-id vectors (deterministic stand-in for
    * a trained codebook).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, embCol: String,
      idCol: String, k: Int, nlist: Int, nprobe: Int): DataFrame = {
    val centroids = corpus.orderBy(col(idCol)).limit(nlist)
    val cells = assignCells(corpus, centroids, embCol, idCol)
      .withColumnRenamed(idCol, "nb_id")
    val q = normalized(queries, embCol, idCol, "vq")
      .withColumnRenamed(idCol, "query_id")
    val cent = normalized(centroids, embCol, idCol, "vcent")
      .withColumnRenamed(idCol, "cell")
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("ccos").desc, col("cell").asc)
    val probed = q.crossJoin(broadcast(cent))
      .withColumn("ccos", ndot6(col("vq"), col("vcent")))
      .withColumn("pr", row_number().over(wProbe))
      .where(col("pr") <= nprobe)
      .select(col("query_id"), col("vq"), col("cell"))
    val wRank = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("nb_id").asc)
    probed.join(cells, "cell")
      .where(col("query_id") =!= col("nb_id"))
      .withColumn("cos", ndot6(col("vq"), col("v")))
      .withColumn("rank", row_number().over(wRank))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nb_id"), col("cos"))
  }
}
