package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import Fns._

/** Deduplication operators for large-scale text corpora. Each is a
  * DataFrame transform designed for the 100 TB shape of the problem:
  *  - exact: one hash-shuffle, no data movement of the payload
  *  - MinHash/LSH: candidate generation is a band-key equi-join (shuffle on
  *    band key), never an all-pairs product
  *  - SimHash: per-row signature + band join on signature prefix
  *  - n-gram Jaccard: shingle-inverted-index join for verification
  */
object Dedup {

  /** Exact dedup on a fingerprint of the text: keeps the row with the
    * minimum id per fingerprint (deterministic winner).
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val fp = md5(lower(col(textCol)))
    df.withColumn("__fp", fp)
      .groupBy(col("__fp").as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
  }

  /** MinHash signatures per document. */
  def minhash(df: DataFrame, textCol: String, idCol: String, k: Int = 3,
      p: Int = 12): DataFrame =
    df.select(col(idCol),
      minhashSignature(shingles(tokens(col(textCol)), k), p).as("sig"))

  /** LSH candidate pairs: documents sharing at least one band bucket.
    * Equi-join on the band key — the scalable plan (shuffle by band key;
    * bucket sizes bound the quadratic blow-up).
    */
  def lshCandidates(df: DataFrame, textCol: String, idCol: String,
      k: Int = 3, p: Int = 12, bands: Int = 4): DataFrame = {
    val r = p / bands
    val withBands = minhash(df, textCol, idCol, k, p)
      .select(col(idCol), explode(bandKeys(col("sig"), bands, r)).as("band"))
    val a = withBands.as("a")
    val b = withBands.as("b")
    a.join(b, "band")
      .where(col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** 32-bit SimHash per document. */
  def simhash(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), simhash32(tokens(col(textCol))).as("simhash"))

  /** SimHash near-dup pairs within Hamming distance `maxDist`, for a
    * bounded candidate set (callers restrict or pre-bucket; full-scale
    * variant joins on 16-bit signature halves first — any pair within
    * distance d shares an exact half when d < 2 halves).
    */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
      maxDist: Int): DataFrame = {
    val sigs = simhash(df, textCol, idCol)
    val a = sigs.select(col(idCol).as("id_a"), col("simhash").as("sig_a"))
    val b = sigs.select(col(idCol).as("id_b"), col("simhash").as("sig_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("dist", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .where(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Exact n-gram Jaccard similarity over a shingle inverted index:
    * explode distinct shingles, self-join on shingle, count shared, then
    * |A∩B| / (|A|+|B|-|A∩B|). No all-pairs product; shuffle on shingle.
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      k: Int = 3, threshold: Double = 0.2): DataFrame = {
    val sh = df.select(col(idCol),
      explode(shingles(tokens(col(textCol)), k)).as("sh"))
    val sizes = sh.groupBy(idCol).agg(count(lit(1)).as("sz"))
    val shared = sh.as("a").join(sh.as("b"), "sh")
      .where(col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.withColumnRenamed(idCol, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed(idCol, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        round(col("shared") / (col("sz_a") + col("sz_b") - col("shared")), 6))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("shared"), col("jaccard"))
  }

  /** Embedding-cosine near-duplicate pairs over a bounded candidate set
    * (the scale path buckets candidates with IVF/LSH first — see
    * Similarity.ivfTopK).
    */
  def embeddingPairs(df: DataFrame, embCol: String, idCol: String,
      threshold: Double): DataFrame = {
    val v = df.select(col(idCol), f64(col(embCol)).as("v"))
    val a = v.select(col(idCol).as("id_a"), col("v").as("va"))
    val b = v.select(col(idCol).as("id_b"), col("v").as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", cosine6(col("va"), col("vb")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
