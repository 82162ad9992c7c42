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

  /** MinHash signatures per document, as explode + p min-aggregates: the
    * md5 hash runs exactly once per (doc, shingle) row, the permutations
    * are cheap arithmetic, and map-side partial aggregation keeps the
    * shuffle at one row per document. (A HOF formulation recomputes the
    * hash per permutation — Catalyst inlines sub-expressions into each
    * lambda, 12x the md5 work.)
    */
  def minhash(df: DataFrame, textCol: String, idCol: String, k: Int = 3,
      p: Int = 12): DataFrame = {
    val hashed = df
      .select(col(idCol), tokens(col(textCol)).as("__t"))
      .select(col(idCol), explode(shingles(col("__t"), k)).as("s"))
      .select(col(idCol), h32(col("s")).as("h"))
    val perms = (0 until p).map(i =>
      min((lit(1L + 2 * i) * col("h") + lit(7919L * i)) % MinhashPrime)
        .as(s"mh$i"))
    hashed.groupBy(idCol).agg(perms.head, perms.tail: _*)
      .select(col(idCol),
        array((0 until p).map(i => col(s"mh$i")): _*).as("sig"))
  }

  /** LSH candidate pairs: documents sharing at least one band bucket.
    * Equi-join on the band key — the scalable plan (shuffle by band key;
    * bucket sizes bound the quadratic blow-up).
    */
  def lshCandidates(df: DataFrame, textCol: String, idCol: String,
      k: Int = 3, p: Int = 12, bands: Int = 4): DataFrame = {
    val r = p / bands
    // materialize the (id, band) table once: the self-join would otherwise
    // recompute every signature for both sides
    val withBands = minhash(df, textCol, idCol, k, p)
      .select(col(idCol), explode(bandKeys(col("sig"), bands, r)).as("band"))
      .persist()
    val a = withBands.as("a")
    val b = withBands.as("b")
    a.join(b, "band")
      .where(col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** 32-bit SimHash per document: explode tokens, hash once per row, 32
    * bit-count sums per doc, then recombine — same
    * explode-and-partially-aggregate shape as minhash.
    */
  def simhash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val hashed = df
      .select(col(idCol), explode(tokens(col(textCol))).as("t"))
      .select(col(idCol), h32(col("t")).as("h"))
    val aggs = count(lit(1)).as("n") +: (0 until 32).map(j =>
      sum(call_function("shiftright", col("h"), lit(j)) % 2).as(s"b$j"))
    hashed.groupBy(idCol).agg(aggs.head, aggs.tail: _*)
      .select(col(idCol),
        (0 until 32).map(j =>
          when(col(s"b$j") * 2 > col("n"), lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

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
  /** `maxDocFreq` (optional) drops shingles present in more than that
    * many documents before the pair join — the standard guard against
    * stopword-shingle skew: one hot shingle otherwise contributes
    * O(docFreq^2) join rows. Changes candidate recall, so it is off by
    * default (the oracle checks the exact variant).
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      k: Int = 3, threshold: Double = 0.2,
      maxDocFreq: Option[Int] = None): DataFrame = {
    val shAll = df
      .select(col(idCol), tokens(col(textCol)).as("__t"))
      .select(col(idCol), explode(shingles(col("__t"), k)).as("sh"))
    val sh = maxDocFreq match {
      case None => shAll
      case Some(cap) =>
        val hot = shAll.groupBy("sh").agg(count(lit(1)).as("df"))
          .where(col("df") > cap).select("sh")
        shAll.join(hot, Seq("sh"), "left_anti")
    }
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
    val v = normalized(df, embCol, idCol, "v")
    val a = v.select(col(idCol).as("id_a"), col("v").as("va"))
    val b = v.select(col(idCol).as("id_b"), col("v").as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", ndot6(col("va"), col("vb")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
