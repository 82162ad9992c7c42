package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared columnar building blocks for the training-data-pipeline operators
  * (dedup, similarity, text analysis). Everything here is a deterministic
  * Catalyst expression — no UDFs, no RNG — so results are reproducible
  * across engines (the DuckDB oracles replay the same formulas) and across
  * cluster topologies (no partition-order dependence).
  */
object Fns {

  /** Deterministic unsigned-32-bit string hash: first 8 hex chars of md5.
    * Codegen'd; identical in DuckDB as ('0x'||substr(md5(s),1,8))::BIGINT.
    */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast(LongType)

  /** Lower-cased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Distinct k-word shingles of the token array. */
  def shingles(toks: Column, k: Int): Column =
    array_distinct(
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))

  private val MinhashPrime = 4294967311L // smallest prime > 2^32

  /** MinHash signature: p permutations h_i(x) = ((1+2i)*h32(x) + 7919*i)
    * mod prime, min over shingles. (1+2i) keeps the multiplier odd;
    * products stay < 2^38 so 64-bit arithmetic never overflows.
    */
  def minhashSignature(shingleArr: Column, p: Int): Column =
    transform(sequence(lit(0), lit(p - 1)),
      i =>
        array_min(transform(shingleArr,
          s => ((lit(1) + i * 2) * h32(s) + lit(7919L) * i) % MinhashPrime)))

  /** LSH band keys: `b:mh[3b],mh[3b+1],mh[3b+2]` per band of r rows. */
  def bandKeys(sig: Column, bands: Int, r: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b =>
        concat_ws(":", b.cast(StringType),
          concat_ws(",", (0 until r).map(j => get(sig, b * r + j)): _*)))

  /** 32-bit SimHash over the token multiset: bit j set iff more than half
    * the tokens have bit j set in their h32.
    */
  def simhash32(toks: Column): Column =
    aggregate(
      sequence(lit(0), lit(31)),
      lit(0L),
      (acc, j) => {
        val ones = size(filter(toks,
          t => call_function("shiftright", h32(t), j) % 2 === 1))
        acc + when(ones * 2 > size(toks),
          call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))
      })

  /** Polynomial rolling fingerprint of the token sequence (order-sensitive,
    * unlike SimHash): acc = (acc*31 + h32(tok)) mod 1e15+7.
    */
  def rollingFingerprint(toks: Column): Column =
    aggregate(toks, lit(0L),
      (acc, t) => (acc * 31 + h32(t)) % 1000000000000007L)

  /** Cast a float embedding to double (all similarity math in f64 so the
    * oracle's arithmetic matches bit-for-bit).
    */
  def f64(emb: Column): Column = transform(emb, x => x.cast(DoubleType))

  /** Sequential-order dot product (zip_with + left fold). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, v) => s + v)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Cosine rounded to 6 decimals: rank-stable across engines. */
  def cosine6(a: Column, b: Column): Column = round(cosine(a, b), 6)
}
