package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** The outcome of [[tuneLsh]]: band layout a caller feeds straight
    * into `lshCandidates`/`minhash` (`bands × rows` permutations),
    * plus the integrated S-curve error that justified it.
    */
  final case class LshTuning(bands: Int, rows: Int, error: Double)

  /** Data-independent (bands, rows) selection for a target Jaccard
    * threshold — `tuneIvf`'s companion on the MinHash side: a user
    * should not hand-pick the band layout either. The candidate
    * probability of a pair at similarity s under b bands of r rows is
    * the S-curve P(s) = 1 − (1 − sʳ)ᵇ; the chosen layout minimizes
    * the usual integrated error — false-positive mass below the
    * threshold plus false-negative mass above it — over all layouts
    * with b·r ≤ p, by 1000-point midpoint quadrature. Pure driver
    * math over ≤ p·ln p candidates: deterministic, no data touched,
    * no job.
    */
  def tuneLsh(threshold: Double, p: Int = 12): LshTuning = {
    require(threshold > 0 && threshold < 1,
      s"tuneLsh: threshold must be in (0, 1), got $threshold")
    require(p >= 1, s"tuneLsh: p must be >= 1, got $p")
    val n = 1000
    val best = (for {
      r <- 1 to p
      b <- 1 to p / r
    } yield {
      val err = (0 until n).map { i =>
        val s = (i + 0.5) / n
        val pr = 1.0 - math.pow(1.0 - math.pow(s, r), b)
        if (s < threshold) pr else 1.0 - pr
      }.sum / n
      LshTuning(b, r, err)
    }).minBy(t => (t.error, t.bands * t.rows, t.rows))
    best
  }

  /** LSH candidate pairs: documents sharing at least one band bucket.
    * Equi-join on the band key — the scalable plan (shuffle by band key;
    * bucket sizes bound the quadratic blow-up).
    *
    * `maxBandFreq` (optional) drops band buckets holding more than that
    * many documents before the self-join — the guard against hot-band
    * skew: a cluster of exact duplicates puts its whole size into ONE
    * bucket, contributing O(size^2) join rows on a single shuffle key.
    * Dropping a hot bucket only loses candidate pairs whose every OTHER
    * band also disagrees, so recall loss is confined to borderline pairs
    * (see SCALING.md). Off by default — the oracle checks the exact
    * variant.
    */
  def lshCandidates(df: DataFrame, textCol: String, idCol: String,
      k: Int = 3, p: Int = 12, bands: Int = 4,
      maxBandFreq: Option[Int] = None): DataFrame =
    lshCandidatesLayout(df, textCol, idCol, k, bands, p / bands, maxBandFreq)

  /** LSH candidate pairs under a [[tuneLsh]]-selected band layout: the
    * caller states the Jaccard threshold they care about and the S-curve
    * picks (bands, rows) — only `bands × rows` permutations are computed
    * (the tuning may use fewer than the `p` budget when that minimizes
    * the integrated error). Same plan shape as `lshCandidates`: band-key
    * equi-join, never a product.
    */
  def lshCandidatesTuned(df: DataFrame, textCol: String, idCol: String,
      threshold: Double, k: Int = 3, p: Int = 12,
      maxBandFreq: Option[Int] = None): DataFrame = {
    val t = tuneLsh(threshold, p)
    lshCandidatesLayout(df, textCol, idCol, k, t.bands, t.rows, maxBandFreq)
  }

  private def lshCandidatesLayout(df: DataFrame, textCol: String,
      idCol: String, k: Int, bands: Int, r: Int,
      maxBandFreq: Option[Int]): DataFrame = {
    val p = bands * r
    // materialize the (id, band) table once: the self-join would otherwise
    // recompute every signature for both sides
    val withBands0 = minhash(df, textCol, idCol, k, p)
      .select(col(idCol), explode(bandKeys(col("sig"), bands, r)).as("band"))
    val withBands = CacheLifecycle.pin(maxBandFreq match {
      case None => withBands0
      case Some(cap) =>
        val hot = withBands0.groupBy("band")
          .agg(count(lit(1)).as("bf")).where(col("bf") > cap).select("band")
        withBands0.join(hot, Seq("band"), "left_anti")
    })
    val a = withBands.as("a")
    val b = withBands.as("b")
    a.join(b, "band")
      .where(col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** 64-bit SimHash per document: explode tokens, hash once per row
    * (one md5, split into two 32-bit halves — bits 0-31 from hex chars
    * 1-8, bits 32-63 from chars 9-16, each half non-negative so the
    * per-bit shifts never meet the sign bit), 64 bit-count sums per doc,
    * then recombine — same explode-and-partially-aggregate shape as
    * minhash. Bit 63's value is Long.MinValue; summing DISTINCT powers
    * of two never carries, so the sum is exactly the bit-OR.
    *
    * 64 bits is the web-scale width (Charikar/Manku et al.): at 32 bits
    * two UNRELATED documents sit within Hamming 3 with probability
    * ~1.3e-6 — a million-document corpus already yields ~10^5 spurious
    * near pairs — and maxDist-3 banding admits only 4×256 = 1,024
    * distinct band keys, a hard parallelism ceiling. At 64 bits the
    * false-pair odds drop to ~2e-15 and the same banding spreads over
    * 4×65,536 keys (see SCALING.md).
    */
  def simhash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val hashed = df
      .select(col(idCol), explode(tokens(col(textCol))).as("t"))
      .select(col(idCol), md5(col("t")).as("m"))
      .select(col(idCol),
        conv(substring(col("m"), 1, 8), 16, 10).cast("long").as("hlo"),
        conv(substring(col("m"), 9, 8), 16, 10).cast("long").as("hhi"))
    val aggs = count(lit(1)).as("n") +: (0 until 64).map { j =>
      val half = if (j < 32) col("hlo") else col("hhi")
      sum(call_function("shiftright", half, lit(j % 32)) % 2).as(s"b$j")
    }
    hashed.groupBy(idCol).agg(aggs.head, aggs.tail: _*)
      .select(col(idCol),
        (0 until 64).map(j =>
          when(col(s"b$j") * 2 > col("n"), lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs within Hamming distance `maxDist`, banded:
    * split the 64-bit signature into `maxDist + 1` bit bands — by
    * pigeonhole, any pair within distance `maxDist` agrees EXACTLY on at
    * least one band — equi-join on (band index, band value), then verify
    * the full Hamming distance. Exact same result set as the quadratic
    * all-pairs scan, but the plan is a shuffle-hash join on the band key,
    * never a nested-loop product. (Arithmetic vs logical shift is
    * immaterial: the band mask keeps only the low `width` bits, so the
    * sign-extension of a negative signature never reaches the key.)
    */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist < 64,
      s"simhashPairs: maxDist must be in [0, 64), got $maxDist")
    val nBands = maxDist + 1
    val bounds = (0 to nBands).map(i => i * 64 / nBands)
    val bandCols = (0 until nBands).map { i =>
      val off = bounds(i)
      val width = bounds(i + 1) - bounds(i)
      val mask = if (width >= 64) -1L else (1L << width) - 1
      struct(lit(i).as("bi"),
        call_function("shiftright", col("simhash"), lit(off))
          .bitwiseAND(lit(mask)).as("bv"))
    }
    // materialize (id, sig, band) once: both join legs reuse it
    val banded = CacheLifecycle.pin(simhash(df, textCol, idCol)
      .select(col(idCol), col("simhash"),
        explode(array(bandCols: _*)).as("band")))
    val a = banded.select(col("band"), col(idCol).as("id_a"),
      col("simhash").as("sig_a"))
    val b = banded.select(col("band"), col(idCol).as("id_b"),
      col("simhash").as("sig_b"))
    a.join(b, "band")
      .where(col("id_a") < col("id_b"))
      .withColumn("dist", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .where(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
      .distinct()
  }

  /** SimHash near-dedup KEEP-FIRST: drop every document with a near
    * PREDECESSOR (a smaller `idCol` within Hamming `maxDist`), keep the
    * rest. The store-always rule — every document's signature counts
    * against its successors whether or not it survived itself — makes a
    * document's fate depend only on the documents before it, so the
    * result is join-expressible (banded pairs + one anti-join, no
    * serial scan) and chains resolve deterministically: b near a drops,
    * and c near only b still drops. Same rule as the streaming
    * `$deduplicateNear` stage, with arrival order replaced by id order.
    */
  def simhashKeepFirst(df: DataFrame, textCol: String, idCol: String,
      maxDist: Int): DataFrame =
    df.join(
      simhashPairs(df, textCol, idCol, maxDist)
        .select(col("id_b").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** Random-hyperplane LSH over embeddings (cosine SimHash): each vector
    * gets a sign bit per hyperplane (dot ≥ 0), the bit string splits into
    * bands of `bandBits`, candidates equi-join on (band, band value), and
    * the exact cosine verifies. The standard cosine-LSH recall/cost dial:
    * more planes → fewer false candidates, more bands → higher recall.
    * `planes` supplies the hyperplanes — pass a deterministic frame (e.g.
    * the lowest-id corpus vectors) so the sample is reproducible; it is
    * broadcast (tiny). Plan shape: one narrow bit pass + a shuffle-hash
    * join on the band key — never a corpus×corpus product. Same
    * hot-bucket caveat as text SimHash: run exact dedup first.
    */
  def hyperplanePairs(corpus: DataFrame, planes: DataFrame, embCol: String,
      idCol: String, threshold: Double, bandBits: Int = 4): DataFrame = {
    val v = normalized(corpus, embCol, idCol, "v")
    // the planes frame is tiny by contract — the single-partition window
    // ranking it is a few rows, then it broadcasts
    val pl = broadcast(normalized(planes, embCol, idCol, "pe")
      .withColumn("__pi",
        row_number().over(Window.orderBy(col(idCol))) - 1)
      .select(col("__pi"), col("pe")))
    val bits = v.crossJoin(pl)
      .select(col(idCol),
        (col("__pi") / bandBits).cast("int").as("band"),
        (when(ndot6(col("v"), col("pe")) >= 0, 1L).otherwise(0L) *
          pow(lit(2.0), col("__pi") % bandBits).cast("long")).as("bit"))
    // materialize the narrow (id, band, bv) signatures once: BOTH legs of
    // the candidate self-join reuse them, so without the persist the
    // corpus×planes bit pass runs twice (same shape as simhashPairs'
    // banded.persist; ~bands rows per doc, far narrower than the corpus).
    // The returned plan depends on this frame, so it cannot unpersist
    // here; blocks are MEMORY_AND_DISK and LRU-evictable — a caller
    // running many passes in one session reclaims them deterministically
    // with CacheLifecycle.releaseAll() once the pass's output is written
    val sigs = CacheLifecycle.pin(bits.groupBy(col(idCol), col("band"))
      .agg(sum(col("bit")).as("bv")))
    val cand = sigs
      .select(col(idCol).as("id_a"), col("band"), col("bv"))
      .join(sigs.select(col(idCol).as("id_b"), col("band"), col("bv")),
        Seq("band", "bv"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    cand
      .join(v.select(col(idCol).as("id_a"), col("v").as("__va")), "id_a")
      .join(v.select(col(idCol).as("id_b"), col("v").as("__vb")), "id_b")
      .withColumn("cos", ndot6(col("__va"), col("__vb")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
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

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the
    * MOSS scheme): hash every k-token gram, then in every window of `w`
    * consecutive gram hashes select the minimum (RIGHTMOST position on
    * ties — the paper's rule, which makes selection robust to window
    * overlap), and deduplicate the selections. Guarantee: two documents
    * sharing any token run of length ≥ w + k − 1 share at least one
    * fingerprint, while storing only ~2/(w+1) of the gram hashes —
    * the sparse middle ground between the whole-document rolling hash
    * (`TextAnalysis`) and dense shingle sets.
    *
    * Shape: explode (id, pos, hash) once, fan each position into the ≤ w
    * windows containing it (a bounded ×w map, w is small), and pick each
    * window's winner with a PARTIAL min_by aggregate keyed on
    * (id, window) — never a per-document sort or a corpus window.
    * Returns distinct (idCol, pos, fp).
    */
  def winnowing(df: DataFrame, textCol: String, idCol: String,
      k: Int = 5, w: Int = 4): DataFrame = {
    require(k >= 1, s"winnowing: k must be >= 1, got $k")
    require(w >= 1, s"winnowing: w must be >= 1, got $w")
    val grams = df
      .select(col(idCol), tokens(col(textCol)).as("__t"))
      .select(col(idCol),
        posexplode(gramHashes(col("__t"), k)).as(Seq("pos", "h")))
    // a window q covers positions [q, q+w-1]; position p belongs to
    // windows max(0, p-w+1)..p. A truncated trailing window has fewer
    // than w members, so "exactly w members" identifies the real
    // windows without a doc-size join. Docs with fewer than w grams
    // have no full window and hence no fingerprints (the guarantee
    // needs w+k-1 tokens anyway).
    val fanned = grams
      .select(col(idCol), col("pos"), col("h"),
        explode(sequence(greatest(col("pos") - (w - 1), lit(0)),
          col("pos"))).as("q"))
    val winners = fanned
      .groupBy(col(idCol), col("q"))
      .agg(min_by(struct(col("pos"), col("h")),
        struct(col("h"), (lit(0) - col("pos")))).as("sel"),
        count(lit(1)).as("__n"))
      .where(col("__n") === w)
    winners.select(col(idCol), col("sel.pos").as("pos"),
      col("sel.h").as("fp")).distinct()
  }

  /** Ordered (not distinct) k-gram hashes of a token array — winnowing
    * needs positions, unlike the set-semantics `shingles`.
    */
  private def gramHashes(toks: Column, k: Int): Column =
    when(size(toks) < k, array().cast("array<long>"))
      .otherwise(transform(sequence(lit(0), size(toks) - k),
        i => h32(concat_ws(" ", (0 until k).map(j => get(toks, i + j)): _*))))

  /** Candidate near-dup pairs by shared winnowing fingerprints: an
    * inverted-index equi-join on the fingerprint (doc-frequency cap for
    * the boilerplate/hot-fingerprint guard, like `ngramJaccardPairs`),
    * counting DISTINCT shared fingerprints per pair. The w+k−1
    * guarantee makes `minShared = 1` exhaustive for long shared runs;
    * higher values trade recall for precision.
    */
  def winnowingPairs(df: DataFrame, textCol: String, idCol: String,
      k: Int = 5, w: Int = 4, minShared: Int = 2,
      maxDocFreq: Option[Int] = None): DataFrame = {
    // pinned: the a-side, b-side (and the doc-freq probe) all read the
    // fingerprint frame — unpinned, the whole winnowing subtree would
    // recompute per leg
    val fpAll = CacheLifecycle.pin(winnowing(df, textCol, idCol, k, w)
      .select(col(idCol), col("fp")).distinct())
    val fp = maxDocFreq match {
      case None => fpAll
      case Some(cap) =>
        val hot = fpAll.groupBy("fp").agg(count(lit(1)).as("df"))
          .where(col("df") > cap).select("fp")
        CacheLifecycle.pin(fpAll.join(hot, Seq("fp"), "left_anti"))
    }
    fp.select(col(idCol).as("id_a"), col("fp"))
      .join(fp.select(col(idCol).as("id_b"), col("fp")), "fp")
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
  }

  /** Embedding-cosine near-duplicate pairs, exact: all-pairs product.
    * ONLY for small bounded candidate sets — the plan is a nested-loop
    * join, so the input is GUARDED: more than `maxExactRows` rows fails
    * fast (one metadata-cheap count) instead of launching an O(n²) job
    * that can't finish at scale. The scale path is `embeddingPairsCelled`;
    * raise the cap explicitly only for a bounded candidate set.
    */
  def embeddingPairs(df: DataFrame, embCol: String, idCol: String,
      threshold: Double, maxExactRows: Long = 100000): DataFrame = {
    require(Fns.atMost(df, maxExactRows) <= maxExactRows,
      s"embeddingPairs is the EXACT all-pairs baseline and the input " +
        s"exceeds $maxExactRows rows (quadratic comparisons). Use " +
        "embeddingPairsCelled (IVF-celled, equi-join) at this size, or " +
        "raise maxExactRows for a deliberately bounded candidate set.")
    val v = normalized(df, embCol, idCol, "v")
    val a = v.select(col(idCol).as("id_a"), col("v").as("va"))
    val b = v.select(col(idCol).as("id_b"), col("v").as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", ndot6(col("va"), col("vb")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Embedding-cosine near-dup pairs at scale: assign every vector to its
    * nearest IVF cell (broadcast centroids — see Similarity.assignCells),
    * then pair only WITHIN a cell via an equi-join on the cell id. Search
    * cost drops from O(n^2) to O(sum cell^2); pairs straddling a cell
    * boundary are the recall trade-off, standard for IVF near-dup.
    */
  def embeddingPairsCelled(df: DataFrame, embCol: String, idCol: String,
      threshold: Double, nlist: Int): DataFrame =
    // single probe: a pair occurs in at most one cell, no dedup needed
    celledPairs(df, embCol, idCol, threshold,
      df.orderBy(col(idCol)).limit(nlist), nprobe = 1, dedup = false)

  /** Celled near-dup pairs with an explicit codebook (e.g. a trained
    * `Similarity.kmeansCentroids`) — balanced cells bound the worst
    * O(cell²) pair cost, which is what matters at 100 TB.
    */
  def embeddingPairsCelledWith(df: DataFrame, embCol: String, idCol: String,
      threshold: Double, centroids: DataFrame): DataFrame =
    celledPairs(df, embCol, idCol, threshold, centroids, nprobe = 1,
      dedup = false)

  /** Multi-probe variant of `embeddingPairsCelled`: every vector lands in
    * its `nprobe` nearest cells (Similarity.assignCellsMulti), recovering
    * the pairs a single-probe assignment loses at cell boundaries. A pair
    * can now co-occur in several cells — `distinct` collapses the
    * duplicates (cos is rounded, so the copies are bit-identical). Cost:
    * `nprobe²`× the within-cell pair candidates, still an equi-join.
    */
  def embeddingPairsCelledMulti(df: DataFrame, embCol: String,
      idCol: String, threshold: Double, nlist: Int,
      nprobe: Int): DataFrame =
    celledPairs(df, embCol, idCol, threshold,
      df.orderBy(col(idCol)).limit(nlist), nprobe, dedup = true)

  /** Connected components over a candidate-pair edge list → duplicate
    * CLUSTERS: every document gets the minimum reachable id as its
    * component label. Iterative min-label propagation WITH pointer
    * jumping — per round: neighbor labels flow one hop (equi-join
    * edges→labels), labels follow their own label's label (labels
    * self-join), then one min-aggregate. The jump doubles the
    * compressed distance per round, so convergence is O(log diameter)
    * rounds, not O(diameter) — a 1000-long pathological chain needs
    * ~10 rounds. Eager localCheckpoint per round truncates the
    * otherwise-doubling plan; the convergence check is a limit(1) count
    * of improved labels; `maxIter` bounds the loop and non-convergence
    * FAILS rather than returning split clusters. All joins are
    * equi-keyed, so AQE skew splitting applies (alternating
    * large/small-star is the fully skew-hardened variant).
    */
  def components(pairs: DataFrame, idACol: String = "id_a",
      idBCol: String = "id_b", maxIter: Int = 25): DataFrame = {
    // round 1 is folded into the init aggregate below, so the loop's
    // first pass is already round 2: maxIter=1 would skip the loop and
    // unconditionally fail the convergence require even on a trivially
    // converged graph. No caller asks for a 1-round budget; reject it
    // loudly instead of mis-reporting it as non-convergence.
    require(maxIter >= 2,
      s"components: maxIter must be >= 2 (round 1 is folded into the " +
        s"init aggregate), got $maxIter")
    val edges = pairs.select(col(idACol).as("src"), col(idBCol).as("dst"))
      .unionByName(
        pairs.select(col(idBCol).as("src"), col(idACol).as("dst")))
      .distinct()
      .persist()
    // Round 1 folded into the init: with identity labels the hop
    // proposal is just the reversed edge and the jump is a no-op, so
    // min(id, min incoming src) IS round 1's result — one aggregate
    // replaces the identity checkpoint plus a full first round (every
    // node appears as src because the edge list is symmetrized).
    // Eager localCheckpoint per round TRUNCATES the logical plan — the
    // naive loop doubles the plan each round (2^rounds analysis/heap).
    var labels = edges.select(col("dst").as("id"), col("src").as("label"))
      .unionByName(edges.select(col("src").as("id"),
        col("src").as("label")))
      .groupBy("id").agg(min(col("label")).as("label"))
      .localCheckpoint(true)
    val labelType = labels.schema("label").dataType
    var converged = false
    var iter = 1
    while (!converged && iter < maxIter) {
      // neighbor labels flow one hop...
      val proposals = edges.join(labels, edges("src") === labels("id"))
        .select(col("dst").as("id"), col("label"),
          lit(null).cast(labelType).as("old"))
      // ...and POINTER JUMPING compresses chains: follow my label's
      // label (labels self-joined on label=id), so the hop distance
      // doubles per round — O(log diameter) rounds, not O(diameter).
      // A 1000-long near-dup chain converges in ~10 rounds.
      val jumped = labels.as("l")
        .join(labels.as("m"), col("l.label") === col("m.id"))
        .select(col("l.id").as("id"), col("m.label").as("label"),
          lit(null).cast(labelType).as("old"))
      // the previous label rides the identity leg as `old`, so the
      // convergence check below is a narrow filter over the fresh
      // CHECKPOINTED frame — no per-round join of two label tables
      // (each id has exactly one identity row, so max(old) is its
      // previous label)
      val sc = labels.sparkSession.sparkContext
      sc.setJobDescription(s"components round $iter")
      val (next, changed) =
        try {
          val cp = labels.select(col("id"), col("label"),
              col("label").as("old"))
            .unionByName(proposals)
            .unionByName(jumped)
            .groupBy("id").agg(min(col("label")).as("label"),
              max(col("old")).as("old"))
            .localCheckpoint(true)
          (cp, cp.where(col("label") < col("old")).limit(1).count())
        } finally sc.setJobDescription(null)
      // drop the previous round's checkpointed blocks
      CacheLifecycle.releaseCheckpoint(labels)
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    // a silent non-converged result would report one cluster as several
    require(converged,
      s"components did not converge in $maxIter rounds — the pair graph " +
        "has a longer chain than expected; raise maxIter")
    // the FINAL labels checkpoint backs the returned frame; register it
    // so CacheLifecycle.releaseAll() can reclaim its blocks once the
    // caller has written the clusters out (after which the frame is dead
    // — a truncated lineage cannot recompute)
    CacheLifecycle.pinCheckpointed(labels)
    labels.select(col("id"), col("label").as("component"))
  }

  /** The prune plan a dedup pass ends with: every id with its canonical
    * representative (the cluster minimum from `components`; singletons
    * keep themselves) and the keep/drop verdict. One left join against
    * the (much smaller) component table — the corpus frame never
    * shuffles on anything but the join key.
    */
  def keepList(df: DataFrame, idCol: String, pairs: DataFrame,
      idACol: String = "id_a", idBCol: String = "id_b"): DataFrame = {
    val comps = components(pairs, idACol, idBCol)
    df.select(col(idCol))
      .join(comps.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("canonical_id"))
      .withColumn("keep", col(idCol) === col("canonical_id"))
  }

  /** Embedding near-dup RESOLUTION: IVF-celled cosine pairs → connected
    * components → canonical keep-list, in one call — the embedding
    * side's analog of the text pipeline's `keepList` ergonomics.
    * Returns every id with its cluster-minimum `canonical_id` and the
    * `keep` verdict; filter on `keep` (or join `canonical_id`) to
    * prune. `nprobe > 1` probes each vector's nearest cells for
    * boundary-pair recall.
    *
    * Scale shape: the parts compose without new exchanges beyond their
    * own — celled equi-join pair generation (never a product),
    * O(log diameter) label propagation over the pair edges (small by
    * construction: only near-duplicates), one left join of the corpus
    * against the component table.
    */
  def dedupEmbeddings(df: DataFrame, embCol: String, idCol: String,
      threshold: Double, nlist: Int, nprobe: Int = 1): DataFrame = {
    val pairs =
      if (nprobe <= 1)
        embeddingPairsCelled(df, embCol, idCol, threshold, nlist)
      else
        embeddingPairsCelledMulti(df, embCol, idCol, threshold, nlist,
          nprobe)
    keepList(df, idCol, pairs)
  }

  /** MinHash-LSH candidate pairs verified by EXACT shingle Jaccard —
    * the fuzzy-dedup pair stage with the false-positive band collisions
    * removed. Verification is restricted to candidate documents only:
    * their shingle tables rebuild from text (never stored), join on the
    * shingle key (inverted index over candidate ids, a tiny corpus
    * subset by construction), and the pair filter is a left-semi
    * against the candidate set — no all-pairs anything. The shingle
    * table is pinned: the a-side, b-side and size legs reuse one pass.
    * Returns (id_a, id_b, jaccard ≥ minJaccard).
    */
  def nearPairs(df: DataFrame, textCol: String, idCol: String,
      minJaccard: Double = 0.5, k: Int = 3, p: Int = 12, bands: Int = 4,
      maxBandFreq: Option[Int] = None): DataFrame = {
    require(minJaccard > 0 && minJaccard <= 1,
      s"nearPairs: minJaccard must be in (0, 1], got $minJaccard")
    val cand = CacheLifecycle.pin(
      lshCandidates(df, textCol, idCol, k, p, bands, maxBandFreq))
    val ids = cand.select(col("id_a").as(idCol))
      .union(cand.select(col("id_b").as(idCol))).distinct()
    val sh = CacheLifecycle.pin(
      df.join(ids, Seq(idCol), "left_semi")
        .select(col(idCol), tokens(col(textCol)).as("__t"))
        .select(col(idCol), explode(shingles(col("__t"), k)).as("sh")))
    val shared = sh.select(col(idCol).as("id_a"), col("sh"))
      .join(sh.select(col(idCol).as("id_b"), col("sh")), "sh")
      .where(col("id_a") < col("id_b"))
      .join(cand, Seq("id_a", "id_b"), "left_semi")
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("__shared"))
    val szs = sh.groupBy(idCol).agg(count(lit(1)).as("__sz"))
    shared
      .join(szs.select(col(idCol).as("id_a"), col("__sz").as("__sza")),
        "id_a")
      .join(szs.select(col(idCol).as("id_b"), col("__sz").as("__szb")),
        "id_b")
      .withColumn("jaccard", round(col("__shared") /
        (col("__sza") + col("__szb") - col("__shared")), 6))
      .where(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Text near-dup RESOLUTION in one call — the text-side analog of
    * [[dedupEmbeddings]]: LSH candidates → exact-Jaccard verification
    * (candidates only) → connected components → canonical keep-list.
    * Returns every id with its cluster-minimum `canonical_id` and the
    * `keep` verdict. The parts compose without new exchanges beyond
    * their own: band equi-join, candidate-restricted shingle join,
    * O(log diameter) label propagation over the (small) verified pair
    * set, one corpus left join.
    */
  def dedupNear(df: DataFrame, textCol: String, idCol: String,
      minJaccard: Double = 0.5, k: Int = 3, p: Int = 12, bands: Int = 4,
      maxBandFreq: Option[Int] = None): DataFrame =
    keepList(df, idCol,
      nearPairs(df, textCol, idCol, minJaccard, k, p, bands, maxBandFreq))

  /** Segment-level dedup (boilerplate removal, RefinedWeb/CCNet-style):
    * split each document on `sep`, drop every segment whose DOCUMENT
    * frequency exceeds `maxDocFrac` of the corpus (a paragraph repeated
    * across more than that fraction of documents is boilerplate —
    * headers, navigation, license blocks), and reassemble the survivors
    * in original order. Returns (idCol, text_clean, n_dropped); a
    * document whose every segment is boilerplate stays, with an empty
    * text_clean.
    *
    * Scale shape: one partial-aggregated distinct-count per segment
    * (shuffle keyed on the segment), an anti-join against the HOT
    * segment set only (small by construction — segments over the
    * fraction are few; Spark broadcasts it), and one aggregation back on
    * the document id. No window over the corpus, no product.
    */
  def dedupSegments(df: DataFrame, textCol: String, idCol: String,
      sep: String = "\n", maxDocFrac: Double = 0.5): DataFrame = {
    require(maxDocFrac > 0 && maxDocFrac <= 1,
      s"dedupSegments: maxDocFrac must be in (0, 1], got $maxDocFrac")
    val segArr = split(col(textCol),
      java.util.regex.Pattern.quote(sep))
    // _outer: a null text explodes to zero rows and the plain variant
    // would silently DROP the document from the output — a curation
    // stage must never lose rows. A null-text document survives with an
    // empty text_clean and n_dropped 0 (the null segment never matches
    // the hot set and collect_list skips it).
    val segs = df.select(col(idCol),
      posexplode_outer(segArr).as(Seq("pos", "seg")))
    // document frequency per segment vs the corpus size — both partial
    // aggregates; the threshold stays in-plan (broadcast 1-row frame),
    // no driver action
    val tot = df.select(count_distinct(col(idCol)).as("__tot"))
    val hot = segs.groupBy(col("seg"))
      .agg(count_distinct(col(idCol)).as("__df"))
      .crossJoin(broadcast(tot))
      .where(col("__df") > col("__tot") * maxDocFrac)
      .select(col("seg"))
    // mark-and-aggregate in ONE pass: a left join against the hot set
    // (broadcastable, like the anti-join it replaces) flags boilerplate
    // segments, and a single per-document aggregate produces both the
    // reassembled text (collect_list skips the null'd-out hot segments)
    // and the dropped count — no second corpus scan for sizes, and every
    // document keeps a row because every document has >= 1 segment
    segs.join(hot.withColumn("__hot", lit(true)), Seq("seg"), "left")
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("__hot").isNull,
            struct(col("pos"), col("seg"))))),
          s => s.getField("seg")), sep).as("text_clean"),
        sum(when(col("__hot"), 1L).otherwise(0L)).as("n_dropped"))
  }

  /** WITHIN-document repeated-line removal (the Gopher/RefinedWeb
    * cleaning step corpus-level dedup misses): every line keeps only its
    * FIRST occurrence inside its own document, survivors reassemble in
    * order. Returns (idCol, text_clean, n_dropped); null-text documents
    * survive with an empty text_clean (posexplode_outer — a curation
    * stage never loses rows).
    *
    * Scale shape: explode + one partial-aggregated min(pos) keyed on
    * (doc, line) — per-document keys, so no corpus-wide hot key exists —
    * and one per-document reassembly aggregate. No window, no join, no
    * product. An O(lines²)-per-row HOF formulation would stay narrow but
    * evaluates interpreted and quadratic on long documents.
    */
  def dedupLines(df: DataFrame, textCol: String, idCol: String,
      sep: String = "\n"): DataFrame = {
    val lines = df.select(col(idCol), posexplode_outer(
      split(col(textCol), java.util.regex.Pattern.quote(sep)))
      .as(Seq("pos", "line")))
    lines
      .groupBy(col(idCol), col("line"))
      .agg(min(col("pos")).as("__first"), count(lit(1)).as("__n"))
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("__first"), col("line")))),
          s => s.getField("line")), sep).as("text_clean"),
        sum(col("__n") - 1).as("n_dropped"))
      .withColumn("n_dropped",
        coalesce(col("n_dropped"), lit(0L)))
  }

  /** Exact duplicated-substring removal (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better" §4.1,
    * ExactSubstr): any window of `minTokens` consecutive whitespace
    * tokens that occurs MORE THAN ONCE in the corpus — across
    * documents or twice inside one — is duplication; every token
    * position covered by any occurrence of such a window is marked,
    * and the survivors reassemble in order (single-space normalized,
    * the documented token-level rendering of the paper's byte-level
    * spans). Returns (idCol, n_tokens, n_dropped_tokens, text_clean);
    * null/empty docs keep a row with zero counts.
    *
    * Scale shape — the paper's suffix array is a single-machine
    * construction; the equivalent corpus-scale formulation is window
    * fingerprints: one explode into (doc, start, 64-bit gram key), a
    * partial-aggregated count over the key, an equi-join back of the
    * duplicated keys, and a distinct-position coverage aggregate (the
    * same overlap-safe machinery as
    * [[TextAnalysis.gopherRepetitionRules]]). The key is md5's two
    * 32-bit halves kept as SEPARATE columns — a 16-byte shuffle key
    * independent of `minTokens`, no 50-token strings through the
    * exchange, and no signed-overflow corner in any engine. At 10¹³
    * windows the 64-bit birthday bound mis-marks ~10⁻⁷ of windows —
    * negligible for curation and replayed identically by the oracle.
    */
  def exactSubstringDedup(df: DataFrame, textCol: String, idCol: String,
      minTokens: Int = 50): DataFrame = {
    require(minTokens >= 2,
      s"exactSubstringDedup: minTokens must be >= 2, got $minTokens")
    val k = minTokens
    val toks = df.select(col(idCol),
      filter(split(col(textCol), " "), t => t =!= "").as("__w"))
    val tokPos = toks.select(col(idCol),
      posexplode_outer(col("__w")).as(Seq("__pos", "__tok")))
    val w = col("__w")
    val gramArr = when(size(w) < k, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(w) - k),
        i => md5(concat_ws(" ",
          (0 until k).map(j => get(w, i + j)): _*))))
    val occ = toks
      .select(col(idCol), posexplode(gramArr).as(Seq("__start", "__m")))
      .select(col(idCol), col("__start"),
        conv(substring(col("__m"), 1, 8), 16, 10).cast("long")
          .as("__hlo"),
        conv(substring(col("__m"), 9, 8), 16, 10).cast("long")
          .as("__hhi"))
    val dup = occ.groupBy(col("__hlo"), col("__hhi"))
      .agg(count(lit(1)).as("__c")).where(col("__c") > 1)
      .select(col("__hlo"), col("__hhi"))
    val cover = occ.join(dup, Seq("__hlo", "__hhi"))
      .select(col(idCol),
        explode(sequence(col("__start"), col("__start") + k - 1))
          .as("__pos"))
      .distinct()
    tokPos
      .join(cover.withColumn("__dup", lit(true)), Seq(idCol, "__pos"),
        "left")
      .groupBy(col(idCol))
      .agg(
        count(when(col("__tok").isNotNull, 1)).as("n_tokens"),
        sum(when(col("__dup"), 1L).otherwise(0L))
          .as("n_dropped_tokens"),
        array_join(transform(array_sort(collect_list(
          when(col("__dup").isNull && col("__tok").isNotNull,
            struct(col("__pos"), col("__tok"))))),
          s => s.getField("__tok")), " ").as("text_clean"))
  }

  /** Incremental (cross-corpus) dedup: the rows of `newDf` whose text is
    * NOT already present in `refDf` — the ingestion-time filter that
    * keeps a growing corpus exact-duplicate-free without re-deduping the
    * whole corpus per batch.
    *
    * Exact semantics either way (the result is an anti-join on the text);
    * `bloomExpectedItems` turns on the scale path: build a Bloom filter
    * over the NEW batch's text hashes (the small side — one distributed
    * aggregate, sketch to the driver, same contract as
    * `DataFrameStatFunctions.bloomFilter`), pre-filter the 100 TB
    * reference corpus with `might_contain` AT THE SCAN (Spark's native
    * codegen'd BloomFilterMightContain — a ref row failing the filter
    * provably matches nothing in the batch), and anti-join only the
    * survivors: the shuffle carries ~|new| rows instead of |ref|. False
    * positives only admit extra rows into the exact join, never change
    * the result. Null text never matches anything (SQL join semantics)
    * and is kept.
    */
  def dedupAgainst(newDf: DataFrame, refDf: DataFrame, textCol: String,
      bloomExpectedItems: Option[Long] = None,
      fpp: Double = 0.01): DataFrame = {
    val ref = refDf.select(col(textCol).as("__ref_text"))
    val pruned = bloomExpectedItems match {
      case None => ref
      case Some(n) =>
        require(n > 0, "dedupAgainst: bloomExpectedItems must be > 0")
        val bf = newDf.select(xxhash64(col(textCol)).as("__k"))
          .stat.bloomFilter("__k", n, fpp)
        val bytes = {
          val bos = new java.io.ByteArrayOutputStream()
          bf.writeTo(bos)
          bos.toByteArray
        }
        ref.where(call_function("bloom_might_contain", lit(bytes),
          xxhash64(col("__ref_text"))))
    }
    // equi-keys on (hash, text): the shuffle partitions on the cheap
    // 8-byte hash, the text equality keeps hash collisions from dropping
    // distinct rows
    newDf.join(pruned,
      xxhash64(col(textCol)) === xxhash64(col("__ref_text")) &&
        col(textCol) === col("__ref_text"),
      "left_anti")
  }

  /** Incremental NEAR-dedup: the rows of `newDf` whose text is not a
    * near-duplicate of any `refDf` row — `dedupAgainst`'s companion for
    * the syndicated/boilerplate copies an exact anti-join can't see.
    *
    * ONE-SHOT convenience form: the reference corpus' band table is
    * derived live (shingle + minhash over ALL of `refDf`) — but PINNED
    * via [[CacheLifecycle]], so repeated calls against the same
    * reference frame in one session amortize that corpus-wide pass
    * (Spark's CacheManager dedups identical plans, so the second call's
    * band subtree resolves to the cached table). Results are identical
    * either way; `CacheLifecycle.releaseAll()` reclaims the blocks. The
    * PRODUCTION form for a standing ingestion pipeline is
    * [[buildBandIndex]] + [[dedupAgainstNearIndexed]], which computes
    * that corpus-wide pass ONCE into a persisted (id, band) table and
    * lets every batch probe it — identical results, O(batch) work per
    * batch instead of O(corpus). Use this live path only for ad-hoc
    * single passes where building an index isn't worth it.
    *
    * Candidates come from a MinHash-LSH band join between the batch and
    * the reference: the BATCH side's band table is the broadcast side (a
    * batch is small next to a 100 TB reference), so the reference
    * streams through the probe with no corpus-wide shuffle. Candidates
    * then verify by exact shingle Jaccard — computed ONLY for candidate
    * pairs (shingle tables are semi-joined down to candidate documents
    * first). A new row drops when ANY verified reference neighbor
    * reaches `minJaccard`; exact copies drop too (identical bands,
    * Jaccard 1). Rows with null text or fewer than `k` tokens have no
    * shingles, band with nothing and are always KEPT — compose with the
    * exact `dedupAgainst` for those.
    *
    * `maxBandFreq` caps reference-side hot band buckets (a duplicate
    * cluster puts its whole size into one bucket, O(size) probe rows per
    * batch band) at a bounded recall cost — same dial as
    * `lshCandidates`, off by default so the oracle checks the exact
    * variant.
    */
  def dedupAgainstNear(newDf: DataFrame, refDf: DataFrame, textCol: String,
      idCol: String, minJaccard: Double = 0.8, k: Int = 3, p: Int = 12,
      bands: Int = 4, maxBandFreq: Option[Int] = None): DataFrame = {
    require(minJaccard > 0 && minJaccard <= 1,
      s"dedupAgainstNear: minJaccard must be in (0, 1], got $minJaccard")
    val r = p / bands
    def bandsOf(df: DataFrame, as: String) =
      minhash(df, textCol, idCol, k, p)
        .select(col(idCol).as(as),
          explode(bandKeys(col("sig"), bands, r)).as("band"))
    val nb = bandsOf(newDf, "__new_id")
    // only the REFERENCE side pins: it is the corpus-sized leg whose
    // shingle+minhash pass dominates the call; the batch side is small
    // and changes per call (caching it would only fill the LRU)
    val rb = CacheLifecycle.pin(bandsOf(refDf, "__ref_id"))
    nearFromBands(newDf, refDf, nb, rb, textCol, idCol, minJaccard, k,
      maxBandFreq)
  }

  /** Persist the reference side of `dedupAgainstNear`: the (id, band)
    * table — the only pass that touches the WHOLE corpus. Ingested
    * batches then probe the saved bands (`dedupAgainstNearIndexed`)
    * instead of re-shingling 100 TB per batch; the shingle verification
    * re-reads text only for candidate documents from the live reference
    * frame, so shingles are never stored. `dir/meta` pins (k, p, bands)
    * — a mismatch between index-time and probe-time parameters would
    * silently compare incompatible signatures.
    */
  def buildBandIndex(refDf: DataFrame, textCol: String, idCol: String,
      dir: String, k: Int = 3, p: Int = 12, bands: Int = 4): Unit = {
    minhash(refDf, textCol, idCol, k, p)
      .select(col(idCol).as("__ref_id"),
        explode(bandKeys(col("sig"), bands, p / bands)).as("band"))
      .write.mode("overwrite").parquet(s"$dir/bands")
    refDf.sparkSession.range(1)
      .select(lit(k).as("k"), lit(p).as("p"), lit(bands).as("bands"))
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Fold admitted batch rows into a `buildBandIndex` directory — the
    * step that closes the standing-ingestion loop (probe the index,
    * keep the survivors, APPEND the survivors' bands so the next batch
    * dedups against them too; the reference text frame passed to the
    * next probe must grow by the same rows). Bands derive with the
    * meta-pinned (k, p, bands); ids already present in the index are
    * skipped (first write wins, append never duplicates), detected
    * with the streaming-index/broadcast-batch probe shape — the index
    * is never shuffled.
    */
  def updateBandIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, df: DataFrame, textCol: String, idCol: String): Unit = {
    val m = spark.read.parquet(s"$dir/meta").collect()(0)
    val (k, p, bands) =
      (m.getAs[Int]("k"), m.getAs[Int]("p"), m.getAs[Int]("bands"))
    val nb = minhash(df, textCol, idCol, k, p)
      .select(col(idCol).as("__ref_id"),
        explode(bandKeys(col("sig"), bands, p / bands)).as("band"))
    val idx = spark.read.parquet(s"$dir/bands")
    val existing = idx
      .join(broadcast(nb.select("__ref_id").distinct()),
        Seq("__ref_id"), "left_semi")
      .select("__ref_id").distinct()
    nb.join(broadcast(existing), Seq("__ref_id"), "left_anti")
      .write.mode("append").parquet(s"$dir/bands")
  }

  /** `dedupAgainstNear` against a `buildBandIndex` directory: identical
    * results, with the corpus-wide shingle+minhash pass amortized into
    * the index build. `refDf` must be the frame the index was built
    * from — it supplies the candidate documents' text for the Jaccard
    * verification (an equi-join by id; only ~candidates rows of text
    * move).
    */
  def dedupAgainstNearIndexed(spark: org.apache.spark.sql.SparkSession,
      dir: String, newDf: DataFrame, refDf: DataFrame, textCol: String,
      idCol: String, minJaccard: Double = 0.8,
      maxBandFreq: Option[Int] = None): DataFrame = {
    require(minJaccard > 0 && minJaccard <= 1,
      s"dedupAgainstNearIndexed: minJaccard must be in (0, 1], got $minJaccard")
    val m = spark.read.parquet(s"$dir/meta").collect()(0)
    val (k, p, bands) =
      (m.getAs[Int]("k"), m.getAs[Int]("p"), m.getAs[Int]("bands"))
    val nb = minhash(newDf, textCol, idCol, k, p)
      .select(col(idCol).as("__new_id"),
        explode(bandKeys(col("sig"), bands, p / bands)).as("band"))
    val rb = spark.read.parquet(s"$dir/bands")
    nearFromBands(newDf, refDf, nb, rb, textCol, idCol, minJaccard, k,
      maxBandFreq)
  }

  /** Candidate generation + verification shared by the live and indexed
    * near-dedup paths: broadcast the batch bands into the reference band
    * table, then exact-Jaccard-verify candidates only.
    */
  private def nearFromBands(newDf: DataFrame, refDf: DataFrame,
      nb: DataFrame, rb0: DataFrame, textCol: String, idCol: String,
      minJaccard: Double, k: Int, maxBandFreq: Option[Int]): DataFrame = {
    val rb = maxBandFreq match {
      case None => rb0
      case Some(cap) =>
        val hot = rb0.groupBy("band").agg(count(lit(1)).as("bf"))
          .where(col("bf") > cap).select("band")
        rb0.join(hot, Seq("band"), "left_anti")
    }
    val cand = broadcast(nb).join(rb, "band")
      .select(col("__new_id"), col("__ref_id")).distinct()
    def shingleTable(df: DataFrame, ids: DataFrame, as: String) =
      df.join(ids, Seq(idCol), "left_semi")
        .select(col(idCol).as(as), tokens(col(textCol)).as("__t"))
        .select(col(as), explode(shingles(col("__t"), k)).as("sh"))
    val nsh = shingleTable(newDf,
      cand.select(col("__new_id").as(idCol)).distinct(), "__new_id")
    val rsh = shingleTable(refDf,
      cand.select(col("__ref_id").as(idCol)).distinct(), "__ref_id")
    val shared = nsh.join(rsh, "sh")
      .join(cand, Seq("__new_id", "__ref_id"), "left_semi")
      .groupBy("__new_id", "__ref_id").agg(count(lit(1)).as("__shared"))
    val nsz = nsh.groupBy("__new_id").agg(count(lit(1)).as("__nsz"))
    val rsz = rsh.groupBy("__ref_id").agg(count(lit(1)).as("__rsz"))
    val dropIds = shared.join(nsz, "__new_id").join(rsz, "__ref_id")
      .where(round(col("__shared") /
        (col("__nsz") + col("__rsz") - col("__shared")), 6) >= minJaccard)
      .select(col("__new_id").as(idCol)).distinct()
    newDf.join(dropIds, Seq(idCol), "left_anti")
  }

  private def celledPairs(df: DataFrame, embCol: String, idCol: String,
      threshold: Double, centroids: DataFrame, nprobe: Int,
      dedup: Boolean): DataFrame = {
    val cells =
      Similarity.assignCellsMulti(df, centroids, embCol, idCol, nprobe)
    val a = cells.select(col("cell"), col(idCol).as("id_a"),
      col("v").as("va"))
    val b = cells.select(col("cell"), col(idCol).as("id_b"),
      col("v").as("vb"))
    val pairs = a.join(b, "cell")
      .where(col("id_a") < col("id_b"))
      .withColumn("cos", ndot6(col("va"), col("vb")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
    // multi-probe: a pair co-occurs in up to nprobe shared cells; the
    // copies are bit-identical (cos is rounded), distinct collapses them
    if (dedup) pairs.distinct() else pairs
  }
}
