package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Fns._

/** Corpus-curation operators a large-scale training-data pipeline needs
  * beyond dedup/quality: benchmark-contamination detection, sequence
  * packing (concat-then-chunk), and domain-mix resampling. All shuffle
  * on equi-keys or bounded aggregates — no cartesian products, no
  * global single-partition windows.
  */
object Curation {

  /** Deterministic host extraction from a URL string — the curation
    * pipeline's provenance key (per-domain quotas, blocklists,
    * `domainMix` labels all start here). Pure regex + string
    * normalization, no java.net parsing: the SAME extraction replays in
    * any SQL engine (the oracle runs it in DuckDB) and a malformed URL
    * yields null instead of an exception — a curation pass must never
    * throw on crawl junk. Normalization: strip scheme / userinfo / port
    * / path / query / fragment, lowercase, strip one trailing dot.
    * A codegen'd narrow map — no shuffle, no UDF.
    */
  def extractHost(url: Column): Column = {
    // a host never contains whitespace; with no explicit scheme the
    // extraction additionally requires a DOTTED host, so free text that
    // merely starts with a word ("not a url ...") yields null instead
    // of its first token
    val withScheme = regexp_extract(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#\\s]*@)?([^/:?#\\s]+)", 1)
    val bare = regexp_extract(url,
      "^(?:[^/@?#\\s]*@)?([^/:?#\\s]+)", 1)
    val raw = when(withScheme =!= "", withScheme)
      .when(bare.contains("."), bare)
      .otherwise(lit(""))
    val cleaned = regexp_replace(lower(raw), "\\.$", "")
    when(cleaned === "", lit(null).cast(StringType)).otherwise(cleaned)
  }

  /** Registrable ("pay-level") domain of a host: the last two labels,
    * or three when the last two form a well-known multi-label public
    * suffix (co.uk, com.au, ...). The built-in suffix set is a
    * deliberately small, deterministic heuristic — a production run
    * would broadcast-join the full Public Suffix List (it is data, not
    * code); the grouping key's SHAPE (narrow map, no shuffle) is
    * identical either way. Hosts with ≤ 1 label (and null) pass
    * through unchanged.
    */
  private val multiLabelSuffixes = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "co.nz", "co.in", "co.za", "com.br",
    "com.mx", "com.cn", "com.sg", "com.ar", "com.tr")
  def registrableDomain(host: Column): Column = {
    val parts = split(host, "\\.")
    val n = size(parts)
    val lastTwo =
      concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    val lastThree = concat_ws(".", element_at(parts, -3),
      element_at(parts, -2), element_at(parts, -1))
    when(host.isNull || n <= 1, host)
      .when(n >= 3 && lastTwo.isin(multiLabelSuffixes: _*), lastThree)
      .otherwise(lastTwo)
  }

  /** Canonical URL for URL-level dedup — the normalization every crawl
    * pipeline applies before treating two URLs as the same page:
    * fragment stripped, scheme and host lowercased, userinfo dropped,
    * default ports (:80 http, :443 https) stripped, trailing path
    * slashes stripped, tracking query parameters removed (utm_*,
    * fbclid, gclid, ref, mc_cid, mc_eid) and the survivors SORTED so
    * parameter order never splits a page. Pure regex/array expressions
    * (each single-match, so engines that replace first-match-only
    * replay identically); null in → null out. A codegen'd narrow map.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val pre = regexp_extract(noFrag, "^([^?]*)", 1)
    val q = regexp_extract(noFrag, "^[^?]*\\?(.*)$", 1)
    val scheme = lower(regexp_extract(pre,
      "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val rest = when(scheme =!= "",
      regexp_replace(pre, "^[a-zA-Z][a-zA-Z0-9+.-]*://", ""))
      .otherwise(pre)
    val hostport = lower(regexp_replace(
      regexp_extract(rest, "^([^/]*)", 1), "^[^@]*@", ""))
    val host = when(scheme === "http",
      regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val path = regexp_replace(
      regexp_extract(rest, "^[^/]*(/.*)?$", 1), "/+$", "")
    val params = filter(split(q, "&"), p =>
      p =!= "" &&
        !p.rlike("^(utm_[^=]*|fbclid|gclid|ref|mc_cid|mc_eid)(=|$)"))
    val qs = array_join(array_sort(params), "&")
    when(url.isNull, lit(null).cast(StringType)).otherwise(concat(
      when(scheme =!= "", concat(scheme, lit("://"))).otherwise(lit("")),
      host, path,
      when(qs =!= "", concat(lit("?"), qs)).otherwise(lit(""))))
  }

  /** URL-level exact dedup: every id with the corpus-minimum id among
    * the rows sharing its CANONICAL url and the keep verdict — the
    * crawl-side keep-list (same ergonomics as `Dedup.keepList`). Rows
    * with no parseable url (null canonical) always keep: "no URL" is
    * not a duplicate of "no URL". Plan: narrow canonicalization map →
    * one hash aggregate on the canonical key → one equi-join back; no
    * window, no product.
    */
  def dedupUrls(df: DataFrame, urlCol: String, idCol: String): DataFrame = {
    val canon = df.select(col(idCol),
      canonicalizeUrl(col(urlCol)).as("canonical_url"))
    val firsts = canon.where(col("canonical_url").isNotNull)
      .groupBy("canonical_url").agg(min(col(idCol)).as("__first"))
    canon.join(firsts, Seq("canonical_url"), "left")
      .select(col(idCol), col("canonical_url"),
        (col("canonical_url").isNull || col(idCol) === col("__first"))
          .as("keep"))
  }

  /** Per-domain corpus statistics: group the corpus by registrable
    * domain (derived from `urlCol` in the same narrow map) and count
    * documents, distinct hosts and an optional summed weight (token
    * count, quality score). THE standard curation dashboard query, and
    * the input `domainMix`'s quotas are computed from. Plan: narrow
    * extraction map → hash aggregate with map-side partials (the
    * distinct-host count rides Spark's partial distinct aggregation);
    * no window, no product, no driver collect. Docs with no parseable
    * host group under the null domain — dropping them silently would
    * misreport the corpus.
    */
  def domainStats(df: DataFrame, urlCol: String,
      weightCol: Option[String] = None): DataFrame = {
    val keyed = df
      .withColumn("__host", extractHost(col(urlCol)))
      .withColumn("domain", registrableDomain(col("__host")))
    val aggs = Seq(count(lit(1)).as("n_docs"),
      count_distinct(col("__host")).as("n_hosts")) ++
      weightCol.map(w => sum(col(w)).as("sum_weight"))
    keyed.groupBy(col("domain")).agg(aggs.head, aggs.tail: _*)
  }

  /** Benchmark contamination (the decontamination pass every pretraining
    * corpus runs before training): a document is contaminated when it
    * shares at least `minShared` distinct k-word shingles with ANY
    * document of the benchmark set. Inverted-index equi-join on the
    * shingle key — the benchmark side is tiny in practice and broadcasts
    * under AQE; the corpus side streams through map-side-distinct.
    * Returns only contaminated docs: (id, shared_ngrams).
    */
  def contamination(docs: DataFrame, bench: DataFrame, textCol: String,
      idCol: String, k: Int = 3, minShared: Long = 2,
      /** skew guard for the 100 TB run: drop shingles whose CORPUS
        * document frequency exceeds this (stop-phrase shingles are
        * non-discriminative — real decontamination uses long, rare
        * n-grams — but they dominate the join volume). 0 = off; the
        * oracle runs uncapped, like the LSH band caps (SCALING.md).
        */
      maxShingleDocs: Long = 0): DataFrame = {
    def shingleSet(df: DataFrame, keep: Column*) = df
      .select(keep :+ tokens(col(textCol)).as("__t"): _*)
      .select(keep :+ explode(shingles(col("__t"), k)).as("sh"): _*)
    val docSh0 = shingleSet(docs, col(idCol))
    val docSh =
      if (maxShingleDocs <= 0) docSh0
      else { // hot-key anti-join, same shape as ngramJaccardPairs' cap:
        // the freq side partial-aggregates map-side, so the hot keys
        // never amplify a shuffle
        val hot = docSh0.groupBy("sh").agg(count(lit(1)).as("__df"))
          .where(col("__df") > maxShingleDocs).select("sh")
        docSh0.join(hot, Seq("sh"), "left_anti")
      }
    val benchSh = shingleSet(bench).distinct()
    docSh.join(benchSh, "sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("shared_ngrams"))
      .where(col("shared_ngrams") >= minShared)
  }

  /** Decontamination keep-list: `contamination`'s resolution step —
    * drop every document sharing at least `minShared` distinct k-gram
    * shingles with the benchmark/eval set, keep the rest. A left
    * anti-join against the (small by construction) contaminated-id set;
    * null-text documents shingle to nothing and are kept. Same
    * `maxShingleDocs` skew guard as `contamination`.
    */
  def decontaminate(docs: DataFrame, bench: DataFrame, textCol: String,
      idCol: String, k: Int = 3, minShared: Long = 2,
      maxShingleDocs: Long = 0): DataFrame =
    docs.join(
      contamination(docs, bench, textCol, idCol, k, minShared,
        maxShingleDocs).select(idCol),
      Seq(idCol), "left_anti")

  /** Boundary-respecting NEXT-FIT packing (the layout for training
    * without cross-document attention — `packChunks`' complement, which
    * SPLITS documents across fixed windows): documents concatenate in
    * `idCol` order and each lands whole in the bin its START offset
    * falls into — `bin = floor(start / binTokens)` — so a bin may run
    * over `binTokens` by at most one document (greedy next-fit; cap
    * documents upstream if strict capacity matters). Deterministic,
    * SQL-replayable, and the global start offsets ride the same
    * two-level bucket scan as `packChunks` — no corpus-wide window.
    * Returns (idCol, bin, start_tok, n_tokens); zero/null-token
    * documents are excluded like `packChunks`.
    */
  def packBins(df: DataFrame, textCol: String, idCol: String,
      binTokens: Long, bucketSize: Long = 1000L): DataFrame = {
    require(binTokens > 0, "packBins: binTokens must be > 0")
    val id = col(idCol)
    val toks = df
      .select(id.as("__id"),
        size(tokens(col(textCol))).cast(LongType).as("__n"))
      .where(col("__n") > 0)
      .withColumn("__bkt", floor(col("__id") / bucketSize))
    val inBucket = toks.withColumn("__cum",
      sum(col("__n")).over(
        Window.partitionBy("__bkt").orderBy("__id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bucketOffsets = toks.groupBy("__bkt")
      .agg(sum(col("__n")).as("__btot"))
      .withColumn("__boff",
        coalesce(sum(col("__btot")).over(
          Window.orderBy("__bkt")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bkt"), col("__boff"))
    inBucket.join(broadcast(bucketOffsets), "__bkt")
      .withColumn("__start", col("__boff") + col("__cum") - col("__n"))
      .select(col("__id").as(idCol),
        floor(col("__start") / binTokens).cast(LongType).as("bin"),
        col("__start").as("start_tok"), col("__n").as("n_tokens"))
  }

  /** Concat-then-chunk sequence packing (the standard pretraining
    * batching layout): documents are concatenated in `idCol` order into
    * one virtual token stream, which is cut into fixed `chunkTokens`
    * windows; each output row maps a document to one chunk it overlaps,
    * with the doc-local token slice [tok_from, tok_to).
    *
    * The global prefix sum is computed WITHOUT a single-partition window
    * (the classic distributed-scan shape): ids bucket arithmetically
    * (`id div bucketSize`), each bucket cumsums locally (window keyed by
    * bucket — a normal hash-partitioned window), bucket totals cumsum in
    * one tiny N/bucketSize-row pass, and the offsets broadcast-join back.
    * At 10⁹ docs with the default bucket that middle pass is ~10⁶ rows —
    * recurse the same trick if that ever becomes the bottleneck.
    */
  def packChunks(df: DataFrame, textCol: String, idCol: String,
      chunkTokens: Long, bucketSize: Long = 1000L): DataFrame = {
    val id = col(idCol)
    val toks = df
      .select(id.as("__id"), size(tokens(col(textCol))).cast(LongType).as("__n"))
      .where(col("__n") > 0)
      .withColumn("__bkt", floor(col("__id") / bucketSize))
    val inBucket = toks.withColumn("__cum",
      sum(col("__n")).over(
        Window.partitionBy("__bkt").orderBy("__id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bucketOffsets = toks.groupBy("__bkt")
      .agg(sum(col("__n")).as("__btot"))
      .withColumn("__boff",
        coalesce(sum(col("__btot")).over(
          Window.orderBy("__bkt")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bkt"), col("__boff"))
    val placed = inBucket
      .join(broadcast(bucketOffsets), "__bkt")
      .withColumn("__end", col("__boff") + col("__cum"))
      .withColumn("__start", col("__end") - col("__n"))
    placed
      .select(col("__id"), col("__n"), col("__start"), col("__end"),
        explode(sequence(
          floor(col("__start") / chunkTokens),
          floor((col("__end") - 1) / chunkTokens))).as("chunk_id"))
      .select(
        col("__id").as(idCol),
        col("chunk_id").cast(LongType),
        (greatest(col("__start"), col("chunk_id") * chunkTokens)
          - col("__start")).as("tok_from"),
        (least(col("__end"), (col("chunk_id") + 1) * chunkTokens)
          - col("__start")).as("tok_to"))
  }

  /** Token-budget corpus selection (the data-mixing step after scoring):
    * keep the highest-quality documents, in (quality desc, id) order,
    * whose running token total stays within `tokenBudget` — a strict
    * greedy prefix, so the selection is deterministic and SQL-replayable.
    * The global running sum uses the same two-level scan as `packChunks`,
    * except the buckets quantize the SORT KEY (quality, `1/qualityBuckets`
    * granularity): bucket order is quality order, so no corpus-wide
    * single-partition window exists. Ties inside a quantum stay in one
    * bucket, so the id tiebreak is still total.
    */
  def selectByBudget(df: DataFrame, textCol: String, idCol: String,
      tokenBudget: Long, qualityBuckets: Int = 1000): DataFrame = {
    val scored = TextAnalysis.qualityScore(df, textCol)
      .select(col(idCol), col("n_tokens").cast(LongType).as("n_tokens"),
        col("quality"))
    val bkt = scored.withColumn("__bkt",
      floor((lit(1.0) - col("quality")) * qualityBuckets).cast(LongType))
    val inBucket = bkt.withColumn("__cum",
      sum(col("n_tokens")).over(
        Window.partitionBy("__bkt")
          .orderBy(col("quality").desc, col(idCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offsets = bkt.groupBy("__bkt")
      .agg(sum(col("n_tokens")).as("__btot"))
      .withColumn("__boff",
        coalesce(sum(col("__btot")).over(
          Window.orderBy("__bkt")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bkt"), col("__boff"))
    inBucket.join(broadcast(offsets), "__bkt")
      .withColumn("cum_tokens", col("__boff") + col("__cum"))
      .where(col("cum_tokens") <= tokenBudget)
      .select(col(idCol), col("n_tokens"), col("quality"),
        col("cum_tokens"))
  }

  /** Deterministic global training-shuffle order: `pos` is the row's
    * rank (0-based) in ascending `md5(salt || id)` order — the standard
    * "shuffle the corpus once per epoch" step, replayable across
    * engines and runs (change `salt` per epoch). The naive formulation
    * is a corpus-wide `row_number` window — one task sorts 100 TB; this
    * computes it with the same two-level scan as `packChunks` /
    * `selectByBudget`: rows rank inside their hash-prefix bucket
    * (`buckets` partitions, each ~n/buckets rows), and bucket offsets
    * come from a window over the bounded bucket-count frame. The hash
    * prefix IS the leading sort key, so bucket order is global order
    * and the id tiebreak inside a bucket keeps the order total.
    * Returns (idCol, pos).
    */
  def shuffleOrder(df: DataFrame, idCol: String, salt: String = "shuffle",
      buckets: Int = 1024): DataFrame = {
    // prefix(32-bit) * buckets must stay exact in a double (< 2^52) or
    // the range-bucket assignment loses monotonicity at boundaries
    require(buckets > 0 && buckets <= (1 << 20),
      s"shuffleOrder: buckets must be in [1, 2^20], got $buckets")
    val hashed = df.select(col(idCol),
      md5(concat(lit(salt), col(idCol).cast(StringType))).as("__h"))
      // RANGE bucket on the 32-bit hash prefix (NOT modulo — bucket
      // order must equal hash order for the offsets to rank globally):
      // floor(prefix * buckets / 2^32), monotone in the hash
      .withColumn("__bkt",
        floor(conv(substring(col("__h"), 1, 8), 16, 10).cast(LongType)
          * buckets / lit(4294967296L)).cast(LongType))
    val within = hashed.withColumn("__r",
      row_number().over(Window.partitionBy("__bkt")
        .orderBy(col("__h"), col(idCol))))
    val offsets = hashed.groupBy("__bkt").agg(count(lit(1)).as("__n"))
      .withColumn("__off",
        coalesce(sum(col("__n")).over(
          Window.orderBy("__bkt")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bkt"), col("__off"))
    within.join(broadcast(offsets), "__bkt")
      .select(col(idCol), (col("__off") + col("__r") - 1).as("pos"))
  }

  /** Deterministic train/validation/test split assignment: each row
    * lands in the named split whose cumulative weight interval contains
    * its hash fraction `h32(salt || id) / 2^32` — stable under corpus
    * growth (a document's split never changes when other documents
    * arrive, unlike rank-based splitting), replayable across engines,
    * and a pure narrow map (no shuffle, no join — `PlanSpec`-style
    * shape). Weights must be positive and sum to 1 within 1e-9; splits
    * assign in the given order. Returns the input plus a `split`
    * column.
    */
  def assignSplits(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)], salt: String = "split"): DataFrame = {
    require(splits.nonEmpty, "assignSplits: at least one split")
    require(splits.map(_._1).distinct.size == splits.size,
      "assignSplits: split names must be unique")
    require(splits.forall(_._2 > 0), "assignSplits: weights must be > 0")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"assignSplits: weights must sum to 1, got ${splits.map(_._2).sum}")
    val frac = h32(concat(lit(salt), col(idCol).cast(StringType))) /
      lit(4294967296.0)
    // round the cumulative bounds to 9 decimals (repo float convention)
    // so an external replay computes the identical thresholds
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail
      .map(b => math.rint(b * 1e9) / 1e9)
    val expr = splits.init.zip(bounds.init).foldRight(
      lit(splits.last._1): Column) { case (((name, _), b), rest) =>
      when(frac < b, lit(name)).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** Domain-mix resampling: hit target proportions `targets`
    * (source → weight) exactly, at the largest output size the data
    * allows without upsampling. scale = minₛ count(s)/p(s); each listed
    * source keeps its floor(p(s)·scale) lowest-hash rows (deterministic
    * — same mix every run and topology); unlisted sources drop.
    *
    * The per-source top-keepN selection uses the same two-level scan as
    * `packChunks`/`selectByBudget` rather than a per-source `row_number`
    * window: the hash splits into `hashBuckets` equal ranges, a
    * |sources|×|buckets| aggregate (map-side partial, tiny) counts rows
    * per (source, bucket), a prefix sum over that tiny frame finds each
    * row's global rank offset, and the residual ranking happens inside a
    * (source, bucket) window — hash-uniform partitions of ~n/buckets
    * rows. A 30 %-of-corpus domain is then ~buckets parallel sorts, not
    * one task's full sort, so the operator survives a hot domain at 100×.
    * The per-source counts are a |targets|-row collect (bounded by
    * config, like the ≤16-bucket collect).
    */
  def domainMix(df: DataFrame, idCol: String, sourceCol: String,
      targets: Map[String, Double], salt: String = "mix",
      hashBuckets: Int = 1024): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      "domainMix needs positive target weights")
    // a non-positive bucket count would flip bucket order vs hash order
    // and silently break the global-rank reconstruction
    require(hashBuckets > 0, "domainMix needs hashBuckets > 0")
    val listed = df.where(col(sourceCol).isin(targets.keys.toSeq: _*))
    val counts = listed.groupBy(col(sourceCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val scale = targets.collect {
      case (s, p) if counts.contains(s) => counts(s) / p
    }.minOption.getOrElse(0.0)
    val keepN = targets.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (s, p)) =>
        when(col(sourceCol) === s,
          lit(math.floor(p * scale).toLong)).otherwise(acc)
    }
    // h32 is uniform on [0, 2^32): equal-width ranges bucket evenly
    val bucketWidth = (1L << 32) / hashBuckets + 1
    val hashed = listed
      .withColumn("__h", h32(concat(lit(salt), col(idCol).cast(StringType))))
      .withColumn("__hbkt", (col("__h") / bucketWidth).cast(LongType))
    // rows ranked BEFORE each (source, bucket): prefix sum over the tiny
    // |sources| x |buckets| count frame — bucket order is hash order, so
    // global rank = bucket offset + rank within the bucket
    val offsets = hashed.groupBy(col(sourceCol), col("__hbkt"))
      .agg(count(lit(1)).as("__bn"))
      .withColumn("__boff",
        coalesce(sum(col("__bn")).over(
          Window.partitionBy(col(sourceCol)).orderBy("__hbkt")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(sourceCol).as("__src2"), col("__hbkt").as("__hbkt2"),
        col("__boff"))
    val inBucket = row_number().over(
      Window.partitionBy(col(sourceCol), col("__hbkt"))
        .orderBy(col("__h"), col(idCol)))
    hashed
      .join(broadcast(offsets), col(sourceCol) === col("__src2") &&
        col("__hbkt") === col("__hbkt2"))
      .withColumn("__rank", col("__boff") + inBucket)
      .where(col("__rank") <= keepN)
      .drop("__h", "__hbkt", "__src2", "__hbkt2", "__boff", "__rank")
  }

  /** Temperature-based domain resampling (the multilingual/multi-domain
    * rebalance standard in pretraining mixes): target proportions
    * p(s) ∝ count(s)^τ — τ = 1 keeps natural proportions, τ → 0 flattens
    * toward uniform, upweighting small domains WITHOUT upsampling (keep
    * rates clamp at 1; the realized output is the largest mix the data
    * allows under that clamp, scaled to ≈ `outputFraction` of the
    * corpus). Selection is a pure per-row hash-threshold compare —
    * keep iff h32(salt‖id) < rate(s)·2³² — so there is NO window, NO
    * per-domain shuffle, and no rank reconstruction at all: the scan
    * parallelism is the input's, any domain skew included. Exactly
    * replayable in SQL (same md5-derived h32), deterministic across
    * runs and topologies.
    *
    * The per-domain counts are one |domains|-row aggregate collected to
    * the driver; `maxDomains` bounds that collect (domains are
    * config-scale in practice — languages, sources, crawls).
    */
  /** Content-defined chunking (the CDC idea behind FastCDC, over
    * tokens): a chunk boundary falls BEFORE token i whenever the hash
    * of the 2-gram ending at i is ≡ 0 mod `targetTokens`, so boundaries
    * depend only on LOCAL content — an insertion early in a document
    * shifts at most one chunk, where fixed tiling (packChunks) shifts
    * every subsequent chunk. That stability is what makes chunk-level
    * exact dedup effective across near-identical documents. Expected
    * chunk length ≈ targetTokens (geometric; no min/max clamp — the
    * sequential FastCDC window is deliberately not replicated so the
    * split stays a pure per-row map, and an oversized tail can feed
    * packChunks downstream).
    *
    * Returns (idCol, chunk_idx, tok_start, chunk) — one row per chunk,
    * a narrow explode with no shuffle. Deterministic md5-derived
    * hashing; the SQL oracle replays byte-for-byte.
    */
  def chunkByContent(df: DataFrame, textCol: String, idCol: String,
      targetTokens: Int = 64): DataFrame = {
    require(targetTokens >= 2, "chunkByContent: targetTokens must be >= 2")
    val withT = df.select(col(idCol), tokens(col(textCol)).as("__t"))
    val n = size(col("__t"))
    // boundaries before token i (0-based, 1 <= i < n): 2-gram hash test;
    // sequence(1, 0) counts DOWN, so short docs skip the scan entirely
    val bounds = concat(
      array(lit(0)),
      when(n <= 1, array().cast("array<int>"))
        .otherwise(filter(sequence(lit(1), n - 1), i =>
          h32(concat_ws(" ", get(col("__t"), i - 1), get(col("__t"), i)))
            % targetTokens === 0)),
      array(n))
    withT
      .select(col(idCol), col("__t"), bounds.as("__b"))
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), size(col("__b")) - 2), j =>
          struct(
            element_at(col("__b"), j + 1).cast("long").as("tok_start"),
            array_join(slice(col("__t"),
              element_at(col("__b"), j + 1) + 1,
              element_at(col("__b"), j + 2) -
                element_at(col("__b"), j + 1)), " ").as("chunk")))))
      .select(col(idCol), col("pos").as("chunk_idx"),
        col("col.tok_start"), col("col.chunk"))
  }

  /** Chunk-level duplication score per document: content-defined chunks
    * (`chunkByContent`) hashed and counted corpus-wide; a document's
    * score is the fraction of its chunks that also appear in ANOTHER
    * document — the sub-document dedup signal (boilerplate paragraphs,
    * syndicated passages) that document-level exact/near dedup misses.
    * Shape: one narrow chunk explode, one partial-aggregated count
    * keyed on the chunk hash, one equi-join back, one per-doc
    * aggregate. Returns (idCol, n_chunks, n_dup, dup_frac rounded 9).
    */
  def chunkDupScore(df: DataFrame, textCol: String, idCol: String,
      targetTokens: Int = 64): DataFrame = {
    val chunks = chunkByContent(df, textCol, idCol, targetTokens)
      .select(col(idCol), h32(col("chunk")).as("__h"))
    // distinct docs per chunk hash: a chunk repeated WITHIN one doc is
    // not corpus duplication
    val docFreq = chunks.groupBy(col("__h"))
      .agg(count_distinct(col(idCol)).as("__df"))
    chunks.join(docFreq, "__h")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("__df") > 1, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_frac",
        round(col("n_dup").cast("double") / col("n_chunks"), 9))
  }

  /** Chunk-level dedup KEEP-LIST: where `chunkDupScore` only measures
    * sub-document duplication, this resolves it — each duplicated chunk
    * keeps ONLY the copy in its canonical document (minimum `idCol`
    * over the documents containing it, the same min-id convention as
    * exact document dedup) and is dropped from every other document,
    * and the survivors reassemble in original order. The cleaned corpus
    * carries each duplicated passage exactly once.
    *
    * Returns (idCol, text_clean, n_chunks, n_dropped); text_clean is in
    * the chunker's token normalization (lower-cased, single-space).
    * A document whose every chunk is owned elsewhere survives with an
    * empty text_clean, and a null-text document survives with
    * n_chunks 0 — a curation stage never loses rows (left join: the
    * null chunk has no hash and no owner).
    *
    * Scale shape: one narrow chunk explode, one partial-aggregated min
    * per chunk hash (map-side combine absorbs hot boilerplate chunks),
    * one equi-join back on the hash (AQE splits a skewed hot key), one
    * per-document aggregate. No window over the corpus, no product, no
    * driver action.
    */
  def dedupChunks(df: DataFrame, textCol: String, idCol: String,
      targetTokens: Int = 64): DataFrame = {
    val chunks = chunkByContent(df, textCol, idCol, targetTokens)
      .select(col(idCol), col("chunk_idx"), col("chunk"),
        h32(col("chunk")).as("__h"))
    val owner = chunks.groupBy(col("__h"))
      .agg(min(col(idCol)).as("__owner"))
    chunks.join(owner, Seq("__h"), "left")
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("__owner") === col(idCol),
            struct(col("chunk_idx"), col("chunk"))))),
          s => s.getField("chunk")), " ").as("text_clean"),
        count(col("chunk")).as("n_chunks"),
        sum(when(col("__owner") =!= col(idCol), 1L).otherwise(0L))
          .as("n_dropped"))
  }

  /** Quality-filter cascade with drop accounting: evaluate the named
    * predicates in order and attribute every dropped document to the
    * FIRST filter it failed — the funnel report every production
    * curation pipeline publishes (N in → n1 dropped too_short → n2
    * dropped low_quality → …). One narrow per-row pass (a coalesce over
    * the failure names; no shuffle, no join); the funnel counts are one
    * partial aggregate over the `first_fail` column downstream. A
    * predicate evaluating to SQL null counts as a FAILURE of that
    * filter (an unscorable document must not silently pass a gate).
    * Returns (idCol, keep, first_fail — null when kept).
    */
  def filterCascade(df: DataFrame, idCol: String,
      filters: Seq[(String, Column)]): DataFrame = {
    require(filters.nonEmpty, "filterCascade: at least one filter")
    require(filters.map(_._1).distinct.size == filters.size,
      "filterCascade: filter names must be unique (they label the funnel)")
    val firstFail = coalesce(filters.map { case (name, pred) =>
      when(!coalesce(pred, lit(false)), lit(name))
    } :+ lit(null).cast(StringType): _*)
    df.select(col(idCol), firstFail.as("first_fail"))
      .select(col(idCol), col("first_fail").isNull.as("keep"),
        col("first_fail"))
  }

  def domainMixTemperature(df: DataFrame, idCol: String, sourceCol: String,
      temperature: Double, outputFraction: Double = 1.0,
      salt: String = "mixT", maxDomains: Int = 100000): DataFrame = {
    require(temperature > 0 && temperature <= 1,
      "temperature must be in (0, 1]: 1 = natural proportions, " +
        "smaller = flatter mix (upsampling, t > 1, is not supported)")
    require(outputFraction > 0 && outputFraction <= 1,
      "outputFraction must be in (0, 1]")
    val counts = df.where(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol)).count()
      .limit(maxDomains + 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.size <= maxDomains,
      s"more than $maxDomains distinct domains — bucket them upstream " +
        "or raise maxDomains (the counts map is driver-resident)")
    if (counts.isEmpty) return df.limit(0)
    val total = counts.values.sum.toDouble
    val weights = counts.view.mapValues(n =>
      math.pow(n.toDouble, temperature)).toMap
    // sum in sorted-key order and round the rate to 9 decimals (the
    // repo-wide float convention): an external SQL replay sums/pows in
    // its own order, and an ulp difference at the threshold would flip
    // boundary rows
    val wSum = weights.toSeq.sortBy(_._1).map(_._2).sum
    // expected output size ≈ outputFraction·total, split by p(s); the
    // per-domain keep RATE clamps at 1 (never upsample a small domain)
    val rate = counts.map { case (s, n) =>
      val r = math.min(1.0, outputFraction * total * (weights(s) / wSum) / n)
      s -> math.round(r * 1e9) / 1e9
    }
    // deterministic per-row keep: uniform h32 under the rate threshold.
    // Thresholds fold into one chained CASE over the bounded domain set
    val threshold = rate.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (s, r)) =>
        when(col(sourceCol) === s,
          lit(math.round(r * 4294967296.0))).otherwise(acc)
    }
    df.where(col(sourceCol).isNotNull &&
      h32(concat(lit(salt), col(idCol).cast(StringType))) < threshold)
  }
}
