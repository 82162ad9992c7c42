package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Fns._

/** Text-analysis operators for corpus curation: token counting, quality
  * scoring, language identification, fingerprinting. All pure columnar
  * expressions (codegen'd, partition-local — embarrassingly parallel at
  * any scale).
  */
object TextAnalysis {

  /** Whitespace tokens + a BPE-ish regex tokenization (letter runs, digit
    * runs, single punctuation marks).
    */
  val BpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_ws_tokens", size(split(col(textCol), "\\s+")))
      .withColumn("n_bpe_tokens",
        size(regexp_extract_all(col(textCol), lit(BpePattern), lit(0))))

  /** Quality heuristics: length, chars-per-token, punctuation ratio,
    * stopword ratio, and a composite score.
    */
  /** Truncate to 6 decimals — unlike rounding, identical across engines
    * when a value lands exactly on a half.
    */
  private def trunc6(c: Column): Column =
    (c * 1000000.0).cast(LongType) / 1000000.0

  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    val toks = tokens(text)
    val nToks = size(toks)
    val stop = typedLit(Seq("the", "a", "of", "and", "to", "in", "is"))
    val stopHits = size(filter(toks, t => array_contains(stop, t)))
    val punct = length(text) -
      length(regexp_replace(text, "[^a-zA-Z0-9 ]", ""))
    df.withColumn("n_tokens", nToks)
      .withColumn("chars_per_token", trunc6(length(text) / nToks))
      .withColumn("punct_ratio", trunc6(punct / length(text)))
      .withColumn("stopword_ratio", trunc6(stopHits / nToks))
      .withColumn("quality",
        trunc6(
          lit(1.0)
            - abs(trunc6(length(text) / nToks) - 5.0) / 10.0
            - trunc6(punct / length(text))
            + trunc6(stopHits / nToks)))
  }

  /** Stopword lists per language for the n-gram/stopword language-ID
    * heuristic. Deterministic argmax with ties broken by list order.
    */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "en"))

  def langScores(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    LangStopwords.map { case (lang, words) =>
      lang -> size(filter(toks, t => array_contains(typedLit(words), t)))
    }
  }

  def langId(df: DataFrame, textCol: String): DataFrame = {
    val scores = langScores(col(textCol))
    val best = scores.tail.foldLeft(
      (scores.head._2, lit(scores.head._1))) {
      case ((bestScore, bestLang), (lang, score)) =>
        (greatest(bestScore, score),
          when(score > bestScore, lang).otherwise(bestLang))
    }
    val withScores = scores.foldLeft(df) { case (d, (lang, s)) =>
      d.withColumn(s"score_$lang", s)
    }
    withScores.withColumn("lang_pred",
      when(best._1 === 0, "unknown").otherwise(best._2))
  }

  /** Content-defined fingerprints: md5 of normalized text + an
    * order-sensitive polynomial rolling hash of the token stream.
    */
  def fingerprint(df: DataFrame, textCol: String): DataFrame = {
    val normalized =
      regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", "")
    df.withColumn("fp_md5", md5(normalized))
      .withColumn("fp_roll", rollingFingerprint(tokens(col(textCol))))
  }

  /** Repetition signals (the Gopher/RefinedWeb-style filters a training
    * corpus is pruned with): duplicate-word fraction, the most frequent
    * word's share, duplicate-bigram fraction, mean word length. All
    * per-row array expressions — zero shuffle, embarrassingly parallel;
    * per-row cost is O(words · distinct) for the mode count, bounded by
    * document length. Fractions are truncated to 6 decimals (exact
    * across engines).
    */
  def repetition(df: DataFrame, textCol: String): DataFrame = {
    // materialize the token array ONCE: lambdas below reference the
    // projected column — an inline split() would be re-evaluated per
    // lambda access (see Fns.shingles note, measured 3-7x)
    val withW = df.withColumn("__w", tokens(col(textCol)))
    val w = col("__w")
    val n = size(w)
    val distinctW = array_distinct(w)
    val topShare = aggregate(distinctW, lit(0),
      (acc, x) => greatest(acc, size(filter(w, y => y === x))))
    val bigrams = transform(
      sequence(lit(0), greatest(n - 2, lit(0))),
      i => concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2)))
    val nBigrams = when(n >= 2, n - 1).otherwise(0)
    withW.withColumn("n_words", n)
      .withColumn("dup_word_frac",
        trunc6((n - size(distinctW)) / n))
      .withColumn("top_word_frac", trunc6(topShare / n))
      .withColumn("dup_bigram_frac",
        when(nBigrams === 0, 0.0).otherwise(trunc6(
          (nBigrams - size(array_distinct(slice(bigrams, lit(1), nBigrams))))
            / nBigrams)))
      .withColumn("mean_word_len",
        trunc6(aggregate(w, lit(0), (acc, x) => acc + length(x)) / n))
      .drop("__w")
  }

  /** The Gopher document-filter RULE SET (Rae et al. 2021, "Scaling
    * Language Models: Methods, Analysis & Insights from Training
    * Gopher", App. A1.1) as per-rule verdicts plus the combined keep —
    * `qualityScore`/`repetition` expose raw signals; this applies the
    * PUBLISHED thresholds, and the per-rule booleans are what an
    * ablation dashboard needs. Every ratio threshold is an integer
    * cross-multiplication (no float division), so any SQL engine
    * replays the verdicts bit-for-bit:
    *  - `word_count_ok`:    50 ≤ words ≤ 100,000
    *  - `mean_word_len_ok`: 3 ≤ mean word chars ≤ 10
    *    (3·words ≤ word chars ≤ 10·words)
    *  - `symbol_ratio_ok`:  '#' count·10 ≤ words AND '...' count·10 ≤
    *    words (the paper applies the 0.1 symbol-to-word threshold to
    *    EACH symbol separately)
    *  - `bullet_lines_ok`:  lines starting with a bullet (•, -, star) ≤ 90 %
    *  - `ellipsis_lines_ok`: lines ending in '...'/'…' ≤ 30 %
    *  - `alpha_words_ok`:   words with ≥ 1 alphabetic char ≥ 80 %
    *  - `stopword_ok`:      ≥ 2 distinct Gopher stop words present
    * `gopher_keep` is their conjunction. Words are WHITESPACE words
    * ([[Fns.wsTokens]]: `\s+` split, empties dropped) — the same
    * definition [[gopherRepetitionRules]] uses, so one cascade never
    * disagrees with itself about what a word is, and a token never
    * fuses across a newline. All per-row array/string expressions —
    * zero shuffle; the bounded HOF passes (word-char sum, line/word
    * filters) run once per row over document-length arrays.
    */
  def gopherRules(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    val withT = df
      .withColumn("__w", wsTokens(text))
      .withColumn("__l", split(text, "\n"))
    val w = col("__w")
    val lines = col("__l")
    val nW = size(w)
    val nL = size(lines)
    val wordChars = aggregate(w, lit(0), (acc, x) => acc + length(x))
    val hashes = length(text) - length(regexp_replace(text, "#", ""))
    val ellipses =
      (length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3
    val bullets = size(filter(lines, l =>
      ltrim(l).startsWith("•") || ltrim(l).startsWith("-") ||
        ltrim(l).startsWith("*")))
    val ellLines = size(filter(lines, l =>
      rtrim(l).endsWith("...") || rtrim(l).endsWith("…")))
    val alphaWords = size(filter(w, x => x.rlike("[a-zA-Z]")))
    val stop = typedLit(GopherStopwords)
    val stopHits = size(filter(stop, s => array_contains(w, s)))
    val rules = Seq(
      "word_count_ok" -> (nW >= 50 && nW <= 100000),
      "mean_word_len_ok" ->
        (wordChars >= nW * 3 && wordChars <= nW * 10),
      "symbol_ratio_ok" -> (hashes * 10 <= nW && ellipses * 10 <= nW),
      "bullet_lines_ok" -> (bullets * 10 <= nL * 9),
      "ellipsis_lines_ok" -> (ellLines * 10 <= nL * 3),
      "alpha_words_ok" -> (alphaWords * 5 >= nW * 4),
      "stopword_ok" -> (stopHits >= 2))
    rules.foldLeft(withT) { case (acc, (name, c)) =>
      acc.withColumn(name, c)
    }.withColumn("gopher_keep",
      rules.map(r => col(r._1)).reduce(_ && _))
      .drop("__w", "__l")
  }

  /** The 8 membership words of Gopher's stop-word rule (App. A1.1). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The REPETITION half of the Gopher filter (Rae et al. 2021, App.
    * A1.1, "repetitious documents"): per-rule verdicts for the 13
    * published thresholds plus the combined `rep_keep`. Definitions
    * (each an integer cross-multiplication, engine-replayable
    * bit-for-bit):
    *  - lines / paragraphs: non-empty `\n` / `\n\n` splits; a
    *    "duplicate" is any occurrence beyond the first of an
    *    identical element, and duplicate CHARACTERS are the characters
    *    of those beyond-first occurrences.
    *    `dup_line_frac_ok` ≤ 30 %, `dup_para_frac_ok` ≤ 30 % (by
    *    element count); `dup_line_char_ok` ≤ 20 %,
    *    `dup_para_char_ok` ≤ 20 % (by characters).
    *  - top n-gram (n = 2,3,4): characters covered by the single most
    *    frequent word n-gram (argmax by occurrence count; count ties
    *    break on the lexicographically greatest gram, so the pick is
    *    engine-deterministic) — count × n-gram chars (tokens only, no
    *    separators) over total word chars — ≤ 20 / 18 / 16 %.
    *  - duplicate n-grams (n = 5…10): characters of tokens covered by
    *    ANY occurrence of any n-gram that appears more than once,
    *    counting each token position ONCE even when duplicated
    *    n-grams overlap (the paper's "take care not to count
    *    characters twice"), over total word chars — ≤ 15/14/13/12/11/10 %.
    * Empty docs pass every rule vacuously (0 ≤ 0); null text is
    * treated as empty.
    *
    * Scale shape: line/paragraph stats are per-row array passes (no
    * shuffle). The n-gram stats CANNOT be a per-row mode loop (an
    * O(distinct²) interpreted HOF — the `repetition` helper's
    * `top_word_frac` trick does not extend to 9 gram sizes); instead
    * the n-gram occurrences for n = 2…10 explode ONCE into
    * (id, n, start, gram) and everything else is hash aggregates and
    * equi-joins on (id, n, gram)/(id, pos): partial-aggregate counts,
    * a conditional-max pivot for the top-gram stats, and a
    * distinct-position coverage join for the overlap-safe duplicate
    * chars. Linear in corpus size (9 gram passes ≈ 9× token volume,
    * the algorithm's honest price), no window, no product, no
    * driver-side state.
    */
  def gopherRepetitionRules(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val id = col(idCol)
    val base = df.select(id,
      coalesce(col(textCol), lit("")).as("__text"))
      .withColumn("__w", wsTokens(col("__text")))

    // ---- per-row line/paragraph duplicate stats (no shuffle) ----
    def charSum(a: Column): Column =
      aggregate(a, lit(0L), (acc, x) => acc + length(x))
    def dupOk(a: Column, num: Int, den: Int): Column = {
      val n = size(a)
      (n - size(array_distinct(a))) * den <= n * num
    }
    def dupCharOk(a: Column, num: Int, den: Int): Column = {
      val total = charSum(a)
      (total - charSum(array_distinct(a))) * den <= total * num
    }
    val lines = filter(split(col("__text"), "\n"), l => l =!= "")
    val paras = filter(split(col("__text"), "\n\n"), p => p =!= "")
    val perRow = base
      .withColumn("__wchars", charSum(col("__w")))
      .withColumn("dup_line_frac_ok", dupOk(lines, 3, 10))
      .withColumn("dup_line_char_ok", dupCharOk(lines, 1, 5))
      .withColumn("dup_para_frac_ok", dupOk(paras, 3, 10))
      .withColumn("dup_para_char_ok", dupCharOk(paras, 1, 5))
      .drop("__text")

    // ---- one occurrence frame for every gram size ----
    val toks = base.select(id, col("__w"))
    def gramArr(n: Int): Column = {
      val w = col("__w")
      when(size(w) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(w) - n),
          i => concat_ws(" ", (0 until n).map(j => get(w, i + j)): _*)))
    }
    val occ = (2 to 10).map { n =>
      toks.select(id, lit(n).as("__n"),
        posexplode(gramArr(n)).as(Seq("__start", "__g")))
    }.reduce(_ unionByName _)
    val counts = occ.groupBy(id, col("__n"), col("__g"))
      .agg(count(lit(1)).as("__c"))

    // top n-gram chars (n = 2..4): the chars covered by the single
    // MOST FREQUENT n-gram — argmax by count, ties broken by the
    // lexicographically greatest gram so the pick is deterministic in
    // every engine. One conditional struct-max per n (struct ordering
    // is field-lexicographic: count first, gram second — exactly the
    // tie-broken argmax), coverage = count × (gram chars minus the
    // n−1 separators) of the winner.
    val topAggs = (2 to 4).map(n =>
      max(when(col("__n") === n,
        struct(col("__c"), col("__g")))).as(s"__ts$n"))
    val tops0 = counts.where(col("__n") <= 4).groupBy(id)
      .agg(topAggs.head, topAggs.tail: _*)
    val tops = (2 to 4).foldLeft(tops0) { case (acc, n) =>
      acc.withColumn(s"__top$n",
        col(s"__ts$n.__c") *
          (length(col(s"__ts$n.__g")) - (n - 1)))
    }.drop((2 to 4).map(n => s"__ts$n"): _*)

    // duplicate n-gram coverage (n = 5..10): token positions covered by
    // any occurrence of a >1-count gram, each position counted once
    val tokLens = toks
      .select(id, posexplode(col("__w")).as(Seq("__pos", "__tok")))
      .select(id, col("__pos"), length(col("__tok")).as("__len"))
    val dupAggs = (5 to 10).map(n =>
      sum(when(col("__n") === n, col("__len"))).as(s"__dup$n"))
    val dupCover = occ.where(col("__n") >= 5)
      .join(counts.where(col("__n") >= 5 && col("__c") > 1)
        .select(id, col("__n"), col("__g")), Seq(idCol, "__n", "__g"))
      .select(id, col("__n"),
        explode(sequence(col("__start"),
          col("__start") + col("__n") - 1)).as("__pos"))
      .distinct()
      .join(tokLens, Seq(idCol, "__pos"))
      .groupBy(id)
      .agg(dupAggs.head, dupAggs.tail: _*)

    val thrTop = Map(2 -> 20, 3 -> 18, 4 -> 16)
    val thrDup = Map(5 -> 15, 6 -> 14, 7 -> 13, 8 -> 12, 9 -> 11,
      10 -> 10)
    val joined = perRow
      .join(tops, Seq(idCol), "left")
      .join(dupCover, Seq(idCol), "left")
    val withOks = thrTop.toSeq.sortBy(_._1).foldLeft(joined) {
      case (acc, (n, thr)) => acc.withColumn(s"top_${n}gram_ok",
        coalesce(col(s"__top$n"), lit(0L)) * 100 <=
          col("__wchars") * thr)
    }
    val withDups = thrDup.toSeq.sortBy(_._1).foldLeft(withOks) {
      case (acc, (n, thr)) => acc.withColumn(s"dup_${n}gram_ok",
        coalesce(col(s"__dup$n"), lit(0L)) * 100 <=
          col("__wchars") * thr)
    }
    val ruleCols = Seq("dup_line_frac_ok", "dup_line_char_ok",
      "dup_para_frac_ok", "dup_para_char_ok") ++
      (2 to 4).map(n => s"top_${n}gram_ok") ++
      (5 to 10).map(n => s"dup_${n}gram_ok")
    withDups
      .withColumn("rep_keep", ruleCols.map(col).reduce(_ && _))
      .drop("__w" +: "__wchars" +:
        ((2 to 4).map(n => s"__top$n") ++
          (5 to 10).map(n => s"__dup$n")): _*)
  }

  /** The C4 cleaning rule set (Raffel et al. 2020, "Exploring the
    * Limits of Transfer Learning", §2.2) as a line filter plus
    * page-level verdicts. A line survives iff its trimmed form ends in
    * terminal punctuation (`. ! ? "`), it has ≥ 3 whitespace words,
    * and it does not mention "javascript" (case-insensitive);
    * `c4_text` is the surviving lines rejoined with `\n`. Page
    * verdicts: `sentence_count_ok` — ≥ 5 sentences in the CLEANED
    * text, where the sentence count is the deterministic
    * `.`/`!`/`?` character count (a documented approximation of C4's
    * sentence splitter, chosen so any SQL engine replays it);
    * `lorem_ok` — no "lorem ipsum"; `brace_ok` — no `{`;
    * `badwords_ok` — no blocklist word among the lower-cased
    * whitespace tokens (the blocklist is DATA, like the Public Suffix
    * List: C4 uses the public "List of Dirty, Naughty …" — pass it
    * in; the default is empty). `c4_keep` is the conjunction. C4's
    * three-sentence-span corpus dedup is deliberately NOT here — that
    * is [[Dedup]]/[[Curation.chunkKeepList]] territory.
    *
    * Pure per-row string/array expressions — no shuffle; the line
    * filter is one bounded HOF pass per row.
    */
  def c4Rules(df: DataFrame, textCol: String,
      badWords: Seq[String] = Seq.empty): DataFrame = {
    val text = coalesce(col(textCol), lit(""))
    val keptLines = filter(split(text, "\n"), l => {
      val t = trim(l)
      t.rlike("[.!?\"]$") &&
        size(filter(split(t, " "), w => w =!= "")) >= 3 &&
        !lower(l).contains("javascript")
    })
    val cleaned = array_join(keptLines, "\n")
    val withText = df
      .withColumn("c4_text", cleaned)
      .withColumn("n_kept_lines", size(keptLines))
      .withColumn("n_sentences",
        length(col("c4_text")) -
          length(translate(col("c4_text"), ".!?", "")))
      .withColumn("sentence_count_ok", col("n_sentences") >= 5)
      .withColumn("lorem_ok", !lower(text).contains("lorem ipsum"))
      .withColumn("brace_ok", !text.contains("{"))
    val withBad =
      if (badWords.isEmpty) withText.withColumn("badwords_ok", lit(true))
      else withText.withColumn("badwords_ok",
        !exists(typedLit(badWords.map(_.toLowerCase)), b =>
          array_contains(split(lower(text), " "), b)))
    withBad.withColumn("c4_keep",
      col("sentence_count_ok") && col("lorem_ok") && col("brace_ok") &&
        col("badwords_ok"))
  }

  /** Corpus vocabulary: the top-`k` terms by total occurrence count,
    * with document frequency — the first corpus-health report any
    * pipeline run produces (tokenizer coverage, boilerplate/stopword
    * probes, `sampleStratified` rate design). Terms are the non-empty
    * lower-cased whitespace tokens.
    *
    * Scale shape: explode → one partial-aggregated (term → tf, df)
    * hash aggregate → global top-k, which plans as
    * TakeOrderedAndProject (per-partition heaps + a k-row driver
    * merge) — no full sort, no window, no single-partition exchange.
    * Ties at the cut break on the term itself, so the top-k SET is
    * deterministic across engines and partitionings.
    */
  def vocabulary(df: DataFrame, textCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"vocabulary: k must be > 0, got $k")
    df.select(col(idCol),
      explode(filter(tokens(col(textCol)), t => t =!= ""))
        .as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("tf"),
        count_distinct(col(idCol)).as("df"))
      .orderBy(col("tf").desc, col("term"))
      .limit(k)
  }

  /** Hashed TF-IDF, sparse form: one row per (doc, feature bucket)
    * with `tfidf = tf · ln((N+1)/(df+1))` truncated to 6 decimals —
    * the hashing-trick featurization (term → `h32 mod dim`) whose
    * model side is CONSTANT-size no matter the corpus: the per-bucket
    * document frequencies are a ≤ `dim`-row aggregate that broadcasts,
    * and the corpus size is a 1-row broadcast. Explode → partial
    * hash-aggregate tf → two broadcast joins; no window, no product.
    * Pair with [[tfidfVectors]] for the dense form the ANN operators
    * consume.
    */
  def tfidfSparse(df: DataFrame, textCol: String, idCol: String,
      dim: Int): DataFrame = {
    require(dim > 0, s"tfidfSparse: dim must be > 0, got $dim")
    val tf = df.select(col(idCol),
      explode(filter(tokens(col(textCol)), t => t =!= ""))
        .as("__term"))
      .select(col(idCol), (h32(col("__term")) % dim).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("__tf"))
    val n = df.select(count_distinct(col(idCol))
      .cast(DoubleType).as("__n"))
    val dfreq = tf.groupBy(col("bucket"))
      .agg(count(lit(1)).cast(DoubleType).as("__df"))
    tf.join(broadcast(dfreq), Seq("bucket"))
      .crossJoin(broadcast(n))
      .select(col(idCol), col("bucket"),
        trunc6(col("__tf") *
          log((col("__n") + 1.0) / (col("__df") + 1.0))).as("tfidf"))
  }

  /** Dense hashed TF-IDF vectors (`Array[Float]` of length `dim`),
    * ready for the [[Similarity]] ANN operators — text and embedding
    * curation share one similarity stack. One per-doc aggregate over
    * the sparse form; the dense fill is a per-row bounded pass
    * (`dim` lookups into the doc's own bucket map).
    */
  def tfidfVectors(df: DataFrame, textCol: String, idCol: String,
      dim: Int): DataFrame =
    tfidfSparse(df, textCol, idCol, dim)
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(
        struct(col("bucket"), col("tfidf")))).as("__m"))
      .select(col(idCol),
        transform(sequence(lit(0), lit(dim - 1)), i =>
          coalesce(element_at(col("__m"), i.cast(LongType)), lit(0.0))
            .cast(FloatType)).as("emb"))

  /** Deterministic reproducible subsampling: keep a row iff
    * `h32(salt ‖ id) mod 10⁶ < rate × 10⁶`. Pure per-row hash — no RNG,
    * no sort, no shuffle; the SAME sample on every run, engine, and
    * cluster topology (Spark's `sample()` is partition-layout-dependent,
    * which silently changes the corpus between runs). `salt` decorrelates
    * independent sampling passes over the same ids.
    */
  def sampleByHash(df: DataFrame, idCol: String, rate: Double,
      salt: String = "smpl"): DataFrame =
    df.where(
      h32(concat(lit(salt), col(idCol).cast(StringType))) % 1000000L <
        math.round(rate * 1000000L))

  /** Per-stratum rates (the curation move: downsample the dominant
    * language/source, keep the rare ones): the stratum column selects its
    * rate, unlisted strata get `defaultRate`. Same hash rule as
    * `sampleByHash`, still one narrow pass.
    */
  def sampleStratified(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      salt: String = "smpl"): DataFrame = {
    val rateCol = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (k, r)) => when(col(strataCol) === k, lit(r)).otherwise(acc)
    }
    df.where(
      h32(concat(lit(salt), col(idCol).cast(StringType))) % 1000000L <
        // round-half like sampleByHash's math.round (and DuckDB's BIGINT
        // cast): a bare cast TRUNCATES, so FP-inexact rates (0.7 →
        // 699999.99…) would shift the threshold one below the oracle's
        round(rateCol * 1000000.0).cast(LongType))
  }

  /** PII patterns for corpus scrubbing. Chosen to behave identically
    * under Java regex (Spark, codegen'd) and RE2 (the DuckDB oracle):
    * character classes, bounded repetition and `\b` only — no lookaround
    * or backreferences (RE2 has neither).
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b\\d{3}[- .]\\d{3}[- .]\\d{4}\\b"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII detection + redaction (emails → [EMAIL], phones → [PHONE],
    * IPv4 → [IP]) with per-kind match counts. Pure per-row regex
    * expressions — zero shuffle, embarrassingly parallel. Emails scrub
    * FIRST so dotted-digit local parts can't later masquerade as IPs.
    */
  def piiScrub(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails",
        size(regexp_extract_all(t, lit(EmailPattern), lit(0))))
      .withColumn("n_phones",
        size(regexp_extract_all(t, lit(PhonePattern), lit(0))))
      .withColumn("n_ips",
        size(regexp_extract_all(t, lit(Ipv4Pattern), lit(0))))
      .withColumn("scrubbed",
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailPattern, "[EMAIL]"),
            PhonePattern, "[PHONE]"),
          Ipv4Pattern, "[IP]"))
  }

  /** Character-distribution entropy (nats) — the classic gibberish /
    * boilerplate signal. Histogram via explode + TWO-STAGE aggregation:
    * partial map-side combine means the shuffle carries at most
    * (doc, distinct-char) pairs (≲100 per doc), never one row per
    * character; the total-length side is a plain equi-join on the id.
    */
  def charEntropy(df: DataFrame, textCol: String, idCol: String)
      : DataFrame = {
    val hist = df
      .select(col(idCol), explode(split(col(textCol), "")).as("__c"))
      .groupBy(col(idCol), col("__c"))
      .agg(count(lit(1)).cast(DoubleType).as("__cnt"))
    val totals = df.select(col(idCol),
      length(col(textCol)).cast(DoubleType).as("__n"))
    hist.join(totals, idCol)
      .withColumn("__p", col("__cnt") / col("__n"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("distinct_chars"),
        max(col("__n")).cast(LongType).as("n_chars"),
        trunc6(-sum(col("__p") * log(col("__p")))).as("entropy"))
  }

  /** Unigram surprisal — the corpus-LM quality signal: score each doc by
    * the mean negative log-probability of its tokens under the corpus's
    * own unigram distribution (gibberish and rare-token soup score HIGH,
    * boilerplate scores LOW). Two-pass, both linear: token counts
    * (explode + partial agg — shuffle is one row per distinct token per
    * partition), then an equi-join of the exploded corpus on token and
    * one groupBy(doc) mean. The vocabulary is NOT broadcast — at 100 TB
    * it doesn't fit; the token join shuffles both sides on the token key
    * and AQE handles the stopword skew.
    */
  def unigramSurprisal(df: DataFrame, textCol: String, idCol: String)
      : DataFrame = {
    val toks = df.select(col(idCol),
      explode(tokens(col(textCol))).as("__w"))
    val counts = toks.groupBy(col("__w"))
      .agg(count(lit(1)).cast(DoubleType).as("__c"))
    val total = toks.agg(count(lit(1)).cast(DoubleType).as("__n"))
    toks.join(counts, "__w")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        trunc6(avg(-log(col("__c") / col("__n")))).as("surprisal"))
  }

  /** N-gram novelty against a reference corpus: the fraction of a
    * document's DISTINCT k-gram shingles absent from the reference — a
    * near-zero score means the document is assembled from passages the
    * reference already carries (the dedupe-adjacent redundancy signal),
    * a near-one score means genuinely new text. Shape: distinct
    * shingles explode once per side, the reference set dedupes with a
    * partial aggregate, one left join keyed on the shingle (AQE absorbs
    * stopword-shingle skew; the reference is never broadcast), one
    * per-document aggregate. Documents with fewer than k tokens have no
    * shingles and score null over a zero count (rows are never lost).
    * Returns (idCol, n_shingles, n_novel, novelty rounded 9).
    */
  def noveltyScore(docs: DataFrame, refDf: DataFrame, textCol: String,
      idCol: String, k: Int = 3): DataFrame = {
    val docSh = docs
      .select(col(idCol), tokens(col(textCol)).as("__t"))
      .select(col(idCol), explode(shingles(col("__t"), k)).as("sh"))
    val refSh = refDf
      .select(tokens(col(textCol)).as("__t"))
      .select(explode(shingles(col("__t"), k)).as("sh"))
      .distinct().withColumn("__seen", lit(true))
    docs.select(col(idCol)).join(
      docSh.join(refSh, Seq("sh"), "left")
        .groupBy(col(idCol))
        .agg(
          count(lit(1)).as("n_shingles"),
          sum(when(col("__seen").isNull, 1L).otherwise(0L)).as("n_novel"))
        .withColumn("novelty",
          round(col("n_novel").cast(DoubleType) / col("n_shingles"), 9)),
      Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        col("novelty"))
  }

  /** Cross-corpus bigram LM score (the CCNet-style curation signal:
    * "does this document look like the REFERENCE distribution"): mean
    * negative log-probability of the document's bigrams under a
    * Laplace-smoothed bigram model trained on `refDf` —
    * p(w2|w1) = (B(w1,w2) + 1) / (U(w1) + V), with V the reference
    * vocabulary size, so out-of-vocabulary tokens and unseen bigrams
    * degrade smoothly instead of scoring -log 0 (the difference from
    * `unigramSurprisal`, which self-scores and never sees OOV).
    * In-distribution text scores LOW; gibberish and off-domain text
    * score HIGH. Returns (idCol, n_bigrams, lm_score trunc6);
    * documents with fewer than 2 tokens have no bigrams and score
    * null over a zero count.
    *
    * Shape: reference unigram/bigram counts are partial aggregates; the
    * scored corpus's bigrams explode once and LEFT-join the two count
    * tables on their keys (both shuffles keyed on token text; AQE
    * absorbs stopword-bigram skew; the model is never broadcast — at
    * 100 TB a bigram table does not fit); V rides a broadcast 1-row
    * frame; one per-document aggregate. No window, no product.
    */
  def lmScore(docs: DataFrame, refDf: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    def bigrams(df: DataFrame, keep: Seq[Column]) = df
      .select(keep :+ tokens(col(textCol)).as("__t"): _*)
      .select(keep :+ explode(when(size(col("__t")) < 2,
        array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(col("__t")) - 2),
          i => concat_ws(" ", get(col("__t"), i), get(col("__t"), i + 1)))))
        .as("__bg"): _*)
    val refToks = refDf.select(explode(tokens(col(textCol))).as("__w"))
    val uni = refToks.groupBy(col("__w"))
      .agg(count(lit(1)).cast(DoubleType).as("__u"))
    val vocab = refToks.agg(
      count_distinct(col("__w")).cast(DoubleType).as("__v"))
    val bi = bigrams(refDf, Seq.empty).groupBy(col("__bg"))
      .agg(count(lit(1)).cast(DoubleType).as("__b"))
    val scored = bigrams(docs, Seq(col(idCol)))
      .withColumn("__w", split(col("__bg"), " ").getItem(0))
      .join(bi, Seq("__bg"), "left")
      .join(uni, Seq("__w"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("__p",
        (coalesce(col("__b"), lit(0.0)) + 1.0) /
          (coalesce(col("__u"), lit(0.0)) + col("__v")))
    // left join back to the corpus so < 2-token documents keep a row
    docs.select(col(idCol)).join(
      scored.groupBy(col(idCol)).agg(
        count(lit(1)).as("n_bigrams"),
        trunc6(avg(-log(col("__p")))).as("lm_score")),
      Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("lm_score"))
  }

  /** BM25 keyword scoring with inverted-index candidate pruning — the
    * corpus-search shape that survives 100 TB: explode DISTINCT terms per
    * doc, equi-join the (tiny, broadcast) query term list — only docs
    * containing at least one query term flow further — compute per-term
    * contributions, one groupBy(doc) sum. Corpus stats (N, avgdl) and
    * per-term document frequencies are small aggregates broadcast back.
    * Returns (id, score) for every candidate; scores truncated to 6
    * decimals for cross-engine determinism.
    */
  def bm25(df: DataFrame, textCol: String, idCol: String,
      query: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(col(idCol), tokens(col(textCol)).as("__w"))
      .withColumn("__dl", size(col("__w")))
    val stats = toks.agg(
      count(lit(1)).as("__n"), avg(col("__dl")).as("__avgdl"))
    // normalize like tokens() does (lowercase) and dedup — an uppercase
    // or repeated query term must not zero out or double-count postings
    val terms = broadcast(
      query.map(_.toLowerCase).distinct.toDF("__term"))
    // inverted postings restricted to the query terms
    val postings = toks
      .select(col(idCol), col("__w"), col("__dl"),
        explode(array_distinct(col("__w"))).as("__term"))
      .join(terms, "__term")
    val dfreq = postings.groupBy("__term")
      .agg(count(lit(1)).as("__df"))
    postings
      .join(broadcast(dfreq), "__term")
      .crossJoin(broadcast(stats))
      .withColumn("__tf",
        size(filter(col("__w"), x => x === col("__term"))))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5)))
      .withColumn("__contrib",
        col("__idf") * col("__tf") * lit(k1 + 1) /
          (col("__tf") +
            lit(k1) * (lit(1 - b) + lit(b) * col("__dl") / col("__avgdl"))))
      .groupBy(col(idCol))
      .agg(trunc6(sum(col("__contrib"))).as("score"))
  }

  // --------------------------------------------------------------------
  // Order-n stupid-backoff LM scoring (Brants et al. 2007, "Large
  // Language Models in Machine Translation") — the higher-order form of
  // [[lmScore]]'s CCNet-style curation signal: the production
  // perplexity filter this feeds uses a 5-gram model, not a bigram.
  // S(w | ctx of len k−1) = cnt(g_k)/cnt(c_k) at the LONGEST observed
  // order k, discounted by α per backoff step; the base case is the
  // Laplace-smoothed unigram (cnt(w)+1)/(N+V) — [[lmScore]]'s OOV
  // discipline, so out-of-vocabulary tokens degrade smoothly instead
  // of scoring −log 0. Scores are UNNORMALIZED relative frequencies
  // (stupid backoff's defining trade: no back-off weights to estimate,
  // so the count tables are pure partial aggregates — the property
  // that makes the model trainable in one distributed pass where
  // Kneser-Ney needs continuation counts).
  // --------------------------------------------------------------------

  /** The all-orders n-gram count table of `refDf`: one row per
    * distinct gram of each order 1..n, counted over every position
    * (for order k, positions k..L per document). ONE groupBy — counts
    * for every order come from one explode + one partial aggregate.
    * Grams are space-joined token runs; grams of different orders can
    * never collide (tokens contain no spaces, so an order-k gram has
    * exactly k−1 spaces), which is what lets the scoring side join ONE
    * unified table instead of n per-order ones. Never broadcast — at
    * 100 TB an n-gram table does not fit; the scoring join shuffles on
    * gram text and AQE absorbs stopword-gram skew.
    */
  def ngramCounts(refDf: DataFrame, textCol: String, n: Int): DataFrame = {
    require(n >= 2 && n <= 8, s"ngramCounts: n must be in [2, 8], got $n")
    refDf.select(tokens(col(textCol)).as("__t"))
      .where(size(col("__t")) >= 1)
      .select(explode(flatten(transform(
        sequence(lit(1), size(col("__t"))), p =>
          transform(sequence(lit(1), least(p, lit(n))), k =>
            struct(k.as("order"),
              concat_ws(" ", slice(col("__t"), p - k + 1, k))
                .as("gram")))))).as("__g"))
      .groupBy(col("__g.order").as("order"), col("__g.gram").as("gram"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Score `docs` against a prepared [[ngramCounts]] table. Shape: one
    * melt explode (per scored position p = 2..L, the 2·min(p,n)−1 gram
    * strings the backoff chain can touch — suffix grams g_1..g_k ending
    * at p and context grams c_2..c_k ending at p−1), ONE left join
    * against the unified count table, one groupBy(id, p) pivot back to
    * a per-position row, the backoff CASE, one per-document aggregate.
    * The single melt join replaces the 2n−1 per-order shuffle joins the
    * column-per-gram layout would need — the scale-defining choice.
    */
  private def scoreBackoff(docs: DataFrame, counts: DataFrame,
      textCol: String, idCol: String, n: Int,
      alpha: Double): DataFrame = {
    require(n >= 2 && n <= 8, s"lmBackoff: n must be in [2, 8], got $n")
    require(alpha > 0 && alpha <= 1,
      s"lmBackoff: alpha must be in (0, 1], got $alpha")
    // α^j for j = 0..n−1 as driver-computed literals: both engines
    // (and the DuckDB oracle, which interpolates the same doubles)
    // must see bit-identical penalty factors, not their own pow()
    val pows = (0 until n).map(j => math.pow(alpha, j))
    // N and V from the order-1 rows of the count table itself, so the
    // standing-state path (read-time fold) and the one-shot path share
    // one definition; a 1-row frame, broadcast
    val nv = counts.where(col("order") === 1)
      .agg(sum(col("cnt")).cast(DoubleType).as("__n"),
        count(lit(1)).cast(DoubleType).as("__v"))
    val melt = docs
      .select(col(idCol), tokens(col(textCol)).as("__t"))
      .where(size(col("__t")) >= 2)
      .select(col(idCol), explode(flatten(transform(
        sequence(lit(2), size(col("__t"))), p =>
          concat(
            transform(sequence(lit(1), least(p, lit(n))), k =>
              struct(p.as("p"), k.as("k"), lit("g").as("r"),
                concat_ws(" ", slice(col("__t"), p - k + 1, k))
                  .as("gram"))),
            transform(sequence(lit(2), least(p, lit(n))), k =>
              struct(p.as("p"), k.as("k"), lit("c").as("r"),
                concat_ws(" ", slice(col("__t"), p - k + 1, k - 1))
                  .as("gram"))))))).as("__m"))
      .select(col(idCol), col("__m.p").as("__p"), col("__m.k").as("__k"),
        col("__m.r").as("__r"), col("__m.gram").as("gram"))
    val pivotAggs =
      (1 to n).map(k => max(when(col("__r") === "g" &&
        col("__k") === k, col("cnt"))).as(s"__g$k")) ++
      (2 to n).map(k => max(when(col("__r") === "c" &&
        col("__k") === k, col("cnt"))).as(s"__c$k"))
    val pivoted = melt
      .join(counts.select(col("gram"), col("cnt")), Seq("gram"), "left")
      .groupBy(col(idCol), col("__p"))
      .agg(pivotAggs.head, pivotAggs.tail: _*)
    // top = the highest order this position CAN use (min(p, n) — no α
    // penalty for being near the document start); pen(k) = α^(top−k)
    val top = least(col("__p"), lit(n))
    def pen(k: Int): Column =
      element_at(typedLit(pows), (top - lit(k) + 1).cast(IntegerType))
    // longest-match-first backoff: cnt(g_k) > 0 implies cnt(c_k) > 0
    // (c_k is a prefix of g_k, and every prefix of an observed k-gram
    // is an observed (k−1)-gram), so the ratio is never null/0 inside
    // its branch; a position whose k-th role row was never generated
    // (p < k) pivots to null and `null > 0` correctly skips the branch
    val s = (n to 2 by -1).foldRight(
      pen(1) * ((coalesce(col("__g1").cast(DoubleType), lit(0.0)) +
        1.0) / (col("__n") + col("__v")))) { (k, lower) =>
      when(col(s"__g$k") > 0,
        pen(k) * (col(s"__g$k").cast(DoubleType) /
          col(s"__c$k").cast(DoubleType))).otherwise(lower)
    }
    val perDoc = pivoted.crossJoin(broadcast(nv))
      .select(col(idCol), (-log(s)).as("__nll"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_scored"),
        trunc6(avg(col("__nll"))).as("lm_backoff"))
    // left join back to the corpus so < 2-token documents keep a row
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_scored"), lit(0L)).as("n_scored"),
        col("lm_backoff"))
  }

  /** One-shot cross-corpus stupid-backoff score: train the count table
    * on `refDf`, score `docs`. In-distribution text scores LOW;
    * gibberish and off-domain text HIGH (the [[lmScore]] convention).
    * Returns (idCol, n_scored, lm_backoff trunc6); documents with
    * fewer than 2 tokens score null over a zero count.
    */
  def lmBackoffScore(docs: DataFrame, refDf: DataFrame, textCol: String,
      idCol: String, n: Int, alpha: Double = 0.4): DataFrame =
    scoreBackoff(docs, ngramCounts(refDf, textCol, n), textCol, idCol,
      n, alpha)

  /** Append a reference batch's n-gram count DELTA to a standing count
    * state directory — the sketch-state discipline (append-only, no
    * read-modify-write; the meta pin carries n, because folding
    * order-3 deltas into an order-5 state would silently skew every
    * higher-order numerator). Counts are additive, so the read-time
    * per-gram sum equals [[ngramCounts]] of the batches' union — the
    * merge law that makes the standing path exactly equal the one-shot.
    */
  def appendNgramState(batch: DataFrame, textCol: String, n: Int,
      dir: String): Unit = {
    require(n >= 2 && n <= 8, s"appendNgramState: n in [2, 8], got $n")
    Sketches.metaCheckOrWrite(batch.sparkSession, dir, Seq("n" -> n))
    ngramCounts(batch, textCol, n)
      .write.mode("append").parquet(s"$dir/counts")
  }

  /** Stupid-backoff scoring from a standing count state: fold the
    * appended deltas (per-gram sum), then score — the train-once
    * encode-every-batch form. Requires the meta pin (read paths never
    * write it) and validates the caller's n against it.
    */
  def lmBackoffScoreFromState(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      docs: DataFrame, textCol: String, idCol: String, n: Int,
      alpha: Double = 0.4): DataFrame = {
    Sketches.metaCheck(spark, dir, Seq("n" -> n))
    val counts = spark.read.parquet(s"$dir/counts")
      .groupBy(col("order"), col("gram"))
      .agg(sum(col("cnt")).as("cnt"))
    scoreBackoff(docs, counts, textCol, idCol, n, alpha)
  }

}
