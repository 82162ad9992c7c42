package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ml.{Curation, Graphs}

/** Round-14 driver-gate queries: the full-Public-Suffix-List domain
  * keying threaded through the COMPOSED curation operators (domain
  * stats, the authority rollup), plus this round's new compositions.
  * The fixture rule table is Round13's `PslFullRules` — its wildcard
  * (`*.site22.org`) and exception (`!www.site10.com`) rules verifiably
  * fire on hosts the md5-url fixture produces, so a heuristic-keyed
  * run CANNOT pass these oracles.
  */
object Round14Queries {

  import Round13Queries.PslFullRules

  /** The publicsuffix.org algorithm over the fixture rules as a
    * reusable CTE chain: input CTE must expose (`k` unique row key,
    * `host`); emits `${pfx}dom(k, host, domain)`. All CTE names carry
    * `pfx` so several chains (or a chain next to other builder
    * families) never collide (the canonCte lesson).
    */
  private[queries] def pslDomainCtes(inCte: String, pfx: String): String = {
    val rules = PslFullRules.map { case (sfx, k) =>
      s"('$sfx', '$k', ${sfx.count(_ == '.') + 1})"
    }.mkString(", ")
    s"""${pfx}pp AS (SELECT k, host, string_split(host, '.') AS parts
              FROM $inCte),
       ${pfx}rules(suffix, kind, rlen) AS (VALUES $rules),
       ${pfx}cand AS (SELECT p.k, r.kind,
                 CASE r.kind WHEN 'wildcard' THEN r.rlen + 1
                      WHEN 'exception' THEN r.rlen - 1
                      ELSE r.rlen END AS efflen
               FROM ${pfx}pp p JOIN ${pfx}rules r
                 ON len(p.parts) >= r.rlen
                AND array_to_string(p.parts[-r.rlen:], '.') = r.suffix
                AND (r.kind <> 'wildcard'
                     OR len(p.parts) >= r.rlen + 1)),
       ${pfx}best AS (SELECT k,
                 CASE WHEN bool_or(kind = 'exception')
                      THEN max(efflen) FILTER (kind = 'exception')
                      ELSE max(efflen) END AS bl
               FROM ${pfx}cand GROUP BY 1),
       ${pfx}dom AS (SELECT p.k, p.host,
              CASE WHEN p.host IS NULL OR len(p.parts) <= 1 THEN p.host
                   WHEN b.bl IS NULL THEN
                     p.parts[-2] || '.' || p.parts[-1]
                   WHEN b.bl >= len(p.parts) THEN p.host
                   ELSE array_to_string(p.parts[-(b.bl + 1):], '.') END
                AS domain
            FROM ${pfx}pp p LEFT JOIN ${pfx}best b USING (k))"""
  }

  /** `domainStats` through full-PSL keying, replayed end to end: the
    * url fixture → host extraction → publicsuffix.org algorithm over
    * the fixture rules → the stats rollup. The wildcard/exception
    * rules change the grouping (blog.site22.org keys as itself,
    * www.site10.com registers itself), so the last-two-labels
    * heuristic produces a different table.
    */
  private lazy val domainStatsPslOracle = {
    import Round11Queries.{hostSql, urlCte}
    s"""WITH $urlCte,
       dsh AS (SELECT doc_id AS k, ${hostSql("url")} AS host FROM urls),
       ${pslDomainCtes("dsh", "ds_")}
      SELECT domain, count(*) AS n_docs,
        count(DISTINCT host) AS n_hosts
      FROM ds_dom GROUP BY 1"""
  }

  /** `Graphs.domainAuthority` through full-PSL keying: the exact
    * integer PageRank chain rolled up to PSL registrable domains.
    */
  private lazy val authorityPslOracle =
    s"""${Round12Queries.pageRankOracle0},
       aph AS (SELECT node AS k, node AS host, pr_rank FROM r3),
       ${pslDomainCtes("aph", "ap_")}
      SELECT d.domain, CAST(sum(a.pr_rank) AS BIGINT) AS authority,
        count(*) AS n_hosts
      FROM ap_dom d JOIN aph a USING (k) GROUP BY 1"""

  /** `curateFunnelByDomain` replayed: the ENTIRE funnel CTE chain
    * (Round13's gate) plus the fixture-PSL domain keying, rolled up
    * per (stage, domain) — the attribution report that tells a
    * curation run WHERE the losses concentrate.
    */
  private lazy val funnelDomainsOracle = {
    import Round11Queries.hostSql
    val stages = Seq(
      (0, "input", "documents"), (1, "html_to_text", "texted2"),
      (2, "blocklist", "unblocked"), (3, "quality_rules", "ruled"),
      (4, "classifier", "scored"), (5, "url_dedup", "urlkept"),
      (6, "near_dedup", "nearkept"))
    val rollups = stages.map { case (i, name, cte) =>
      s"""SELECT CAST($i AS INT) AS step, '$name' AS stage, d.domain,
            count(*) AS docs
          FROM $cte s JOIN fd_dom d ON d.k = s.doc_id
          GROUP BY 1, 2, 3"""
    }.mkString("\n      UNION ALL ")
    s"""${Round13Queries.funnelOraclePrefix},
       fdh AS (SELECT doc_id AS k, ${hostSql("url")} AS host FROM urls),
       ${pslDomainCtes("fdh", "fd_")}
      $rollups"""
  }

  /** Per-language phrases whose stopwords fire EXACTLY ONE language's
    * list (the shared fr/es `la` avoided), so the langId argmax is
    * unambiguous; the trailing doc-varying token keeps texts distinct.
    * zh has no stopword list → `unknown` → drops from the mix.
    */
  private val LangPhrases = Seq(
    "en" -> "the of and it", "de" -> "der und ist zu",
    "fr" -> "le les et dans", "es" -> "el los y una")

  /** The multilingual fixture + langId stopword-argmax chain shared by
    * the mix and plan oracles: `ml(doc_id, mltext)` … `mll(doc_id,
    * lang_pred)` (known languages only).
    */
  private lazy val langFixtureCtes = {
    val phrase = LangPhrases.map { case (l, p) =>
      s"WHEN '$l' THEN '$p'"
    }.mkString(" ")
    def scoreSql(words: Seq[String]) =
      s"len(list_filter(toks, x -> list_contains(" +
        words.map(w => s"'$w'").mkString("[", ",", "]") + ", x)))"
    // the SAME stopword lists TextAnalysis.LangStopwords hardcodes
    val en = scoreSql(Seq("the", "of", "and", "to", "in", "is", "that", "it"))
    val de = scoreSql(Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"))
    val fr = scoreSql(Seq("le", "la", "les", "et", "est", "un", "une", "dans"))
    val es = scoreSql(Seq("el", "la", "los", "y", "es", "un", "una", "en"))
    s"""ml AS (SELECT doc_id,
              (CASE lang $phrase ELSE 'zz qq' END)
                || ' x' || (doc_id % 90)::VARCHAR AS mltext
            FROM documents),
       mt AS (SELECT doc_id, string_split(lower(mltext), ' ') AS toks
              FROM ml),
       ms AS (SELECT doc_id, $en AS s_en, $de AS s_de, $fr AS s_fr,
                $es AS s_es
              FROM mt),
       mlp AS (SELECT doc_id,
                 CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0
                        THEN 'unknown'
                      WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
                      WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
                      WHEN s_fr >= s_es THEN 'fr'
                      ELSE 'es' END AS lang_pred
               FROM ms),
       mll AS (SELECT doc_id, lang_pred FROM mlp
               WHERE lang_pred IN ('en', 'de', 'fr', 'es'))"""
  }

  /** `languageMix` replayed: the multilingual text fixture → the langId
    * stopword-argmax → per-language counts → min-ratio scale → floored
    * keeps → lowest-hash-first row ranks (salt mixL).
    */
  private lazy val languageMixOracle = {
    s"""WITH $langFixtureCtes,
       mlc AS (SELECT lang_pred, CAST(count(*) AS DOUBLE) AS c
               FROM mll GROUP BY 1),
       mlw(lang_pred, p) AS (VALUES ('en', 0.4), ('de', 0.3),
               ('fr', 0.2), ('es', 0.1)),
       mlsc AS (SELECT min(c / p) AS scale
                FROM mlc JOIN mlw USING (lang_pred)),
       mlk AS (SELECT mlc.lang_pred,
                 CAST(floor(p * (SELECT scale FROM mlsc)) AS BIGINT)
                   AS k
               FROM mlc JOIN mlw USING (lang_pred)),
       mlr AS (SELECT doc_id, lang_pred,
                 row_number() OVER (PARTITION BY lang_pred
                   ORDER BY ('0x'||substr(md5('mixL'||
                     CAST(doc_id AS VARCHAR)),1,8))::BIGINT, doc_id)
                   AS rn
               FROM mll)
      SELECT doc_id, lang_pred FROM mlr JOIN mlk USING (lang_pred)
      WHERE rn <= k"""
  }

  /** `unigramEncodeIds` replayed: piece ids are the lexicographic rank
    * within the trained vocabulary; each word's best path maps to its
    * id array and joins back to the positional token occurrences.
    */
  private lazy val unigramEncodeIdsOracle = {
    val er = UniEmRounds + 1
    s"""WITH RECURSIVE
       $unigramTrainChain,
       $unigramEncodeChain,
       vid AS (SELECT piece,
                 CAST(row_number() OVER (ORDER BY piece) - 1 AS BIGINT)
                   AS pid
               FROM uv$UniEmRounds),
       wseq AS (SELECT word,
                  unnest(range(1, len(string_split(path, ' ')) + 1))
                    AS ord,
                  unnest(string_split(path, ' ')) AS piece
                FROM r${er}best),
       uti AS (SELECT doc_id,
                 unnest(range(1, len(tl) + 1)) - 1 AS tok_pos,
                 unnest(tl) AS word
               FROM (SELECT doc_id, list_filter(
                       string_split(lower(text), ' '), t -> t <> '')
                       AS tl
                     FROM ucorp))
      SELECT t.doc_id, CAST(t.tok_pos AS BIGINT) AS tok_pos,
        CAST(s.ord - 1 AS BIGINT) AS piece_pos,
        CAST(v.pid AS BIGINT) AS piece_id
      FROM uti t JOIN wseq s USING (word) JOIN vid v USING (piece)"""
  }

  /** Byte-fallback encode replayed end to end: the bait corpus appends
    * a per-doc `w<digit>z` token (digits and `z` are provably outside
    * the training alphabet — the corpus is [a-y]-minus-x lowercase);
    * the Viterbi replay runs over a piece table EXTENDED with the
    * unknown single chars at probability 0 (exactly the engine's
    * `getOrElse(piece, 0)` admissibility for single chars), vocabulary
    * ranks shift by 256, and an unknown piece's id is its UTF-8 byte —
    * for this ASCII bait, `unicode(piece)`.
    */
  private lazy val unigramBytesOracle = {
    val R = UniEmRounds
    s"""WITH RECURSIVE
       $unigramTrainChain,
       ubait AS (SELECT doc_id,
           text || ' w' || CAST(doc_id % 10 AS VARCHAR) || 'z' AS text
         FROM ucorp),
       ubw AS MATERIALIZED (
         SELECT DISTINCT word FROM (
           SELECT unnest(list_filter(string_split(lower(text), ' '),
             t -> t <> '')) AS word
           FROM ubait)),
       uvx AS MATERIALIZED (
         SELECT piece, p FROM uv$R
         UNION ALL
         SELECT c.piece, CAST(0 AS BIGINT) AS p
         FROM (SELECT DISTINCT unnest(string_split(word, '')) AS piece
               FROM ubw) c
         WHERE NOT EXISTS (SELECT 1 FROM uv$R v
                           WHERE v.piece = c.piece)),
       bseg(word, pos, k, sc, path) AS (
         SELECT word, 0, 0, CAST(1 AS HUGEINT), '' FROM ubw
         UNION ALL
         SELECT s.word, s.pos + len(v.piece), s.k + 1, s.sc * v.p,
           CASE WHEN s.path = '' THEN v.piece
                ELSE s.path || ' ' || v.piece END
         FROM bseg s JOIN uvx v
           ON v.piece = substr(s.word, s.pos + 1, len(v.piece))
         WHERE s.pos < len(s.word)
           AND s.pos + len(v.piece) <= len(s.word)),
       bbest AS MATERIALIZED (
         SELECT word, k, path FROM (
           SELECT word, k, path,
             row_number() OVER (PARTITION BY word
               ORDER BY sc * $uniPowMult DESC, k ASC, path ASC) AS rn
           FROM bseg WHERE pos = len(word))
         WHERE rn = 1),
       bvid AS (SELECT piece,
                  CAST(row_number() OVER (ORDER BY piece) + 255
                    AS BIGINT) AS pid
                FROM uv$R),
       bseq AS (SELECT word,
                  unnest(range(1, len(string_split(path, ' ')) + 1))
                    AS ord,
                  unnest(string_split(path, ' ')) AS piece
                FROM bbest),
       bids AS (SELECT s.word, s.ord,
                  coalesce(v.pid,
                    CAST(CASE WHEN unicode(s.piece) < 128
                      THEN unicode(s.piece)
                      ELSE error('unigramBytesOracle: non-ASCII ' ||
                        'fallback piece — unicode() equals the UTF-8 ' ||
                        'byte only below 128; replay real byte ' ||
                        'expansion before widening the corpus')
                      END AS BIGINT)) AS pid
                FROM bseq s LEFT JOIN bvid v USING (piece)),
       bti AS (SELECT doc_id,
                 unnest(range(1, len(tl) + 1)) - 1 AS tok_pos,
                 unnest(tl) AS word
               FROM (SELECT doc_id, list_filter(
                       string_split(lower(text), ' '), t -> t <> '')
                       AS tl
                     FROM ubait))
      SELECT t.doc_id, CAST(t.tok_pos AS BIGINT) AS tok_pos,
        CAST(i.ord - 1 AS BIGINT) AS piece_pos,
        CAST(i.pid AS BIGINT) AS piece_id
      FROM bti t JOIN bids i USING (word)"""
  }

  /** `packChunksBySize` fed by the trained tokenizer's piece counts —
    * context-window packing by what actually fills the window. The
    * pack replay is the q_pack_chunks machinery over `udoc.n_pieces`.
    */
  private lazy val packByPiecesOracle =
    s"""WITH RECURSIVE
       $unigramTrainChain,
       $unigramEncodeChain,
       ppd AS (SELECT d.doc_id,
                 CAST(coalesce(u.n_pieces, 0) AS BIGINT) AS n
               FROM documents d LEFT JOIN udoc u USING (doc_id)
               WHERE d.doc_id < 300),
       ppc AS (SELECT doc_id, n,
                 CAST(sum(n) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS BIGINT) AS e
               FROM ppd WHERE n > 0),
       ppx AS (SELECT doc_id, n, e - n AS s, e,
                 unnest(range((e - n) // 64, (e - 1) // 64 + 1))
                   AS chunk_id
               FROM ppc)
      SELECT doc_id, chunk_id,
             greatest(s, chunk_id * 64) - s AS tok_from,
             least(e, (chunk_id + 1) * 64) - s AS tok_to
      FROM ppx"""

  /** `packTokenIds` replayed end to end: the per-doc ordered piece-id
    * stream (encode-ids machinery + a per-doc row_number), the global
    * running-sum placement (the packByPieces replay), and the
    * div/mod window arithmetic.
    */
  private lazy val packTokenIdsOracle = {
    val er = UniEmRounds + 1
    s"""WITH RECURSIVE
       $unigramTrainChain,
       $unigramEncodeChain,
       vid AS (SELECT piece,
                 CAST(row_number() OVER (ORDER BY piece) - 1 AS BIGINT)
                   AS pid
               FROM uv$UniEmRounds),
       wseq AS (SELECT word,
                  unnest(range(1, len(string_split(path, ' ')) + 1))
                    AS ord,
                  unnest(string_split(path, ' ')) AS piece
                FROM r${er}best),
       uti AS (SELECT doc_id,
                 unnest(range(1, len(tl) + 1)) - 1 AS tok_pos,
                 unnest(tl) AS word
               FROM (SELECT doc_id, list_filter(
                       string_split(lower(text), ' '), t -> t <> '')
                       AS tl
                     FROM ucorp)
               WHERE doc_id < 300),
       pidx AS MATERIALIZED (
         SELECT t.doc_id,
           row_number() OVER (PARTITION BY t.doc_id
             ORDER BY t.tok_pos, s.ord) - 1 AS pidx,
           v.pid
         FROM uti t JOIN wseq s USING (word) JOIN vid v USING (piece)),
       ppd AS (SELECT d.doc_id,
                 CAST(coalesce(u.n_pieces, 0) AS BIGINT) AS n
               FROM documents d LEFT JOIN udoc u USING (doc_id)
               WHERE d.doc_id < 300),
       ppc AS (SELECT doc_id, n,
                 CAST(sum(n) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS BIGINT) AS e
               FROM ppd WHERE n > 0)
      SELECT p.doc_id,
        CAST((c.e - c.n + p.pidx) // 64 AS BIGINT) AS chunk_id,
        CAST((c.e - c.n + p.pidx) % 64 AS BIGINT) AS pos,
        CAST(p.pid AS BIGINT) AS piece_id
      FROM pidx p JOIN ppc c USING (doc_id)"""
  }

  /** `bpeEncodeIdsLarge` replayed: the 277-merge chained-replace
    * ground truth per TOKEN OCCURRENCE (position carried through the
    * chain), pieces mapped to ids — code point for single chars,
    * 0x110000 + first-producing rank for merge outputs.
    */
  private[queries] lazy val bpeEncodeIdsOracle = {
    import Round13Queries.largeMerges
    val groups = largeMerges.grouped(20).toSeq
    val ctes = groups.zipWithIndex.map { case (g, gi) =>
      val inner = g.foldLeft("s") { case (acc, (l, r)) =>
        s"replace($acc, ' $l  $r ', ' $l$r ')"
      }
      s"be${gi + 1} AS (SELECT doc_id, tok_pos, $inner AS s FROM be$gi)"
    }
    val last = s"be${groups.size}"
    val mergeVals = largeMerges.zipWithIndex.map { case ((l, r), i) =>
      s"('${l + r}', ${i + 1})"
    }.mkString(", ")
    s"""WITH be0 AS (
         SELECT doc_id, ord - 1 AS tok_pos,
           array_to_string(list_transform(range(1, len(word) + 1),
             i -> ' '||word[i]||' '), '') AS s
         FROM (SELECT doc_id,
                 unnest(range(1, len(tl) + 1)) AS ord,
                 unnest(tl) AS word
               FROM (SELECT doc_id, list_filter(
                       string_split(lower(text), ' '), t -> t <> '')
                       AS tl
                     FROM documents))),
       ${ctes.mkString(",\n       ")},
       bm(piece, rnk) AS (VALUES $mergeVals),
       bmid AS (SELECT piece, 1114112 + min(rnk) AS pid
                FROM bm GROUP BY 1),
       bpcs AS (SELECT doc_id, tok_pos,
                  unnest(range(1, len(pl) + 1)) AS ord2,
                  unnest(pl) AS piece
                FROM (SELECT doc_id, tok_pos, list_filter(
                        string_split(s, ' '), x -> x <> '') AS pl
                      FROM $last)),
       bids AS (SELECT p.doc_id, p.tok_pos, p.ord2,
                  CASE WHEN len(p.piece) = 1 THEN unicode(p.piece)
                       ELSE m.pid END AS pid
                FROM bpcs p LEFT JOIN bmid m USING (piece))
      SELECT doc_id, CAST(tok_pos AS BIGINT) AS tok_pos,
        CAST(ord2 - 1 AS BIGINT) AS piece_pos,
        CAST(pid AS BIGINT) AS piece_id
      FROM bids"""
  }

  private val LangPlanBudget = 4000L
  private val LangPlanCap = 2

  /** `languagePlan` replayed: the langid chain feeds the water-filling
    * epoch-plan machinery keyed by lang_pred — at the gate scales the
    * budget forces 2-3 redistribution rounds (de/fr/es cap at 2
    * epochs, en absorbs the surplus uncapped).
    */
  private lazy val languagePlanOracle =
    s"""WITH $langFixtureCtes,
       lp AS (SELECT mll.lang_pred, ml.mltext AS text
              FROM mll JOIN ml USING (doc_id)),
       ${Round12Queries.epochPlanReplay("lp", "lang_pred",
         LangPlanBudget, LangPlanCap)}"""

  /** `tuneIvf` replayed end to end, no unrolling: the doubling trial
    * sequence {min(2^i, nlist)} is generated from n, every trial's
    * recall@k computes in one generic (trial × query × probed-cell)
    * join, and the chosen nprobe is the first doubling that reaches the
    * target (else nlist). All ingredients are the pinned ANN families:
    * md5-hash-ordered sample, id-prefix codebook, rounded-cosine cell
    * assignment with lowest-cell ties, (cos DESC, nb_id ASC) top-k.
    */
  private lazy val tuneIvfOracle = {
    import MlQueries.{cosSql, normSql}
    val K = 10
    s"""WITH nv AS MATERIALIZED (
           SELECT vec_id, $normSql AS e FROM embeddings),
       tn AS (SELECT count(*) AS n FROM nv),
       tnl AS (SELECT CAST(least(65536, greatest(8,
                 round(sqrt(n::DOUBLE)))) AS BIGINT) AS nlist FROM tn),
       tcent AS MATERIALIZED (
           SELECT vec_id AS cell, e AS vcent
           FROM (SELECT vec_id, e,
                   row_number() OVER (ORDER BY vec_id) AS r FROM nv)
           WHERE r <= (SELECT nlist FROM tnl)),
       tsamp AS MATERIALIZED (
           SELECT vec_id AS query_id, e AS vq
           FROM nv
           ORDER BY ('0x'||substr(md5('tune'||vec_id::VARCHAR),1,8))
                      ::BIGINT, vec_id
           LIMIT 32),
       texact AS MATERIALIZED (
           SELECT query_id, nb_id FROM (
             SELECT s.query_id, v.vec_id AS nb_id,
               row_number() OVER (PARTITION BY s.query_id
                 ORDER BY ${cosSql("s.vq", "v.e")} DESC, v.vec_id)
                 AS r
             FROM tsamp s JOIN nv v ON v.vec_id <> s.query_id)
           WHERE r <= $K),
       tne AS (SELECT count(*) AS ne FROM texact),
       tcells AS MATERIALIZED (
           SELECT vec_id AS nb_id, cell, e AS v FROM (
             SELECT v.vec_id, c.cell, v.e,
               row_number() OVER (PARTITION BY v.vec_id
                 ORDER BY ${cosSql("v.e", "c.vcent")} DESC, c.cell)
                 AS r
             FROM nv v CROSS JOIN tcent c)
           WHERE r = 1),
       tqrank AS MATERIALIZED (
           SELECT query_id, vq, cell, r FROM (
             SELECT s.query_id, s.vq, c.cell,
               row_number() OVER (PARTITION BY s.query_id
                 ORDER BY ${cosSql("s.vq", "c.vcent")} DESC, c.cell)
                 AS r
             FROM tsamp s CROSS JOIN tcent c)),
       ttrials AS (SELECT DISTINCT
                     least(CAST(2 ** i AS BIGINT),
                       (SELECT nlist FROM tnl)) AS nprobe
                   FROM range(0, 17) t(i)
                   WHERE CAST(2 ** i AS BIGINT) <=
                         2 * (SELECT nlist FROM tnl)),
       tgot AS MATERIALIZED (
           SELECT nprobe, query_id, nb_id FROM (
             SELECT t.nprobe, q.query_id, c.nb_id,
               row_number() OVER (PARTITION BY t.nprobe, q.query_id
                 ORDER BY ${cosSql("q.vq", "c.v")} DESC, c.nb_id)
                 AS r
             FROM ttrials t
             JOIN tqrank q ON q.r <= t.nprobe
             JOIN tcells c ON c.cell = q.cell
                          AND c.nb_id <> q.query_id)
           WHERE r <= $K),
       trec AS MATERIALIZED (
           SELECT t.nprobe,
             CAST(count(e.nb_id) AS DOUBLE) / (SELECT ne FROM tne)
               AS recall
           FROM ttrials t
           LEFT JOIN tgot g ON g.nprobe = t.nprobe
           LEFT JOIN texact e ON e.query_id = g.query_id
                             AND e.nb_id = g.nb_id
           GROUP BY 1),
       tpick AS (SELECT COALESCE(
                   (SELECT min(nprobe) FROM trec WHERE recall >= 0.9),
                   (SELECT max(nprobe) FROM trec)) AS nprobe)
      SELECT CAST((SELECT nlist FROM tnl) AS INT) AS nlist,
        CAST(t.nprobe AS INT) AS nprobe, t.recall
      FROM trec t JOIN tpick p ON t.nprobe = p.nprobe"""
  }

  // ---------------------------------------------------------------
  // Unigram-LM (SentencePiece) tokenizer gates. The corpus restricts
  // to short lowercase-alpha tokens so the DuckDB replay's HUGEINT
  // normalized scores stay inside 128 bits (word length ≤ 6 → at most
  // (10^6)^6 = 10^36 < 2^127); the Spark operator itself is
  // uncapped (BigInt cross-multiplied comparisons).
  private[queries] val UniMaxPieceLen = 3
  private val UniSeedSize = 40
  private val UniMinCount = 2L
  private[queries] val UniEmRounds = 2

  private[queries] def unigramCorpus(docs: DataFrame,
      maxWordLen: Int = 6): DataFrame =
    docs.select(col("doc_id"),
      array_join(filter(split(lower(col("text")), " "),
        t => t.rlike(s"^[a-z]{1,$maxWordLen}$$")), " ").as("text"))

  private def unigramCorpusCteOver(maxWordLen: Int): String =
    s"""ucorp AS MATERIALIZED (
         SELECT doc_id, array_to_string(list_filter(
           string_split(lower(text), ' '),
           t -> regexp_matches(t, '^[a-z]{1,$maxWordLen}$$')), ' ')
           AS text
         FROM documents)"""

  private val unigramCorpusCte = unigramCorpusCteOver(6)

  /** Seed-vocabulary CTEs: distinct (word, freq), substring-occurrence
    * counts up to length 3, all single chars ∪ top-40 multi-char
    * pieces with count ≥ 2 (ties (count DESC, piece)), fixed-point
    * ppm probabilities — `uw` and `uv0`.
    */
  private val unigramSeedCtes =
    s"""uw AS MATERIALIZED (
         SELECT word, count(*) AS f
         FROM (SELECT unnest(list_filter(string_split(lower(text), ' '),
                 t -> t <> '')) AS word
               FROM ucorp)
         GROUP BY 1),
       usub AS MATERIALIZED (
         SELECT piece, CAST(sum(f) AS BIGINT) AS c
         FROM (SELECT f, unnest(flatten(list_transform(
                 range(1, len(word) + 1),
                 i -> list_transform(
                   range(0, least(${UniMaxPieceLen - 1},
                     len(word) - i) + 1),
                   l -> substr(word, CAST(i AS INT),
                     CAST(l + 1 AS INT)))))) AS piece
               FROM uw)
         GROUP BY 1),
       useed AS MATERIALIZED (
         SELECT piece, c FROM usub WHERE len(piece) = 1
         UNION ALL
         SELECT piece, c FROM (
           SELECT piece, c FROM usub
           WHERE len(piece) >= 2 AND c >= $UniMinCount
           ORDER BY c DESC, piece LIMIT $UniSeedSize)),
       uv0 AS MATERIALIZED (
         SELECT piece, c,
           CAST(c * 1000000 // (SELECT CAST(sum(c) AS HUGEINT)
             FROM useed) AS BIGINT) AS p
         FROM useed)"""

  /** The common-power multipliers that normalize a k-piece product
    * score to the fixed word-length-6 exponent: `P^(6-k)`.
    */
  private val uniPowMult =
    """(CASE k WHEN 1 THEN '1000000000000000000000000000000'::HUGEINT
              WHEN 2 THEN '1000000000000000000000000'::HUGEINT
              WHEN 3 THEN '1000000000000000000'::HUGEINT
              WHEN 4 THEN '1000000000000'::HUGEINT
              WHEN 5 THEN '1000000'::HUGEINT
              ELSE '1'::HUGEINT END)"""

  /** One hard-EM round replayed: brute-force every vocab-valid
    * segmentation of every distinct word (recursive CTE — bounded by
    * word length 6 and piece length 3), pick the exact argmax
    * (normalized HUGEINT score DESC, k ASC, path ASC), count pieces
    * along the winning paths weighted by word frequency, renormalize
    * to ppm. Emits `${r}seg`, `${r}best`, `${r}cnt`, and `uv$n`.
    */
  private def unigramEmRoundCtes(n: Int,
      pruneTo: Option[Int] = None): String = {
    val r = s"r$n"
    val prev = s"uv${n - 1}"
    val finish = pruneTo match {
      case None =>
        s"""uv$n AS MATERIALIZED (
         SELECT v.piece, coalesce(c.c, CAST(0 AS BIGINT)) AS c,
           CAST(coalesce(c.c, 0) * 1000000 //
             greatest(CAST(1 AS HUGEINT),
               (SELECT CAST(coalesce(sum(c), 0) AS HUGEINT)
                FROM ${r}cnt)) AS BIGINT) AS p
         FROM $prev v LEFT JOIN ${r}cnt c USING (piece))"""
      case Some(v) =>
        s"""${r}cv AS (SELECT v.piece,
             coalesce(c.c, CAST(0 AS BIGINT)) AS c
           FROM $prev v LEFT JOIN ${r}cnt c USING (piece)),
       ${r}keep AS MATERIALIZED (
         SELECT piece, c FROM ${r}cv WHERE len(piece) = 1
         UNION ALL
         SELECT piece, c FROM (
           SELECT piece, c FROM ${r}cv WHERE len(piece) >= 2
           ORDER BY c DESC, piece LIMIT $v)),
       uv$n AS MATERIALIZED (
         SELECT piece, c,
           CAST(c * 1000000 //
             greatest(CAST(1 AS HUGEINT),
               (SELECT CAST(coalesce(sum(c), 0) AS HUGEINT)
                FROM ${r}keep)) AS BIGINT) AS p
         FROM ${r}keep)"""
    }
    s"""${r}seg(word, f, pos, k, sc, path) AS (
         SELECT word, f, 0, 0, CAST(1 AS HUGEINT), '' FROM uw
         UNION ALL
         SELECT s.word, s.f, s.pos + len(v.piece), s.k + 1,
           s.sc * v.p,
           CASE WHEN s.path = '' THEN v.piece
                ELSE s.path || ' ' || v.piece END
         FROM ${r}seg s JOIN $prev v
           ON v.piece = substr(s.word, s.pos + 1, len(v.piece))
         WHERE s.pos < len(s.word)
           AND s.pos + len(v.piece) <= len(s.word)),
       ${r}best AS MATERIALIZED (
         SELECT word, f, k, path FROM (
           SELECT word, f, k, path,
             row_number() OVER (PARTITION BY word
               ORDER BY sc * $uniPowMult DESC, k ASC, path ASC) AS rn
           FROM ${r}seg WHERE pos = len(word))
         WHERE rn = 1),
       ${r}cnt AS MATERIALIZED (
         SELECT piece, CAST(sum(f) AS BIGINT) AS c
         FROM (SELECT f, unnest(string_split(path, ' ')) AS piece
               FROM ${r}best)
         GROUP BY 1),
       $finish"""
  }

  /** One SOFT-EM round replayed: every path's common-power-normalized
    * score (`sc · P^(len−k)` — all paths of a word share the 10⁶^len
    * denominator, so scores ADD), per-word denominators, per-(word,
    * piece) occupancy numerators with multiplicity, ppm-floored
    * expected counts × word frequency, renormalize. Word length ≤ 5
    * keeps `num · 10⁶` under 2¹²⁷.
    */
  private def unigramSoftRoundCtes(n: Int,
      pruneTo: Option[Int] = None): String = {
    val r = s"s$n"
    val prev = s"uv${n - 1}"
    // the same SHRINK finish as the hard-EM builder: keep chars plus
    // the top-pruneTo multi-char pieces (ties (count DESC, piece ASC))
    // and renormalize over the survivors
    val finish = pruneTo match {
      case None =>
        s"""uv$n AS MATERIALIZED (
         SELECT v.piece, coalesce(c.c, CAST(0 AS BIGINT)) AS c,
           CAST(coalesce(c.c, 0) * 1000000 //
             greatest(CAST(1 AS HUGEINT),
               (SELECT CAST(coalesce(sum(c), 0) AS HUGEINT)
                FROM ${r}cnt)) AS BIGINT) AS p
         FROM $prev v LEFT JOIN ${r}cnt c USING (piece))"""
      case Some(v) =>
        s"""${r}cv AS (SELECT v.piece,
             coalesce(c.c, CAST(0 AS BIGINT)) AS c
           FROM $prev v LEFT JOIN ${r}cnt c USING (piece)),
       ${r}keep AS MATERIALIZED (
         SELECT piece, c FROM ${r}cv WHERE len(piece) = 1
         UNION ALL
         SELECT piece, c FROM (
           SELECT piece, c FROM ${r}cv WHERE len(piece) >= 2
           ORDER BY c DESC, piece LIMIT $v)),
       uv$n AS MATERIALIZED (
         SELECT piece, c,
           CAST(c * 1000000 //
             greatest(CAST(1 AS HUGEINT),
               (SELECT CAST(coalesce(sum(c), 0) AS HUGEINT)
                FROM ${r}keep)) AS BIGINT) AS p
         FROM ${r}keep)"""
    }
    val lenPow =
      """(CASE len(word) - k
              WHEN 1 THEN '1000000'::HUGEINT
              WHEN 2 THEN '1000000000000'::HUGEINT
              WHEN 3 THEN '1000000000000000000'::HUGEINT
              WHEN 4 THEN '1000000000000000000000000'::HUGEINT
              ELSE '1'::HUGEINT END)"""
    s"""${r}seg(word, f, pos, k, sc, path) AS (
         SELECT word, f, 0, 0, CAST(1 AS HUGEINT), '' FROM uw
         UNION ALL
         SELECT s.word, s.f, s.pos + len(v.piece), s.k + 1,
           s.sc * v.p,
           CASE WHEN s.path = '' THEN v.piece
                ELSE s.path || ' ' || v.piece END
         FROM ${r}seg s JOIN $prev v
           ON v.piece = substr(s.word, s.pos + 1, len(v.piece))
         WHERE s.pos < len(s.word)
           AND s.pos + len(v.piece) <= len(s.word)),
       ${r}paths AS MATERIALIZED (
         SELECT word, f, path, sc * $lenPow AS snorm
         FROM ${r}seg WHERE pos = len(word)),
       ${r}den AS (SELECT word, sum(snorm) AS den
                   FROM ${r}paths GROUP BY 1),
       ${r}num AS (SELECT word, piece, sum(snorm) AS num
                   FROM (SELECT word, snorm,
                           unnest(string_split(path, ' ')) AS piece
                         FROM ${r}paths)
                   GROUP BY 1, 2),
       ${r}ctr AS MATERIALIZED (
         SELECT n.word, n.piece,
           CAST(n.num * 1000000 // d.den AS BIGINT) AS cppm
         FROM ${r}num n JOIN ${r}den d USING (word)
         WHERE d.den > 0),
       ${r}cnt AS MATERIALIZED (
         SELECT piece, CAST(sum(c.cppm * uw.f) AS BIGINT) AS c
         FROM ${r}ctr c JOIN uw USING (word) GROUP BY 1),
       $finish"""
  }

  private lazy val unigramSoftPruneOracle =
    s"""WITH RECURSIVE
       ${(unigramCorpusCteOver(5) +: unigramSeedCtes +:
         (1 to UniEmRounds).map(n =>
           unigramSoftRoundCtes(n, Some(UniPruneTo))))
         .mkString(",\n       ")}
      SELECT piece, c AS cnt, p AS p_ppm FROM uv$UniEmRounds"""

  private lazy val unigramSoftOracle =
    s"""WITH RECURSIVE
       ${(unigramCorpusCteOver(5) +: unigramSeedCtes +:
         (1 to UniEmRounds).map(n => unigramSoftRoundCtes(n)))
         .mkString(",\n       ")}
      SELECT piece, c AS cnt, p AS p_ppm FROM uv$UniEmRounds"""

  private val UniPruneTo = 12

  private[queries] lazy val unigramTrainChain =
    (unigramCorpusCte +: unigramSeedCtes +:
      (1 to UniEmRounds).map(n => unigramEmRoundCtes(n)))
      .mkString(",\n       ")

  private lazy val unigramPruneOracle =
    s"""WITH RECURSIVE
       ${(unigramCorpusCte +: unigramSeedCtes +:
         (1 to UniEmRounds).map(n =>
           unigramEmRoundCtes(n, Some(UniPruneTo))))
         .mkString(",\n       ")}
      SELECT piece, c AS cnt, p AS p_ppm FROM uv$UniEmRounds"""

  private lazy val unigramTrainOracle =
    s"""WITH RECURSIVE
       $unigramTrainChain
      SELECT piece, c AS cnt, p AS p_ppm FROM uv$UniEmRounds"""

  /** Encode replayed as one more Viterbi pass (round `emRounds+1`'s
    * `best` CTE) under the FINAL vocabulary, rolled up per document
    * with the path checksum that pins the exact segmentations —
    * shared by the encode and fertility oracles.
    */
  private[queries] lazy val unigramEncodeChain = {
    val er = UniEmRounds + 1
    s"""${unigramEmRoundCtes(er)},
       uenc AS (SELECT word, CAST(k AS BIGINT) AS np,
                  ('0x'||substr(md5(word || ':' || path),1,8))::BIGINT
                    AS ph
                FROM r${er}best),
       utok AS (SELECT doc_id,
                  unnest(list_filter(string_split(lower(text), ' '),
                    t -> t <> '')) AS word
                FROM ucorp),
       udoc AS (SELECT t.doc_id, count(*) AS n_tokens,
                  CAST(sum(e.np) AS BIGINT) AS n_pieces,
                  CAST(sum(e.ph) AS BIGINT) AS path_hash
                FROM utok t JOIN uenc e USING (word) GROUP BY 1)"""
  }

  private lazy val unigramEncodeOracle =
    s"""WITH RECURSIVE
       $unigramTrainChain,
       $unigramEncodeChain
      SELECT d.doc_id, coalesce(u.n_tokens, 0) AS n_tokens,
        coalesce(u.n_pieces, 0) AS n_pieces,
        coalesce(u.path_hash, 0) AS path_hash
      FROM documents d LEFT JOIN udoc u USING (doc_id)"""

  /** `fertilityByDomain` replayed: the train + encode chains, the
    * md5-url fixture's host→heuristic-domain map, one rollup with the
    * fixed-point pieces-per-token ratio.
    */
  private lazy val tokenizerFertilityOracle = {
    import Round11Queries.{urlCte, hostSql, domainSql}
    s"""WITH RECURSIVE
       $unigramTrainChain,
       $unigramEncodeChain,
       $urlCte,
       tfh AS (SELECT doc_id, ${hostSql("url")} AS host FROM urls),
       tfd AS (SELECT doc_id, ${domainSql("host")} AS domain FROM tfh),
       tfdoc AS (SELECT d.doc_id,
                   coalesce(u.n_tokens, 0) AS nt,
                   coalesce(u.n_pieces, 0) AS np
                 FROM documents d LEFT JOIN udoc u USING (doc_id))
      SELECT f.domain, count(*) AS n_docs,
        CAST(sum(d.nt) AS BIGINT) AS n_tokens,
        CAST(sum(d.np) AS BIGINT) AS n_pieces,
        CASE WHEN sum(d.nt) = 0 THEN CAST(0 AS BIGINT)
             ELSE CAST(sum(d.np) * 1000000 // sum(d.nt) AS BIGINT)
        END AS fert_ppm
      FROM tfdoc d JOIN tfd f USING (doc_id) GROUP BY 1"""
  }

  private lazy val fertilityLanguageOracle =
    s"""WITH RECURSIVE
       $unigramTrainChain,
       $unigramEncodeChain,
       tldoc AS (SELECT d.doc_id, d.lang,
                   coalesce(u.n_tokens, 0) AS nt,
                   coalesce(u.n_pieces, 0) AS np
                 FROM documents d LEFT JOIN udoc u USING (doc_id))
      SELECT lang, count(*) AS n_docs,
        CAST(sum(nt) AS BIGINT) AS n_tokens,
        CAST(sum(np) AS BIGINT) AS n_pieces,
        CASE WHEN sum(nt) = 0 THEN CAST(0 AS BIGINT)
             ELSE CAST(sum(np) * 1000000 // sum(nt) AS BIGINT)
        END AS fert_ppm
      FROM tldoc GROUP BY 1"""

  // ---------------------------------------------------------------
  // Incremental recipe: batch 2 probes batch 1's persisted indexes.

  /** The trained default-config unigram vocabulary, collected once per
    * sf and shared by the ENCODE-side gates (encode/encode-ids/bytes/
    * fertility/pack) — they all train the identical (maxPieceLen,
    * seedSize, minCount, emRounds) vocabulary, so retraining per gate
    * only re-buys the same deterministic result. The TRAINING gates
    * (q_unigram_train/_soft/_prune) still run their own full loops —
    * they ARE the training checks. Driver-side config-scale data (the
    * incrStates / vocabDirs caching pattern).
    */
  private val unigramVocabCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, Long)]]

  private[queries] def unigramVocabFor(sf: String,
      corp: => DataFrame): Seq[(String, Long)] =
    unigramVocabCache.computeIfAbsent(sf, { _ =>
      graft.ml.Unigram.unigramTrain(corp, "text", UniMaxPieceLen,
        UniSeedSize, UniMinCount, UniEmRounds)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toSeq
    })

  private val unigramVocabDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[queries] final case class IncrState(dir: String,
    model: graft.ml.Classifier.QualityModel, cut: Int)
  private val incrStates =
    new java.util.concurrent.ConcurrentHashMap[String, IncrState]()

  /** Build (once per sf) the standing-ingestion state both incremental
    * gates probe: the batch-1 curate run, its admitted corpus, the URL
    * and band indexes, and the frozen classifier operating point.
    */
  private[queries] def incrStateFor(spark: SparkSession, sf: String,
      docs: DataFrame, blocklist: DataFrame): IncrState =
    incrStates.computeIfAbsent(sf, { _ =>
      import graft.ml.{Classifier, Dedup, Recipes}
      val d = Round12Queries.tempIndexDir("graft-incr-recipe").toString
      val pages = Round13Queries.withFunnelPage(docs)
      val input = Round11Queries.withUrl(pages
        .select(col("doc_id"), col("page").as("text"))
        .withColumn("html", wrapHtml(col("text"))))
      val seed = pages.where(col("doc_id") < 300)
        .select(col("doc_id"),
          col("page").contains("short line").cast("int").as("__y"))
      val (kept1, _) = Recipes.curate(input, "doc_id", "html", "url",
        blocklist, seed, "__y", minJaccard = 0.8,
        badWords = Seq("offer"))
      kept1.select("doc_id", "text_clean", "url")
        .write.mode("overwrite").parquet(s"$d/admitted")
      Curation.buildUrlIndex(kept1, "url", "doc_id", s"$d/url")
      Dedup.buildBandIndex(spark.read.parquet(s"$d/admitted"),
        "text_clean", "doc_id", s"$d/band")
      // the frozen operating point: the same training pass curate ran
      val texted = input
        .withColumn("text_clean", Curation.htmlToText(col("html")))
        .where(col("text_clean").isNotNull && col("text_clean") =!= "")
      val labeled = texted.select(col("doc_id"), col("text_clean"))
        .join(seed, Seq("doc_id"))
      val model = Classifier.train(labeled, "text_clean", "__y",
        "doc_id")
      val cut = Classifier.tuneThreshold(labeled, "text_clean", "__y",
        "doc_id", model)
      IncrState(d, model, cut.cutBucket)
    })

  /** The Spark side of [[langFixtureCtes]]'s `ml` stage. */
  private def langFixture(docs: DataFrame): DataFrame = {
    val phrase = LangPhrases.foldLeft(
      when(lit(false), lit(""))) { case (acc, (l, p)) =>
      acc.when(col("lang") === l, lit(p))
    }.otherwise(lit("zz qq"))
    docs.withColumn("__mltext",
      concat(phrase, lit(" x"), (col("doc_id") % 90).cast("string")))
  }

  private[queries] def wrapHtml(page: Column): Column = concat(
    lit("<html><head><style>p { color: red; }</style></head>"),
    lit("<body><!-- nav --><p>"), page, lit("</p></body></html>"))

  /** Generalized band-candidate → shingle-verify drop set (the
    * Round12 loop machinery with a parameterized Jaccard threshold):
    * batch `n` against reference `r`, both exposing `${x}band` and
    * `${x}sh0`.
    */
  private def nearDropCtes(pfx: String, n: String, r: String,
      j: String): String =
    s"""${pfx}cand AS (SELECT DISTINCT a.doc_id AS nid, b.doc_id AS rid
                       FROM ${n}band a JOIN ${r}band b USING (band)),
       ${pfx}nsh AS (SELECT doc_id, unnest(sh) AS s FROM ${n}sh0
                     WHERE doc_id IN (SELECT nid FROM ${pfx}cand)),
       ${pfx}rsh AS (SELECT doc_id, unnest(sh) AS s FROM ${r}sh0
                     WHERE doc_id IN (SELECT rid FROM ${pfx}cand)),
       ${pfx}shared AS (SELECT a.doc_id AS nid, b.doc_id AS rid,
                               count(*) AS sc
                        FROM ${pfx}nsh a JOIN ${pfx}rsh b ON a.s = b.s
                        JOIN ${pfx}cand c
                          ON c.nid = a.doc_id AND c.rid = b.doc_id
                        GROUP BY 1, 2),
       ${pfx}drop AS (SELECT DISTINCT s.nid FROM ${pfx}shared s
                      JOIN (SELECT doc_id, len(sh) AS sz
                            FROM ${n}sh0) nz ON nz.doc_id = s.nid
                      JOIN (SELECT doc_id, len(sh) AS sz
                            FROM ${r}sh0) rz ON rz.doc_id = s.rid
                      WHERE round(CAST(s.sc AS DOUBLE)
                              / (nz.sz + rz.sz - s.sc), 6) >= $j)"""

  /** `Recipes.curateBatch` replayed END TO END: the ENTIRE batch-1
    * funnel chain (Round13's oracle prefix) derives the kept set, its
    * canonical-url index keys and its band index rows; batch 2 — near
    * twins of kept docs, url collisions with kept docs, batch-internal
    * exact twins, fresh novels, blocked hosts, empty pages — then runs
    * the same cleaning front under the FROZEN chain-1 classifier
    * (w3/bias3/cutq referenced, never retrained) and probes the
    * index state: canonical urls against `k1urls`, bands against
    * `k1band` with exact-Jaccard verification, then the internal
    * LSH → verify → closure pass over the survivors.
    */
  /** The batch-2 stage CTEs in funnel order — shared by the count and
    * per-domain incremental funnel oracles. */
  private[queries] val incrStageCtes = Seq(
    (0, "input", "b2src"), (1, "html_to_text", "b2texted2"),
    (2, "blocklist", "b2unb"), (3, "quality_rules", "b2ruled"),
    (4, "classifier", "b2scored"), (5, "url_dedup", "b2urlkept"),
    (6, "near_dedup", "b2near"))

  private[queries] lazy val recipeIncrementalPrefix = {
    import Round12Queries.{htmlChainSql, c4CtesOver, c4KeepParts,
      gopherKeepChain, repChain, sigCtes, BlockEntries, ClfBuckets}
    import Round11Queries.{hostSql, canonCte}
    import Round13Queries.funnelPageCteOver
    val c4keep = c4KeepParts.map(p => s"($p)").mkString(" AND ")
    val c4B2 = c4CtesOver("b2qp")
      .replaceAll("\\bk\\b", "b2k")
      .replaceAll("\\bc\\b", "b2c")
    val canonB2 = canonCte
      .replaceAll("\\bc([1-5])\\b", "b2c$1")
      .replaceAll("\\burls\\b", "b2u")
      .replaceAll("\\bcanon\\b", "b2canon")
    s"""${Round13Queries.funnelOraclePrefix},
       k1 AS MATERIALIZED (
         SELECT u.doc_id, u.text_clean FROM urlkept u
         WHERE u.doc_id IN (SELECT doc_id FROM nearkept)),
       k1urls AS MATERIALIZED (
         SELECT DISTINCT canonical_url FROM canon
         WHERE doc_id IN (SELECT doc_id FROM nearkept)
           AND canonical_url IS NOT NULL),
       k1band AS (SELECT doc_id, band FROM fnband
                  WHERE doc_id IN (SELECT doc_id FROM nearkept)),
       k1sh0 AS (SELECT doc_id, sh FROM fnsh0
                 WHERE doc_id IN (SELECT doc_id FROM nearkept)),
       ${funnelPageCteOver("bp3pages",
         "(SELECT d.doc_id + 3000000 AS doc_id, d.text FROM documents d " +
           "WHERE d.doc_id IN (SELECT doc_id FROM k1))")},
       ${funnelPageCteOver("bp4pages",
         "(SELECT doc_id + 4000000 AS doc_id, text FROM documents " +
           "WHERE doc_id < 30)")},
       ${funnelPageCteOver("bp5pages",
         "(SELECT doc_id + 5000000 AS doc_id, text FROM documents " +
           "WHERE doc_id >= 30 AND doc_id < 120)")},
       ${funnelPageCteOver("bp6pages",
         "(SELECT doc_id + 5000000 AS doc_id, text FROM documents " +
           "WHERE doc_id >= 120 AND doc_id < 140)")},
       b2src AS MATERIALIZED (
         SELECT k1.doc_id + 2000000 AS doc_id,
           'edited intro ' || k1.text_clean AS page,
           'https://fresh' || (k1.doc_id + 2000000)::VARCHAR
             || '.example.org/p/1' AS url
         FROM k1
         UNION ALL
         SELECT p.doc_id, p.page, u.url
         FROM bp3pages p JOIN urls u ON u.doc_id = p.doc_id - 3000000
         UNION ALL
         SELECT doc_id, page,
           'https://int' || doc_id::VARCHAR || '.example.org/p/1'
         FROM bp4pages
         UNION ALL
         SELECT doc_id + 500000, page,
           'https://int' || (doc_id + 500000)::VARCHAR
             || '.example.org/p/1'
         FROM bp4pages
         UNION ALL
         SELECT doc_id, page,
           'https://nov' || doc_id::VARCHAR || '.example.org/p/1'
         FROM bp5pages
         UNION ALL
         SELECT doc_id, page, 'https://www.${BlockEntries.head}/x'
         FROM bp6pages
         UNION ALL
         SELECT doc_id + 5000000, '',
           'https://emp' || (doc_id + 5000000)::VARCHAR
             || '.example.org/p/1'
         FROM documents WHERE doc_id >= 140 AND doc_id < 150),
       b2h AS (SELECT doc_id, url,
                 '<html><head><style>p { color: red; }</style></head>'
                 || '<body><!-- nav --><p>' || page || '</p></body></html>'
                   AS html
               FROM b2src),
       b2texted AS MATERIALIZED (
         SELECT doc_id, url, trim($htmlChainSql) AS text_clean
         FROM b2h h),
       b2texted2 AS MATERIALIZED (
         SELECT * FROM b2texted
         WHERE text_clean IS NOT NULL AND text_clean <> ''),
       b2bh AS (SELECT doc_id, ${hostSql("url")} AS host FROM b2texted2),
       b2bp AS (SELECT doc_id, string_split(host, '.') AS parts
                FROM b2bh),
       b2bc AS (SELECT b2bp.doc_id FROM b2bp JOIN ble b
                  ON len(b2bp.parts) >= b.elen
                 AND array_to_string(b2bp.parts[-b.elen:], '.')
                       = b.entry),
       b2unb AS MATERIALIZED (
         SELECT t.doc_id, t.url, t.text_clean FROM b2texted2 t
         WHERE t.doc_id NOT IN (SELECT doc_id FROM b2bc)),
       b2qp AS (SELECT doc_id, text_clean AS page FROM b2unb),
       $c4B2,
       b2cq AS MATERIALIZED (SELECT doc_id, c4_text,
              ($c4keep) AS c4_keep FROM b2c),
       ${gopherKeepChain("b2cq", "c4_text", "bg_")},
       ${repChain("b2cq", "c4_text", "br_")},
       b2ruled AS MATERIALIZED (
         SELECT q.doc_id, u.url, q.c4_text AS text_clean
         FROM b2cq q JOIN bg_gk g USING (doc_id)
              JOIN br_rep r USING (doc_id)
              JOIN b2unb u USING (doc_id)
         WHERE q.c4_keep AND g.gopher_keep AND r.rep_keep),
       b2tok AS (SELECT doc_id,
                   unnest(string_split(lower(text_clean), ' ')) AS tk
                 FROM b2ruled),
       b2feat AS MATERIALIZED (SELECT DISTINCT doc_id,
                   ${MlQueries.h32("tk")} % $ClfBuckets AS b FROM b2tok),
       b2mi AS (SELECT b2feat.doc_id, sum(w.w) AS mi
                FROM b2feat JOIN w3 w USING (b) GROUP BY 1),
       b2p AS MATERIALIZED (SELECT doc_id,
                0.5 + 0.5 * (m / (1.0 + abs(m))) AS p
              FROM (SELECT r.doc_id,
                      CAST(COALESCE(mi.mi, 0) +
                           (SELECT bv FROM bias3) AS DOUBLE)
                        / 1000000000000.0 AS m
                    FROM b2ruled r LEFT JOIN b2mi mi USING (doc_id))),
       b2scored AS MATERIALIZED (
         SELECT r.doc_id, r.url, r.text_clean
         FROM b2ruled r JOIN b2p USING (doc_id)
         WHERE CAST(floor(b2p.p * 1000) AS INT) >=
               (SELECT cut FROM cutq)),
       b2u AS (SELECT doc_id, url FROM b2scored),
       $canonB2,
       b2firsts AS (SELECT canonical_url, min(doc_id) AS f
                    FROM b2canon WHERE canonical_url IS NOT NULL
                    GROUP BY 1),
       b2urlkept AS MATERIALIZED (
         SELECT s.doc_id, s.text_clean
         FROM b2scored s JOIN b2canon c USING (doc_id)
         LEFT JOIN b2firsts f ON f.canonical_url = c.canonical_url
         WHERE c.canonical_url IS NULL
            OR (c.canonical_url NOT IN
                  (SELECT canonical_url FROM k1urls)
                AND s.doc_id = f.f)),
       n2src AS (SELECT doc_id, text_clean AS text FROM b2urlkept),
       ${sigCtes("n2", "n2src")},
       ${nearDropCtes("a2", "n2", "k1", "0.8")},
       b2v AS MATERIALIZED (
         SELECT doc_id FROM b2urlkept
         WHERE doc_id NOT IN (SELECT nid FROM a2drop)),
       i2band AS (SELECT doc_id, band FROM n2band
                  WHERE doc_id IN (SELECT doc_id FROM b2v)),
       i2cand AS MATERIALIZED (
         SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM i2band a JOIN i2band b USING (band)
         WHERE a.doc_id < b.doc_id),
       i2sh AS MATERIALIZED (
         SELECT doc_id, unnest(sh) AS g FROM n2sh0
         WHERE doc_id IN (SELECT id_a FROM i2cand
                          UNION SELECT id_b FROM i2cand)),
       i2sz AS MATERIALIZED (SELECT doc_id, count(*) AS sz
                             FROM i2sh GROUP BY 1),
       i2shared AS (SELECT c.id_a, c.id_b, count(*) AS n
                    FROM i2cand c JOIN i2sh a ON a.doc_id = c.id_a
                    JOIN i2sh b ON b.doc_id = c.id_b AND b.g = a.g
                    GROUP BY 1, 2),
       i2pairs AS MATERIALIZED (
         SELECT sh.id_a, sh.id_b FROM i2shared sh
         JOIN i2sz za ON za.doc_id = sh.id_a
         JOIN i2sz zb ON zb.doc_id = sh.id_b
         WHERE round(sh.n / (za.sz + zb.sz - sh.n), 6) >= 0.8),
       i2edges AS (SELECT id_a AS s, id_b AS d FROM i2pairs
                   UNION SELECT id_b, id_a FROM i2pairs),
       i2reach(id, r) AS (SELECT s, d FROM i2edges
                          UNION SELECT i2reach.id, i2edges.d
                          FROM i2reach JOIN i2edges
                            ON i2reach.r = i2edges.s),
       i2comp AS (SELECT id AS doc_id, least(id, min(r)) AS component
                  FROM i2reach GROUP BY id),
       b2near AS (SELECT v.doc_id FROM b2v v
                  LEFT JOIN i2comp USING (doc_id)
                  WHERE v.doc_id =
                        coalesce(i2comp.component, v.doc_id))"""
  }

  private lazy val recipeIncrementalOracle = {
    val counts = incrStageCtes.map { case (i, name, cte) =>
      s"SELECT CAST($i AS INT) AS step, '$name' AS stage, " +
        s"(SELECT count(*) FROM $cte) AS docs"
    }.mkString("\n        UNION ALL ")
    s"""$recipeIncrementalPrefix
      SELECT * FROM (
        $counts)"""
  }

  /** The incremental funnel ATTRIBUTED per registrable domain
    * (heuristic keying — the q_domain_stats pairing): every batch-2
    * stage frame joins back to the batch's (doc_id, url) source and
    * rolls up by domain.
    */
  private lazy val recipeIncrementalDomainsOracle = {
    import Round11Queries.{hostSql, domainSql}
    val rollups = incrStageCtes.map { case (i, name, cte) =>
      s"""SELECT CAST($i AS INT) AS step, '$name' AS stage, d.domain,
            count(*) AS docs
          FROM $cte s JOIN ibdom d USING (doc_id)
          GROUP BY 1, 2, 3"""
    }.mkString("\n      UNION ALL ")
    s"""$recipeIncrementalPrefix,
       ibdom AS MATERIALIZED (
         SELECT doc_id, ${domainSql(hostSql("url"))} AS domain
         FROM b2src)
      $rollups"""
  }

  /** Batch 2 for the incremental gate: near twins of every kept-1 doc
    * (fresh urls — they must reach and drop at the band-index probe),
    * url-collision probes (fresh pages carrying a kept-1 doc's RAW url
    * — they drop at the url-index probe), batch-internal exact twins
    * (the second id drops in the internal pass), fresh novels, blocked
    * hosts, and empty pages — every stage discriminates.
    */
  private[queries] def incrBatch2(docs: DataFrame, kept1: DataFrame): DataFrame = {
    import Round13Queries.withFunnelPage
    val twins = kept1
      .select((col("doc_id") + 2000000L).as("doc_id"),
        concat(lit("edited intro "), col("text_clean")).as("page"))
      .withColumn("url", concat(lit("https://fresh"),
        col("doc_id").cast("string"), lit(".example.org/p/1")))
    val rawUrls = Round11Queries.withUrl(docs)
      .select(col("doc_id"), col("url"))
    val probes = withFunnelPage(
        docs.join(kept1.select("doc_id"), Seq("doc_id"), "left_semi")
          .select((col("doc_id") + 3000000L).as("doc_id"), col("text")))
      .select(col("doc_id"), col("page"))
      .join(rawUrls.select((col("doc_id") + 3000000L).as("doc_id"),
        col("url")), Seq("doc_id"))
    val itw = withFunnelPage(docs.where(col("doc_id") < 30)
        .select((col("doc_id") + 4000000L).as("doc_id"), col("text")))
      .select(col("doc_id"), col("page"))
    val itw1 = itw.withColumn("url", concat(lit("https://int"),
      col("doc_id").cast("string"), lit(".example.org/p/1")))
    val itw2 = itw.select((col("doc_id") + 500000L).as("doc_id"),
        col("page"))
      .withColumn("url", concat(lit("https://int"),
        col("doc_id").cast("string"), lit(".example.org/p/1")))
    val novels = withFunnelPage(
        docs.where(col("doc_id") >= 30 && col("doc_id") < 120)
          .select((col("doc_id") + 5000000L).as("doc_id"), col("text")))
      .select(col("doc_id"), col("page"))
      .withColumn("url", concat(lit("https://nov"),
        col("doc_id").cast("string"), lit(".example.org/p/1")))
    val blocked = withFunnelPage(
        docs.where(col("doc_id") >= 120 && col("doc_id") < 140)
          .select((col("doc_id") + 5000000L).as("doc_id"), col("text")))
      .select(col("doc_id"), col("page"))
      .withColumn("url",
        lit(s"https://www.${Round12Queries.BlockEntries.head}/x"))
    val empties = docs.where(col("doc_id") >= 140 && col("doc_id") < 150)
      .select((col("doc_id") + 5000000L).as("doc_id"))
      .select(col("doc_id"), lit("").as("page"),
        concat(lit("https://emp"), col("doc_id").cast("string"),
          lit(".example.org/p/1")).as("url"))
    twins.unionByName(probes).unionByName(itw1).unionByName(itw2)
      .unionByName(novels).unionByName(blocked).unionByName(empties)
      .withColumn("html", wrapHtml(col("page")))
  }

  val all: Seq[Q] = Seq(
    // unigram-LM (SentencePiece) tokenizer training: seed substrings →
    // hard-EM Viterbi rounds with fixed-point ppm probabilities — the
    // whole training replayed bit-for-bit by brute-force segmentation
    // enumeration in DuckDB
    Q.fn("q_unigram_train", unigramTrainOracle) { (spark, sf) =>
      graft.ml.Unigram.unigramTrain(
        unigramCorpus(Tables.load(spark, sf, "documents")), "text",
        UniMaxPieceLen, UniSeedSize, UniMinCount, UniEmRounds)
    },

    // ... the SOFT E-step (the real Kudo 2018 EM): expected piece
    // counts over ALL segmentations as exact integer forward-backward
    // marginals, ppm-floored — replayed by brute-force path
    // enumeration with additive common-power scores
    Q.fn("q_unigram_soft", unigramSoftOracle) { (spark, sf) =>
      graft.ml.Unigram.unigramTrainSoft(
        unigramCorpus(Tables.load(spark, sf, "documents"), 5), "text",
        UniMaxPieceLen, UniSeedSize, UniMinCount, UniEmRounds)
    },

    // ... the SHRINK loop: each round keeps only the top-N
    // multi-character pieces (plus all chars) and renormalizes — the
    // vocabulary converges to the target size like real SentencePiece
    // ... SOFT EM composed with the SHRINK loop — the actual
    // SentencePiece training loop (expected counts over ALL
    // segmentations, then keep the top-N multi-char pieces and
    // renormalize), completing the hard/soft × plain/prune matrix
    Q.fn("q_unigram_soft_prune", unigramSoftPruneOracle) { (spark, sf) =>
      graft.ml.Unigram.unigramTrainSoft(
        unigramCorpus(Tables.load(spark, sf, "documents"), 5), "text",
        UniMaxPieceLen, UniSeedSize, UniMinCount, UniEmRounds,
        pruneTo = Some(UniPruneTo))
    },

    Q.fn("q_unigram_prune", unigramPruneOracle) { (spark, sf) =>
      graft.ml.Unigram.unigramTrain(
        unigramCorpus(Tables.load(spark, sf, "documents")), "text",
        UniMaxPieceLen, UniSeedSize, UniMinCount, UniEmRounds,
        pruneTo = Some(UniPruneTo))
    },

    // ... the persisted tokenizer ARTIFACT: train once, save, encode
    // every batch from the loaded model — identical results, so the
    // persisted path shares the live encode's oracle
    Q.fn("q_unigram_persisted", unigramEncodeOracle) { (spark, sf) =>
      val corp = unigramCorpus(Tables.load(spark, sf, "documents"))
      val dir = unigramVocabDirs.computeIfAbsent(sf, { _ =>
        val d = Round12Queries.tempIndexDir("graft-unigram-vocab")
          .toString
        graft.ml.Unigram.saveVocab(spark,
          graft.ml.Unigram.unigramTrain(corp, "text", UniMaxPieceLen,
            UniSeedSize, UniMinCount, UniEmRounds),
          UniMaxPieceLen, d)
        d
      })
      graft.ml.Unigram.encodeWithVocabDir(spark, dir, corp, "text",
        "doc_id")
    },

    // ... and Viterbi encoding under the trained vocabulary, with a
    // per-document path checksum pinning the exact segmentations
    Q.fn("q_unigram_encode", unigramEncodeOracle) { (spark, sf) =>
      val corp = unigramCorpus(Tables.load(spark, sf, "documents"))
      val vocab = unigramVocabFor(sf, corp)
      graft.ml.Unigram.unigramEncode(corp, "text", "doc_id", vocab,
        UniMaxPieceLen)
    },

    // ... and the production id-sequence output: per token occurrence,
    // the piece-id array a training pipeline ingests (ids = the
    // vocabulary's lexicographic ranks). The GATE posexplodes the
    // array to one scalar row per piece (the driver's checker cannot
    // sort array columns); the operator keeps the array contract.
    Q.fn("q_unigram_encode_ids", unigramEncodeIdsOracle) { (spark, sf) =>
      val corp = unigramCorpus(Tables.load(spark, sf, "documents"))
      val vocab = unigramVocabFor(sf, corp)
      Q.explodePieceIds(
        graft.ml.Unigram.unigramEncodeIds(corp, "text", "doc_id", vocab,
          UniMaxPieceLen))
    },

    // ... BYTE FALLBACK (SentencePiece --byte_fallback): no token is
    // ever <unk> — ids 0..255 are raw UTF-8 bytes, vocabulary ranks
    // shift by 256, and out-of-alphabet characters (a planted
    // `w<digit>z` bait token per doc) encode as their bytes; the
    // oracle replays Viterbi over the 0-probability-extended piece
    // table and maps unknown pieces through unicode()
    Q.fn("q_unigram_bytes", unigramBytesOracle) { (spark, sf) =>
      val corp = unigramCorpus(Tables.load(spark, sf, "documents"))
      val bait = corp.withColumn("text",
        concat(col("text"), lit(" w"),
          pmod(col("doc_id"), lit(10)).cast("string"), lit("z")))
      val vocab = unigramVocabFor(sf, corp)
      Q.explodePieceIds(
        graft.ml.Unigram.unigramEncodeIds(bait, "text", "doc_id",
          vocab, UniMaxPieceLen, byteFallback = true))
    },

    // ... and the fertility report: WHERE does the trained tokenizer
    // fragment badly? pieces-per-token per registrable domain, exact
    // integer sums + fixed-point ratio
    Q.fn("q_tokenizer_fertility", tokenizerFertilityOracle) { (spark, sf) =>
      val docs = Tables.load(spark, sf, "documents")
      val corp = unigramCorpus(docs)
      val vocab = unigramVocabFor(sf, corp)
      graft.ml.Unigram.fertilityByDomain(
        corp.join(Round11Queries.withUrl(docs)
          .select(col("doc_id"), col("url")), Seq("doc_id")),
        "text", "doc_id", "url", vocab, UniMaxPieceLen)
    },

    // ... and by LANGUAGE — the multilingual tokenizer-health report
    // (a vocabulary trained mostly on one language fragments the
    // others; pieces-per-token by language shows where)
    Q.fn("q_fertility_language", fertilityLanguageOracle) { (spark, sf) =>
      val docs = Tables.load(spark, sf, "documents")
      val corp = unigramCorpus(docs)
      val vocab = unigramVocabFor(sf, corp)
      graft.ml.Unigram.fertilityByKey(
        corp.join(docs.select("doc_id", "lang"), Seq("doc_id")),
        "text", "doc_id", "lang", vocab, UniMaxPieceLen)
    },

    // the incremental recipe: batch 2 cleaned and filtered under the
    // FROZEN batch-1 classifier, then deduped against batch 1's
    // persisted url + band indexes (probe-only — the standing-pipeline
    // production form; the whole two-batch derivation replays in one
    // DuckDB query chaining the funnel and loop CTE families)
    // ... served from the shared incremental one-pass engine run
    // (Recipes.curateBatchReports once per scale factor over the
    // standing-state fixtures; q_recipe_reports drives the combined
    // entry point live and carries the family's honest bench cost)
    Q.fn("q_recipe_incremental", recipeIncrementalOracle) { (spark, sf) =>
      Round16Queries.incrFunnelDf(spark, sf)
    },

    // ... and the rolling-crawl funnel ATTRIBUTED per registrable
    // domain — the curateFunnelByDomain report from the curateBatch
    // state machinery (same frozen operating point, same standing
    // indexes; one extra hash aggregate per checkpointed stage frame)
    // ... the per-domain attribution from the SAME shared incremental
    // one-pass run (heuristic domain keying, as before)
    Q.fn("q_recipe_incremental_domains",
        recipeIncrementalDomainsOracle) { (spark, sf) =>
      Round16Queries.incrDomainsDf(spark, sf)
    },

    // language-aware mixing: langId predictions keying per-language
    // quotas — the multilingual rebalance composed from the langid and
    // mix families over a deterministic multilingual text fixture
    Q.fn("q_language_mix", languageMixOracle) { (spark, sf) =>
      Curation.languageMix(
        langFixture(Tables.load(spark, sf, "documents")),
        "__mltext", "doc_id",
        Map("en" -> 0.4, "de" -> 0.3, "fr" -> 0.2, "es" -> 0.1))
        .select(col("doc_id"), col("lang_pred"))
    },

    // BPE id sequences from the pass-exact production encoder — same
    // per-token-occurrence contract as q_unigram_encode_ids, with the
    // GPT-2-style id layout (code points, then merge ranks)
    Q.fn("q_bpe_encode_ids", bpeEncodeIdsOracle) { (spark, sf) =>
      Q.explodePieceIds(graft.ml.Bpe.bpeEncodeIdsLarge(
        Tables.load(spark, sf, "documents"), "text", "doc_id",
        Round13Queries.largeMerges))
    },

    // the PRE-TRAINING DATA LAYOUT — the chain end after tokenize →
    // pack: one row per piece, (doc_id, chunk_id, pos, piece_id) —
    // every document's trained-tokenizer id stream placed at its
    // packed global offset (the windows q_pack_by_pieces assigns,
    // flattened to actual token ids)
    Q.fn("q_pack_token_ids", packTokenIdsOracle) { (spark, sf) =>
      val corp = unigramCorpus(Tables.load(spark, sf, "documents"))
      val vocab = unigramVocabFor(sf, corp)
      Curation.packTokenIds(
        graft.ml.Unigram.unigramEncodeIds(
          corp.where(col("doc_id") < 300), "text", "doc_id", vocab,
          UniMaxPieceLen),
        "doc_id", chunkTokens = 64, bucketSize = 50)
    },

    // context-window packing by TRAINED-TOKENIZER piece counts (what
    // actually fills a window), not whitespace tokens — the unigram
    // encoder's n_pieces feeds the two-level-scan packer directly
    Q.fn("q_pack_by_pieces", packByPiecesOracle) { (spark, sf) =>
      val corp = unigramCorpus(Tables.load(spark, sf, "documents"))
      val vocab = unigramVocabFor(sf, corp)
      val enc = graft.ml.Unigram.unigramEncode(corp, "text", "doc_id",
        vocab, UniMaxPieceLen).where(col("doc_id") < 300)
      Curation.packChunksBySize(
        enc.select(col("doc_id"), col("n_pieces")),
        "doc_id", "n_pieces", chunkTokens = 64, bucketSize = 50)
    },

    // UniMax-style language-aware epoch planning: langid predictions
    // key the exact-integer water-filling budget allocation — small
    // languages upweight under the per-language epoch cap
    Q.fn("q_language_plan", languagePlanOracle) { (spark, sf) =>
      Curation.languagePlan(
        langFixture(Tables.load(spark, sf, "documents"))
          .select(col("doc_id"), col("__mltext")),
        "__mltext", budgetTokens = LangPlanBudget,
        maxEpochs = LangPlanCap)
    },

    // full PSL semantics threaded through a COMPOSITION (round-13
    // verdict lead item): the per-domain stats dashboard keyed by the
    // publicsuffix.org algorithm instead of the last-two-labels
    // heuristic — same broadcast-only plan, different (correct) groups
    Q.fn("q_domain_stats_psl", domainStatsPslOracle) { (spark, sf) =>
      import spark.implicits._
      Curation.domainStats(
        Round11Queries.withUrl(Tables.load(spark, sf, "documents")),
        "url", None, Some(PslFullRules.toDF("suffix", "kind")))
    },

    // data-driven IVF parameter search, gate-checked: nlist from n,
    // nprobe doubling to the recall floor, the recall that justified it
    Q.fn("q_tune_ivf", tuneIvfOracle) { (spark, sf) =>
      import spark.implicits._
      val t = graft.ml.Similarity.tuneIvf(
        Tables.load(spark, sf, "embeddings"), "embedding", "vec_id",
        k = 10, target = 0.9, sampleQueries = 32)
      Seq((t.nlist, t.nprobe, t.recall)).toDF("nlist", "nprobe", "recall")
    },

    // per-domain funnel attribution, keyed by the fixture PSL rules —
    // the flagship composition threaded through full-PSL semantics AND
    // the per-stage loss report in one gate
    // ... served from the SAME shared one-pass engine run as
    // q_recipe_funnel (Recipes.curateReports with the fixture PSL,
    // once per scale factor — the one-pass-reports production shape)
    Q.fn("q_recipe_funnel_domains", funnelDomainsOracle) { (spark, sf) =>
      Round16Queries.oneShotDomainsDf(spark, sf)
    },

    // ... and through the authority rollup the link-quality and mix
    // compositions consume
    Q.fn("q_authority_psl", authorityPslOracle) { (spark, sf) =>
      import spark.implicits._
      Graphs.domainAuthority(
        Round16Queries.fixtureRanks(spark, sf),
        "node", Some(PslFullRules.toDF("suffix", "kind")))
    }
  )
}
