package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ml.{Bpe, Curation, Dedup, Graphs}

/** Round-13 driver-gate queries: the production-scale BPE encoder
  * (pass-by-rank simulation beyond the 256-merge expression-chain cap),
  * plus the round's composition oracles. Merge fixtures are built
  * deterministically from the documents fixture vocabulary so the
  * DuckDB replay applies the IDENTICAL merge list.
  */
object Round13Queries {

  /** 16 fixture-vocabulary words spelled out merge-by-merge; the other
    * 15 corpus words stay partially mergeable (shared prefixes only),
    * so per-document piece counts vary.
    */
  private val spelledWords = Seq("scan", "column", "window", "order",
    "sort", "part", "value", "line", "join", "merge", "group", "query",
    "vector", "stream", "filter", "customer")

  /** A deterministic WELL-FORMED merge table above the 256-merge
    * expression-chain cap: prefix spell-outs (each side is a char or an
    * earlier merge's output — the shape `bpeTrain` learns) padded past
    * the cap with full-word compound pairs (rank machinery at scale;
    * they never fire inside a single word, exactly like the long tail
    * of a real tokenizer's merges on any one document).
    */
  private[queries] lazy val largeMerges: Seq[(String, String)] = {
    val prefixes =
      scala.collection.mutable.LinkedHashSet.empty[(String, String)]
    spelledWords.foreach { w =>
      (1 until w.length).foreach(i =>
        prefixes += ((w.substring(0, i), w.substring(i, i + 1))))
    }
    val base = spelledWords.take(14)
    val compounds = for (a <- base; b <- base) yield (a, b)
    val all = prefixes.toSeq ++ compounds
    require(all.size > 256,
      s"largeMerges must exceed the expression-chain cap, got ${all.size}")
    all
  }

  /** `bpeEncodeLarge` replayed in DuckDB: the identical merge list
    * applied as chained `replace` passes in rank order over the spaced
    * symbol rendering — the ground-truth semantics the pass-by-rank
    * simulation must reproduce. 20 merges nest per CTE (bounded parser
    * depth), one CTE chain, each referenced once.
    */
  private lazy val bpeLargeOracle = {
    val groups = largeMerges.grouped(20).toSeq
    val ctes = groups.zipWithIndex.map { case (g, gi) =>
      val inner = g.foldLeft("s") { case (acc, (l, r)) =>
        s"replace($acc, ' $l  $r ', ' $l$r ')"
      }
      s"e${gi + 1} AS (SELECT doc_id, $inner AS s FROM e$gi)"
    }
    val last = s"e${groups.size}"
    s"""WITH e0 AS (SELECT doc_id, array_to_string(list_transform(
              range(1, len(word) + 1), i -> ' '||word[i]||' '), '') AS s
            FROM (SELECT doc_id, unnest(list_filter(
                    string_split(lower(text), ' '), t -> t <> ''))
                    AS word
                  FROM documents)),
         ${ctes.mkString(",\n         ")},
         enc AS (SELECT doc_id, count(*) AS n_tokens,
                   CAST(sum(len(list_filter(string_split(s, ' '),
                     x -> x <> ''))) AS BIGINT) AS n_bpe_pieces
                 FROM $last GROUP BY 1)
        SELECT d.doc_id, coalesce(enc.n_tokens, 0) AS n_tokens,
          coalesce(enc.n_bpe_pieces, 0) AS n_bpe_pieces
        FROM documents d LEFT JOIN enc USING (doc_id)"""
  }

  /** `q_cbor_pipeline` replay: the wire chain is a lossless identity on
    * JSON documents, so the oracle is the downstream pipeline over the
    * plain table — any wire defect (lost field, mangled number, dropped
    * row) breaks the compare.
    */
  private val cborOracle =
    """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
       FROM documents WHERE regexp_matches(text, 'spark')"""

  /** The funnel's page fixture: 8-15 varied sentences per page whose
    * ADJACENT word pairs always contain a varying token (doc-vocabulary
    * picks + a 90-way number), so the repetition rules discriminate
    * instead of rejecting every page on template skeletons; three c4
    * killer lines (javascript / config-brace / offer) appear
    * independently at 1/30 per line, a "short line" label marker
    * prepends at 1/2 (the classifier's supervision), and a lorem tail
    * appends at 1/25. All md5 picks — the oracle replays bit-for-bit.
    */
  /** Sentence frames: varied stopword STARTS (gopher's two-distinct-
    * stopword rule stays satisfiable) and varied terminal-punctuation
    * ENDS — so the cross-sentence (end, start) word pair varies too and
    * the top-2-gram rule measures real repetition, not the frame.
    */
  private[queries] val FunnelStarts =
    Seq("the", "that", "of", "and", "to")
  private[queries] val FunnelEnds =
    Seq("today.", "again.", "nicely.", "indeed.", "somehow.", "alright.")

  private[queries] def withFunnelPage(df: DataFrame): DataFrame = {
    val id = col("doc_id")
    val toks = split(lower(col("text")), " ")
    def pickI(i: Column, salt: String, n: Int): Column =
      conv(substring(md5(concat(id.cast("string"), lit(salt),
        i.cast("string"))), 1, 4), 16, 10).cast("long") % n
    def wOf(i: Column, salt: String): Column =
      get(toks, (pickI(i, salt, 997) % size(toks)).cast("int"))
    def lineOf(i: Column): Column = {
      val k = pickI(i, "-k", 30)
      val j = pickI(i, "-j", 90).cast("string")
      when(k === 0,
        lit("Please enable JavaScript to view this content today."))
        .when(k === 1, concat(
          lit("var config = { \"mode\": full, \"page\": "), j,
          lit(" };")))
        .when(k === 2, concat(
          lit("click here to read all about special offer "), j,
          lit("!")))
        .otherwise(concat(
          element_at(typedLit(FunnelStarts),
            (pickI(i, "-st", 5) + 1).cast("int")),
          lit(" "), wOf(i, "-a"), lit(" saw "), j,
          lit(" with "), wOf(i, "-b"), lit(" under "), wOf(i, "-c"),
          lit(" "),
          element_at(typedLit(FunnelEnds),
            (pickI(i, "-en", 6) + 1).cast("int"))))
    }
    val nLines = (lit(8) + Round11Queries.pick("-L", 8)).cast("int")
    val body =
      array_join(transform(sequence(lit(0), nLines - 1), i => lineOf(i)),
        "\n")
    val marked = when(Round11Queries.pick("-sl", 2) === 0,
      concat(lit("short line\n"), body)).otherwise(body)
    val page = when(Round11Queries.pick("-lo", 25) === 0,
      concat(marked, lit("\nlorem ipsum dolor sit amet.")))
      .otherwise(marked)
    df.select(id, col("text"), page.as("page"))
  }

  /** DuckDB replay of [[withFunnelPage]] over the documents table. */
  private[queries] lazy val funnelPageCte: String =
    funnelPageCteOver("fpages", "documents")

  /** DuckDB replay of [[withFunnelPage]] as a reusable builder: emits
    * `$name(doc_id, page)` over `$src` (any table or parenthesized
    * subquery exposing doc_id, text) — the md5 picks salt on the
    * EXPOSED doc_id, so a shifted-id source yields fresh pages, in
    * sync with the Spark side calling [[withFunnelPage]] on a
    * shifted-id frame.
    */
  private[queries] def funnelPageCteOver(name: String,
      src: String): String = {
    def pickSql(salt: String, n: Int) =
      s"(('0x'||substr(md5(doc_id::VARCHAR || '$salt'),1,4))" +
        s"::BIGINT % $n)"
    def pickISql(salt: String, n: Int) =
      s"(('0x'||substr(md5(doc_id::VARCHAR || '$salt' || i::VARCHAR)" +
        s",1,4))::BIGINT % $n)"
    val j = s"${pickISql("-j", 90)}::VARCHAR"
    def w(salt: String) =
      s"t[CAST((${pickISql(salt, 997)} % len(t)) + 1 AS INT)]"
    val line =
      s"""CASE ${pickISql("-k", 30)}
           WHEN 0 THEN 'Please enable JavaScript to view this content today.'
           WHEN 1 THEN 'var config = { "mode": full, "page": ' || $j || ' };'
           WHEN 2 THEN 'click here to read all about special offer ' || $j || '!'
           ELSE (['the','that','of','and','to'])
                  [CAST(${pickISql("-st", 5)} + 1 AS INT)]
                || ' ' || ${w("-a")} || ' saw ' || $j || ' with ' ||
                ${w("-b")} || ' under ' || ${w("-c")} || ' ' ||
                (['today.','again.','nicely.','indeed.','somehow.','alright.'])
                  [CAST(${pickISql("-en", 6)} + 1 AS INT)]
         END"""
    s"""$name AS (
         SELECT doc_id,
           CASE WHEN ${pickSql("-lo", 25)} = 0
                THEN marked || chr(10) || 'lorem ipsum dolor sit amet.'
                ELSE marked END AS page
         FROM (
           SELECT doc_id,
             CASE WHEN ${pickSql("-sl", 2)} = 0
                  THEN 'short line' || chr(10) || body
                  ELSE body END AS marked
           FROM (
             SELECT doc_id,
               array_to_string(
                 list_transform(range(0, 8 + ${pickSql("-L", 8)}),
                   i -> ($line)), chr(10)) AS body
             FROM (SELECT doc_id, string_split(lower(text), ' ') AS t
                   FROM $src))))"""
  }

  /** `Recipes.curate` funnel replayed END TO END: the page fixture
    * wrapped in the html fixture, the md5-url fixture, and then every
    * stage of the recipe re-derived with the SAME CTE families the
    * individual gates use — html→text strip chain, blocklist
    * tail-match, C4→Gopher→repetition cascade over the cleaned text,
    * the 3-step classifier trained on post-markup text with page-rule
    * labels and applied at the tuned cut, canonical-URL keep-first,
    * and the LSH→verify→closure near-dedup at j ≥ 0.8. Each funnel
    * row is one stage's surviving-document count.
    */
  private lazy val funnelOracle = {
    import Round12Queries._
    import Round11Queries.{urlCte, canonCte, hostSql}
    val fpages = funnelPageCte
    // the canonicalization chain's c1..c5 collide with the classifier
    // chain's per-step c$k CTEs — prefix the canon copy
    val canonCteU = canonCte.replaceAll("\\bc([1-5])\\b", "uc$1")
    val entries = Round12Queries.BlockEntries
      .map(e => s"'$e'").mkString("[", ",", "]")
    val c4keep = c4KeepParts.map(p => s"($p)").mkString(" AND ")
    s"""WITH RECURSIVE
       $fpages,
       h AS (SELECT doc_id,
               '<html><head><style>p { color: red; }</style></head>' ||
               '<body><!-- nav --><p>' || page || '</p></body></html>'
                 AS html
             FROM fpages),
       texted AS MATERIALIZED (
         SELECT doc_id, trim($htmlChainSql) AS text_clean FROM h),
       texted2 AS MATERIALIZED (
         SELECT * FROM texted
         WHERE text_clean IS NOT NULL AND text_clean <> ''),
       $urlCte,
       bhh AS (SELECT doc_id, ${hostSql("url")} AS host FROM urls),
       bhp AS (SELECT doc_id, string_split(host, '.') AS parts
               FROM bhh),
       ble AS (SELECT entry, len(string_split(entry, '.')) AS elen
               FROM (SELECT unnest($entries) AS entry)),
       bcand AS (SELECT bhp.doc_id FROM bhp JOIN ble b
                   ON len(bhp.parts) >= b.elen
                  AND array_to_string(bhp.parts[-b.elen:], '.')
                        = b.entry),
       unblocked AS MATERIALIZED (
         SELECT t.doc_id, t.text_clean FROM texted2 t
         WHERE t.doc_id NOT IN (SELECT doc_id FROM bcand)),
       qpages AS (SELECT doc_id, text_clean AS page FROM unblocked),
       ${c4CtesOver("qpages")},
       cq AS MATERIALIZED (SELECT doc_id, c4_text,
              ($c4keep) AS c4_keep FROM c),
       ${gopherKeepChain("cq", "c4_text", "fg_")},
       ${repChain("cq", "c4_text", "fr_")},
       ruled AS MATERIALIZED (
         SELECT cq.doc_id, cq.c4_text AS text_clean
         FROM cq JOIN fg_gk g USING (doc_id)
                 JOIN fr_rep r USING (doc_id)
         WHERE cq.c4_keep AND g.gopher_keep AND r.rep_keep),
       clfsrc AS (SELECT doc_id, text_clean AS text FROM texted2),
       ${clfCtesOver("clfsrc", "fpages",
          "contains(page, 'short line')", 3, "500.0")},
       ${clfThresholdCtesOver(3)},
       cutq AS MATERIALIZED (SELECT CAST(cut AS INT) AS cut FROM corr
                             ORDER BY correct DESC, cut ASC LIMIT 1),
       rtok AS (SELECT doc_id,
                  unnest(string_split(lower(text_clean), ' ')) AS tk
                FROM ruled),
       rfeat AS MATERIALIZED (SELECT DISTINCT doc_id,
                  ${MlQueries.h32("tk")} % $ClfBuckets AS b FROM rtok),
       rmi AS (SELECT rfeat.doc_id, sum(w.w) AS mi
               FROM rfeat JOIN w3 w USING (b) GROUP BY 1),
       rp AS MATERIALIZED (SELECT doc_id,
                0.5 + 0.5 * (m / (1.0 + abs(m))) AS p
              FROM (SELECT r.doc_id,
                      CAST(COALESCE(mi.mi, 0) +
                           (SELECT bv FROM bias3) AS DOUBLE)
                        / 1000000000000.0 AS m
                    FROM ruled r LEFT JOIN rmi mi USING (doc_id))),
       scored AS MATERIALIZED (
         SELECT r.doc_id, r.text_clean
         FROM ruled r JOIN rp USING (doc_id)
         WHERE CAST(floor(rp.p * 1000) AS INT) >=
               (SELECT cut FROM cutq)),
       $canonCteU,
       sfirsts AS (SELECT c.canonical_url, min(c.doc_id) AS f
                   FROM canon c JOIN scored s USING (doc_id)
                   WHERE c.canonical_url IS NOT NULL GROUP BY 1),
       urlkept AS MATERIALIZED (
         SELECT s.doc_id, s.text_clean
         FROM scored s JOIN canon c USING (doc_id)
         LEFT JOIN sfirsts f ON f.canonical_url = c.canonical_url
         WHERE c.canonical_url IS NULL OR s.doc_id = f.f),
       uk2 AS (SELECT doc_id, text_clean AS text FROM urlkept),
       ${sigCtes("fn", "uk2")},
       ncand AS MATERIALIZED (
         SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM fnband a JOIN fnband b USING (band)
         WHERE a.doc_id < b.doc_id),
       ncsh AS MATERIALIZED (
         SELECT doc_id, unnest(sh) AS g FROM fnsh0
         WHERE doc_id IN (SELECT id_a FROM ncand
                          UNION SELECT id_b FROM ncand)),
       nszs AS MATERIALIZED (SELECT doc_id, count(*) AS sz
                             FROM ncsh GROUP BY 1),
       nshared AS (SELECT c.id_a, c.id_b, count(*) AS n
                   FROM ncand c JOIN ncsh a ON a.doc_id = c.id_a
                   JOIN ncsh b ON b.doc_id = c.id_b AND b.g = a.g
                   GROUP BY 1, 2),
       npairs AS MATERIALIZED (
         SELECT sh.id_a, sh.id_b FROM nshared sh
         JOIN nszs za ON za.doc_id = sh.id_a
         JOIN nszs zb ON zb.doc_id = sh.id_b
         WHERE round(sh.n / (za.sz + zb.sz - sh.n), 6) >= 0.8),
       nedges AS (SELECT id_a AS s, id_b AS d FROM npairs
                  UNION SELECT id_b, id_a FROM npairs),
       nreach(id, r) AS (SELECT s, d FROM nedges
                         UNION SELECT nreach.id, nedges.d
                         FROM nreach JOIN nedges
                           ON nreach.r = nedges.s),
       ncomp AS (SELECT id AS doc_id, least(id, min(r)) AS component
                 FROM nreach GROUP BY id),
       nearkept AS (SELECT u.doc_id FROM urlkept u
                    LEFT JOIN ncomp USING (doc_id)
                    WHERE u.doc_id =
                          coalesce(ncomp.component, u.doc_id))
      SELECT * FROM (
        SELECT CAST(0 AS INT) AS step, 'input' AS stage,
               (SELECT count(*) FROM documents) AS docs
        UNION ALL SELECT 1, 'html_to_text',
               (SELECT count(*) FROM texted2)
        UNION ALL SELECT 2, 'blocklist',
               (SELECT count(*) FROM unblocked)
        UNION ALL SELECT 3, 'quality_rules',
               (SELECT count(*) FROM ruled)
        UNION ALL SELECT 4, 'classifier',
               (SELECT count(*) FROM scored)
        UNION ALL SELECT 5, 'url_dedup',
               (SELECT count(*) FROM urlkept)
        UNION ALL SELECT 6, 'near_dedup',
               (SELECT count(*) FROM nearkept))"""
  }

  /** The funnel oracle's CTE chain WITHOUT the final stage-count
    * select — Round14's per-domain attribution appends its own domain
    * rollups over the same stage CTEs.
    */
  private[queries] lazy val funnelOraclePrefix =
    funnelOracle.substring(0,
      funnelOracle.lastIndexOf("\n      SELECT * FROM ("))

  /** `domainLinkQuality` replayed by CHAINING the existing gate CTE
    * families: the pageRank iteration chain (r3) rolled up to domain
    * authority, the anchor-extraction fixture's (href, anchor) pairs
    * reduced to per-domain link counts and distinct lower-cased
    * whitespace anchor terms, and the staged integer quality product.
    * Both fixtures pick target sites with the SAME md5 salts, so the
    * anchors genuinely point at the ranked hosts.
    */
  private lazy val linkQualityOracle = {
    import Round11Queries.{hostSql, domainSql}
    val dq = """(?i)<a[^>]*[^\w-]href="([^"]*)"[^>]*>([^<]*)</a"""
    val sq = """(?i)<a[^>]*[^\w-]href=''([^'']*)''[^>]*>([^<]*)</a"""
    s"""${Round12Queries.pageRankOracle0},
       rolled AS (SELECT ${domainSql("node")} AS domain,
               CAST(sum(pr_rank) AS BIGINT) AS authority
             FROM r3 GROUP BY 1),
       ${Round12Queries.linkHtmlCte},
       z AS (SELECT doc_id, unnest(
               list_zip(regexp_extract_all(html_links, '$dq', 1),
                        regexp_extract_all(html_links, '$dq', 2)) ||
               list_zip(regexp_extract_all(html_links, '$sq', 1),
                        regexp_extract_all(html_links, '$sq', 2)))
               AS z
             FROM h),
       lk AS (SELECT z[1] AS href, z[2] AS anchor FROM z),
       ldh AS (SELECT ${hostSql("href")} AS hh, anchor FROM lk),
       ld AS MATERIALIZED (SELECT ${domainSql("hh")} AS domain, anchor
             FROM ldh WHERE ${domainSql("hh")} IS NOT NULL),
       lc AS (SELECT domain, count(*) AS n_links FROM ld GROUP BY 1),
       lt AS (SELECT domain, count(DISTINCT t) AS n_terms
              FROM (SELECT domain, unnest(list_filter(
                      regexp_split_to_array(lower(anchor), '\\s+'),
                      x -> x <> '')) AS t
                    FROM ld)
              GROUP BY 1),
       q AS (SELECT lc.domain, lc.n_links,
               CAST(COALESCE(lt.n_terms, 0) AS BIGINT) AS n_anchor_terms,
               CAST(least(least(COALESCE(lt.n_terms, 0), 10000000)
                 * 1000000 // lc.n_links, 10000000)
                 AS BIGINT) AS diversity_ppm,
               CAST(COALESCE(r.authority, 0) AS BIGINT) AS authority
             FROM lc LEFT JOIN lt USING (domain)
                     LEFT JOIN rolled r USING (domain))
      SELECT domain, n_links, n_anchor_terms, diversity_ppm, authority,
        CAST((authority // 1000) * diversity_ppm // 1000 AS BIGINT)
          AS quality
      FROM q"""
  }

  /** `mixByLinkQuality` replayed: the link-quality chain's q table
    * becomes the target-weight map (positive quality only), the corpus
    * domains come from the md5-url fixture, and the `domainMix`
    * selection replays exactly — min-ratio scale, floored per-domain
    * keeps, lowest-hash-first row ranks.
    */
  private lazy val mixLinkQualityOracle = {
    import Round11Queries.{hostSql, domainSql}
    val prefix = linkQualityOracle.stripSuffix(linkQualitySelect)
    s"""$prefix,
       qt AS MATERIALIZED (SELECT domain,
              CAST((authority // 1000) * diversity_ppm // 1000
                AS BIGINT) AS p
            FROM q
            WHERE (authority // 1000) * diversity_ppm // 1000 > 0),
       cdom AS (SELECT doc_id, ${domainSql("chost")} AS domain
                FROM (SELECT doc_id, ${hostSql("url")} AS chost
                      FROM urls)),
       listed AS MATERIALIZED (SELECT c.doc_id, c.domain
                FROM cdom c JOIN qt USING (domain)),
       mcnt AS (SELECT domain, CAST(count(*) AS DOUBLE) AS c
                FROM listed GROUP BY 1),
       msc AS (SELECT min(c / qt.p) AS scale
               FROM mcnt JOIN qt USING (domain)),
       mkeep AS (SELECT mcnt.domain,
                   CAST(floor(qt.p * (SELECT scale FROM msc))
                     AS BIGINT) AS k
                 FROM mcnt JOIN qt USING (domain)),
       mr AS (SELECT doc_id, domain,
                row_number() OVER (PARTITION BY domain
                  ORDER BY ('0x'||substr(md5('mixQ'||
                    CAST(doc_id AS VARCHAR)),1,8))::BIGINT, doc_id)
                  AS rn
              FROM listed)
      SELECT doc_id, domain FROM mr JOIN mkeep USING (domain)
      WHERE rn <= k"""
  }

  private lazy val linkQualitySelect =
    linkQualityOracle.substring(linkQualityOracle.lastIndexOf("\n      SELECT"))

  /** `semDeDup` replayed: the trained-codebook CTE chain (seeds +
    * one Lloyd round + assignment), within-cell cosine pairs at 0.35,
    * recursive reachability closure, and the per-group
    * least-prototypical keeper (min proto, ties to min id).
    */
  private lazy val semDedupOracle = {
    import MlQueries.{kmeansCellsCte, cosSql}
    s"""WITH RECURSIVE $kmeansCellsCte,
       spr AS MATERIALIZED (SELECT c.vec_id, c.cell,
               ${cosSql("c.e", "cn2.vcent")} AS proto
             FROM cells c JOIN cn2 USING (cell)),
       sps AS MATERIALIZED (SELECT a.vec_id AS id_a, b.vec_id AS id_b
             FROM cells a JOIN cells b
               ON a.cell = b.cell AND a.vec_id < b.vec_id
             WHERE ${cosSql("a.e", "b.e")} >= 0.35),
       sed AS (SELECT id_a AS s, id_b AS d FROM sps
               UNION SELECT id_b, id_a FROM sps),
       sreach(id, r) AS (SELECT s, d FROM sed
                         UNION SELECT sreach.id, sed.d
                         FROM sreach JOIN sed ON sreach.r = sed.s),
       scomp AS (SELECT id AS vec_id, least(id, min(r)) AS component
                 FROM sreach GROUP BY id),
       swc AS MATERIALIZED (SELECT spr.vec_id, spr.cell, spr.proto,
               COALESCE(scomp.component, spr.vec_id) AS component
             FROM spr LEFT JOIN scomp USING (vec_id)),
       smp AS (SELECT component, min(proto) AS m FROM swc GROUP BY 1),
       skp AS (SELECT swc.component, min(swc.vec_id) AS kid
               FROM swc JOIN smp ON swc.component = smp.component
                 AND swc.proto = smp.m
               GROUP BY 1)
      SELECT swc.vec_id, swc.cell, swc.proto, swc.component,
        (swc.vec_id = skp.kid) AS keep
      FROM swc JOIN skp USING (component)"""
  }

  /** Fixture rule table for the FULL-PSL-semantics gate: literals
    * (incl. multi-label), a wildcard and an exception that target
    * hosts the md5-url fixture actually produces.
    */
  private[queries] val PslFullRules: Seq[(String, String)] = Seq(
    ("com", "literal"), ("org", "literal"), ("net", "literal"),
    ("co.uk", "literal"), ("com.au", "literal"),
    // *.site22.org: the fixture has BOTH blog.site22.org (wildcard
    // fires -> the host IS a public suffix, maps to itself) and bare
    // site22.org (needs the extra label -> falls to the 'org' literal)
    ("site22.org", "wildcard"),
    // !www.site10.com: www.site10.com registers itself while its
    // sibling blog.site10.com resolves through the 'com' literal
    ("www.site10.com", "exception"))

  /** `registrableDomainPsl` over the fixture rules, replayed with the
    * publicsuffix.org algorithm in SQL: per-rule tail matches with the
    * wildcard's extra-label guard, exception-overrides-all, longest
    * match, implicit-* (last-two) fallback, is-a-suffix maps to
    * itself.
    */
  private lazy val pslFullOracle = {
    import Round11Queries.{hostSql, urlCte}
    val rules = PslFullRules.map { case (sfx, k) =>
      s"('$sfx', '$k', ${sfx.count(_ == '.') + 1})"
    }.mkString(", ")
    s"""WITH $urlCte,
       ph AS (SELECT doc_id, ${hostSql("url")} AS host FROM urls),
       pp AS (SELECT doc_id, host, string_split(host, '.') AS parts
              FROM ph),
       prules(suffix, kind, rlen) AS (VALUES $rules),
       pcand AS (SELECT pp.doc_id, r.kind,
                   CASE r.kind WHEN 'wildcard' THEN r.rlen + 1
                        WHEN 'exception' THEN r.rlen - 1
                        ELSE r.rlen END AS efflen
                 FROM pp JOIN prules r
                   ON len(pp.parts) >= r.rlen
                  AND array_to_string(pp.parts[-r.rlen:], '.') = r.suffix
                  AND (r.kind <> 'wildcard'
                       OR len(pp.parts) >= r.rlen + 1)),
       pbest AS (SELECT doc_id,
                   CASE WHEN bool_or(kind = 'exception')
                        THEN max(efflen) FILTER (kind = 'exception')
                        ELSE max(efflen) END AS bl
                 FROM pcand GROUP BY 1)
      SELECT pp.doc_id, pp.host,
        CASE WHEN pp.host IS NULL OR len(pp.parts) <= 1 THEN pp.host
             WHEN b.bl IS NULL THEN
               pp.parts[-2] || '.' || pp.parts[-1]
             WHEN b.bl >= len(pp.parts) THEN pp.host
             ELSE array_to_string(pp.parts[-(b.bl + 1):], '.') END
          AS domain
      FROM pp LEFT JOIN pbest b USING (doc_id)"""
  }

  val all: Seq[Q] = Seq(
    Q.fn("q_bpe_encode_large", bpeLargeOracle) { (spark, sf) =>
      Bpe.bpeEncodeLarge(Tables.load(spark, sf, "documents"),
        "text", "doc_id", largeMerges)
    },

    // the reference's Kafka wire format end to end: every fixture row
    // serializes to gzip-CBOR (docs/serialisation.md:3), rides the
    // decode fallback chain back to JSON, and feeds a normal
    // aggregation pipeline — proving a json-streams deployment's
    // topics are readable byte-for-byte
    Q.fn("q_cbor_pipeline", cborOracle) { (spark, sf) =>
      import graft.streaming.KafkaIo
      val docs = Tables.load(spark, sf, "documents")
      val decoded = docs
        .select(KafkaIo.wireDecode(KafkaIo.wireEncode(
          to_json(struct(col("doc_id"), col("text"))))).as("j"))
        .select(from_json(col("j"),
          org.apache.spark.sql.types.DataType.fromDDL(
            "doc_id BIGINT, text STRING"))
          .as("v"))
        .select("v.*")
      graft.op.Pipeline.run(decoded,
        """[{"$match":{"text":{"$regex":"spark"}}},
            {"$project":{"doc_id":1,
              "n_chars":{"$toLong":{"$strLenCP":"$text"}}}}]""",
        Tables.env(spark, sf))
    },

    // the flagship end-to-end composition, now gate-checked: raw
    // html+url pages in, the per-stage funnel out, every stage's count
    // replayed in DuckDB from the same fixtures
    // (the fixture keeps the LIGHT html wrap — style + comment + tags,
    // no trailing entity junk — so C4's terminal-punctuation line rule
    // stays discriminating; see Round16Queries.oneShotInput.) Served
    // from the shared one-pass engine run: Recipes.curateReports runs
    // the staged chain ONCE per scale factor and this gate re-serves
    // its collected funnel rows (the q_recipe_funnel_domains gate
    // consumes the same pass; q_recipe_reports drives the combined
    // entry point live)
    Q.fn("q_recipe_funnel", funnelOracle) { (spark, sf) =>
      Round16Queries.oneShotFunnelDf(spark, sf)
    },

    // anchor diversity x authority: the two link-graph signals
    // composed into the per-domain quality table a domainMix pass
    // consumes — chained from the SAME fixtures the pagerank and
    // anchor gates use
    Q.fn("q_domain_link_quality", linkQualityOracle) { (spark, sf) =>
      val docs = Tables.load(spark, sf, "documents")
      val anchors = Graphs.extractAnchors(
        Round12Queries.withLinkHtml(docs), "html_links", "doc_id")
      val auth = Round16Queries.fixtureRanks(spark, sf)
        .groupBy(Curation.registrableDomain(col("node")).as("domain"))
        .agg(sum(col("pr_rank")).as("authority"))
      Graphs.domainLinkQuality(anchors, "href", "anchor", auth)
    },

    // ... and the quality table FEEDING the mix quotas: domains keep
    // documents in proportion to their link quality — the composition
    // the quality table exists for
    Q.fn("q_mix_link_quality", mixLinkQualityOracle) { (spark, sf) =>
      import Round11Queries.withUrl
      val docs = Tables.load(spark, sf, "documents")
      val anchors = Graphs.extractAnchors(
        Round12Queries.withLinkHtml(docs), "html_links", "doc_id")
      val auth = Round16Queries.fixtureRanks(spark, sf)
        .groupBy(Curation.registrableDomain(col("node")).as("domain"))
        .agg(sum(col("pr_rank")).as("authority"))
      val quality =
        Graphs.domainLinkQuality(anchors, "href", "anchor", auth)
      // pinned: the derived domain feeds domainMix's counts aggregate
      // AND its per-row selection (the domainMixFromUrls lesson)
      val corpus = graft.ml.CacheLifecycle.pin(withUrl(docs)
        .withColumn("domain",
          Curation.registrableDomain(Curation.extractHost(col("url"))))
        .select(col("doc_id"), col("domain")))
      Graphs.mixByLinkQuality(corpus, "doc_id", "domain", quality)
    },

    // SemDeDup: semantic dedup inside the trained k-means cells —
    // duplicate groups by pairwise cosine, each keeping its LEAST
    // prototypical member (Abbas et al. 2023)
    Q.fn("q_semdedup", semDedupOracle) { (spark, sf) =>
      val (corpus, cents) = MlQueries.trainedCodebook(spark, sf)
      graft.ml.Similarity.semDeDup(corpus, cents, "embedding",
        "vec_id", threshold = 0.35)
    },

    // full PSL semantics (wildcard + exception + longest match) driven
    // through the gate on a fixture rule table — the vendored real
    // list runs the same code path (spec'd; 9.6k rules cannot inline
    // into an oracle)
    Q.fn("q_domain_psl_full", pslFullOracle) { (spark, sf) =>
      import spark.implicits._
      import Round11Queries.withUrl
      val rules = PslFullRules.toDF("suffix", "kind")
      val hosts = withUrl(Tables.load(spark, sf, "documents"))
        .select(col("doc_id"),
          Curation.extractHost(col("url")).as("host"))
      Curation.registrableDomainPsl(hosts, "host", rules)
        .select("doc_id", "host", "domain")
    }
  )
}
