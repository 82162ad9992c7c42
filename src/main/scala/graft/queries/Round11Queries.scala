package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ml.{Curation, Dedup}

/** Round-11 driver-gate queries: the embedding-side dedup RESOLUTION
  * (celled pairs → connected components → canonical keep-list in one
  * operator) and the URL/domain curation family.
  */
object Round11Queries {
  import MlQueries.{normSql, cosSql}

  /** `dedupEmbeddings` over the q_dedup_embedding_celled corpus: the
    * oracle replays the celled pair generation, closes the pair graph
    * with a recursive reachability CTE (min reachable id = the
    * component label `components` converges to) and resolves the
    * min-id keep-list.
    */
  private val dedupEmbeddingsOracle =
    s"""WITH RECURSIVE
         v AS (SELECT vec_id, $normSql AS e
               FROM embeddings WHERE vec_id<300),
         cent AS (SELECT vec_id AS cell, e AS vcent FROM v WHERE vec_id<8),
         asg AS (SELECT vec_id, cell, e, row_number() OVER
                   (PARTITION BY vec_id
                    ORDER BY ${cosSql("e", "vcent")} DESC, cell) AS r
                 FROM v CROSS JOIN cent),
         cells AS (SELECT vec_id, cell, e FROM asg WHERE r=1),
         pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
                   FROM cells a JOIN cells b
                     ON a.cell=b.cell AND a.vec_id < b.vec_id
                   WHERE ${cosSql("a.e", "b.e")} >= 0.35),
         edges AS (SELECT id_a AS s, id_b AS d FROM pairs
                   UNION SELECT id_b, id_a FROM pairs),
         reach(id, r) AS (SELECT s, d FROM edges
                          UNION SELECT reach.id, edges.d
                          FROM reach JOIN edges ON reach.r = edges.s),
         comp AS (SELECT id AS vec_id, least(id, min(r)) AS component
                  FROM reach GROUP BY id)
        SELECT emb.vec_id,
               coalesce(comp.component, emb.vec_id) AS canonical_id,
               emb.vec_id = coalesce(comp.component, emb.vec_id) AS keep
        FROM (SELECT vec_id FROM embeddings WHERE vec_id<300) emb
        LEFT JOIN comp USING (vec_id)"""

  /** The testdata has no url column, so the fixture DERIVES one
    * deterministically from `doc_id` (md5-picked scheme / subdomain /
    * site / TLD / port / case, ~1/20 null) — identically in Spark and
    * in the oracle's CTE — and the operators under test (extractHost /
    * registrableDomain / domainStats) run on that column like any
    * crawl-provenance field.
    */
  /** Doc-keyed pick: varies per document (case, port, tracking junk,
    * trailing slash, fragment — the noise canonicalization collapses).
    */
  private[queries] def pick(salt: String, n: Int): Column =
    conv(substring(md5(concat(col("doc_id").cast("string"), lit(salt))),
      1, 4), 16, 10).cast("long") % n

  /** Group-keyed pick (doc_id % 150): several documents share one
    * logical PAGE (site/scheme/subdomain/path), so URL-level dedup has
    * real collisions once the per-doc noise is canonicalized away.
    */
  private[queries] def pickG(salt: String, n: Int): Column =
    conv(substring(md5(concat((col("doc_id") % 150).cast("string"),
      lit(salt))), 1, 4), 16, 10).cast("long") % n

  private[queries] def withUrl(df: DataFrame): DataFrame = {
    val scheme = when(pickG("-s", 2) === 0, lit("http"))
      .otherwise(lit("https"))
    val sub = when(pickG("-w", 3) === 0, lit(""))
      .when(pickG("-w", 3) === 1, lit("www.")).otherwise(lit("blog."))
    val name = concat(lit("site"), pickG("-n", 40).cast("string"))
    val tld = element_at(
      array(lit("com"), lit("org"), lit("net"), lit("co.uk"),
        lit("com.au")),
      (pickG("-t", 5) + 1).cast("int"))
    val port = when(pick("-p", 4) === 0, lit(":8080"))
      .when(pick("-p", 4) === 1 && pickG("-s", 2) === 0, lit(":80"))
      .when(pick("-p", 4) === 2 && pickG("-s", 2) === 1, lit(":443"))
      .otherwise(lit(""))
    val slash = when(pick("-l", 3) === 0, lit("/")).otherwise(lit(""))
    val qpart = when(pick("-q", 4) === 0, lit("?utm_source=x&b=2&a=1"))
      .when(pick("-q", 4) === 1, lit("?z=9&a=1"))
      .when(pick("-q", 4) === 2, lit("?ref=home"))
      .otherwise(lit(""))
    val frag = when(pick("-f", 3) === 0, lit("#sec2")).otherwise(lit(""))
    val url0 = concat(scheme, lit("://"), sub, name, lit("."), tld, port,
      lit("/p/"), (col("doc_id") % 150).cast("string"), slash, qpart,
      frag)
    df.withColumn("url",
      when(pick("-z", 20) === 0, lit(null).cast("string"))
        .when(pick("-u", 10) === 0, upper(url0))
        .otherwise(url0))
  }

  /** The same fixture in DuckDB: `urls(doc_id, url, text)`. Page parts
    * key on the doc_id%150 GROUP, per-doc noise on doc_id — in sync
    * with `withUrl`.
    */
  private[queries] val urlCte = {
    def pickSql(salt: String, n: Int) =
      s"(('0x'||substr(md5(doc_id::VARCHAR || '$salt'),1,4))::BIGINT % $n)"
    def pickGSql(salt: String, n: Int) =
      s"(('0x'||substr(md5((doc_id % 150)::VARCHAR || '$salt'),1,4))" +
        s"::BIGINT % $n)"
    s"""urls AS (
         SELECT doc_id, text,
           CASE WHEN ${pickSql("-z", 20)} = 0 THEN NULL
                WHEN ${pickSql("-u", 10)} = 0 THEN upper(u0)
                ELSE u0 END AS url
         FROM (
           SELECT doc_id, text,
             (CASE WHEN ${pickGSql("-s", 2)} = 0 THEN 'http'
                   ELSE 'https' END)
             || '://'
             || (CASE WHEN ${pickGSql("-w", 3)} = 0 THEN ''
                      WHEN ${pickGSql("-w", 3)} = 1 THEN 'www.'
                      ELSE 'blog.' END)
             || 'site' || ${pickGSql("-n", 40)}::VARCHAR || '.'
             || (['com','org','net','co.uk','com.au'])
                  [CAST(${pickGSql("-t", 5)} + 1 AS INT)]
             || (CASE WHEN ${pickSql("-p", 4)} = 0 THEN ':8080'
                      WHEN ${pickSql("-p", 4)} = 1
                           AND ${pickGSql("-s", 2)} = 0 THEN ':80'
                      WHEN ${pickSql("-p", 4)} = 2
                           AND ${pickGSql("-s", 2)} = 1 THEN ':443'
                      ELSE '' END)
             || '/p/' || (doc_id % 150)::VARCHAR
             || (CASE WHEN ${pickSql("-l", 3)} = 0 THEN '/' ELSE '' END)
             || (CASE WHEN ${pickSql("-q", 4)} = 0
                        THEN '?utm_source=x&b=2&a=1'
                      WHEN ${pickSql("-q", 4)} = 1 THEN '?z=9&a=1'
                      WHEN ${pickSql("-q", 4)} = 2 THEN '?ref=home'
                      ELSE '' END)
             || (CASE WHEN ${pickSql("-f", 3)} = 0 THEN '#sec2'
                      ELSE '' END) AS u0
           FROM documents))"""
  }

  /** `Curation.extractHost` + `registrableDomain` replayed in DuckDB:
    * the SAME regex and label arithmetic (that portability is the point
    * of the pure-regex extraction).
    */
  private[queries] def hostSql(url: String) = {
    val withScheme = s"""regexp_extract($url,
      '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#\\s]*@)?([^/:?#\\s]+)', 1)"""
    val bare = s"""regexp_extract($url,
      '^(?:[^/@?#\\s]*@)?([^/:?#\\s]+)', 1)"""
    s"""nullif(regexp_replace(regexp_replace(lower(
          CASE WHEN $withScheme <> '' THEN $withScheme
               WHEN contains($bare, '.') THEN $bare
               ELSE '' END),
        '\\.$$', ''), '^.*[\\[\\]].*$$', ''), '')"""
  }
  private[queries] def domainSql(host: String) =
    s"""CASE WHEN $host IS NULL OR len(string_split($host, '.')) <= 1
              THEN $host
             WHEN len(string_split($host, '.')) >= 3
                  AND (string_split($host, '.')[-2] || '.' ||
                       string_split($host, '.')[-1]) IN
                      ('co.uk','org.uk','ac.uk','gov.uk','co.jp','ne.jp',
                       'or.jp','com.au','net.au','org.au','co.nz','co.in',
                       'co.za','com.br','com.mx','com.cn','com.sg',
                       'com.ar','com.tr')
              THEN string_split($host, '.')[-3] || '.' ||
                   string_split($host, '.')[-2] || '.' ||
                   string_split($host, '.')[-1]
             ELSE string_split($host, '.')[-2] || '.' ||
                  string_split($host, '.')[-1] END"""

  /** `Curation.canonicalizeUrl` replayed in DuckDB, one CTE step per
    * normalization stage (every regexp is single-match, so DuckDB's
    * first-match regexp_replace agrees with Spark's replace-all).
    */
  private[queries] val canonCte =
    s"""c1 AS (SELECT doc_id, url,
                 regexp_replace(url, '#.*', '') AS nofrag FROM urls),
        c2 AS (SELECT doc_id, url,
                 regexp_extract(nofrag, '^([^?]*)', 1) AS pre,
                 regexp_extract(nofrag, '^[^?]*\\?(.*)$$', 1) AS q
               FROM c1),
        c3 AS (SELECT doc_id, url, q,
                 lower(regexp_extract(pre,
                   '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
                 CASE WHEN regexp_extract(pre,
                        '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1) <> ''
                      THEN regexp_replace(pre,
                        '^[a-zA-Z][a-zA-Z0-9+.-]*://', '')
                      ELSE pre END AS rest
               FROM c2),
        c4 AS (SELECT doc_id, url, q, scheme,
                 lower(regexp_replace(
                   regexp_extract(rest, '^([^/]*)', 1),
                   '^[^@]*@', '')) AS hostport,
                 regexp_replace(regexp_extract(rest, '^[^/]*(/.*)?$$', 1),
                   '/+$$', '') AS path
               FROM c3),
        c5 AS (SELECT doc_id, url, scheme, path,
                 CASE WHEN scheme = 'http'
                        THEN regexp_replace(hostport, ':80$$', '')
                      WHEN scheme = 'https'
                        THEN regexp_replace(hostport, ':443$$', '')
                      ELSE hostport END AS host,
                 array_to_string(list_sort(list_filter(
                   string_split(q, '&'), p -> p <> '' AND NOT
                     regexp_matches(p,
                       '^(utm_[^=]*|fbclid|gclid|ref|mc_cid|mc_eid)(=|$$)')
                   )), '&') AS qs
               FROM c4),
        canon AS (SELECT doc_id, url,
                    CASE WHEN url IS NULL THEN NULL ELSE
                      (CASE WHEN scheme <> '' THEN scheme || '://'
                            ELSE '' END)
                      || host || path
                      || (CASE WHEN qs <> '' THEN '?' || qs ELSE '' END)
                    END AS canonical_url
                  FROM c5)"""

  private val urlCanonicalOracle =
    s"""WITH $urlCte, $canonCte
        SELECT doc_id, url, canonical_url FROM canon"""

  private val urlDedupOracle =
    s"""WITH $urlCte, $canonCte,
         firsts AS (SELECT canonical_url, min(doc_id) AS f
                    FROM canon WHERE canonical_url IS NOT NULL
                    GROUP BY 1)
        SELECT c.doc_id, c.canonical_url,
               (c.canonical_url IS NULL OR c.doc_id = firsts.f) AS keep
        FROM canon c LEFT JOIN firsts USING (canonical_url)"""

  private val urlDomainsOracle =
    s"""WITH $urlCte,
         h AS (SELECT doc_id, url, ${hostSql("url")} AS host FROM urls)
        SELECT doc_id, url, host, ${domainSql("host")} AS domain FROM h"""

  private val domainStatsOracle =
    s"""WITH $urlCte,
         h AS (SELECT doc_id, ${hostSql("url")} AS host,
                      strlen(text) AS w FROM urls),
         d AS (SELECT doc_id, host, ${domainSql("host")} AS domain, w
               FROM h)
        SELECT domain, count(*) AS n_docs,
               count(DISTINCT host) AS n_hosts,
               CAST(sum(w) AS BIGINT) AS sum_weight
        FROM d GROUP BY 1"""

  val all: Seq[Q] = Seq(
    Q.fn("q_dedup_embeddings", dedupEmbeddingsOracle) { (spark, sf) =>
      Dedup.dedupEmbeddings(
        Tables.load(spark, sf, "embeddings").where(col("vec_id") < 300),
        "embedding", "vec_id", threshold = 0.35, nlist = 8)
    },

    Q.fn("q_url_domains", urlDomainsOracle) { (spark, sf) =>
      withUrl(Tables.load(spark, sf, "documents"))
        .withColumn("host", Curation.extractHost(col("url")))
        .withColumn("domain", Curation.registrableDomain(col("host")))
        .select("doc_id", "url", "host", "domain")
    },

    Q.fn("q_domain_stats", domainStatsOracle) { (spark, sf) =>
      val docs = withUrl(Tables.load(spark, sf, "documents"))
        .withColumn("w", octet_length(col("text")))
      Curation.domainStats(docs, "url", weightCol = Some("w"))
    },

    Q.fn("q_url_canonical", urlCanonicalOracle) { (spark, sf) =>
      withUrl(Tables.load(spark, sf, "documents"))
        .select(col("doc_id"), col("url"),
          Curation.canonicalizeUrl(col("url")).as("canonical_url"))
    },

    Q.fn("q_url_dedup", urlDedupOracle) { (spark, sf) =>
      Curation.dedupUrls(
        withUrl(Tables.load(spark, sf, "documents")), "url", "doc_id")
    }
  )
}
