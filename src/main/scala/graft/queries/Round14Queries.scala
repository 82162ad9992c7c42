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

  val all: Seq[Q] = Seq(
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

    // ... and through the authority rollup the link-quality and mix
    // compositions consume
    Q.fn("q_authority_psl", authorityPslOracle) { (spark, sf) =>
      import spark.implicits._
      import Round11Queries.{withUrl, pick}
      val u = withUrl(Tables.load(spark, sf, "documents"))
        .withColumn("src", Curation.extractHost(col("url")))
      val e1 = u.select(col("src"),
        concat(lit("www.site"), pick("-l1", 40).cast("string"),
          lit(".com")).as("dst"))
      val e2 = u.select(col("src"),
        concat(lit("site"), pick("-l2", 40).cast("string"),
          lit(".org")).as("dst"))
      Graphs.domainAuthority(
        Graphs.pageRank(e1.union(e2), "src", "dst", iters = 3),
        "node", Some(PslFullRules.toDF("suffix", "kind")))
    }
  )
}
