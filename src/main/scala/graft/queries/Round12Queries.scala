package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ml.{Curation, Multimodal}

/** Round-12 driver-gate queries: the Public Suffix List as broadcast
  * DATA, the persisted canonical-url index (crawl-incremental URL
  * dedup), the stats→quotas→mix URL composition, and the persisted
  * aHash signature index (crawl-incremental perceptual dedup). All
  * fixtures reuse Round11's md5-derived URL column / Round10's
  * md5-derived PPM corpus so the oracles replay bit-for-bit.
  */
object Round12Queries {
  import Round11Queries.{withUrl, urlCte, hostSql, domainSql, canonCte}

  /** `registrableDomainFromTable` replayed in DuckDB: the same
    * candidate-tail-vs-suffix-table join (value-equivalent to the
    * engine's per-length broadcast joins — a host has exactly one tail
    * per label count, so "longest matched suffix" is the max label
    * count over matched tails), the same +1-label resolution and
    * last-two-labels fallback.
    */
  private val pslOracle = {
    val sfx = Curation.fixtureSuffixStrings
      .map(s => s"'$s'").mkString("[", ",", "]")
    s"""WITH $urlCte,
         h AS (SELECT doc_id, ${hostSql("url")} AS host FROM urls),
         hp AS (SELECT doc_id, host,
                       string_split(host, '.') AS parts FROM h),
         sfxl AS (SELECT suffix, len(string_split(suffix, '.')) AS slen
                  FROM (SELECT unnest($sfx) AS suffix)),
         cand AS (SELECT hp.doc_id, s.slen FROM hp JOIN sfxl s
                    ON len(hp.parts) >= s.slen
                   AND array_to_string(hp.parts[-s.slen:], '.') = s.suffix),
         best AS (SELECT doc_id, max(slen) AS slen FROM cand GROUP BY 1)
        SELECT hp.doc_id, hp.host,
          CASE WHEN hp.host IS NULL OR len(hp.parts) <= 1 THEN hp.host
               WHEN b.slen IS NULL
                 THEN hp.parts[-2] || '.' || hp.parts[-1]
               WHEN b.slen >= len(hp.parts) THEN hp.host
               ELSE array_to_string(hp.parts[-(b.slen+1):], '.') END
            AS domain
        FROM hp LEFT JOIN best b USING (doc_id)"""
  }

  /** `dedupUrlsAgainstIndex` with the prior crawl = doc_id < 250: the
    * oracle replays the persisted index as a CTE (the canonical firsts
    * of the prior slice) and the batch keep rule — keep iff canonical
    * null, or unseen in BOTH the index and the earlier batch rows.
    */
  private val urlIncrOracle =
    s"""WITH $urlCte, $canonCte,
         prior AS (SELECT canonical_url FROM canon
                   WHERE doc_id < 250 AND canonical_url IS NOT NULL
                   GROUP BY 1),
         batch AS (SELECT doc_id, canonical_url FROM canon
                   WHERE doc_id >= 250),
         firsts AS (SELECT canonical_url, min(doc_id) AS f FROM batch
                    WHERE canonical_url IS NOT NULL GROUP BY 1)
        SELECT b.doc_id, b.canonical_url,
               (b.canonical_url IS NULL OR
                (p.canonical_url IS NULL AND b.doc_id = f.f)) AS keep
        FROM batch b
        LEFT JOIN prior p USING (canonical_url)
        LEFT JOIN firsts f USING (canonical_url)"""

  /** `domainMixFromUrls` (τ=0.5, half the corpus): the q_domain_stats
    * extraction feeding the q_domain_temperature math — counts per
    * registrable domain, weights n^τ, keep rates rounded to 9 decimals
    * and clamped at 1, per-row md5-h32 threshold keep.
    */
  private val mixUrlsOracle =
    s"""WITH $urlCte,
         h AS (SELECT doc_id, ${hostSql("url")} AS host FROM urls),
         d AS (SELECT doc_id, ${domainSql("host")} AS domain FROM h
               WHERE ${domainSql("host")} IS NOT NULL),
         cnt AS (SELECT domain, CAST(count(*) AS DOUBLE) AS n
                 FROM d GROUP BY 1),
         w AS (SELECT domain, n, pow(n, 0.5) AS wt FROM cnt),
         tot AS (SELECT sum(n) AS total, sum(wt) AS wsum FROM w),
         rate AS (SELECT domain,
                    round(least(1.0, 0.5 * total * (wt / wsum) / n), 9)
                      AS r
                  FROM w CROSS JOIN tot)
        SELECT d.doc_id, d.domain
        FROM d JOIN rate USING (domain)
        WHERE ('0x'||substr(md5('mixT'||CAST(d.doc_id AS VARCHAR)),1,8))
                ::BIGINT
              < CAST(round(r * 4294967296.0) AS BIGINT)"""

  /** `dedupImagesAgainstAHashIndex` with the index = the base images of
    * the Round10 aHash corpus and the batch = their bumped twins (near,
    * must drop) plus fresh unrelated images (must keep). The oracle
    * replays the STORED signatures as a CTE — the same md5-cell aHash,
    * 7-band pigeonhole and ≤6-bit verify as q_multimodal_ahash.
    */
  private val ahashIndexOracle = {
    val lum = "('0x'||substr(md5(doc_id || '-' || c),1,2))::BIGINT"
    val lumN = "('0x'||substr(md5(doc_id || '-n-' || c),1,2))::BIGINT"
    s"""WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 1000),
         ref AS (SELECT doc_id,
                   list_transform(range(0,64), c -> $lum) AS lum
                 FROM ids),
         twin AS (SELECT doc_id + 500000 AS doc_id,
                    list_transform(range(0,64), c ->
                      CASE WHEN c = 0 THEN ($lum + 16) % 256
                           ELSE $lum END) AS lum
                  FROM ids),
         fresh AS (SELECT doc_id + 700000 AS doc_id,
                     list_transform(range(0,64), c -> $lumN) AS lum
                   FROM ids),
         batch AS (SELECT * FROM twin UNION ALL SELECT * FROM fresh),
         lums AS (SELECT doc_id, lum, 'r' AS side FROM ref
                  UNION ALL SELECT doc_id, lum, 'b' AS side FROM batch),
         m AS (SELECT doc_id, side, lum,
                      list_sum(lum)::DOUBLE / 64 AS mean FROM lums),
         ah AS (SELECT doc_id, side,
                  CAST(list_sum(list_transform(range(0,64), c ->
                    CASE WHEN lum[CAST(c+1 AS INT)] <= mean THEN 0::BIGINT
                         WHEN c = 63 THEN -9223372036854775807 - 1
                         ELSE (1::BIGINT << CAST(c AS INT)) END))
                    AS BIGINT) AS ahash
                FROM m),
         bands AS (SELECT doc_id, side, ahash,
                     unnest(list_transform(range(0,7), i ->
                       i::VARCHAR || ':' ||
                       ((ahash >> CAST(i*64//7 AS INT)) &
                        ((1::BIGINT <<
                          CAST((i+1)*64//7 - i*64//7 AS INT)) - 1))
                         ::VARCHAR)) AS band
                   FROM ah),
         hit AS (SELECT DISTINCT nb.doc_id
                 FROM (SELECT * FROM bands WHERE side = 'b') nb
                 JOIN (SELECT * FROM bands WHERE side = 'r') rb
                   ON nb.band = rb.band
                 WHERE bit_count(xor(nb.ahash, rb.ahash)) <= 6)
        SELECT b.doc_id FROM batch b
        LEFT JOIN hit USING (doc_id) WHERE hit.doc_id IS NULL"""
  }

  /** source-dir → built index dir, JVM-lifetime (Bench runs each query
    * warmup+timed and Verify again; the build is the amortized pass and
    * must not be re-run — or re-timed — per execution).
    */
  private val urlIndexDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val ahashIndexDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def tempIndexDir(prefix: String): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    sys.addShutdownHook {
      import java.nio.file.{Files => F}
      import scala.jdk.CollectionConverters._
      F.walk(d).iterator.asScala.toSeq.reverse.foreach(F.deleteIfExists)
    }
    d
  }

  /** The Round10 md5-cell PPM image: cell c's gray value is the first
    * digest byte of `{key}-{c}` (with `-n-` for the fresh family), cell
    * 0 bumped by +16 for the twin.
    */
  private def ppm(key: String, bump: Boolean): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    "P3\n8 8\n255\n" + (0 until 64).map { c =>
      md.reset()
      md.update(s"$key-$c".getBytes("US-ASCII"))
      val v0 = md.digest()(0) & 0xff
      val v = if (bump && c == 0) (v0 + 16) % 256 else v0
      s"$v $v $v"
    }.mkString(" ")
  }

  private def packedImages(spark: SparkSession, df: DataFrame): DataFrame =
    Multimodal.pack(df.withColumn("fmt", lit("ppm")), "img", "fmt")

  val all: Seq[Q] = Seq(
    Q.fn("q_domain_psl", pslOracle) { (spark, sf) =>
      Curation.registrableDomainFromTable(
        withUrl(Tables.load(spark, sf, "documents"))
          .withColumn("host", Curation.extractHost(col("url")))
          .select("doc_id", "host"),
        "host", Curation.fixtureSuffixes(spark))
        .select("doc_id", "host", "domain")
    },

    Q.fn("q_url_dedup_incremental", urlIncrOracle) { (spark, sf) =>
      val docs = withUrl(Tables.load(spark, sf, "documents"))
      val dir = urlIndexDirs.computeIfAbsent(sf, { _ =>
        val d = tempIndexDir("graft-url-index")
        Curation.buildUrlIndex(docs.where(col("doc_id") < 250),
          "url", "doc_id", d.toString)
        d.toString
      })
      Curation.dedupUrlsAgainstIndex(spark, dir,
        docs.where(col("doc_id") >= 250), "url", "doc_id")
    },

    Q.fn("q_domain_mix_urls", mixUrlsOracle) { (spark, sf) =>
      Curation.domainMixFromUrls(
        withUrl(Tables.load(spark, sf, "documents"))
          .select("doc_id", "url"),
        "url", "doc_id", temperature = 0.5, outputFraction = 0.5)
        .select("doc_id", "domain")
    },

    Q.fn("q_multimodal_ahash_index", ahashIndexOracle) { (spark, sf) =>
      import spark.implicits._
      val ids = Tables.load(spark, sf, "documents")
        .where(col("doc_id") < 1000)
        .select(col("doc_id")).as[Long]
      val dir = ahashIndexDirs.computeIfAbsent(sf, { _ =>
        val d = tempIndexDir("graft-ahash-index")
        val ref = ids.map(id => (id, ppm(s"$id", bump = false)))
          .toDF("doc_id", "img")
        Multimodal.buildAHashIndex(packedImages(spark, ref), "doc_id",
          d.toString)
        d.toString
      })
      val batch = ids.flatMap { id =>
        Seq((id + 500000L, ppm(s"$id", bump = true)),
          (id + 700000L, ppm(s"$id-n", bump = false)))
      }.toDF("doc_id", "img")
      Multimodal.dedupImagesAgainstAHashIndex(spark, dir,
        packedImages(spark, batch), "doc_id")
        .select("doc_id")
    }
  )
}
