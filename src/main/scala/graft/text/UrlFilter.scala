package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * URL/domain-based hygiene filtering — the pretraining curation pass
 * that runs BEFORE any content signal (RefinedWeb/CCNet posture: a
 * blocklisted or spam-TLD page is dropped without tokenizing a byte,
 * and exact-URL dedup collapses recrawls of the same page):
 *
 *  1. normalize the URL (scheme, `www.`, query string stripped) —
 *     map-only regexp chain, no shuffle;
 *  2. `blocklist`: the registered domain sits on a blocklist;
 *  3. `low_quality_tld`: spam-prior TLDs (the `.info/.biz/.xyz` tier);
 *  4. `dup_url`: a second crawl of an already-seen normalized URL —
 *     keeper is the deterministic min doc_id per normalized URL.
 *
 * Rules fire in that fixed order, first failure wins (the
 * [[TextFilters.qualityFilter]] verdict discipline). The only shuffle
 * in the plan is ONE exchange on `url_norm` feeding a window MIN for
 * the dedup owner; everything else is codegen'd string expressions.
 * (Round 7 shipped this as groupBy(url_norm).min + self-join — TWO
 * url_norm shuffles and a join whose probe side piles every recrawl
 * of a URL onto one key. The r7 scale ramp caught it: 0.73s→5.70s on
 * a 4x data step, the ramp's only superlinear segment, because the
 * planted corpus's 100-identity recrawl pattern concentrates the
 * join. The window form halves the shuffles, drops the join, and its
 * per-key cost is the recrawl multiplicity — bounded in a real crawl,
 * and AQE-splittable when a single URL is hammered.)
 *
 * The synthetic documents table carries no URL column, so the
 * `url_filter` entry PLANTS one deterministically from (doc_id,
 * source) — the planted-corpus discipline — with surface noise
 * (http/https, `www.`, tracking query strings) that normalization
 * must cancel, and identity collisions (doc_id mod 100) that dedup
 * must catch. The oracle SQL replays the plant verbatim.
 */
object UrlFilter {

  val Domains: Seq[String] = Seq("news-site", "blogspam", "example",
    "tracker-hub", "archive", "forum", "wiki", "shop", "adfarm",
    "papers", "media")

  val Tlds: Seq[String] = Seq(".com", ".org", ".net", ".info", ".biz",
    ".edu", ".xyz")

  /** Blocklist / spam-TLD lists from GraftConfig (`url.blockedDomains`
    * / `url.lowQualityTlds`) — a deployment feeds its own lists; the
    * defaults are the planted-demo constants, and the oracle SQL
    * interpolates the same values so a reconfigured list stays
    * hash-checked. */
  def BlockedDomains: Seq[String] = graft.config.GraftConfig.active.url.blockedDomains

  def LowQualityTlds: Seq[String] = graft.config.GraftConfig.active.url.lowQualityTlds

  /** Deterministic planted URL: identity from `doc_id mod 100` (so
    * recrawl collisions occur at every SF), surface form varying with
    * doc_id so normalization has real work. */
  /** The deterministic URL plant as a column (so callers that need
    * other columns alongside — host_stats keeps `text` — stay
    * map-only instead of planting and joining back). */
  def plantedUrlCol: Column = {
    val uid = col("doc_id") % 100
    val domain = element_at(array(Domains.map(lit): _*), (uid % 11 + 1).cast("int"))
    val tld = element_at(array(Tlds.map(lit): _*), (uid % 7 + 1).cast("int"))
    concat(
      when(col("doc_id") % 2 === 0, lit("https://")).otherwise(lit("http://")),
      when(col("doc_id") % 5 === 0, lit("www.")).otherwise(lit("")),
      domain, tld, lit("/"), col("source"), lit("/page-"), uid.cast("string"),
      when(col("doc_id") % 3 === 0, lit("?utm_source=feed")).otherwise(lit("")))
  }

  def withPlantedUrls(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), plantedUrlCol.as("url"))

  /** The operator proper: verdicts over any (doc_id, url) frame. */
  def urlFilter(urls: DataFrame): DataFrame = {
    val norm = regexp_replace(regexp_replace(regexp_replace(col("url"),
      "^https?://", ""), "^www\\.", ""), "\\?.*$", "")
    val parsed = urls
      .withColumn("url_norm", norm)
      .withColumn("host", substring_index(col("url_norm"), "/", 1))
      .withColumn("domain", substring_index(col("host"), ".", 1))
      .withColumn("tld", expr("substring(host, length(domain) + 1, 10)"))
    val byUrl = org.apache.spark.sql.expressions.Window.partitionBy("url_norm")
    parsed
      .withColumn("owner", min("doc_id").over(byUrl))
      .withColumn("fail_reason",
        when(col("domain").isin(BlockedDomains: _*), "blocklist")
          .when(col("tld").isin(LowQualityTlds: _*), "low_quality_tld")
          .when(col("doc_id") =!= col("owner"), "dup_url")
          .otherwise("ok"))
      .select(col("doc_id"), col("url"), col("url_norm"), col("domain"),
        col("tld"), col("fail_reason"),
        (col("fail_reason") === "ok").cast("int").as("keep"))
  }

  def urlFilterQuery(spark: SparkSession, sfDir: String): DataFrame =
    urlFilter(withPlantedUrls(Tables.documents(spark, sfDir)))

  /**
   * `host_stats`: the per-host crawl triage report a pipeline owner
   * reads before touching content — which hosts dominate the corpus,
   * how much of each host is recrawl duplication, and how long its
   * documents run (Common-Crawl host-level curation: blocklists and
   * crawl budgets are set from exactly this table).
   *
   * Scale shape: TWO-LEVEL aggregation — docs roll up to
   * `url_norm` first (count + chars), URLs then roll up to host —
   * so the distinct-URL count is a plain COUNT at the second level,
   * never a COUNT(DISTINCT) expansion over doc rows. Both levels are
   * partial-agg shuffles on bounded keys (URLs, then hosts). The
   * corpus-share denominator is a single-row total broadcast over the
   * host-sized result (hosts ~ 1e6-1e8 at web scale; the rollup is
   * the standard two-stage reduce).
   */
  def hostStats(urls: DataFrame): DataFrame = {
    val norm = regexp_replace(regexp_replace(regexp_replace(col("url"),
      "^https?://", ""), "^www\\.", ""), "\\?.*$", "")
    val perUrl = urls
      .withColumn("url_norm", norm)
      .withColumn("host", substring_index(col("url_norm"), "/", 1))
      .groupBy("host", "url_norm")
      .agg(count(lit(1)).as("docs"), sum(length(col("text")).cast("long")).as("chars"))
    val perHost = perUrl.groupBy("host")
      .agg(sum("docs").as("n_docs"),
        count(lit(1)).as("n_urls"),
        (sum("docs") - count(lit(1))).as("dup_docs"),
        sum("chars").as("chars_sum"))
    val total = perHost.agg(sum("n_docs").as("total_docs"))
    perHost.crossJoin(broadcast(total))
      .select(col("host"), col("n_docs"), col("n_urls"), col("dup_docs"),
        col("chars_sum"),
        (floor(col("chars_sum") / col("n_docs") * 10000) / 10000).as("mean_doc_chars"),
        (floor(col("n_docs") / col("total_docs") * 10000) / 10000).as("corpus_share"))
  }

  def hostStatsQuery(spark: SparkSession, sfDir: String): DataFrame =
    // plant rides the projection next to text — no self-join to get
    // both columns (r8 ramp caught the joined form going superlinear:
    // a corpus-sized shuffle join feeding a 500-key agg)
    hostStats(Tables.documents(spark, sfDir)
      .select(col("doc_id"), plantedUrlCol.as("url"), col("text")))

  def hostStatsSql: String =
    s"""WITH u AS (
       |  SELECT doc_id,
       |    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END)
       |    || (CASE WHEN doc_id % 5 = 0 THEN 'www.' ELSE '' END)
       |    || ([${sqlList(Domains)}])[(doc_id % 100) % 11 + 1]
       |    || ([${sqlList(Tlds)}])[(doc_id % 100) % 7 + 1]
       |    || '/' || source || '/page-' || (doc_id % 100)
       |    || (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed' ELSE '' END) AS url
       |  FROM documents),
       |n AS (SELECT u.doc_id,
       |  regexp_replace(regexp_replace(regexp_replace(url,
       |    '^https?://', ''), '^www\\.', ''), '\\?.*$$', '') AS url_norm,
       |  CAST(len(d.text) AS BIGINT) AS chars
       |  FROM u JOIN documents d ON u.doc_id = d.doc_id),
       |p AS (SELECT string_split(url_norm, '/')[1] AS host, url_norm,
       |        CAST(COUNT(*) AS BIGINT) AS docs, CAST(SUM(chars) AS BIGINT) AS chars
       |      FROM n GROUP BY 1, 2),
       |h AS (SELECT host, CAST(SUM(docs) AS BIGINT) AS n_docs,
       |        CAST(COUNT(*) AS BIGINT) AS n_urls,
       |        CAST(SUM(docs) - COUNT(*) AS BIGINT) AS dup_docs,
       |        CAST(SUM(chars) AS BIGINT) AS chars_sum
       |      FROM p GROUP BY host),
       |t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs FROM h)
       |SELECT host, n_docs, n_urls, dup_docs, chars_sum,
       |  FLOOR(chars_sum / n_docs * 10000) / 10000 AS mean_doc_chars,
       |  FLOOR(n_docs / total_docs * 10000) / 10000 AS corpus_share
       |FROM h CROSS JOIN t""".stripMargin

  private def sqlList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString(", ")

  val urlFilterSql: String = {
    val verdict =
      s"""CASE WHEN domain IN (${sqlList(BlockedDomains)}) THEN 'blocklist'
         |       WHEN tld IN (${sqlList(LowQualityTlds)}) THEN 'low_quality_tld'
         |       WHEN doc_id <> owner THEN 'dup_url'
         |       ELSE 'ok' END""".stripMargin
    s"""WITH u AS (
       |  SELECT doc_id,
       |    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END)
       |    || (CASE WHEN doc_id % 5 = 0 THEN 'www.' ELSE '' END)
       |    || ([${sqlList(Domains)}])[(doc_id % 100) % 11 + 1]
       |    || ([${sqlList(Tlds)}])[(doc_id % 100) % 7 + 1]
       |    || '/' || source || '/page-' || (doc_id % 100)
       |    || (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed' ELSE '' END) AS url
       |  FROM documents),
       |n AS (SELECT doc_id, url,
       |  regexp_replace(regexp_replace(regexp_replace(url,
       |    '^https?://', ''), '^www\\.', ''), '\\?.*$$', '') AS url_norm FROM u),
       |p AS (SELECT *, string_split(url_norm, '/')[1] AS host FROM n),
       |d AS (SELECT *, string_split(host, '.')[1] AS domain,
       |        substr(host, len(string_split(host, '.')[1]) + 1, 10) AS tld
       |      FROM p),
       |o AS (SELECT url_norm, MIN(doc_id) AS owner FROM d GROUP BY url_norm)
       |SELECT doc_id, url, url_norm, domain, tld,
       |  $verdict AS fail_reason,
       |  CAST(($verdict) = 'ok' AS INTEGER) AS keep
       |FROM d JOIN o USING (url_norm)""".stripMargin
  }
}
