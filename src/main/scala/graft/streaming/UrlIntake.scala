package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.text.UrlFilter

/**
 * Streaming URL hygiene gate — the continuous form of
 * [[graft.text.UrlFilter.urlFilter]] for a crawl-frontier intake:
 * every arriving (doc_id, url) gets a verdict BEFORE any content is
 * fetched or tokenized.
 *
 * The blocklist and TLD rules are stateless per-row string logic (the
 * same codegen'd normalization chain as the batch operator, applied
 * in the pre-projection). Recrawl detection (`dup_url`) is keyed
 * state on the NORMALIZED url — one boolean per distinct URL, the
 * [[StreamingDedup]] state shape: the store grows with distinct URLs,
 * not crawl length, and a production deployment bounds it with state
 * TTL (a recrawl older than the TTL is a legitimate refetch).
 *
 * Verdict order matches the batch operator: blocklist, then TLD, then
 * dup — and because all copies of one normalized URL share their
 * domain and TLD, the static verdicts agree across copies, so the
 * keyed state is only consulted when they pass.
 */
object UrlIntake {

  final case class UrlIn(doc_id: Long, url: String, url_norm: String,
      domain: String, tld: String)
  final case class UrlVerdict(doc_id: Long, url: String, url_norm: String,
      fail_reason: String, keep: Int)

  /** Per-URL group verdict: the first arrival (doc_id-smallest within
    * the batch, first batch across batches) owns the URL; later copies
    * are `dup_url`. Static rules fire first, as in the batch operator. */
  def verdicts(urlNorm: String, rows: Iterator[UrlIn],
      state: GroupState[Boolean]): Iterator[UrlVerdict] = {
    val sorted = rows.toSeq.sortBy(_.doc_id)
    val seen = state.exists
    val out = sorted.zipWithIndex.map { case (r, i) =>
      val reason =
        if (UrlFilter.BlockedDomains.contains(r.domain)) "blocklist"
        else if (UrlFilter.LowQualityTlds.contains(r.tld)) "low_quality_tld"
        else if (seen || i > 0) "dup_url"
        else "ok"
      UrlVerdict(r.doc_id, r.url, r.url_norm, reason, if (reason == "ok") 1 else 0)
    }
    state.update(true)
    out.iterator
  }

  /** (doc_id, url) stream -> per-arrival verdict rows. */
  def urlStream(spark: SparkSession, urls: Dataset[Row]): Dataset[UrlVerdict] = {
    import spark.implicits._
    val norm = regexp_replace(regexp_replace(regexp_replace(col("url"),
      "^https?://", ""), "^www\\.", ""), "\\?.*$", "")
    urls
      .select(col("doc_id").cast("long"), col("url"))
      .withColumn("url_norm", norm)
      .withColumn("host", substring_index(col("url_norm"), "/", 1))
      .withColumn("domain", substring_index(col("host"), ".", 1))
      .withColumn("tld", expr("substring(host, length(domain) + 1, 10)"))
      .select(col("doc_id"), col("url"), col("url_norm"), col("domain"), col("tld"))
      .as[UrlIn]
      .groupByKey(_.url_norm)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(verdicts)
  }
}
