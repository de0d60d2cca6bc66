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
 * state on the NORMALIZED url — one last-sighting record per distinct
 * URL, the [[StreamingDedup]] state shape: the store grows with
 * distinct URLs, not crawl length, and `stream.stateTtlSec` (+ an
 * event-time column) bounds it — a recrawl older than the TTL is a
 * legitimate refetch (fresh owner), and an idle URL's record is
 * garbage-collected by the state store's event-time timeout.
 *
 * Verdict order matches the batch operator: blocklist, then TLD, then
 * dup — and because all copies of one normalized URL share their
 * domain and TLD, the static verdicts agree across copies, so the
 * keyed state is only consulted when they pass.
 */
object UrlIntake {

  final case class UrlIn(doc_id: Long, url: String, url_norm: String,
      domain: String, tld: String, ts: java.sql.Timestamp)
  final case class UrlState(lastSeenMs: Long)
  final case class UrlVerdict(doc_id: Long, url: String, url_norm: String,
      fail_reason: String, keep: Int)

  /** Per-URL group verdict: the first arrival (doc_id-smallest within
    * the batch, first batch across batches) owns the URL; later copies
    * are `dup_url`. Static rules fire first, as in the batch operator.
    * With `ttlMs > 0` the ownership expires TTL after the last
    * sighting (event time): a later arrival is a fresh owner, and the
    * record itself is GC'd on event-time timeout when the URL stays
    * idle. */
  def verdictsTtl(ttlMs: Long)(urlNorm: String, rows: Iterator[UrlIn],
      state: GroupState[UrlState]): Iterator[UrlVerdict] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val sorted = rows.toSeq.sortBy(_.doc_id)
    def tsMs(r: UrlIn): Long = if (r.ts == null) 0L else r.ts.getTime
    val last = state.getOption.map(_.lastSeenMs)
    val out = sorted.zipWithIndex.map { case (r, i) =>
      val seen = last.exists(ls => ttlMs <= 0 || tsMs(r) - ls <= ttlMs)
      val reason =
        if (UrlFilter.BlockedDomains.contains(r.domain)) "blocklist"
        else if (UrlFilter.LowQualityTlds.contains(r.tld)) "low_quality_tld"
        else if (seen || i > 0) "dup_url"
        else "ok"
      UrlVerdict(r.doc_id, r.url, r.url_norm, reason, if (reason == "ok") 1 else 0)
    }
    val maxTs = sorted.map(tsMs).max
    state.update(UrlState(math.max(last.getOrElse(0L), maxTs)))
    if (ttlMs > 0)
      state.setTimeoutTimestamp(
        math.max(maxTs + ttlMs, state.getCurrentWatermarkMs + 1))
    out.iterator
  }

  /** The TTL-less verdict kernel (retain-forever default). */
  def verdicts(urlNorm: String, rows: Iterator[UrlIn],
      state: GroupState[UrlState]): Iterator[UrlVerdict] =
    verdictsTtl(0L)(urlNorm, rows, state)

  /** (doc_id, url) stream -> per-arrival verdict rows. With `tsCol`
    * + a configured `stream.stateTtlSec`, runs under an event-time
    * watermark with expiring URL ownership per [[verdictsTtl]]. */
  def urlStream(spark: SparkSession, urls: Dataset[Row],
      tsCol: Option[String] = None,
      ttlSec: Int = graft.config.GraftConfig.active.stream.stateTtlSec): Dataset[UrlVerdict] = {
    import spark.implicits._
    val withTtl = tsCol.nonEmpty && ttlSec > 0
    val timeout = if (withTtl) GroupStateTimeout.EventTimeTimeout()
                  else GroupStateTimeout.NoTimeout()
    val norm = regexp_replace(regexp_replace(regexp_replace(col("url"),
      "^https?://", ""), "^www\\.", ""), "\\?.*$", "")
    val tsExpr = tsCol.map(c => col(c).cast("timestamp"))
      .getOrElse(lit(null).cast("timestamp"))
    val projected = urls.toDF()
      .select(col("doc_id").cast("long"), col("url"), tsExpr.as("ts"))
      .withColumn("url_norm", norm)
      .withColumn("host", substring_index(col("url_norm"), "/", 1))
      .withColumn("domain", substring_index(col("host"), ".", 1))
      .withColumn("tld", expr("substring(host, length(domain) + 1, 10)"))
      .select(col("doc_id"), col("url"), col("url_norm"), col("domain"),
        col("tld"), col("ts"))
    // watermark on the PROJECTED ts attribute (a cast/alias sheds the
    // event-time tag, so tagging the source column would not survive)
    val src = if (withTtl) projected.withWatermark("ts", "0 seconds") else projected
    src
      .as[UrlIn]
      .groupByKey(_.url_norm)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(
        verdictsTtl(if (withTtl) ttlSec * 1000L else 0L))
  }
}
