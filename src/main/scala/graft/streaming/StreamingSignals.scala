package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.text.TextAnalysis

/**
 * Streaming SIGNALS-MAINTENANCE gate — the continuous twin of the
 * batch [[graft.operators.SignalsMaintenance]] (`quality_signals_delta`):
 * crawls and recrawls arrive as a document stream, and the
 * materialize-once signals table must absorb them WITHOUT re-scoring
 * what it already holds. Keyed state per doc_id is the last-emitted
 * content digest; an arrival whose digest matches emits NOTHING (the
 * resident table already carries its row — the streaming form of the
 * batch `unchanged` carry), while a first sighting or an edited
 * recrawl emits one signal row tagged `added` / `changed` — exactly
 * the rows a downstream merge upserts into the resident table.
 *
 * The signal expressions are [[TextAnalysis.signalsOver]] — the SAME
 * select list the batch projections use, applied AFTER the gate: only
 * emitted (added/changed) arrivals pay the regex-heavy extraction,
 * the batch entry's "only the delta pays the text pass" posture
 * preserved per micro-batch. Within one batch, multiple versions of a
 * doc process in (event-time, digest) order, so emissions are
 * deterministic under any micro-batch split.
 *
 * 100 TB posture: state is ONE 32-char digest per distinct doc_id —
 * no text, no signals in the state store — sharded by doc_id like any
 * keyed state; with `stream.stateTtlSec` + an event-time column the
 * digests age out TTL after the last sighting (idle docs GC'd via
 * event-time timeout), bounding state to the active-recrawl window at
 * the price the batch twin states explicitly: an arrival after expiry
 * re-emits as `added` (a refetch), the same semantics as
 * [[UrlIntake]]'s aged URL re-ownership.
 */
object StreamingSignals {

  final case class DocArrival(doc_id: Long, text: String, fp: String,
      ts: java.sql.Timestamp)
  final case class DocDigest(fp: String, lastSeenMs: Long)
  final case class ChangedDoc(doc_id: Long, text: String, status: String)

  /** Per-doc digest gate. Arrivals in (event-time, digest) order; each
    * compares against the last-emitted digest and emits on change.
    * With `ttlMs > 0` a digest last sighted more than TTL before the
    * arrival's OWN event time no longer suppresses (deterministic
    * window semantics, the [[UrlIntake]] lastSeen discipline —
    * independent of where micro-batch boundaries fall), and idle docs
    * time out of the store entirely. */
  def gateTtl(ttlMs: Long)(docId: Long, rows: Iterator[DocArrival],
      state: GroupState[DocDigest]): Iterator[ChangedDoc] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    def tsMs(r: DocArrival): Long = if (r.ts == null) 0L else r.ts.getTime
    val arrivals = rows.toArray.sortBy(r => (tsMs(r), r.fp))
    var fp = state.getOption.map(_.fp).orNull
    var lastSeenMs = state.getOption.map(_.lastSeenMs).getOrElse(Long.MinValue)
    val out = Vector.newBuilder[ChangedDoc]
    arrivals.foreach { r =>
      val expired = ttlMs > 0 && fp != null &&
        lastSeenMs != Long.MinValue && tsMs(r) - lastSeenMs > ttlMs
      if (expired) fp = null
      if (fp == null) out += ChangedDoc(r.doc_id, r.text, "added")
      else if (fp != r.fp) out += ChangedDoc(r.doc_id, r.text, "changed")
      fp = r.fp
      // monotonic, like UrlIntake: a wholly-late micro-batch must not
      // move lastSeen backward (which would let a later arrival see a
      // spurious TTL expiry and re-emit as 'added')
      lastSeenMs = math.max(lastSeenMs, tsMs(r))
    }
    state.update(DocDigest(fp, lastSeenMs))
    if (ttlMs > 0)
      state.setTimeoutTimestamp(
        math.max(lastSeenMs + ttlMs, state.getCurrentWatermarkMs + 1))
    out.result().iterator
  }

  def gate(docId: Long, rows: Iterator[DocArrival],
      state: GroupState[DocDigest]): Iterator[ChangedDoc] =
    gateTtl(0L)(docId, rows, state)

  /** (doc_id, text) stream → signal rows for added/changed docs only
    * (`status` first, then the [[TextAnalysis.signalsOver]] columns).
    * With `tsCol` + a configured `stream.stateTtlSec`, digests expire
    * per [[gateTtl]]; otherwise state is retained forever (exact
    * batch-delta equivalence). */
  def signalsStream(spark: SparkSession, docs: Dataset[Row],
      tsCol: Option[String] = None,
      ttlSec: Int = graft.config.GraftConfig.active.stream.stateTtlSec): DataFrame = {
    import spark.implicits._
    val withTtl = tsCol.nonEmpty && ttlSec > 0
    val timeout = if (withTtl) GroupStateTimeout.EventTimeTimeout()
                  else GroupStateTimeout.NoTimeout()
    val tsExpr = tsCol.map(c => col(c).cast("timestamp"))
      .getOrElse(lit(null).cast("timestamp"))
    val projected = docs.toDF().select(col("doc_id").cast("long"),
      col("text"), md5(col("text")).as("fp"), tsExpr.as("ts"))
    val src = if (withTtl) projected.withWatermark("ts", "0 seconds") else projected
    val changed = src
      .as[DocArrival]
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(
        gateTtl(if (withTtl) ttlSec * 1000L else 0L))
    TextAnalysis.signalsOver(changed.toDF(), Seq("doc_id", "status"))
  }
}
