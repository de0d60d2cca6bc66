package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.dedup.Dedup

/**
 * Streaming NEAR-duplicate gate — the missing rung between
 * [[StreamingDedup]] (exact content hash: any edit sails through) and
 * the nightly batch [[Dedup.minhashPairs]]: a lightly-edited copy of
 * an earlier document is flagged AT INTAKE, in the micro-batch it
 * arrives in.
 *
 * Shape: each arriving document is expanded map-side into its 16
 * MinHash band keys (the same fused codegen signature expression as
 * the batch path) plus its distinct shingle set as 8-byte xxhash64
 * keys (the [[Dedup.substringStats]] hashed-key discipline — Jaccard
 * over hashed shingles equals Jaccard over shingle strings modulo a
 * 64-bit collision). `flatMapGroupsWithState` keyed on
 * (band, band_hash) then holds each bucket's claimants in the state
 * store; an arrival is exact-Jaccard-verified against its bucket's
 * claimants and emits the verified pair — the batch operator's
 * band-candidate + exact-verify semantics, made incremental.
 *
 * Equivalence to batch: over any micro-batch split of a corpus, the
 * union of emitted pairs (distinct — a pair sharing several bands
 * surfaces once per shared band, all in the later doc's batch) equals
 * `minhashPairs(corpus)` as long as no bucket overflows `maxBucket`.
 * On overflow the batch plan retro-drops the WHOLE bucket, which a
 * causal stream cannot replay (pairs already emitted are gone); the
 * gate instead freezes the bucket — claimants are discarded, nothing
 * further is emitted from it — and near-dups colliding there still
 * surface via their other 15 bands. That asymmetry is inherent to
 * append-mode streaming and documented here rather than papered over.
 *
 * 100 TB posture: state per bucket is its claimants' hashed shingle
 * sets — bounded by `maxBucket` × doc length, keyed state sharded
 * across executors by Spark's state store like any
 * mapGroupsWithState; the hot-bucket freeze is exactly what stops a
 * boilerplate bucket from accumulating unbounded state. Claimants
 * additionally age out with EVENT-TIME TTL when configured
 * (`stream.stateTtlSec` + an event-time column — dup windows in
 * crawl pipelines are weeks, not forever, the same bound Spark's own
 * watermarked dropDuplicates uses): an arrival only ever matches
 * claimants seen within the TTL of its own event time — a
 * NON-DESTRUCTIVE per-arrival view (deterministic window semantics,
 * independent of micro-batch boundaries: an out-of-order arrival
 * within the same trigger still sees every claimant its own event
 * time allows) — state then compacts ONCE per trigger against the
 * batch's max event time, and a bucket idle past the TTL — frozen
 * ones included — is garbage-collected by the state store's
 * event-time timeout.
 */
object StreamingNearDup {

  val NumPerms = 64
  val RowsPerBand = 4
  val ShingleWidth = 3
  val Threshold = 0.5
  val MaxBucket = 1000

  final case class BandedDoc(band: Int, band_hash: Long, doc_id: Long, sh: Seq[Long],
      ts: java.sql.Timestamp)
  final case class Claimant(doc_id: Long, sh: Seq[Long], tsMs: Long)
  final case class BucketState(claimants: List[Claimant], frozen: Boolean)
  final case class NearPair(a: Long, b: Long, jaccard: Double)

  /** Map-side prep: one row per (band, doc) with the doc's hashed
    * shingle set — the fused signature expression runs once per doc
    * and the band keys are slices of it, exactly the batch layout.
    * `tsCol` (event time) rides along for the TTL path; absent, the
    * column is null and the gate retains state forever. */
  def bandedShingles(docs: DataFrame, idCol: String, textCol: String,
      tsCol: Option[String] = None): DataFrame = {
    val toks = Dedup.tokens(col(textCol))
    val tsExpr = tsCol.map(c => col(c).cast("timestamp"))
      .getOrElse(lit(null).cast("timestamp"))
    val sigs = docs.select(col(idCol).as("doc_id"),
      graft.dedup.SignatureExprs.minhash_shingle_sig(toks, ShingleWidth, NumPerms).as("sig"),
      transform(array_distinct(Dedup.shingles(toks, ShingleWidth)),
        s => xxhash64(s)).as("sh"),
      tsExpr.as("ts"))
    val bandHashes = (0 until NumPerms / RowsPerBand).map { b =>
      xxhash64(slice(col("sig"), b * RowsPerBand + 1, RowsPerBand))
    }
    sigs.select(col("doc_id"), col("sh"), col("ts"),
      posexplode(array(bandHashes: _*)).as(Seq("band", "band_hash")))
      .select(col("band"), col("band_hash"), col("doc_id"), col("sh"), col("ts"))
  }

  private def jaccard(a: Seq[Long], b: Seq[Long]): Double = {
    val sa = a.toSet; val sb = b.toSet
    val inter = sa.count(sb.contains)
    val union = sa.size + sb.size - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** Verify one bucket's arrivals against its stored claimants (and
    * each other, in doc_id order), then fold the arrivals into state —
    * or freeze the bucket past [[MaxBucket]]. With `ttlMs > 0`:
    * claimants older than TTL relative to the ARRIVAL's event time
    * are ignored and trimmed (event-time window semantics), the
    * bucket's timeout extends to last-sighting + TTL, and a timed-out
    * invocation removes the state (frozen buckets thaw this way). */
  def verifyBucketTtl(ttlMs: Long)(
      key: (Int, Long),
      rows: Iterator[BandedDoc],
      state: GroupState[BucketState]): Iterator[NearPair] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val st = state.getOption.getOrElse(BucketState(Nil, frozen = false))
    val arrivals = rows.toArray.sortBy(_.doc_id)
    def tsMs(d: BandedDoc): Long = if (d.ts == null) 0L else d.ts.getTime
    // extend the GC deadline to last sighting + TTL (floored above the
    // watermark — setTimeoutTimestamp rejects timestamps at/behind it)
    def touchTimeout(): Unit =
      if (ttlMs > 0 && arrivals.nonEmpty)
        state.setTimeoutTimestamp(
          math.max(arrivals.map(tsMs).max + ttlMs, state.getCurrentWatermarkMs + 1))
    if (st.frozen) { touchTimeout(); return Iterator.empty }
    val out = Vector.newBuilder[NearPair]
    var claimants = st.claimants
    var frozen = false
    arrivals.foreach { d =>
      if (!frozen) {
        // non-destructive TTL view per arrival (see
        // [[StreamingSemanticNearDup.verifyCellTtl]]): an out-of-order
        // sibling in the same trigger must not drop a claimant that is
        // still inside an older-ts arrival's window; state compacts
        // once below against the batch's max event time
        val live = if (ttlMs > 0) claimants.filter(c => tsMs(d) - c.tsMs <= ttlMs)
                   else claimants
        live.foreach { c =>
          if (c.doc_id != d.doc_id) {
            val j = jaccard(c.sh, d.sh)
            if (j >= Threshold)
              out += NearPair(math.min(c.doc_id, d.doc_id),
                math.max(c.doc_id, d.doc_id), math.floor(j * 10000) / 10000)
          }
        }
        claimants = Claimant(d.doc_id, d.sh, tsMs(d)) :: claimants
        val liveCount = if (ttlMs > 0) claimants.count(c => tsMs(d) - c.tsMs <= ttlMs)
                        else claimants.size
        if (liveCount > MaxBucket) frozen = true
      }
    }
    if (!frozen && ttlMs > 0 && arrivals.nonEmpty) {
      val maxTs = arrivals.map(tsMs).max
      claimants = claimants.filter(c => maxTs - c.tsMs <= ttlMs)
    }
    state.update(if (frozen) BucketState(Nil, frozen = true)
      else BucketState(claimants, frozen = false))
    touchTimeout()
    if (frozen) Iterator.empty else out.result().iterator
  }

  /** The TTL-less verify (retain-forever default), kept as the named
    * batch-equivalence kernel the specs exercise directly. */
  def verifyBucket(
      key: (Int, Long),
      rows: Iterator[BandedDoc],
      state: GroupState[BucketState]): Iterator[NearPair] =
    verifyBucketTtl(0L)(key, rows, state)

  /** docs stream with (doc_id, text) → verified near-dup pairs
    * (a < b, 4dp-floored Jaccard; distinct() at the sink — a pair
    * surfaces once per shared band). With `tsCol` + a configured
    * `stream.stateTtlSec`, the gate runs under an event-time
    * watermark and ages claimants/buckets out per [[verifyBucketTtl]];
    * otherwise state is retained forever (exact batch equivalence). */
  def neardupStream(spark: SparkSession, docs: Dataset[org.apache.spark.sql.Row],
      idCol: String = "doc_id", textCol: String = "text",
      tsCol: Option[String] = None,
      ttlSec: Int = graft.config.GraftConfig.active.stream.stateTtlSec): Dataset[NearPair] = {
    import spark.implicits._
    val withTtl = tsCol.nonEmpty && ttlSec > 0
    val timeout = if (withTtl) GroupStateTimeout.EventTimeTimeout()
                  else GroupStateTimeout.NoTimeout()
    val banded = bandedShingles(docs.toDF(), idCol, textCol, tsCol)
    // watermark on the PROJECTED ts attribute (a cast/alias sheds the
    // event-time tag, so tagging the source column would not survive)
    val src = if (withTtl) banded.withWatermark("ts", "0 seconds") else banded
    src
      .as[BandedDoc]
      .groupByKey(d => (d.band, d.band_hash))
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(
        verifyBucketTtl(if (withTtl) ttlSec * 1000L else 0L))
  }
}
