package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.dedup.SemDedup

/**
 * Streaming SEMANTIC near-duplicate gate — the embedding-side twin of
 * [[StreamingNearDup]] (cells for bands), closing the one asymmetry
 * left in the intake story: an arriving crawl stream could get minhash
 * verdicts live but SemDeDup verdicts only from the nightly batch
 * ([[SemDedup.dedupSemanticDelta]]). Now a re-embedded crawl document
 * is flagged against the RESIDENT corpus in the micro-batch it
 * arrives in.
 *
 * Shape: each arrival is assigned its home cell MAP-SIDE with the
 * frozen base-fitted centroid literal — the SAME
 * [[SemDedup.assignWithCentSim]] expression the batch delta path runs,
 * so stream and batch route every vector identically by construction.
 * `flatMapGroupsWithState` keyed on the cell then holds each cell's
 * claimants (the resident base members, SEEDED as the state store's
 * initial state from the same resident assignments the batch path
 * exports, plus earlier arrivals); an arrival is exact-cosine-verified
 * against its cell's claimants and emits the verified pair with its
 * `leg` label (`delta_base` against a resident claimant, `delta_delta`
 * against an earlier arrival) — the batch operator's
 * assign + within-cell-probe + verify semantics, made incremental.
 *
 * Engine parity: the in-kernel cosine replays
 * [[graft.functions.VectorKernels.cosine]] operation-for-operation
 * (float→double widening, single fused dot/norm loop in index order)
 * and rounds HALF_UP to 4 dp exactly as the batch plan's
 * `round(vec_cosine, 4)` — streamed `cos` values are bit-identical to
 * the batch pair report's (spec-asserted set equality, doubles
 * included).
 *
 * Equivalence to batch: over any micro-batch split of the delta, the
 * emitted pairs equal `dedupSemanticDelta`'s — BOTH legs — as long as
 * no cell crosses `maxCell`. On overflow the batch plan retro-drops
 * the WHOLE cell; a causal stream cannot replay already-emitted pairs,
 * so the gate instead FREEZES the cell (the [[StreamingNearDup]]
 * overflow discipline): the tipping micro-batch's output for that cell
 * is suppressed, nothing further is emitted from it, and pairs emitted
 * in earlier micro-batches stand. That asymmetry is inherent to
 * append-mode streaming and documented rather than papered over.
 *
 * 100 TB posture: state per cell is its claimants' embeddings —
 * bounded by `maxCell` × dim floats and sharded across executors by
 * the state store; the map-side assignment is the only per-arrival
 * corpus-independent work (centroid literal, no join); the verify is
 * claimant-bounded. The resident seed is one pass over the base
 * assignment table at stream start, never re-read.
 *
 * TTL parity with the sibling gates ([[StreamingNearDup]],
 * [[StreamingDedup]]): with a `tsCol` and a configured
 * `stream.stateTtlSec`, the gate runs under an event-time watermark
 * with [[org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout]]
 * — claimants older than TTL relative to an ARRIVAL's event time
 * (resident base members included, per their `baseTs` snapshot time)
 * are ignored and trimmed, each cell's GC deadline extends to
 * last-sighting + TTL, and a timed-out invocation removes the state —
 * which is also how a FROZEN cell thaws and resumes emitting.
 * Retain-forever (the default, `ttlSec = 0`) keeps exact batch
 * equivalence.
 */
object StreamingSemanticNearDup {

  final case class CellDoc(cell: Int, vec_id: Long, emb: Seq[Float],
      ts: java.sql.Timestamp)
  final case class Claimant(vec_id: Long, emb: Seq[Float], isBase: Boolean,
      tsMs: Long)
  final case class CellState(claimants: List[Claimant], frozen: Boolean)
  final case class SemPair(a: Long, b: Long, cos: Double, leg: String)

  /** [[graft.functions.VectorKernels.cosine]] replayed on the state
    * store's Seq[Float] representation, rounded HALF_UP to 4 dp like
    * the batch plan's `round(vec_cosine, 4)` — same ops, same order,
    * bit-identical doubles. */
  private[graft] def cosine4(x: Seq[Float], y: Seq[Float]): Double = {
    val n = math.min(x.length, y.length)
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val a = x(i).toDouble
      val b = y(i).toDouble
      dot += a * b; nx += a * a; ny += b * b
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    val c = if (denom == 0.0) 0.0 else dot / denom
    java.math.BigDecimal.valueOf(c)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue
  }

  /** Verify one cell's arrivals against its claimants (resident base +
    * earlier arrivals, then each other in vec_id order), fold them in,
    * or freeze the cell once base∪arrivals crosses `maxCell` — the
    * batch guard's count, applied causally. With `ttlMs > 0`:
    * claimants older than TTL relative to EACH arrival's own event
    * time are ignored for that arrival (non-destructively — state
    * compacts once per trigger against the max event time, so
    * out-of-order rows within a batch keep their windows), the cell's
    * timeout extends to
    * last-sighting + TTL, and a timed-out invocation removes the state
    * (frozen cells thaw this way) — [[StreamingNearDup.verifyBucketTtl]]'s
    * discipline on the cell key. */
  def verifyCellTtl(tau: Double, maxCell: Int, ttlMs: Long)(
      key: Int,
      rows: Iterator[CellDoc],
      state: GroupState[CellState]): Iterator[SemPair] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val st = state.getOption.getOrElse(CellState(Nil, frozen = false))
    val arrivals = rows.toArray.sortBy(_.vec_id)
    def tsMs(d: CellDoc): Long = if (d.ts == null) 0L else d.ts.getTime
    // extend the GC deadline to last sighting + TTL (floored above the
    // watermark — setTimeoutTimestamp rejects timestamps at/behind it)
    def touchTimeout(): Unit =
      if (ttlMs > 0 && arrivals.nonEmpty)
        state.setTimeoutTimestamp(
          math.max(arrivals.map(tsMs).max + ttlMs, state.getCurrentWatermarkMs + 1))
    if (st.frozen) { touchTimeout(); return Iterator.empty }
    val out = Vector.newBuilder[SemPair]
    var claimants = st.claimants
    var frozen = false
    arrivals.foreach { d =>
      if (!frozen) {
        // TTL view is NON-DESTRUCTIVE per arrival: each arrival matches
        // against the claimants inside ITS OWN event-time window, so an
        // out-of-order sibling in the same trigger (newer ts, lower
        // vec_id — arrivals fold in vec_id order for batch equality)
        // cannot permanently drop a claimant a still-in-window sibling
        // should pair with; state is compacted ONCE below, against the
        // batch's max event time.
        val live = if (ttlMs > 0) claimants.filter(c => tsMs(d) - c.tsMs <= ttlMs)
                   else claimants
        live.foreach { c =>
          if (c.vec_id != d.vec_id) {
            val cos = cosine4(c.emb, d.emb)
            if (cos >= tau)
              out += SemPair(math.min(c.vec_id, d.vec_id),
                math.max(c.vec_id, d.vec_id), cos,
                if (c.isBase) "delta_base" else "delta_delta")
          }
        }
        claimants = Claimant(d.vec_id, d.emb, isBase = false, tsMs(d)) :: claimants
        val liveCount = if (ttlMs > 0) claimants.count(c => tsMs(d) - c.tsMs <= ttlMs)
                        else claimants.size
        if (liveCount > maxCell) frozen = true
      }
    }
    if (!frozen && ttlMs > 0 && arrivals.nonEmpty) {
      val maxTs = arrivals.map(tsMs).max
      claimants = claimants.filter(c => maxTs - c.tsMs <= ttlMs)
    }
    state.update(if (frozen) CellState(Nil, frozen = true)
      else CellState(claimants, frozen = false))
    touchTimeout()
    if (frozen) Iterator.empty else out.result().iterator
  }

  /** The TTL-less verify (retain-forever default), kept as the named
    * batch-equivalence kernel the specs exercise directly. */
  def verifyCell(tau: Double, maxCell: Int)(
      key: Int,
      rows: Iterator[CellDoc],
      state: GroupState[CellState]): Iterator[SemPair] =
    verifyCellTtl(tau, maxCell, 0L)(key, rows, state)

  /** Map-side cell routing for a (vec_id, embedding) frame — the batch
    * path's assignment expression verbatim, reduced to the gate's
    * key + payload columns. */
  private def routed(frame: DataFrame, cents: Array[Array[Float]],
      tsCol: Option[String] = None): DataFrame = {
    val tsExpr = tsCol.map(c => col(c).cast("timestamp"))
      .getOrElse(lit(null).cast("timestamp"))
    frame
      .select(col("vec_id"), col("embedding"), tsExpr.as("ts"),
        SemDedup.centAssignStruct(cents).as("h"))
      .select(col("h.cell").as("cell"), col("vec_id"),
        col("embedding").as("emb"), col("ts"))
  }

  /** The resident base, grouped into the state store's initial state:
    * one [[CellState]] per cell holding the base members as claimants
    * — what the batch path calls the resident assignment fixture.
    * Under TTL, residents carry `baseTsMs` (the corpus snapshot's
    * event time) and age out of claims like any other claimant. */
  def seedState(spark: SparkSession, base: DataFrame,
      cents: Array[Array[Float]], baseTsMs: Long = 0L): Dataset[(Int, CellState)] = {
    import spark.implicits._
    routed(base, cents).as[CellDoc]
      .groupByKey(_.cell)
      .mapGroups((cell, it) => (cell,
        CellState(it.map(d => Claimant(d.vec_id, d.emb, isBase = true, baseTsMs)).toList,
          frozen = false)))
  }

  /** arrivals stream with (vec_id, embedding) → verified semantic
    * near-dup pairs (a < b, 4dp HALF_UP cosine, `leg` label), against
    * resident state seeded from `base` under the frozen `cents`.
    * With `tsCol` + a configured `stream.stateTtlSec`, the gate runs
    * under an event-time watermark and ages claimants/cells out per
    * [[verifyCellTtl]]; otherwise state is retained forever (exact
    * batch equivalence). */
  def semanticStream(spark: SparkSession, arrivals: Dataset[org.apache.spark.sql.Row],
      base: DataFrame, cents: Array[Array[Float]],
      tau: Double = SemDedup.SemTau,
      maxCell: Int = graft.config.GraftConfig.active.semdedup.maxCell,
      tsCol: Option[String] = None,
      ttlSec: Int = graft.config.GraftConfig.active.stream.stateTtlSec,
      baseTsMs: Long = 0L): Dataset[SemPair] = {
    import spark.implicits._
    val withTtl = tsCol.nonEmpty && ttlSec > 0
    val timeout = if (withTtl) GroupStateTimeout.EventTimeTimeout()
                  else GroupStateTimeout.NoTimeout()
    val init = seedState(spark, base, cents, if (withTtl) baseTsMs else 0L)
      .groupByKey(_._1).mapValues(_._2)
    val src0 = routed(arrivals.toDF(), cents, tsCol)
    // watermark on the PROJECTED ts attribute (a cast/alias sheds the
    // event-time tag, so tagging the source column would not survive)
    val src = if (withTtl) src0.withWatermark("ts", "0 seconds") else src0
    src.as[CellDoc]
      .groupByKey(_.cell)
      .flatMapGroupsWithState(OutputMode.Append(), timeout,
        init)(verifyCellTtl(tau, maxCell, if (withTtl) ttlSec * 1000L else 0L))
  }
}
