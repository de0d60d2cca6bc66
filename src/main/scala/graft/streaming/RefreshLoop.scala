package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.SemDedup
import graft.operators.Embeddings
import graft.query.{IvfSearch, MrlSearch}

/**
 * The §4 model-refresh loop as ONE production entry point — the
 * policy RefreshLoopSpec proves end-to-end, owned by the library
 * instead of re-derived by every pipeline owner from test code:
 *
 *   drift alarm ([[StreamingEmbedDrift]] history row) → [[refit]]
 *   (refit rotation + centroids over the merged corpus, swap the
 *   resident MRL tier in place — one forced map-only re-encode) →
 *   [[publish]] (zero-downtime serving swap between micro-batches) →
 *   [[report]] (the `dedup_semantic_refit` kernel: is the frozen
 *   semantic state blind to pairs the refit fit sees?) →
 *   [[thawIfGained]] (the full re-cluster, EXECUTED only when the
 *   report prices it in).
 *
 * Rules the loop owns so a caller no longer has to know them:
 *  - **the hash-shuffled fit sample** ([[RefreshLoop.refitCentroids]]):
 *    [[IvfSearch.fitCentroids]] seeds k-means from the head of vec_id
 *    order, and a head made entirely of pre-swap vectors never seeds
 *    a centroid inside the drifted cluster — Lloyd then
 *    single-captures the whole cluster into ONE oversized cell at any
 *    cell count (spec-measured 410-fill) and no guard can separate
 *    the assignments. Re-keying by `xxhash64(vec_id)` makes the fit
 *    head a uniform sample.
 *  - **√N cell re-resolution** for the grown merged corpus.
 *  - **the checkpoint-release discipline**: the two assignment
 *    localCheckpoints are released the moment the report's integers
 *    are driver-side (the `dedup_semantic_refit` rule —
 *    localCheckpoint blocks are not GC'd with the plan).
 *  - **the self-calibrated guard**: refit max cell fill + headroom,
 *    so the maxCell statistic tracks the corpus instead of a config
 *    constant going stale across generations.
 *
 * Publish is a separate step from refit because the SERVING swap has
 * a timing contract (between micro-batches — the ref is volatile and
 * each micro-batch reads it once); the lifecycle itself serves gen-2
 * from the moment [[refit]] returns.
 */
final class RefreshLoop(
    spark: SparkSession,
    life: MrlLifecycle,
    ref: AnnServe.MrlIndexRef,
    tau: Double = SemDedup.SemTau,
    guardHeadroom: Int = 16) {

  /** The refresh report: the thaw's pricing and the §4 decision. */
  case class RefitReport(guard: Int, pairsFrozen: Long, pairsRefit: Long,
      pairsCommon: Long) {
    def gained: Long = pairsRefit - pairsCommon
    def lost: Long = pairsFrozen - pairsCommon
    /** Thaw when the frozen state is BLIND to pairs the refit sees. */
    def shouldThaw: Boolean = gained > 0
  }

  /** The maintenance action the drift alarm triggers: ingest the
    * arrivals into the resident tier, refit rotation + centroids over
    * the merged corpus (hash-shuffled sample, √N cells), and swap the
    * tier's models in place (one forced map-only re-encode). Returns
    * the refit centroids — the gen-2 semantic fit the report and the
    * thaw both read. */
  def refit(merged: DataFrame, delta: DataFrame, batchId: Long = 0L,
      fitKey: Option[String] = None): Array[Array[Float]] = {
    val refitCents = RefreshLoop.refitCentroids(merged, fitKey)
    val dim = merged.select(size(col("embedding"))).head().getInt(0)
    val comps = Embeddings.mrlRotationOf(merged, dim / MrlSearch.PrefixShare)
    life.ingest(delta, batchId)
    life.reRotate(comps, Some(refitCents))
    refitCents
  }

  /** Zero-downtime publish: point the serving ref at the lifecycle's
    * current (gen-2) index. Call from the serving stream's afterBatch
    * hook to pin the micro-batch boundary it lands on. */
  def publish(): Unit = ref.idx = life.current

  /** The refresh report — [[SemDedup.pairFidelity]] under the frozen
    * vs the refit assignment, guard self-calibrated from the refit
    * fill (+ headroom for the next round's arrivals) unless pinned. */
  def report(merged: DataFrame, frozenCents: Array[Array[Float]],
      refitCents: Array[Array[Float]],
      guardOverride: Option[Int] = None): RefitReport = {
    val frozen = SemDedup.assignWithCentSim(merged, frozenCents)
      .select(col("vec_id"), col("cell")).localCheckpoint()
    val refit = SemDedup.assignWithCentSim(merged, refitCents)
      .select(col("vec_id"), col("cell")).localCheckpoint()
    try {
      val guard = guardOverride.getOrElse {
        // max over an EMPTY merged corpus is a null cell — degenerate
        // but not a crash: the guard collapses to the headroom alone
        val maxFill = Option(refit.groupBy("cell").count()
          .agg(max("count")).head().get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
        maxFill.toInt + guardHeadroom
      }
      val (nf, nr, common) = SemDedup.pairFidelity(merged, frozen, refit, tau, guard)
      RefitReport(guard, nf, nr, common)
    } finally {
      // the report is driver-side integers from here on; release even
      // when the guard/fidelity jobs throw
      SemDedup.releaseLocalCheckpoint(frozen)
      SemDedup.releaseLocalCheckpoint(refit)
    }
  }

  /** The thaw, executed ONLY when the report prices it in: the full
    * SemDeDup re-cluster of the merged corpus under the refit fit —
    * the gen-2 resident state future delta rounds probe. None = keep
    * the frozen state (the no-drift merge's honest verdict). */
  def thawIfGained(merged: DataFrame, refitCents: Array[Array[Float]],
      rep: RefitReport): Option[DataFrame] =
    if (rep.shouldThaw)
      Some(SemDedup.semanticDedupPlan(merged, refitCents, tau, rep.guard))
    else None

  /** The whole round in one call, for callers without a micro-batch
    * boundary to respect: refit → publish immediately → report →
    * thaw-if-gained. */
  def onDriftAlarm(merged: DataFrame, delta: DataFrame,
      frozenCents: Array[Array[Float]], batchId: Long = 0L,
      fitKey: Option[String] = None)
      : (Array[Array[Float]], RefitReport, Option[DataFrame]) = {
    val refitCents = refit(merged, delta, batchId, fitKey)
    publish()
    val rep = report(merged, frozenCents, refitCents)
    (refitCents, rep, thawIfGained(merged, refitCents, rep))
  }

  /** The result of the last monitor-triggered round ([[alarmHook]]):
    * (refit centroids, fidelity report, the executed thaw when gained
    * > 0) — what the pipeline owner reads after the stream drains. */
  @volatile var lastRound
      : Option[(Array[Array[Float]], RefitReport, Option[DataFrame])] = None

  private val alarmTaken = new java.util.concurrent.atomic.AtomicBoolean(false)

  /**
   * Wire a [[StreamingEmbedDrift]] monitor to this loop — the r14
   * verdict's last hand-wired step, closed: pass the returned function
   * as `driftStream(..., onAlarm = Some(loop.alarmHook(...)))` and the
   * alarm row fired in trigger T runs the refresh round BETWEEN T and
   * T+1 (foreachBatch is synchronous within its trigger — the same
   * boundary discipline [[publish]] uses on the serving stream).
   *
   * The round the hook runs is refit → report → thaw-iff-gained —
   * deliberately WITHOUT [[publish]]: the serving swap's timing
   * belongs to the SERVING stream's own afterBatch hook (this class's
   * header contract), and the lifecycle serves gen-2 from the moment
   * refit returns. A caller with no serving stream uses
   * [[onDriftAlarm]] instead, which publishes inline.
   *
   * @param base        the resident corpus the arrivals merge into
   * @param frozenCents the gen-1 semantic fit the report grades
   * @param arrivals    the delta accumulated when batch `id` fired —
   *                    for a file-source intake, a static read of the
   *                    landed files
   * Fires ONCE per loop instance (an alarm storm must not re-enter
   * k-means refits concurrently); re-arm by constructing a new loop
   * for the next corpus generation.
   */
  def alarmHook(base: DataFrame, frozenCents: Array[Array[Float]],
      arrivals: Long => DataFrame, fitKey: Option[String] = None)
      : (Long, DataFrame) => Unit =
    (batchId, _) =>
      if (alarmTaken.compareAndSet(false, true)) {
        val delta = arrivals(batchId)
        val merged = base.unionByName(delta)
        val refitCents = refit(merged, delta, batchId, fitKey)
        val rep = report(merged, frozenCents, refitCents)
        lastRound = Some((refitCents, rep, thawIfGained(merged, refitCents, rep)))
      }
}

object RefreshLoop {

  /** The refit fit rule (spec-found, §4 item 4): draw the k-means
    * sample HASH-SHUFFLED and re-resolve cells at √N of the grown
    * corpus. Exposed so batch refit jobs outside the loop share the
    * exact rule. */
  def refitCentroids(merged: DataFrame,
      fitKey: Option[String] = None): Array[Array[Float]] =
    IvfSearch.fitCentroids(
      merged.select(xxhash64(col("vec_id")).as("vec_id"), col("embedding")),
      IvfSearch.scaledCells(merged.count()), fitKey)
}
