package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

import graft.query.{BqSearch, IvfSearch, MrlSearch, PqSearch, SqSearch}

/**
 * A quantized serving tier as the insert/delete/compact lifecycle sees
 * it: frozen models captured in the adapter instance, an index value
 * `I` that is a DETERMINISTIC encode of a (vec_id, embedding) row set.
 * That determinism is the whole contract — it is what makes
 * main ∪ staged-delta the same serving plan as one index over the
 * union, and a compaction bit-identical to a fresh encode of the
 * surviving rows (FAISS `add()` semantics: adding never refits;
 * refitting is an offline decision that re-encodes the corpus anyway).
 *
 * One adapter per tier ([[PqTier]], [[SqTier]], [[BqTier]],
 * [[MrlTier]]) closes the r9 gap where the maintenance story (staged
 * inserts, tombstones, compaction, the corpus-merge diff feed) existed
 * for PQ only — the machinery is written ONCE in [[QuantLifecycle]]
 * and the tiers differ exactly where they should: the encode, the
 * union, the cacheable artifacts, and the serving chain.
 */
trait QuantTier[I] {
  /** Frozen-model encode of a (vec_id, embedding) row set. */
  def encode(data: DataFrame): I

  /** Serve main ∪ delta as one index (legal because encode is a
    * deterministic map of the row set). */
  def union(main: I, delta: I): I

  /** The artifacts worth caching across triggers after a compaction
    * (codes / cells — the small tables the tier exists to keep small;
    * never the full-precision fetch side). */
  def parts(i: I): Seq[DataFrame]

  /** The tier's serving chain for a (vec_id, embedding) query batch,
    * with the tombstone contract: `deleted` (column `id`) anti-joins
    * the candidate table BEFORE the shortlist cap. */
  def serve(i: I, queries: DataFrame, k: Int, deleted: Option[DataFrame]): DataFrame
}

/**
 * Tier-generic auto-compacting insert/delete lifecycle — the machinery
 * behind [[PqLifecycle]], [[SqLifecycle]] and [[BqLifecycle]].
 *
 * Replay safety: a batch lands its raw vectors at
 * `stagedRoot/batch=<batchId>` with overwrite (idempotent under
 * foreachBatch redelivery); compaction never deletes FILES — it
 * advances the `compactedThrough` / `deletedThrough` high-water marks,
 * so a replayed already-compacted batch (or an already-consumed
 * tombstone set) is ignored by the listings. The
 * [[InsertLifecycle]]/[[StreamingIntake]] sink discipline.
 *
 * Deletion ([[delete]]/[[applyDiff]]): tombstones are effective
 * immediately on the serving path (anti-join before the shortlist cap
 * inside the tier's serve) and consumed physically at the next
 * compaction — the landing place for the merge trilogy's
 * `removed`/`changed` feed ([[graft.operators.CorpusDiff]]).
 *
 * Scale posture: ingest is one small parquet write + one count; the
 * staged delta is a lazy encode plan over the staged dirs, realized
 * only when served (k tiny inserts never cost O(k²) re-encodes);
 * compaction is one map-only encode pass over the vector union plus
 * the artifact caches, and it MATERIALIZES the surviving vectors
 * under `stagedRoot/compacted=<n>` and re-reads them — so the serving
 * plan's lineage depth is CONSTANT in the number of compactions (the
 * lazy union/anti-join chain of the r10 shape re-evaluated an N-deep
 * plan at the N+1st compaction: O(N²) cumulative recompute over a
 * stream's lifetime — the classic streaming-lineage leak, flagged by
 * the r10 VERDICT and fixed here with the same replay-safe directory
 * discipline the staged batches already use).
 */
class QuantLifecycle[I](
    spark: SparkSession,
    initialData: DataFrame,
    initial: I,
    initialTier: QuantTier[I],
    stagedRoot: String,
    compactEveryVectors: Long) {

  /** The active tier adapter (frozen models live inside it). Mutable
    * ONLY through [[swapTier]] — a model-refresh event (encoder swap,
    * rotation refit) installs a new adapter and immediately re-encodes,
    * so a serving snapshot never pairs an index with models that did
    * not produce it. */
  @volatile private var tier: QuantTier[I] = initialTier

  /** One immutable serving state, swapped in a SINGLE volatile write:
    * a reader that captures it once can never observe a torn
    * (index, high-water-mark) pair — the r10 ADVICE race where a new
    * mainIndex paired with an old compactedThrough double-counts
    * staged rows, or an old index pairs with an already-cleared
    * tombstone set and serves deleted rows. */
  private final class Snapshot(
      val mainData: DataFrame,
      val mainIndex: I,
      val compactedThrough: Long,
      val diffThrough: Long,
      val deletedThrough: Long,
      val nCompactions: Int)

  @volatile private var snap: Snapshot =
    new Snapshot(initialData.select(col("vec_id"), col("embedding")), initial,
      -1L, -1L, -1L, 0)
  // Monotone write-side counters (mutated under `synchronized` only;
  // volatile for reader visibility). A reader pairing a STALE counter
  // with a fresh snapshot (or vice versa) only narrows/extends the
  // staged/tombstone listings along their monotone axis — both
  // combinations serve a consistent corpus state, unlike the torn
  // snapshot fields above.
  @volatile private var maxSeen: Long = -1L
  @volatile private var diffSeq: Long = -1L
  @volatile private var deleteSeq: Long = -1L

  /** Compactions performed so far (observable for specs/monitoring). */
  def compactions: Int = snap.nCompactions

  private def existingDirs(prefix: String, from: Long, to: Long): Seq[String] =
    (from to to).map(i => s"$stagedRoot/$prefix=$i")
      .filter(d => new java.io.File(d).exists())

  private def deletedDirs(s: Snapshot): Seq[String] =
    existingDirs("deleted", s.deletedThrough + 1, deleteSeq)

  /** Outstanding tombstones (ids deleted since the last compaction),
    * or None when the index is tombstone-free. */
  def deletedIds: Option[DataFrame] = deletedIdsOf(snap)

  private def deletedIdsOf(s: Snapshot): Option[DataFrame] = {
    val dirs = deletedDirs(s)
    if (dirs.isEmpty) None else Some(spark.read.parquet(dirs: _*).select("id"))
  }

  /**
   * Soft-delete a set of vector ids (column `id` or `vec_id`). The
   * tombstone takes effect immediately on [[serve]] and is CONSUMED by
   * the next compaction, which drops the rows physically and clears
   * the tombstone set. Until that compaction a tombstone kills its id
   * everywhere — re-inserting a deleted id becomes visible only after
   * the compaction that consumes the tombstone (the [[applyDiff]]
   * changed-doc sequencing handles this by compacting between the
   * delete and the re-ingest).
   */
  def delete(ids: DataFrame): Unit = synchronized {
    val next = deleteSeq + 1
    val idCol = if (ids.columns.contains("id")) col("id") else col("vec_id").as("id")
    ids.select(idCol).write.mode("overwrite").parquet(s"$stagedRoot/deleted=$next")
    deleteSeq = next // published only after the write lands
  }

  /**
   * Apply a corpus-merge diff ([[graft.operators.CorpusDiff]] rows:
   * doc_id, status) to the serving tier:
   *  - `removed` and `changed` ids tombstone the resident rows (a
   *    changed doc's OLD vector is stale);
   *  - a compaction consumes the tombstones (physical drop, frozen
   *    models — deterministic encode of the surviving row set);
   *  - `added` + `changed` rows of the NEW snapshot ingest as a
   *    staged batch, servable immediately via the delta path.
   * After this call, serving equals a fresh index built over the new
   * snapshot's vectors with the same frozen models (spec-asserted per
   * tier).
   */
  def applyDiff(diff: DataFrame, newVectors: DataFrame): Unit = synchronized {
    val stale = diff.filter(col("status").isin("removed", "changed"))
      .select(col("doc_id").as("id"))
    // adds-only diffs skip the tombstone write AND the pre-ingest
    // compaction: an empty deleted=<n> dir would otherwise read as
    // deleted.nonEmpty and trigger a full corpus rewrite + re-encode
    // on EVERY applyDiff call (r11 ADVICE) — the stale-row sequencing
    // (tombstone → compact → re-ingest) only matters when a stale row
    // actually exists
    if (!stale.isEmpty) {
      delete(stale)
      compactNow()
    }
    val fresh = newVectors.select(col("vec_id"), col("embedding"))
      .join(diff.filter(col("status").isin("added", "changed"))
        .select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
    // out-of-band ingests stage under their OWN `diff=` namespace: a
    // streaming sink attached to this lifecycle numbers `batch=` dirs
    // with ITS foreachBatch counter, and a later redelivery of that id
    // would silently overwrite an applyDiff batch staged at
    // maxSeen + 1 (the r10 ADVICE collision)
    val next = diffSeq + 1
    fresh.write.mode("overwrite").parquet(s"$stagedRoot/diff=$next")
    diffSeq = next
    if (stagedVectors >= compactEveryVectors) compactNow()
  }

  private def stagedDirs(s: Snapshot): Seq[String] =
    existingDirs("batch", s.compactedThrough + 1, maxSeen) ++
      existingDirs("diff", s.diffThrough + 1, diffSeq)

  /** The uncompacted staged arrivals (streamed batches ∪ out-of-band
    * diff ingests), if any. */
  def stagedData: Option[DataFrame] = stagedDataOf(snap)

  private def stagedDataOf(s: Snapshot): Option[DataFrame] = {
    val dirs = stagedDirs(s)
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs: _*).select("vec_id", "embedding"))
  }

  def stagedVectors: Long = stagedData.map(_.count()).getOrElse(0L)

  /** The serving index: main-only after a compaction, main + lazily
    * encoded staged delta between them — same frozen models either
    * way, so search semantics never depend on compaction timing. */
  def current: I = currentOf(snap)

  private def currentOf(s: Snapshot): I = stagedDataOf(s) match {
    case None => s.mainIndex
    case Some(staged) => tier.union(s.mainIndex, tier.encode(staged))
  }

  /** foreachBatch entry: land the batch idempotently, then compact if
    * the staged set reached the threshold. */
  def ingest(batch: DataFrame, batchId: Long): Unit = synchronized {
    batch.select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(s"$stagedRoot/batch=$batchId")
    maxSeen = math.max(maxSeen, batchId)
    if (stagedVectors >= compactEveryVectors) compactNow()
  }

  /** Fold the staged set into the main index and CONSUME outstanding
    * tombstones: ONE frozen-model encode over the surviving vector
    * union (main ∪ staged, minus deleted). The survivors are WRITTEN
    * under `stagedRoot/compacted=<n>` (overwrite — replay-safe like
    * the batch dirs) and `mainData` re-reads that directory, so the
    * next compaction's encode scans one flat parquet table instead of
    * an ever-deeper union/anti-join lineage. Artifacts are cached and
    * materialized BEFORE the snapshot swap (a concurrent reader serves
    * the old state until the single volatile write below). A no-op
    * only when there is nothing staged AND nothing deleted. */
  def compactNow(): Unit = doCompact(force = false)

  /** Install a new tier adapter (fresh frozen models — the refit an
    * encoder swap forces) and re-encode the resident state under it in
    * ONE forced compaction, so serving is immediately consistent with
    * the new models. The staged/tombstone machinery is untouched: the
    * compaction consumes outstanding tombstones and folds staged
    * arrivals exactly as a threshold compaction would, just under the
    * new adapter. After this call, serving equals a fresh encode of
    * the surviving rows with the new models. */
  protected def swapTier(newTier: QuantTier[I]): Unit = synchronized {
    tier = newTier
    doCompact(force = true)
  }

  private def doCompact(force: Boolean): Unit = synchronized {
    val s = snap
    val staged = stagedDataOf(s)
    val deleted = deletedIdsOf(s)
    if (force || staged.nonEmpty || deleted.nonEmpty) {
      val union = staged.fold(s.mainData)(s.mainData.unionByName(_))
      val survivors = deleted.fold(union)(del =>
        union.join(broadcast(del.select(col("id").as("vec_id"))), Seq("vec_id"), "left_anti"))
      val gen = s.nCompactions + 1
      survivors.write.mode("overwrite").parquet(s"$stagedRoot/compacted=$gen")
      val newData = spark.read.parquet(s"$stagedRoot/compacted=$gen")
        .select(col("vec_id"), col("embedding"))
      val newIndex = tier.encode(newData)
      val cached = tier.parts(newIndex)
      cached.foreach(_.cache())
      cached.foreach(_.count()) // materialize before swapping the serving index
      val old = s.mainIndex
      snap = new Snapshot(newData, newIndex, maxSeen, diffSeq, deleteSeq, gen)
      tier.parts(old).foreach(_.unpersist())
      // GC compacted generations: without it a long-lived stream
      // accumulates O(nCompactions × corpus) on disk (r11 ADVICE).
      // gen-1 is RETAINED one extra cycle as recompute insurance — the
      // pre-swap snapshot's mainData and any cache-evicted partition
      // of its index parts re-scan that directory, and a reader that
      // captured the snapshot just before this swap may still be
      // executing against it. Anything ≤ gen-2 is two full
      // compactions stale; no supported reader reaches that far back.
      (1 to gen - 2).foreach(g =>
        graft.util.Io.deleteRecursively(s"$stagedRoot/compacted=$g"))
    }
  }

  /** Serve a (vec_id, embedding) query batch from the current state —
    * outstanding tombstones are excluded before the shortlist cap.
    * The snapshot is read ONCE, so the index and its tombstone set
    * are always the same generation. */
  def serve(queries: DataFrame, k: Int): DataFrame = {
    val s = snap
    tier.serve(currentOf(s), queries, k, deletedIdsOf(s))
  }

  /** Attach to a raw (vec_id, embedding) arrival stream. */
  def sink(arrivalStream: DataFrame, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    arrivalStream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) => ingest(batch, batchId) }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
}

/** IVF-PQ tier adapter: cells + subspace codes, ADC serving
  * ([[PqSearch.topKForQueries]]). */
final class PqTier(spark: SparkSession,
    cents: Array[Array[Float]], cb: Array[Array[Array[Float]]])
    extends QuantTier[PqSearch.PqIndex] {
  def encode(data: DataFrame): PqSearch.PqIndex = {
    val d = data.select(col("vec_id"), col("embedding"))
    val (cells, codes) = PqSearch.encode(spark, d, cents, cb)
    PqSearch.PqIndex(cells, codes, d, cents, cb)
  }
  def union(main: PqSearch.PqIndex, delta: PqSearch.PqIndex): PqSearch.PqIndex =
    PqSearch.PqIndex(main.cells.unionByName(delta.cells),
      main.codes.unionByName(delta.codes),
      main.fetch.unionByName(delta.fetch), cents, cb)
  def parts(i: PqSearch.PqIndex): Seq[DataFrame] = Seq(i.cells, i.codes)
  def serve(i: PqSearch.PqIndex, queries: DataFrame, k: Int,
      deleted: Option[DataFrame]): DataFrame =
    PqSearch.topKForQueries(spark,
      queries.select(col("vec_id").as("query_id"), col("embedding").as("qv")),
      i.cells, i.codes, i.fetch, i.cents, i.cb, k, deleted)
}

/** IVF-SQ8 tier adapter: cells + dequantized per-dim codes, ADC
  * serving ([[SqSearch.ivfsqTopKForQueries]]). */
final class SqTier(spark: SparkSession, cents: Array[Array[Float]],
    vmin: Array[Double], delta: Array[Double])
    extends QuantTier[SqSearch.SqIndex] {
  def encode(data: DataFrame): SqSearch.SqIndex =
    SqSearch.buildIndexOn(spark, data, cents, vmin, delta)
  def union(main: SqSearch.SqIndex, delta0: SqSearch.SqIndex): SqSearch.SqIndex =
    SqSearch.SqIndex(main.cells.unionByName(delta0.cells),
      main.dvecs.unionByName(delta0.dvecs),
      main.fetch.unionByName(delta0.fetch), cents, vmin, delta)
  def parts(i: SqSearch.SqIndex): Seq[DataFrame] = Seq(i.cells, i.dvecs)
  def serve(i: SqSearch.SqIndex, queries: DataFrame, k: Int,
      deleted: Option[DataFrame]): DataFrame =
    SqSearch.ivfsqTopKForQueries(spark, queries,
      i.cells, i.dvecs, i.fetch, i.cents, deleted, k)
}

/** 1-bit BQ tier adapter: packed sign words, Hamming-shortlist serving
  * ([[BqSearch.topKForQueries]]). The flat (exhaustive-Hamming) form —
  * BQ's code table IS the scan; cells compose in front of it at the
  * entry level, not in the maintenance state. */
final class BqTier(thr: Array[Double]) extends QuantTier[BqSearch.BqIndex] {
  def encode(data: DataFrame): BqSearch.BqIndex = {
    val d = data.select(col("vec_id"), col("embedding"))
    BqSearch.BqIndex(
      d.select(col("vec_id"), BqSearch.bqWords(col("embedding"), thr).as("words")),
      d, thr)
  }
  def union(main: BqSearch.BqIndex, delta: BqSearch.BqIndex): BqSearch.BqIndex =
    BqSearch.BqIndex(main.codes.unionByName(delta.codes),
      main.fetch.unionByName(delta.fetch), thr)
  def parts(i: BqSearch.BqIndex): Seq[DataFrame] = Seq(i.codes)
  def serve(i: BqSearch.BqIndex, queries: DataFrame, k: Int,
      deleted: Option[DataFrame]): DataFrame =
    BqSearch.topKForQueries(queries, i, deleted, k)
}

/**
 * IVF-SQ8 insert/delete/compact lifecycle — [[QuantLifecycle]] over
 * [[SqTier]]: the maintenance story the SQ8 serving tier was missing
 * (tombstone serving landed r10; this adds staged inserts, compaction,
 * and the corpus-merge diff feed, symmetric with [[PqLifecycle]]).
 */
final class SqLifecycle(
    spark: SparkSession,
    initialData: DataFrame,
    initial: SqSearch.SqIndex,
    stagedRoot: String,
    compactEveryVectors: Long)
  extends QuantLifecycle[SqSearch.SqIndex](spark, initialData, initial,
    new SqTier(spark, initial.cents, initial.vmin, initial.delta),
    stagedRoot, compactEveryVectors)

/**
 * 1-bit BQ insert/delete/compact lifecycle — [[QuantLifecycle]] over
 * [[BqTier]], completing the maintenance symmetry across all three
 * quantized serving tiers.
 */
final class BqLifecycle(
    spark: SparkSession,
    initialData: DataFrame,
    initial: BqSearch.BqIndex,
    stagedRoot: String,
    compactEveryVectors: Long)
  extends QuantLifecycle[BqSearch.BqIndex](spark, initialData, initial,
    new BqTier(initial.thr), stagedRoot, compactEveryVectors)

/** Rotated-prefix MRL tier adapter: IVF cells + the dim/4 rotated
  * prefix table, prefix-shortlist serving
  * ([[MrlSearch.ivfmrlTopKForQueries]]). */
final class MrlTier(spark: SparkSession,
    cents: Array[Array[Float]], comps: Array[(Array[Double], Double)])
    extends QuantTier[MrlSearch.MrlIndex] {
  def encode(data: DataFrame): MrlSearch.MrlIndex =
    MrlSearch.buildIndexOn(spark, data, cents, comps)
  def union(main: MrlSearch.MrlIndex, delta: MrlSearch.MrlIndex): MrlSearch.MrlIndex =
    MrlSearch.MrlIndex(main.cells.unionByName(delta.cells),
      main.pvecs.unionByName(delta.pvecs),
      main.fetch.unionByName(delta.fetch), cents, comps)
  def parts(i: MrlSearch.MrlIndex): Seq[DataFrame] = Seq(i.cells, i.pvecs)
  def serve(i: MrlSearch.MrlIndex, queries: DataFrame, k: Int,
      deleted: Option[DataFrame]): DataFrame =
    MrlSearch.ivfmrlTopKForQueries(spark, queries,
      i.cells, i.pvecs, i.fetch, i.cents, i.comps, deleted, k)
}

/**
 * Rotated-prefix MRL insert/delete/compact lifecycle —
 * [[QuantLifecycle]] over [[MrlTier]], giving the fourth serving tier
 * the same maintenance story as SQ8/PQ/BQ. What makes this tier's
 * lifecycle special is the ENCODER-SWAP path ([[reRotate]]): its only
 * models are the IVF centroids and the PCA rotation, and the rotation
 * refit is a PcaSampleN-BOUNDED sample fit (driver-side
 * eigendecomposition) — not SQ8's full-corpus per-dim parameter pass
 * and not PQ's multi-pass codebook k-means. After an encoder swap the
 * recovery is: refit on a bounded sample of the re-embedded corpus,
 * then ONE map-only re-projection (a compaction under the new tier) —
 * the cheapest model-refresh of any fitted tier, which is exactly the
 * scenario [[graft.operators.Embeddings.embedDriftQuery]] exists to
 * detect (spec: MrlSpec encoder-swap recovery, QuantLifecycleSpec
 * reRotate serving equality).
 */
final class MrlLifecycle(
    spark: SparkSession,
    initialData: DataFrame,
    initial: MrlSearch.MrlIndex,
    stagedRoot: String,
    compactEveryVectors: Long)
  extends QuantLifecycle[MrlSearch.MrlIndex](spark, initialData, initial,
    new MrlTier(spark, initial.cents, initial.comps),
    stagedRoot, compactEveryVectors) {

  private var curCents: Array[Array[Float]] = initial.cents

  /** Swap the rotation (and optionally the centroids) in place: one
    * forced compaction re-encodes main ∪ staged (minus tombstones)
    * under the new models — a single map-only projection pass over the
    * resident vectors, no per-dim corpus pass, no codebook k-means.
    * After this call, serving equals a fresh [[MrlSearch.buildIndexOn]]
    * over the surviving rows with the new models (spec-asserted). */
  def reRotate(comps: Array[(Array[Double], Double)],
      cents: Option[Array[Array[Float]]] = None): Unit = synchronized {
    curCents = cents.getOrElse(curCents)
    swapTier(new MrlTier(spark, curCents, comps))
  }
}
