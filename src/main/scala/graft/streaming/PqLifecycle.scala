package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.query.PqSearch
import graft.query.PqSearch.PqIndex

/**
 * Auto-compacting PQ insert lifecycle — the IVF-PQ twin of
 * [[InsertLifecycle]], closing the gap where continuously-arriving
 * vectors were servable by the LSH delta path but not by the PQ
 * representation that is the actual 100 TB serving shape.
 *
 * The models (IVF centroids + per-subspace codebooks) are FROZEN at
 * construction: arrivals are encoded with them (FAISS `add()`
 * semantics — adding never refits; refitting is an offline decision
 * that re-encodes the corpus anyway). Because [[PqSearch.encode]] is
 * a deterministic map of the row set, serving main ∪ staged-delta is
 * the SAME plan as serving one index over the union, and a compaction
 * is bit-identical to a fresh encode of the combined corpus — the
 * exact property [[graft.index.IndexMaintenance.compact]] gives the
 * LSH path, asserted in PqLifecycleSpec.
 *
 * Replay safety: a batch lands its raw vectors at
 * `stagedRoot/batch=<batchId>` with overwrite (idempotent under
 * foreachBatch redelivery); compaction never deletes FILES — it
 * advances the `compactedThrough` / `deletedThrough` high-water
 * marks, so a replayed already-compacted batch (or an already-consumed
 * tombstone set) is ignored by the listings. The
 * [[InsertLifecycle]]/[[StreamingIntake]] sink discipline.
 *
 * DELETION ([[delete]]/[[applyDiff]]): tombstones are effective
 * immediately on the serving path (anti-join before the ADC cap) and
 * consumed physically at the next compaction — the landing place for
 * the merge trilogy's `removed`/`changed` feed
 * ([[graft.operators.CorpusDiff]]).
 *
 * Scale posture: ingest is one small parquet write + one count; the
 * staged delta is a lazy encode plan over the staged dirs, realized
 * only when served (k tiny inserts never cost O(k²) re-encodes);
 * compaction is one map-only encode pass over the vector union plus
 * the two caches. Codes are ~13 bytes/vector — the main index the
 * lifecycle re-caches is exactly the artifact PQ exists to keep small.
 */
final class PqLifecycle(
    spark: SparkSession,
    initialData: DataFrame,
    initial: PqIndex,
    stagedRoot: String,
    compactEveryVectors: Long) {

  @volatile private var mainData: DataFrame =
    initialData.select(col("vec_id"), col("embedding"))
  @volatile private var mainCells: DataFrame = initial.cells
  @volatile private var mainCodes: DataFrame = initial.codes
  @volatile private var compactedThrough: Long = -1L
  @volatile private var maxSeen: Long = -1L
  @volatile private var nCompactions: Int = 0
  @volatile private var deleteSeq: Long = -1L
  @volatile private var deletedThrough: Long = -1L

  /** Compactions performed so far (observable for specs/monitoring). */
  def compactions: Int = nCompactions

  private def deletedDirs: Seq[String] =
    ((deletedThrough + 1) to deleteSeq)
      .map(i => s"$stagedRoot/deleted=$i")
      .filter(d => new java.io.File(d).exists())

  /** Outstanding tombstones (ids deleted since the last compaction),
    * or None when the index is tombstone-free. */
  def deletedIds: Option[DataFrame] = {
    val dirs = deletedDirs
    if (dirs.isEmpty) None else Some(spark.read.parquet(dirs: _*).select("id"))
  }

  /**
   * Soft-delete a set of vector ids (column `id` or `vec_id`). The
   * tombstone takes effect immediately on [[serve]] (the anti-join
   * runs BEFORE the ADC cap inside [[PqSearch.topKForQueries]] — the
   * IndexMaintenance ordering) and is CONSUMED by the next
   * compaction, which drops the rows physically and clears the
   * tombstone set. Until that compaction a tombstone kills its id
   * everywhere — re-inserting a deleted id becomes visible only after
   * the compaction that consumes the tombstone (the [[applyDiff]]
   * changed-doc sequencing handles this by compacting between the
   * delete and the re-ingest).
   */
  def delete(ids: DataFrame): Unit = synchronized {
    deleteSeq += 1
    val idCol = if (ids.columns.contains("id")) col("id") else col("vec_id").as("id")
    ids.select(idCol).write.mode("overwrite").parquet(s"$stagedRoot/deleted=$deleteSeq")
  }

  /**
   * Apply a corpus-merge diff ([[graft.operators.CorpusDiff]] rows:
   * doc_id, status) to the serving tier — the maintenance round the
   * merge trilogy's `removed` feed was missing a landing place for:
   *  - `removed` and `changed` ids tombstone the resident rows (a
   *    changed doc's OLD vector is stale);
   *  - a compaction consumes the tombstones (physical drop, frozen
   *    models — deterministic encode of the surviving row set);
   *  - `added` + `changed` rows of the NEW snapshot ingest as a
   *    staged batch, servable immediately via the delta path.
   * After this call, serving equals a fresh index built over the new
   * snapshot's vectors with the same frozen models (spec-asserted).
   */
  def applyDiff(diff: DataFrame, newVectors: DataFrame): Unit = synchronized {
    delete(diff.filter(col("status").isin("removed", "changed"))
      .select(col("doc_id").as("id")))
    compactNow()
    val fresh = newVectors.select(col("vec_id"), col("embedding"))
      .join(diff.filter(col("status").isin("added", "changed"))
        .select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
    ingest(fresh, maxSeen + 1)
  }

  private def stagedDirs: Seq[String] =
    ((compactedThrough + 1) to maxSeen)
      .map(i => s"$stagedRoot/batch=$i")
      .filter(d => new java.io.File(d).exists())

  /** The uncompacted staged arrivals, if any. */
  def stagedData: Option[DataFrame] = {
    val dirs = stagedDirs
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs: _*).select("vec_id", "embedding"))
  }

  def stagedVectors: Long = stagedData.map(_.count()).getOrElse(0L)

  /** The serving index: main-only after a compaction, main + lazily
    * encoded staged delta between them — same models either way, so
    * search semantics never depend on compaction timing. */
  def current: PqIndex = stagedData match {
    case None => PqIndex(mainCells, mainCodes, mainData, initial.cents, initial.cb)
    case Some(staged) =>
      val (dCells, dCodes) = PqSearch.encode(spark, staged, initial.cents, initial.cb)
      PqIndex(mainCells.unionByName(dCells), mainCodes.unionByName(dCodes),
        mainData.unionByName(staged), initial.cents, initial.cb)
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
    * union (main ∪ staged, minus deleted), cached and materialized
    * before the swap. A no-op only when there is nothing staged AND
    * nothing deleted. */
  def compactNow(): Unit = synchronized {
    val staged = stagedData
    val deleted = deletedIds
    if (staged.nonEmpty || deleted.nonEmpty) {
      val union = staged.fold(mainData)(mainData.unionByName(_))
      val newData = deleted.fold(union)(del =>
        union.join(org.apache.spark.sql.functions.broadcast(
          del.select(col("id").as("vec_id"))), Seq("vec_id"), "left_anti"))
      val (cells, codes) = PqSearch.encode(spark, newData, initial.cents, initial.cb)
      val cCells = cells.cache(); val cCodes = codes.cache()
      cCells.count(); cCodes.count() // materialize before swapping the serving index
      val (oldCells, oldCodes) = (mainCells, mainCodes)
      mainData = newData
      mainCells = cCells
      mainCodes = cCodes
      compactedThrough = maxSeen
      deletedThrough = deleteSeq
      nCompactions += 1
      oldCells.unpersist()
      oldCodes.unpersist()
    }
  }

  /** Serve a (vec_id, embedding) query batch from the current state —
    * outstanding tombstones are excluded before the shortlist cap. */
  def serve(queries: DataFrame, k: Int): DataFrame = {
    val idx = current
    PqSearch.topKForQueries(spark,
      queries.select(col("vec_id").as("query_id"), col("embedding").as("qv")),
      idx.cells, idx.codes, idx.fetch, idx.cents, idx.cb, k, deletedIds)
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
