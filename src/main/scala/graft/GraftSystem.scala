package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.crypto.{KeyLifecycle, VersionedCrypto}
import graft.index.{IndexMaintenance, LshIndex}
import graft.lsh.{Lsh, LshModel, LshParams}
import graft.query.AnnQuery

/**
 * The reference's top-level system object as ONE switching surface:
 * `api/ForwardSecureANNSystem` sequences SETUP → INDEX → FINALIZE →
 * QUERY → staged insert → key rotation → selective re-encryption →
 * EXPORT (ARCHITECTURE.md lifecycle; ForwardSecureANNSystem.java),
 * and a reference user drives everything through that one handle.
 * [[GraftSystem]] is the same handle over graft's operators: every
 * verb delegates to the library plan the `SparkEntry` queries already
 * hash-verify, and the facade itself only sequences them — state is
 * an [[LshModel]], two [[LshIndex.Built]] (main + optional delta),
 * the plaintext serving view, the encrypted versioned store (the
 * system of record, exactly the reference's ciphertext filesystem),
 * and the current key version.
 *
 * Driver-side mutability is deliberate and mirrors the reference: the
 * reference is a single-node stateful server; on Spark the state
 * worth holding is just plan handles (DataFrames are lazy) plus two
 * ints. Everything data-sized stays distributed.
 */
final class GraftSystem private (
    val spark: SparkSession,
    val model: LshModel,
    val blockSize: Int,
    private var mainCodes: DataFrame,
    private var main: LshIndex.Built,
    private var serving: DataFrame,
    private var store: DataFrame,
    private var version: Int) {

  private var stagedCodes: Option[DataFrame] = None
  private var stagedData: Option[DataFrame] = None
  private var delta: Option[LshIndex.Built] = None
  private var deletedIds: Option[DataFrame] = None
  // ReencryptionTracker: ids touched since the last migration
  private var touched: Option[DataFrame] = None

  def currentVersion: Int = version

  /** The encrypted versioned store (id, kv, iv, ct, dim). */
  def encryptedStore: DataFrame = store

  /** QUERY: top-k per query over main + staged delta, honoring soft
    * deletes (reference `loadPointIfActive`). */
  def query(queries: DataFrame, k: Int): DataFrame = (delta, stagedData) match {
    case (Some(d), Some(sd)) =>
      // deletions thread through to refineFromProbes so they filter
      // before the candidate cap/rank — both paths return identical
      // results for identical state (reference loadPointIfActive)
      IndexMaintenance.lshTopKWithDelta(
        spark, serving, sd, queries, k, model, main, d, deletedIds)
    case _ =>
      AnnQuery.lshTopK(spark, serving, queries, k, model, main, deletedIds)
  }

  /** Staged INSERT (PartitionedIndexService.insert): code the batch,
    * delta-build it, append it to the encrypted store under the
    * current key — searchable immediately via [[query]]. */
  def insert(points: DataFrame): Unit = {
    val pts = points.select(col("vec_id"), col("embedding"))
    val codes = IndexMaintenance.stageCodes(pts, "vec_id", "embedding", model)
    stagedCodes = Some(stagedCodes.fold(codes)(_.unionByName(codes)))
    stagedData = Some(stagedData.fold(pts)(_.unionByName(pts)))
    delta = Some(IndexMaintenance.buildDelta(stagedCodes.get, blockSize))
    store = store.unionByName(
      VersionedCrypto.encrypt(pts, "vec_id", "embedding", version))
  }

  /** FINALIZE of the staged state (`finalizeForSearch`): fold the
    * delta into the main index — provably the from-scratch build. */
  def compactNow(): Unit = stagedCodes.foreach { sc =>
    mainCodes = mainCodes.unionByName(sc)
    main = LshIndex.build(mainCodes, blockSize)
    serving = serving.unionByName(stagedData.get)
    stagedCodes = None; stagedData = None; delta = None
  }

  /** Soft delete (reference metadata.isDeleted): drops from every
    * subsequent query; store and index untouched. */
  def delete(ids: DataFrame): Unit = {
    val d = ids.select(col("id"))
    deletedIds = Some(deletedIds.fold(d)(_.unionByName(d)))
  }

  /** Mark ids for lazy selective re-encryption (ReencryptionTracker). */
  def touch(ids: DataFrame): Unit = {
    val t = ids.select(col("id"))
    touched = Some(touched.fold(t)(_.unionByName(t)))
  }

  /** Key ROTATION + selective re-encryption: promote v+1 and migrate
    * exactly the touched set (KeyRotationServiceImpl posture — rows
    * outside it carry over byte-identical and migrate lazily when
    * next touched). */
  def rotateKeys(): Unit = {
    val t = touched.getOrElse(spark.range(0).select(col("id")))
    store = VersionedCrypto.rotate(store, t, version)
    version += 1
    touched = None
  }

  /** Storage accounting over the versioned store. */
  def storageReport(): DataFrame = VersionedCrypto.storageReport(store)

  /** kv histogram — the gate for safe key deletion. */
  def keyUsage(): DataFrame = KeyLifecycle.keyUsage(store)

  /** Versions deletable without losing any record. */
  def deletableVersions(upTo: Int): DataFrame =
    KeyLifecycle.safeKeyDeletion(store, (1 to upTo), version)

  /** Disaster recovery (`restoreIndexFromDisk`): rebuild the serving
    * view and index from the encrypted store alone — every present key
    * version decrypted under its own key. Returns a FRESH system. */
  def restore(): GraftSystem = {
    val versions = store.select(col("kv")).distinct()
      .collect().map(_.getInt(0)).sorted
    val vecs = versions.map { v =>
      VersionedCrypto.decrypt(store.filter(col("kv") === v), v)
        .select(col("id").as("vec_id"), col("vec").as("embedding"))
    }.reduce(_ unionByName _)
    val codes = LshIndex.codes(vecs, "vec_id", "embedding", model)
    val sys = new GraftSystem(spark, model, blockSize, codes,
      LshIndex.build(codes, blockSize), vecs, store, version)
    sys.deletedIds = deletedIds
    sys
  }

  /** Online serving (the reference's QueryServiceImpl.search loop):
    * a query STREAM answered per micro-batch against the current main
    * index — staged inserts serve through [[query]] until
    * [[compactNow]] folds them in. */
  def serveStream(queries: DataFrame, k: Int, outPath: String,
      checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.AnnServe.serve(queries, serving, k, model, main,
      outPath, checkpoint, trigger)

  /** EXPORT: store + index layout as parquet under `outDir`. */
  def export(outDir: String): Unit = {
    store.write.mode("overwrite").parquet(s"$outDir/store.parquet")
    main.membership.write.mode("overwrite").parquet(s"$outDir/membership.parquet")
    main.summaries.write.mode("overwrite").parquet(s"$outDir/summaries.parquet")
  }
}

object GraftSystem {
  /**
   * SETUP + INDEX + FINALIZE over a plaintext (vec_id, embedding)
   * corpus: fit the LSH family from a bounded sample, code and
   * greedy-build the index, encrypt the corpus into the versioned
   * store under key version `version`.
   */
  def setup(spark: SparkSession, data: DataFrame,
      params: LshParams = LshParams(), blockSize: Int = 64,
      version: Int = 1): GraftSystem = {
    val d = data.select(col("vec_id"), col("embedding"))
    val model = Lsh.fit(d, "embedding", params)
    val codes = LshIndex.codes(d, "vec_id", "embedding", model)
    new GraftSystem(spark, model, blockSize, codes,
      LshIndex.build(codes, blockSize), d,
      VersionedCrypto.encrypt(d, "vec_id", "embedding", version), version)
  }
}
