package graft.crypto

import org.apache.spark.sql.{DataFrame, functions => F}

/**
 * Key lifecycle bookkeeping as set-based queries over the versioned
 * record table (reference: `key/KeyUsageTracker`,
 * `key/SecureKeyDeletion`, `key/KeyRotationPolicy`). The RocksDB
 * counters of the reference become aggregates over the `kv` column —
 * partition-pruned when the table is partitioned by `kv`.
 */
object KeyLifecycle {

  /** Records per key version (usage tracker). */
  def keyUsage(records: DataFrame): DataFrame =
    records.groupBy(F.col("kv")).agg(F.count(F.lit(1)).as("n_records"))

  /** [[keyUsage]] for an explicit version list: versions with no rows
    * report 0 bound vectors (a tracker entry whose bindings are all
    * released), which the deletion audit below needs to see. */
  def keyUsage(records: DataFrame, versions: Seq[Int]): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    versions.toDF("kv")
      .join(records.groupBy("kv").agg(F.count(F.lit(1)).as("n_bound")), Seq("kv"), "left")
      .withColumn("n_bound", F.coalesce(F.col("n_bound"), F.lit(0L)))
  }

  /**
   * Safe deletion audit of key versions strictly below `keepVersion`
   * (reference `KeyManager.deleteKeysOlderThan` guarded by
   * `KeyUsageTracker.isSafeToDelete`): a version is deleted only when
   * NO vector is still bound to it — otherwise it is skipped with its
   * binding count, never breaking decryptability. The master key is
   * out of scope exactly as in the reference (stored separately, never
   * deleted, so any K_v stays re-derivable). Set-based: one groupBy
   * over the store replaces the tracker's mutable counters; the
   * decision is a pure column formula over the usage table.
   */
  def safeKeyDeletion(records: DataFrame, versions: Seq[Int], keepVersion: Int): DataFrame =
    keyUsage(records, versions)
      .withColumn("safe_to_delete", (F.col("n_bound") === 0).cast("int"))
      .withColumn("deleted",
        (F.col("kv") < keepVersion && F.col("n_bound") === 0).cast("int"))

  /**
   * Versions safe to delete: strictly older than `currentVersion`
   * and referenced by zero records (reference SafeKeyDeletion:
   * a key may be destroyed only when nothing remains encrypted
   * under it).
   */
  def deletableVersions(records: DataFrame, currentVersion: Int): Seq[Int] = {
    val used = keyUsage(records)
      .filter(F.col("n_records") > 0)
      .select("kv").collect().map(_.getInt(0)).toSet
    (1 until currentVersion).filterNot(used)
  }

  /** Rotation-due policy: version exceeded its operation budget (KeyRotationPolicy). */
  def rotationDue(records: DataFrame, version: Int, maxOps: Long): Boolean =
    keyUsage(records).filter(F.col("kv") === version)
      .select("n_records").collect().headOption.exists(_.getLong(0) >= maxOps)

  /**
   * Full rotation policy: due when the version exceeded its ops budget
   * OR its age (reference `KeyRotationServiceImpl` rotates on
   * `opsThreshold` or `ageThresholdMs` — config.json base:
   * 500000000 ops / 86400000 ms). `createdAtMs` is the version's
   * creation stamp from key metadata; `nowMs` is injected so the
   * policy is a pure, testable function.
   */
  def rotationDue(records: DataFrame, version: Int, maxOps: Long,
      createdAtMs: Long, nowMs: Long, ageThresholdMs: Long): Boolean =
    (nowMs - createdAtMs) >= ageThresholdMs || rotationDue(records, version, maxOps)
}
