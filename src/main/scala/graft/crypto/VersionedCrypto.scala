package graft.crypto

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.BinaryPack.{pack_floats, unpack_floats}
import graft.functions.VectorFunctions.vec_l2

/**
 * Forward-secure versioned encryption of vector records, re-expressed
 * as set-based columnar jobs (reference: fspann
 * `crypto/AesGcmCryptoService`, `keymanagement/KeyRotationServiceImpl`,
 * `ReencryptionTracker`).
 *
 * Semantics preserved:
 *  - K_v = PRF(K_master, v) via HMAC-SHA256, derived driver-side and
 *    shipped as literals (keys are KBs; never in a shuffle);
 *  - records are (id, kv, iv, ct, dim) with AES-GCM and AAD = id, so
 *    a ciphertext cannot be replayed under another id;
 *  - rotation promotes the version without touching the LSH index
 *    (codes are computed over plaintext at ingest; the index keys by
 *    id only);
 *  - selective re-encryption migrates exactly the touched set: the
 *    untouched partition of the table is carried over byte-identical.
 *
 * The RocksDB point-store of the reference becomes a parquet table
 * partitioned by `kv` — rotation is a partition-pruned batch job, not
 * point writes, which is the 100 TB-friendly posture.
 *
 * IVs are 12-byte deterministic PRF(id, kv) values (reference derives
 * per-record IVs; GCM requires uniqueness per key, which (id, kv)
 * provides since an id is re-encrypted at most once per version).
 * Spark's `aes_encrypt` emits iv||ct||tag, `aes_decrypt` consumes it.
 */
object VersionedCrypto {

  val MasterKeyHex = "000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f"

  /** K_v = HMAC-SHA256(K_master, "key:" + v), truncated to AES-128. */
  def deriveKey(masterHex: String, version: Int): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(hexToBytes(masterHex), "HmacSHA256"))
    mac.doFinal(s"key:$version".getBytes("UTF-8")).take(16)
  }

  private def hexToBytes(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  /** Deterministic 12-byte IV column: first 12 bytes of SHA-256(id || ':' || kv). */
  private def ivCol(id: Column, kv: Column): Column =
    unhex(substring(sha2(concat(id.cast("string"), lit(":"), kv.cast("string")), 256), 1, 24))

  /** Encrypt (id, vec) under key version `version` -> (id, kv, iv, ct, dim). */
  def encrypt(df: DataFrame, idCol: String, vecCol: String, version: Int): DataFrame = {
    val key = lit(deriveKey(MasterKeyHex, version))
    val id = col(idCol).cast("long")
    val kv = lit(version)
    val iv = ivCol(id, kv)
    df.select(
      id.as("id"),
      kv.as("kv"),
      iv.as("iv"),
      aes_encrypt(pack_floats(col(vecCol)), key, lit("GCM"), lit("DEFAULT"), iv,
        id.cast("string").cast("binary")).as("ct"),
      size(col(vecCol)).as("dim"))
  }

  /** Decrypt (id, kv, ct) rows of a single key version back to vectors. */
  def decrypt(df: DataFrame, version: Int): DataFrame = {
    val key = lit(deriveKey(MasterKeyHex, version))
    df.withColumn("vec",
      unpack_floats(aes_decrypt(col("ct"), key, lit("GCM"), lit("DEFAULT"),
        col("id").cast("string").cast("binary"))))
  }

  /**
   * Rotate v -> v+1 for exactly the `touched` ids (selective
   * re-encryption): decrypt touched under v, re-encrypt under v+1,
   * union with untouched rows carried over unchanged.
   */
  def rotate(records: DataFrame, touched: DataFrame, fromVersion: Int): DataFrame = {
    val t = touched.select(col("id")).distinct()
    // rows at other versions are never candidates; fromVersion rows
    // outside the touched set carry over byte-identical
    val carried = records.filter(col("kv") =!= fromVersion)
      .unionByName(records.filter(col("kv") === fromVersion).join(t, Seq("id"), "left_anti"))
    carried.unionByName(reencryptOnly(records, touched, fromVersion))
  }

  /**
   * Migrate EVERY touched row to `toVersion`, each decrypted under its
   * own actual key version — the facade-rotation variant for stores
   * where touched rows have fallen behind (touched at v1, never
   * rotated while the version advanced). [[rotate]] migrates only
   * current-version rows (the single-version drain unit); this one
   * leaves no touched row behind, so a tracker clearing after it is
   * sound. The per-version loop is driver-side over the DISTINCT kv
   * set among touched rows — bounded by the key-version count (a few
   * ints), never data-sized.
   */
  def rotateAllVersions(records: DataFrame, touched: DataFrame,
      toVersion: Int): DataFrame = {
    val t = touched.select(col("id")).distinct()
    val touchedRows = records.join(t, Seq("id"), "left_semi")
    val untouched = records.join(t, Seq("id"), "left_anti")
    val versions = touchedRows.select(col("kv")).distinct()
      .collect().map(_.getInt(0)).sorted
    versions.foldLeft(untouched) { (acc, v) =>
      acc.unionByName(encrypt(
        decrypt(touchedRows.filter(col("kv") === v), v)
          .select(col("id"), col("vec")),
        "id", "vec", toVersion))
    }
  }

  /**
   * ONLY the migrated rows for `touched`: decrypt under v, re-encrypt
   * under v+1. The unit of work of the lazy background drain
   * ([[graft.streaming.ReencryptionDrain]]); [[rotate]] = this plus
   * the untouched carry-over. Rows not at `fromVersion` are left out
   * (they cannot be decrypted under v's key).
   */
  def reencryptOnly(records: DataFrame, touched: DataFrame, fromVersion: Int): DataFrame = {
    val touchedRows = records.filter(col("kv") === fromVersion)
      .join(touched.select(col("id")).distinct(), Seq("id"), "left_semi")
    encrypt(
      decrypt(touchedRows, fromVersion).select(col("id"), col("vec")),
      "id", "vec", fromVersion + 1)
  }

  // ---- SparkEntry wiring over the embeddings table ----

  /** Encrypted-points metadata view; ct layout is iv||ciphertext||tag. */
  def encryptPoints(spark: SparkSession, sfDir: String): DataFrame =
    encrypt(Tables.embeddings(spark, sfDir), "vec_id", "embedding", 1)
      .select(col("id"), col("kv"), col("dim"),
        length(col("iv")).as("iv_len"), length(col("ct")).as("ct_len"))

  val encryptPointsSql: String =
    """SELECT vec_id AS id, 1 AS kv, CAST(len(embedding) AS INTEGER) AS dim,
      |  12 AS iv_len, CAST(12 + 4 * len(embedding) + 16 AS INTEGER) AS ct_len
      |FROM embeddings""".stripMargin

  /**
   * Decrypt-and-refine roundtrip: encrypted store -> decrypt -> exact
   * L2 top-k. Must equal brute force over plaintext (the oracle).
   */
  def decryptRefine(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val store = encrypt(emb, "vec_id", "embedding", 1)
    val decrypted = decrypt(store, 1).select(col("id").as("vec_id"), col("vec").as("embedding"))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val w = Window.partitionBy("query_id").orderBy(col("dist"), col("vec_id"))
    decrypted.join(broadcast(queries))
      .withColumn("dist", vec_l2(col("embedding"), col("qv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("query_id"), col("vec_id"), round(col("dist"), 4).as("dist"), col("rnk"))
  }

  val decryptRefineSql: String =
    """SELECT query_id, vec_id, ROUND(dist, 4) AS dist, rnk FROM (
      |  SELECT q.vec_id AS query_id, e.vec_id, d.dist,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY d.dist, e.vec_id) AS INTEGER) AS rnk
      |  FROM embeddings q CROSS JOIN embeddings e,
      |    LATERAL (SELECT list_distance(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS dist) d
      |  WHERE q.vec_id < 5)
      |WHERE rnk <= 10""".stripMargin

  /**
   * Key rotation v1 -> v2 with touched set = ids divisible by 10
   * (deterministic stand-in for a query's ReencryptionTracker set).
   */
  def keyRotation(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val store = encrypt(emb, "vec_id", "embedding", 1)
    val touched = emb.filter(col("vec_id") % 10 === 0).select(col("vec_id").as("id"))
    rotate(store, touched, fromVersion = 1)
      .select(col("id"), col("kv"), col("dim"), length(col("ct")).as("ct_len"))
  }

  val keyRotationSql: String =
    """SELECT vec_id AS id,
      |  CASE WHEN vec_id % 10 = 0 THEN 2 ELSE 1 END AS kv,
      |  CAST(len(embedding) AS INTEGER) AS dim,
      |  CAST(12 + 4 * len(embedding) + 16 AS INTEGER) AS ct_len
      |FROM embeddings""".stripMargin

  // ---- safe key deletion (audit logic lives in [[KeyLifecycle]]) ----

  /**
   * Deterministic lifecycle scenario for the audit: encrypt all at v1,
   * selectively rotate the even ids to v2, then purge the odd ids from
   * the store (a data-deletion pass — the situation that actually
   * frees old keys). v1 ends with zero bound vectors -> deleted; v2
   * holds the survivors -> kept.
   */
  def keyDeletion(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val store = encrypt(emb, "vec_id", "embedding", 1)
    val rotated = rotate(store, emb.filter(col("vec_id") % 2 === 0).select(col("vec_id").as("id")), 1)
    val purged = rotated.filter(col("id") % 2 === 0)
    KeyLifecycle.safeKeyDeletion(purged, versions = Seq(1, 2), keepVersion = 2)
      .orderBy("kv")
  }

  val keyDeletionSql: String =
    """SELECT 1 AS kv, 0 AS n_bound, 1 AS safe_to_delete, 1 AS deleted
      |UNION ALL
      |SELECT 2, COUNT(*), 0, 0 FROM embeddings WHERE vec_id % 2 = 0""".stripMargin

  // ---- storage accounting + re-encryption reporting ----

  /**
   * Storage accounting per key version (reference `StorageMetrics` /
   * `PathStorageSizer`: the RocksDB sizer walks files; here storage IS
   * the versioned table, so sizing is a partition-pruned aggregate —
   * record counts and ciphertext/IV byte totals per `kv`).
   */
  def storageReport(records: DataFrame): DataFrame =
    records.groupBy("kv").agg(
      count(lit(1)).as("n_records"),
      sum(length(col("ct")).cast("long")).as("ct_bytes"),
      sum(length(col("iv")).cast("long")).as("iv_bytes"))

  /** [[storageReport]] over the standard rotation scenario (sql oracle). */
  def storageReportQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val store = encrypt(emb, "vec_id", "embedding", 1)
    val touched = emb.filter(col("vec_id") % 10 === 0).select(col("vec_id").as("id"))
    storageReport(rotate(store, touched, fromVersion = 1)).orderBy("kv")
  }

  val storageReportSql: String =
    """SELECT CASE WHEN vec_id % 10 = 0 THEN 2 ELSE 1 END AS kv,
      |  COUNT(*) AS n_records,
      |  CAST(SUM(12 + 4 * len(embedding) + 16) AS BIGINT) AS ct_bytes,
      |  CAST(SUM(12) AS BIGINT) AS iv_bytes
      |FROM embeddings GROUP BY 1""".stripMargin

  /**
   * One-row summary of a selective re-encryption run (reference
   * `common/ReencryptReport`): how many records the touched set
   * migrated to the new version and how many carried over — the
   * numbers an operator checks after a rotation job.
   */
  def reencReport(after: DataFrame, fromVersion: Int): DataFrame = {
    val toVersion = fromVersion + 1
    after.agg(
      lit(fromVersion).as("from_version"),
      lit(toVersion).as("to_version"),
      sum((col("kv") === toVersion).cast("long")).as("migrated"),
      sum((col("kv") === fromVersion).cast("long")).as("untouched"),
      count(lit(1)).as("total"))
  }

  /** [[reencReport]] over the standard rotation scenario (sql oracle). */
  def reencReportQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val store = encrypt(emb, "vec_id", "embedding", 1)
    val touched = emb.filter(col("vec_id") % 10 === 0).select(col("vec_id").as("id"))
    reencReport(rotate(store, touched, fromVersion = 1), fromVersion = 1)
  }

  val reencReportSql: String =
    """SELECT 1 AS from_version, 2 AS to_version,
      |  COUNT(*) FILTER (WHERE vec_id % 10 = 0) AS migrated,
      |  COUNT(*) FILTER (WHERE vec_id % 10 != 0) AS untouched,
      |  COUNT(*) AS total
      |FROM embeddings""".stripMargin
}
