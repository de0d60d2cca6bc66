package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * `corpus_diff`: snapshot diff for corpus merges — given the PREVIOUS
 * corpus snapshot and the incoming one, classify every document as
 * `added` / `removed` / `changed` / `unchanged`. The audit a crawl
 * merge runs FIRST: `added` + `changed` is exactly the delta that
 * [[graft.dedup.Dedup.minhashPairsDelta]] signs and probes, `removed`
 * feeds index deletion ([[graft.index.IndexMaintenance]]), and a
 * wildly wrong added/removed ratio is the earliest signal a crawl
 * shipped truncated.
 *
 * Scale posture: each side reduces to (doc_id, digest) BEFORE the
 * join — a 16-byte MD5 rides the shuffle, never document text — and
 * the full-outer join hash-partitions on doc_id (co-partitionable
 * with the corpus layout, AQE-coalescible). Change detection compares
 * digests, so the plan never holds two copies of a document at once.
 *
 * Cross-engine: MD5 hex is identical in Spark and DuckDB (lowercase
 * both), and the status ladder is null/equality logic only.
 */
object CorpusDiff {

  /** (doc_id, status) for every document present in either snapshot. */
  def corpusDiff(oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    val o = oldSnap.select(col("doc_id"), md5(col("text")).as("fp_old"))
    val n = newSnap.select(col("doc_id"), md5(col("text")).as("fp_new"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "removed")
          .when(col("fp_old") =!= col("fp_new"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** The entry's deterministic snapshot carve (both engines replay
    * it from the documents table):
    *  - OLD is missing every `doc_id % 13 == 0` doc (→ `added` in the
    *    new snapshot) and carries a stale suffix on `doc_id % 5 == 0`
    *    docs (→ `changed` after the recrawl);
    *  - NEW is missing every `doc_id % 7 == 0` doc (→ `removed`).
    * Docs hit by both carves appear in neither snapshot and are
    * absent from the diff entirely. */
  def corpusDiffQuery(spark: SparkSession, sfDir: String): DataFrame =
    corpusDiffOn(Tables.documents(spark, sfDir).select(col("doc_id"), col("text")))

  /** The deterministic OLD-snapshot carve (constants from
    * [[graft.Carves]]; shared with the incremental-maintenance entry,
    * [[SignalsMaintenance]], so both tell one merge story over the
    * same snapshots). */
  def carveOld(docs: DataFrame): DataFrame =
    docs.filter(graft.Carves.inOld(col("doc_id")))
      .select(col("doc_id"),
        graft.Carves.oldText(col("doc_id"), col("text")).as("text"))

  /** The deterministic NEW-snapshot carve. */
  def carveNew(docs: DataFrame): DataFrame =
    docs.filter(graft.Carves.inNew(col("doc_id")))

  /** The NEW-snapshot carve as a DuckDB source clause. */
  val carveNewSql: String =
    s"(SELECT doc_id, text FROM documents WHERE ${graft.Carves.inNewSql("doc_id")}) newsnap"

  /** The entry's carve + diff over any (doc_id, text) frame (the
    * ramp's handle). */
  def corpusDiffOn(docs: DataFrame): DataFrame =
    corpusDiff(carveOld(docs), carveNew(docs))

  val corpusDiffSql: String =
    s"""WITH o AS (
       |  SELECT doc_id,
       |    md5(${graft.Carves.oldTextSql("doc_id", "text")}) AS fp_old
       |  FROM documents WHERE ${graft.Carves.inOldSql("doc_id")}),
       |n AS (SELECT doc_id, md5(text) AS fp_new FROM documents WHERE ${graft.Carves.inNewSql("doc_id")})
       |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       |  CASE WHEN o.fp_old IS NULL THEN 'added'
       |       WHEN n.fp_new IS NULL THEN 'removed'
       |       WHEN o.fp_old <> n.fp_new THEN 'changed'
       |       ELSE 'unchanged' END AS status
       |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""".stripMargin
}
