package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextAnalysis

/**
 * `quality_signals_delta`: INCREMENTAL maintenance of the
 * materialize-once signals table ([[TextAnalysis.qualitySignals]] —
 * the RedPajama-V2 signals-as-data posture) across a corpus snapshot
 * merge. A recrawl should not re-score 100 TB: [[CorpusDiff]]
 * classifies every document by digest, signal rows for `unchanged`
 * docs are CARRIED from the resident signals table (signals depend
 * only on text, and equal digests mean equal text), and only
 * `added` + `changed` docs — the crawl-sized delta — pay the
 * signal-extraction text pass. `removed` docs drop out of the result
 * by construction (they are in neither branch).
 *
 * Scale posture: the text-scanning subtree touches ONLY the delta
 * (one map-only signals pass over delta docs); everything else moves
 * 16-byte digests or already-computed signal rows through doc_id
 * equi-joins (co-partitionable with the corpus layout, semi-join
 * form so no payload widens the shuffle). At 100 TB the resident
 * table is a warehouse table written when the base corpus was
 * scored; here [[graft.FixtureExport]] stages it once per JVM per
 * corpus so bench reps time the maintenance plan, not the base
 * build. The entry runs the PRODUCTION shape: it writes the
 * `corpus_diff` audit table first (staged per invocation — the
 * curateMaterialized honesty rule, so bench times the diff write a
 * real merge always pays) and routes maintenance off the staged
 * diff, so each status filter is a small-table scan and the digest
 * join runs exactly once. The self-contained [[signalsDelta]] form
 * (kept for the scale ramp and specs) instead evaluates the diff
 * subtree once per status filter — bounded by digest-only work but
 * two extra text scans. Sandbox honesty (SCALE_r09 `signals_delta`):
 * at KB-sized docs the maintenance plan's joins+md5 scans cost MORE
 * wall-clock than the map-only full signals pass it avoids
 * (5.6s vs 1.3s at 200k docs, though both ramp sublinearly); the
 * win needs per-doc text work to dominate shuffle cost — real
 * corpora, heavier signal sets, or digests stored at ingest (which
 * removes the md5 scans entirely).
 *
 * Correctness: the DuckDB oracle recomputes the FULL signals table
 * over the new snapshot ([[TextAnalysis.qualitySignalsSqlFrom]] over
 * the [[CorpusDiff.carveNewSql]] source) — so the bit-strict gate
 * itself checks the maintenance invariant `base-carry ∪ delta-score
 * == full recompute`, not just row shape. SignalsMaintenanceSpec
 * asserts the same equality in-engine plus the branch accounting
 * (carried + scored == result; scored == |added| + |changed|).
 */
object SignalsMaintenance {

  private def basePath(sfDir: String): String =
    graft.FixturePaths.stage("qsignals_base_" + sfDir.replaceAll("[^A-Za-z0-9.]+", "_"))

  /** Resident signals table for the OLD snapshot (staged once per
    * JVM per corpus — the production premise is that it already
    * exists). */
  private def residentBase(spark: SparkSession, sfDir: String,
      oldSnap: DataFrame): DataFrame = {
    val path = basePath(sfDir)
    graft.FixtureExport.ensure(s"qsignals:$sfDir", path) {
      TextAnalysis.qualitySignalsOn(oldSnap).write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }

  /** The merge given the MATERIALIZED diff (the production shape:
    * the merge writes the `corpus_diff` audit table first, then
    * maintenance routes off it — each status filter is a small-table
    * scan, and the digest join runs exactly once, upstream). */
  def signalsDeltaFromDiff(base: DataFrame, newSnap: DataFrame,
      diff: DataFrame): DataFrame = {
    val keepIds = diff.filter(col("status") === "unchanged").select("doc_id")
    val deltaIds = diff.filter(col("status").isin("added", "changed")).select("doc_id")
    base.join(keepIds, Seq("doc_id"), "left_semi")
      .unionByName(TextAnalysis.qualitySignalsOn(
        newSnap.join(deltaIds, Seq("doc_id"), "left_semi")))
  }

  /** Self-contained in-plan form (the scale ramp's handle): the diff
    * subtree is evaluated once per status filter — bounded by
    * digest-only work, but two extra text scans next to the staged
    * form the entry runs. */
  def signalsDelta(base: DataFrame, oldSnap: DataFrame, newSnap: DataFrame): DataFrame =
    signalsDeltaFromDiff(base, newSnap, CorpusDiff.corpusDiff(oldSnap, newSnap))

  def qualitySignalsDelta(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val oldSnap = CorpusDiff.carveOld(docs)
    val newSnap = CorpusDiff.carveNew(docs)
    // the merge's first act is writing the corpus_diff AUDIT table;
    // maintenance then reads it back — staged per invocation (mode
    // overwrite, the curateMaterialized honesty rule: bench reps time
    // the diff write too, it is part of every real merge)
    val diffPath = basePath(sfDir) + "_diff"
    CorpusDiff.corpusDiff(oldSnap, newSnap)
      .write.mode("overwrite").parquet(diffPath)
    signalsDeltaFromDiff(residentBase(spark, sfDir, oldSnap), newSnap,
      spark.read.parquet(diffPath))
  }

  /** Full recompute over the new snapshot — equality with the
    * incremental merge is the point of the check. */
  val qualitySignalsDeltaSql: String =
    TextAnalysis.qualitySignalsSqlFrom(CorpusDiff.carveNewSql)
}
