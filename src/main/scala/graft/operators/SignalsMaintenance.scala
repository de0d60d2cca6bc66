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
 * build.
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
    "/root/repo/tmp/stage/qsignals_base_" + sfDir.replaceAll("[^A-Za-z0-9.]+", "_")

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

  /** The merge over any (doc_id, text) corpus frame given a resident
    * base signals table (the ramp's handle takes the staged-read out
    * of the picture by passing the base frame directly). */
  def signalsDelta(base: DataFrame, oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    val diff = CorpusDiff.corpusDiff(oldSnap, newSnap)
    val keepIds = diff.filter(col("status") === "unchanged").select("doc_id")
    val deltaIds = diff.filter(col("status").isin("added", "changed")).select("doc_id")
    base.join(keepIds, Seq("doc_id"), "left_semi")
      .unionByName(TextAnalysis.qualitySignalsOn(
        newSnap.join(deltaIds, Seq("doc_id"), "left_semi")))
  }

  def qualitySignalsDelta(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val oldSnap = CorpusDiff.carveOld(docs)
    signalsDelta(residentBase(spark, sfDir, oldSnap), oldSnap, CorpusDiff.carveNew(docs))
  }

  /** Full recompute over the new snapshot — equality with the
    * incremental merge is the point of the check. */
  val qualitySignalsDeltaSql: String =
    TextAnalysis.qualitySignalsSqlFrom(CorpusDiff.carveNewSql)
}
