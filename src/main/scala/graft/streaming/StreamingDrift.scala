package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.operators.CorpusStats

/**
 * Continuously-maintained quality-drift monitor: the streaming twin
 * of `quality_drift`, so the "is this crawl a different kind of text
 * than the served corpus?" alarm fires DURING intake instead of
 * after a batch pass — the monitoring half of the merge gate
 * ([[StreamingSignals]] maintains the rows, this maintains the
 * distribution view).
 *
 * Spark-first shape: the arriving docs run the SAME staged signal
 * pass and the SAME per-(signal, decile-bin) histogram aggregation
 * as the batch drift ([[CorpusStats.signalHist]], shared code — the
 * twin discipline), as a complete-mode streaming aggregation whose
 * keyed state is the ≤ |DriftSignals|×10-row histogram — CONSTANT in
 * the stream length, the [[StreamingCms]] fixed-state argument. Each
 * trigger joins the running delta histogram against the RESIDENT
 * base histogram (a tiny static table, computed once when the base
 * was scored) via [[CorpusStats.driftFromHists]] — integer-exact,
 * identical arithmetic to the batch report — and overwrites the
 * drift sink: after any prefix of arrivals the sink holds exactly
 * the batch `quality_drift` of that prefix (spec-asserted).
 */
object StreamingDrift {

  /** `baseHist` = [[CorpusStats.signalHist]] of the resident base
    * signals with columns (nb, sb) — in production a warehouse table
    * written when the base corpus was scored. */
  def driftStream(docs: DataFrame, baseHist: DataFrame, outPath: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val deltaHist = CorpusStats.signalHist(
      graft.text.TextAnalysis.signalsOver(docs, Seq("doc_id")), "nd", "sd")
    deltaHist.writeStream
      .outputMode(OutputMode.Complete())
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (hist: DataFrame, _: Long) =>
        if (!hist.isEmpty) {
          CorpusStats.driftFromHists(baseHist, hist)
            .coalesce(1).write.mode("overwrite").parquet(outPath)
        }
      }
      .start()
  }
}
