package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.operators.Embeddings

/**
 * Continuously-maintained EMBEDDING-drift monitor: the streaming twin
 * of `embed_drift`, completing the drift pair — `quality_drift` got
 * its live monitor in [[StreamingDrift]]; this is the embedding
 * side's. The moment it exists for is an encoder swap MID-INTAKE: a
 * deployment rollout that changes normalization, a silently updated
 * model checkpoint, a fine-tune pushed to the embedding service — the
 * per-dim mean shifts, sign flips, and freshly-collapsed dimensions
 * show up in the NEXT trigger's report, before a single drifted
 * vector is folded into the resident index (re-indexing 100 TB
 * against a drifted encoder poisons every distance in the store).
 *
 * Spark-first shape (the [[StreamingDrift]] pattern exactly): the
 * arriving vectors run the SAME dim-keyed partial aggregation as the
 * batch diagnostics ([[Embeddings.embedDiagnostics]], shared code —
 * the twin discipline) as a complete-mode streaming aggregation whose
 * keyed state is `dim` rows — CONSTANT in the stream length. Each
 * trigger joins the running delta diagnostics against the RESIDENT
 * base diagnostics (a dim-sized static table, computed once when the
 * base corpus was embedded) via [[Embeddings.driftFromDiags]] —
 * identical arithmetic to the batch report — and overwrites the
 * drift sink: after any prefix of arrivals the sink holds exactly
 * the batch `embed_drift` of that prefix (spec-asserted).
 */
object StreamingEmbedDrift {

  /** The default alarm predicate for [[driftStream]]'s `onAlarm`
    * hook: ANY drifted dimension trips it — per-dim drift flags are
    * already thresholded by [[Embeddings.driftFromDiags]], so one
    * flagged dim is a real encoder-behavior change, not noise. */
  def defaultAlarm(report: DataFrame): Boolean =
    report.filter(org.apache.spark.sql.functions.col("drifted") === 1)
      .limit(1).count() > 0

  /**
   * @param vecs      streaming (vec_id, embedding) arrivals
   * @param baseDiag  [[Embeddings.embedDiagnostics]] of the resident
   *                  corpus — in production a warehouse table written
   *                  when the base was embedded
   * @param outPath   the monitor sink (overwritten per trigger: it
   *                  always holds the CURRENT report)
   * @param history   optional audit trail: each trigger's report also
   *                  lands at `history/batch=<id>` (what lets a spec —
   *                  or an incident review — see the alarm fire
   *                  mid-stream)
   * @param onAlarm   maintenance hook invoked INSIDE the trigger whose
   *                  report trips `alarmWhen` — foreachBatch completes
   *                  before the next trigger starts, so whatever the
   *                  hook does (e.g. [[RefreshLoop.alarmHook]]'s
   *                  refit round) lands between trigger T and T+1,
   *                  the same boundary discipline publish uses
   * @param alarmWhen the alarm predicate over a trigger's report
   *                  ([[defaultAlarm]]: any drifted dim)
   */
  def driftStream(vecs: DataFrame, baseDiag: DataFrame, outPath: String,
      checkpoint: String,
      history: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      onAlarm: Option[(Long, DataFrame) => Unit] = None,
      alarmWhen: DataFrame => Boolean = defaultAlarm): StreamingQuery = {
    val deltaDiag = Embeddings.embedDiagnostics(vecs)
    deltaDiag.writeStream
      .outputMode(OutputMode.Complete())
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (diag: DataFrame, batchId: Long) =>
        if (!diag.isEmpty) {
          val report = Embeddings.driftFromDiags(baseDiag, diag)
            .coalesce(1).cache()
          try {
            report.write.mode("overwrite").parquet(outPath)
            history.foreach(h =>
              report.write.mode("overwrite").parquet(f"$h/batch=$batchId%03d"))
            onAlarm.foreach { hook =>
              if (alarmWhen(report)) hook(batchId, report)
            }
          } finally report.unpersist()
        }
      }
      .start()
  }
}
