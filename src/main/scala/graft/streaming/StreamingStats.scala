package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.operators.CorpusStats

/**
 * Continuously-maintained corpus composition report: the streaming
 * twin of `corpus_stats`, so the mixture designer reads CURRENT
 * proportions while intake runs instead of waiting for a nightly
 * batch pass.
 *
 * Spark-first shape: a streaming AGGREGATION (complete mode) whose
 * state is exactly [[CorpusStats.perCell]]'s cell table — bounded by
 * sources × langs, never corpus-sized — and each trigger hands the
 * full updated cell set to `foreachBatch`, where the same `derive`
 * stage the batch report uses computes the shares and overwrites the
 * (tiny) report sink. No watermark: composition totals are
 * all-time-running by definition.
 */
object StreamingStats {

  def statsStream(docs: DataFrame, outPath: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    CorpusStats.perCell(docs)
      .writeStream
      .outputMode(OutputMode.Complete())
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (cells: DataFrame, _: Long) =>
        if (!cells.isEmpty) {
          CorpusStats.derive(cells)
            .coalesce(1)
            .write.mode("overwrite").parquet(outPath)
        }
      }
      .start()
}
