package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.operators.CorpusStats

/**
 * Continuously-maintained Count-Min sketch over the intake's n-grams:
 * the streaming twin of `ngram_cms_topk`'s sketch side, so frequency
 * queries ("how common is this boilerplate gram so far?") are served
 * DURING the crawl instead of after a batch pass.
 *
 * Spark-first shape: a streaming aggregation (complete mode) whose
 * keyed state is exactly [[CorpusStats.cmsSketch]]'s cell table —
 * depth x width = 4096 BIGINT cells, FIXED regardless of how much
 * text has streamed through (contrast the streaming exact-quantile
 * and stats ops, whose state is merely *bounded*; the sketch's is
 * constant). Each trigger overwrites the (32 KB) sketch sink via
 * foreachBatch. The count-per-cell aggregation is the same additive
 * merge the batch sketch uses shard-wise, which is WHY the streamed
 * state equals the batch sketch bit-for-bit at any prefix of
 * arrivals.
 */
object StreamingCms {

  def cmsStream(docs: DataFrame, outPath: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    CorpusStats.cmsSketch(docs, "doc_id", "text", CorpusStats.TopGramWidth)
      .writeStream
      .outputMode(OutputMode.Complete())
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (cells: DataFrame, _: Long) =>
        if (!cells.isEmpty) {
          cells.coalesce(1).write.mode("overwrite").parquet(outPath)
        }
      }
      .start()
}
