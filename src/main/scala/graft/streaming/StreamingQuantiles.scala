package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.operators.Quantiles

/**
 * Continuously-maintained exact score quantiles: the streaming twin of
 * `quality_threshold`, so the filter cutoff tracks the LIVE corpus
 * while intake runs — a pipeline that cuts "the worst decile" keeps
 * cutting the worst decile of everything seen so far, not of last
 * night's snapshot.
 *
 * Spark-first shape: the caller scores arriving docs with any
 * MAP-ONLY 4dp score (e.g. `Dsir.scoreWith` against a resident model,
 * or the quality signals), and the stream maintains
 * [[Quantiles.bucketize]]'s (bkt, count) table as a complete-mode
 * streaming aggregation — state bounded by the SCORE RANGE (a few
 * thousand 4dp buckets), never by corpus size, the same bounded-state
 * argument as [[StreamingStats]]. Each trigger hands the full updated
 * bucket table to `foreachBatch`, where [[Quantiles.fromBuckets]] —
 * the identical tiny-table prefix-sum machinery the batch entry runs —
 * re-derives every requested threshold and overwrites the (ps-sized)
 * report sink. Exactness is free: the bucket counts are sufficient
 * statistics for every rank query, so the streamed thresholds equal a
 * batch pass over the union of all arrivals, bit for bit.
 */
object StreamingQuantiles {

  /**
   * `scored` must be a STREAMING frame carrying `scoreCol` (4dp
   * quantized, the SURVEY §5 discipline every graft score follows).
   */
  def quantileStream(scored: DataFrame, scoreCol: String,
      ps: Seq[Double] = Quantiles.DefaultPs,
      outPath: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    Quantiles.bucketize(scored, scoreCol)
      .writeStream
      .outputMode(OutputMode.Complete())
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (bucketed: DataFrame, _: Long) =>
        if (!bucketed.isEmpty) {
          Quantiles.fromBuckets(bucketed, ps)
            .coalesce(1)
            .write.mode("overwrite").parquet(outPath)
        }
      }
      .start()
}
