package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming exact deduplication: keep the first occurrence of each
 * content hash across the whole stream, suppress all later copies —
 * the continuous form of `Dedup.dedupExact` for ingest pipelines.
 *
 * Keyed state is one boolean per distinct content hash (the hash
 * itself is the key), so the state store grows with distinct
 * content, not stream length; a production deployment bounds it
 * with state TTL the same way Spark's own `dropDuplicates` on a
 * watermarked stream does.
 */
object StreamingDedup {

  final case class DocIn(doc_id: Long, content_hash: String)
  final case class DocKept(doc_id: Long, content_hash: String)

  /** Emit only the first (doc_id-smallest within the batch) row per unseen hash. */
  def keepFirst(
      hash: String,
      docs: Iterator[DocIn],
      state: GroupState[Boolean]): Iterator[DocKept] = {
    if (state.exists) Iterator.empty
    else {
      val first = docs.minBy(_.doc_id)
      state.update(true)
      Iterator(DocKept(first.doc_id, hash))
    }
  }

  /** docs stream with a `text` column -> first-occurrence rows only. */
  def dedupStream(spark: SparkSession, docs: Dataset[org.apache.spark.sql.Row]): Dataset[DocKept] = {
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), sha2(col("text"), 256).as("content_hash"))
      .as[DocIn]
      .groupByKey(_.content_hash)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(keepFirst)
  }
}
