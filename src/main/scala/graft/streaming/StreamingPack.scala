package graft.streaming

import org.apache.spark.sql.{Column, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming sequence packing — the continuous form of
 * [[graft.operators.Corpus.seqPack]]: documents arriving on a stream
 * are assigned (pack_id, pack_offset) slots in fixed-token-budget
 * training sequences as they arrive, instead of re-packing the
 * accumulated corpus per release.
 *
 * Keyed state is ONE long per stratum (the cumulative token count):
 * pack_id = cum/budget and pack_offset = cum%budget are pure functions
 * of that running total, exactly the batch packer's arithmetic — so
 * when the stream delivers documents in the batch's packing order
 * (doc_id within stratum; a crawl/ingest pipeline's natural arrival
 * order), streamed assignments equal the batch plan row-for-row
 * across any micro-batch boundaries. State size is O(strata),
 * independent of stream length.
 */
object StreamingPack {

  final case class DocIn(doc_id: Long, stratum: String, n_tokens: Long)
  final case class Packed(doc_id: Long, stratum: String, n_tokens: Long,
      pack_id: Long, pack_offset: Long)

  /** Advance the stratum's running token total over this batch's docs
    * (doc_id order within the batch — the packing order). */
  def packGroup(budget: Int)(stratum: String, docs: Iterator[DocIn],
      state: GroupState[Long]): Iterator[Packed] = {
    var cum = state.getOption.getOrElse(0L)
    val out = docs.toSeq.sortBy(_.doc_id).map { d =>
      val r = Packed(d.doc_id, stratum, d.n_tokens, cum / budget, cum % budget)
      cum += d.n_tokens
      r
    }
    state.update(cum)
    out.iterator
  }

  /** Document stream (doc_id, stratum, text) -> per-doc pack slots.
    * `counter` picks the token semantics (default whitespace — the
    * [[graft.operators.Corpus.nTokens]] kernel; pass a BPE counter to
    * pack by subword tokens). */
  def packStream(spark: SparkSession, docs: Dataset[Row], stratumCol: String,
      budget: Int,
      counter: Column => Column = graft.operators.Corpus.nTokens)
      : Dataset[Packed] = {
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), col(stratumCol).cast("string").as("stratum"),
        counter(col("text")).cast("long").as("n_tokens"))
      .as[DocIn]
      .groupByKey(_.stratum)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        packGroup(budget))
  }
}
