package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Decontaminate, Dsir}
import graft.operators.Dsir.DsirModel
import graft.text.{Normalize, QualityClassifier, TextAnalysis, TextFilters}
import graft.text.QualityClassifier.QcModel
import graft.text.TextAnalysis.LmModel

/**
 * Continuous corpus intake: the training-data hygiene chain —
 * normalization → PII scrub → quality filter → benchmark
 * decontamination → (optional) trained-classifier verdict — applied
 * to documents AS THEY ARRIVE, instead of as a nightly batch over the
 * accumulated corpus.
 *
 * Every verdict depends only on the document itself and the FIXED
 * benchmark gram set, so the chain is stateless across micro-batches:
 * `foreachBatch` runs the exact batch operators on each arrival batch
 * (their per-doc outputs are independent of batch boundaries by
 * construction) and lands results under a batch_id partition with
 * dynamic overwrite — idempotent under micro-batch replay, the same
 * sink posture as [[AnnServe]] and [[ReencryptionDrain]]. At 100 TB
 * this is the shape that lets intake keep up with arrival rate: no
 * state store, no watermark, per-batch work proportional to the batch.
 */
object StreamingIntake {

  /**
   * Per-doc intake verdict over one (micro-)batch: PII counts +
   * scrubbed text + quality signals/decision + contamination flag —
   * quality and contamination are judged on the SCRUBBED text (the
   * text that would enter training).
   */
  def intakeBatch(docs: DataFrame, bench: DataFrame, n: Int,
      model: Option[QcModel] = None,
      dsir: Option[DsirModel] = None,
      lm: Option[LmModel] = None,
      bloom: Option[(Array[Long], Int)] = None): DataFrame = {
    val normed = docs.select(col("doc_id"),
      Normalize.normalize(col("text")).as("text"))
    val scrubbed = TextFilters.piiScrub(normed, "doc_id", "text")
    val clean = scrubbed.select(col("doc_id"), col("text_clean").as("text"))
    val scored = TextFilters.qualityFilter(clean, "doc_id", "text")
    // with a RESIDENT Bloom bitset the contamination verdict is
    // map-only (no per-batch bench join at all — the bitset rides the
    // batch plan as a literal); without one, the exact-join pass runs
    // against the static bench frame
    val contam = bloom.fold(
        Decontaminate.decontaminate(clean, bench, "doc_id", "text", n)) {
      case (words, m) =>
        graft.operators.BloomDecontaminate
          .decontaminateBloom(clean, "doc_id", "text", n, words, m)
    }
    val verdicts = scrubbed.select("doc_id", "n_emails", "n_phones", "n_ips", "text_clean")
      .join(scored, Seq("doc_id"))
      .join(contam.select("doc_id", "n_hits", "contaminated"), Seq("doc_id"))
    // trained-classifier verdict on the cleaned text (map-only plan;
    // the label column is meaningless at intake time and not emitted)
    val withQc = model.fold(verdicts) { m =>
      verdicts.join(QualityClassifier.score(clean, "doc_id", "text", lit(0), m)
        .select(col("doc_id"), col("pred").as("qc_pred")), Seq("doc_id"))
    }
    // DSIR importance verdict against a RESIDENT fitted model: the
    // 256-double log-ratio array rides each batch plan as a literal,
    // so the verdict is map-only per arrival batch (Dsir.scoreWith)
    val withDsir = dsir.fold(withQc) { m =>
      withQc.join(Dsir.scoreWith(clean, "doc_id", "text", m), Seq("doc_id"))
    }
    // LM quality score against a resident top-V unigram model — the
    // same literal-model map-only posture (TextAnalysis.lmScoreWith)
    lm.fold(withDsir) { m =>
      withDsir.join(TextAnalysis.lmScoreWith(clean, "doc_id", "text", m)
        .select(col("doc_id"), col("lm_topv")), Seq("doc_id"))
    }
  }

  /**
   * Run the intake chain on a document stream. `bench` is a STATIC
   * DataFrame (eval suites are fixed MB-sized artifacts — the
   * broadcast side of the decontamination join every batch reuses).
   */
  def intakeStream(docs: DataFrame, bench: DataFrame, n: Int,
      outPath: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      model: Option[QcModel] = None,
      dsir: Option[DsirModel] = None,
      lm: Option[LmModel] = None,
      bloom: Option[(Array[Long], Int)] = None): StreamingQuery =
    docs.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          intakeBatch(batch, bench, n, model, dsir, lm, bloom)
            .withColumn("batch_id", lit(batchId))
            .write
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(outPath)
        }
      }
      .start()
}
