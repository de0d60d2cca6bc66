package graft

import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

class QualitySignalsSpec extends SparkSpecBase {

  test("quality_signals agrees with every per-signal entry it consolidates") {
    val wide = TextAnalysis.qualitySignals(spark, sf).cache()
    // text_quality columns
    val tq = TextAnalysis.textQuality(spark, sf)
      .select("doc_id", "n_chars", "n_tokens", "avg_token_len", "punct_ratio", "stopword_ratio")
    assert(wide.select("doc_id", "n_chars", "n_tokens", "avg_token_len",
        "punct_ratio", "stopword_ratio")
      .exceptAll(tq).count() == 0, "text_quality signals diverge")
    // repetition columns
    val rep = TextAnalysis.textRepetition(spark, sf)
      .select("doc_id", "dup_token_frac", "top_bigram_frac")
    assert(wide.select("doc_id", "dup_token_frac", "top_bigram_frac")
      .exceptAll(rep).count() == 0, "repetition signals diverge")
    // language columns
    val li = TextAnalysis.langIdQuery(spark, sf)
      .select(col("doc_id"), col("pred_lang"), col("score").as("lang_score"))
    assert(wide.select("doc_id", "pred_lang", "lang_score")
      .exceptAll(li).count() == 0, "lang-ID signals diverge")
    // the new ratios are true ratios
    wide.select("digit_ratio", "upper_ratio").collect().foreach { r =>
      assert(r.getDouble(0) >= 0 && r.getDouble(0) <= 1)
      assert(r.getDouble(1) >= 0 && r.getDouble(1) <= 1)
    }
    wide.unpersist()
    ()
  }

  test("quality_signals is one map-only projection (no exchange, no join)") {
    val p = TextAnalysis.qualitySignals(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Exchange"), s"must be map-only:\n$p")
    assert(!p.contains("Join"), s"must not join:\n$p")
  }
}
