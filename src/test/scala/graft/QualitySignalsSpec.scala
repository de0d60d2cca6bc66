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

  test("quality_ablation: verdicts reconcile with the signals table; nested profiles keep monotonically") {
    val rows = TextAnalysis.qualityAblation(spark, sf).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3) + r.getLong(4) + r.getLong(5) + r.getLong(6), r.getDouble(7)))
    }.toMap
    assert(rows.keySet == TextAnalysis.AblationProfiles.map(_._1).toSet)
    val nDocs = TextAnalysis.qualitySignals(spark, sf).count()
    rows.foreach { case (p, (n, keep, fails, share)) =>
      assert(n == nDocs, s"$p covers the corpus")
      assert(keep + fails == n, s"$p: keep + first-fails must partition the docs")
      assert(share == math.floor(keep.toDouble / n * 10000) / 10000, s"$p share")
    }
    // each profile's thresholds dominate the previous one's, so keep
    // rates are monotone by construction — and the grid must actually
    // discriminate on this corpus
    assert(rows("lenient")._2 >= rows("standard")._2)
    assert(rows("standard")._2 >= rows("strict")._2)
    assert(rows("lenient")._2 > rows("strict")._2,
      "grid does not discriminate on this corpus")
    // replay one profile driver-side from the signals table
    val (_, minT, maxP, minS, maxB) = TextAnalysis.AblationProfiles(2)
    val sig = TextAnalysis.qualitySignals(spark, sf)
      .select("n_tokens", "punct_ratio", "stopword_ratio", "top_bigram_frac")
      .collect()
    val expectKeep = sig.count { r =>
      !(r.getInt(0) < minT) && !(r.getDouble(1) > maxP) &&
        !(r.getDouble(2) < minS) &&
        !(!r.isNullAt(3) && r.getDouble(3) > maxB)
    }
    assert(rows("strict")._2 == expectKeep, "strict keep replay")
  }
}
