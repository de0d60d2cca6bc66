package graft

import org.apache.spark.sql.functions._
import java.lang.Double.doubleToRawLongBits

/**
 * Signed-zero oracle hygiene (the round-7 `embed_pca` red, generalized).
 *
 * The divergence class: DuckDB's `ROUND(x, d)` preserves the IEEE sign
 * bit (x in (-0.5e-d, 0) rounds to `-0.0`) while Spark's `round` goes
 * through java.math.BigDecimal, which has no signed zero (`+0.0`).
 * Rows, schema, and every |value| match; the driver's exact value hash
 * still differs by one bit. Any oracle output column that ROUNDs a
 * possibly-negative DOUBLE must therefore normalize with `+ 0.0`
 * (IEEE: -0.0 + 0.0 = +0.0; a no-op for every other value).
 */
class OracleHygieneSpec extends SparkSpecBase {

  test("the class exists: Spark round of a tiny negative is +0.0 while sign-preserving round is -0.0") {
    // Spark side: round() through BigDecimal — never a negative zero.
    val sparkBits = spark.range(1).select(round(lit(-7.77e-06), 4).as("v"))
      .head().getDouble(0)
    assert(doubleToRawLongBits(sparkBits) == doubleToRawLongBits(+0.0),
      "Spark round(-7.77e-06, 4) must be +0.0")
    // DuckDB side (simulated): ROUND keeps the sign bit of the input.
    def duckRound(x: Double, d: Int): Double = {
      val r = BigDecimal(x).setScale(d, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (r == 0.0) Math.copySign(r, x) else r
    }
    val duckBits = duckRound(-7.77e-06, 4)
    assert(doubleToRawLongBits(duckBits) == doubleToRawLongBits(-0.0),
      "sign-preserving ROUND(-7.77e-06, 4) must be -0.0")
    // The driver's hash is bit-exact, so these two ARE different results;
    // the `+ 0.0` normalization aligns them:
    assert(doubleToRawLongBits(duckBits + 0.0) == doubleToRawLongBits(sparkBits))
  }

  /** Oracle columns whose ROUND input can be negative and near zero
    * (cosines, signed projections, raw float sums) — each must carry
    * the `+ 0.0` normalization. FLOOR'd ratios/distances and
    * DECIMAL-cast money columns are out of scope (non-negative domains
    * or no-signed-zero types cannot produce -0.0). */
  private val hazardous: Map[String, Seq[String]] = Map(
    "embed_pca" -> Seq("""ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), m.w) + m.b, 4) + 0.0 AS v"""),
    "embed_project" -> Seq("""ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), m.w), 4) + 0.0 AS v"""),
    "dedup_semantic" -> Seq(") + 0.0 AS csim"),
    "decontaminate_semantic" -> Seq("COALESCE(h.max_cos, -1.0) + 0.0 AS max_cos"),
    "neardup_embedding" -> Seq(") + 0.0 AS cosine"),
    "fvecs_roundtrip" -> Seq("+ 0.0 AS v_sum", "+ 0.0 AS v_first", "+ 0.0 AS v_last"),
    "csv_vectors" -> Seq("+ 0.0 AS v_sum", "+ 0.0 AS v_first", "+ 0.0 AS v_last"),
    "ann_mmr_topk" -> Seq("rels[i] + 0.0 AS rel4", "scores[i] + 0.0 AS score4"))

  test("every hazardous ROUND'd oracle output carries the signed-zero normalization") {
    val sql = SparkEntry.oracleSql
    hazardous.foreach { case (name, fragments) =>
      assert(sql.contains(name), s"oracle entry $name missing")
      fragments.foreach { frag =>
        assert(sql(name).contains(frag),
          s"$name oracle lost its signed-zero normalization: expected fragment `$frag`")
      }
    }
  }

  // The replay engine (DuckDB 1.0) INLINES a CTE once per reference:
  // the tier-report oracle references the brute-force gt chain ~15x
  // and each tier chain 3x — without MATERIALIZED the sf0.1 replay
  // re-ran a 12M-row window sort fifteen times, spilled >75 GB of
  // temp, and never finished. These pins keep the hint from being
  // lost in a refactor.
  test("multi-referenced chain CTEs in the tier/probe oracles stay MATERIALIZED") {
    val sql = SparkEntry.oracleSql
    val report = sql("ann_tier_report")
    Seq("gt AS MATERIALIZED", "lsh AS MATERIALIZED", "sq AS MATERIALIZED",
      "pq AS MATERIALIZED", "opq AS MATERIALIZED", "bq AS MATERIALIZED",
      "mrl AS MATERIALIZED", "iassign AS MATERIALIZED").foreach { frag =>
      assert(report.contains(frag), s"ann_tier_report oracle lost `$frag`")
    }
    val curve = sql("ann_probe_curve")
    Seq("gt AS MATERIALIZED", "assign AS MATERIALIZED",
      "probes_1 AS MATERIALIZED", "topk_8 AS MATERIALIZED").foreach { frag =>
      assert(curve.contains(frag), s"ann_probe_curve oracle lost `$frag`")
    }
    // the autotunes nest those queries — the hints must survive nesting
    assert(sql("ann_tier_autotune").contains("gt AS MATERIALIZED"))
    assert(sql("ann_probe_autotune").contains("gt AS MATERIALIZED"))
  }

  // The r10 VERDICT flagged the semantic oracles for hardcoding the
  // cell guard (`4096`) while the Spark plans read semdedup.maxCell
  // from the active config — a config override would silently gate
  // the plan against a different guard. Both sides now interpolate
  // the ACTIVE value (round-trip evidence: a GRAFT_CONFIG maxCell=7
  // Verify run stays hash-green on all five semantic entries).
  test("semantic oracles interpolate the ACTIVE semdedup.maxCell, not a constant") {
    val mc = graft.config.GraftConfig.active.semdedup.maxCell
    val sql = SparkEntry.oracleSql
    assert(sql("dedup_semantic").contains(s"csz <= $mc"))
    assert(sql("dedup_semantic_tune").contains(s"csz <= $mc"))
    // the delta chain (nested verbatim by apply and compact) guards
    // with a QUALIFY over base ∪ delta
    Seq("dedup_semantic_delta", "dedup_semantic_delta_apply",
      "dedup_semantic_compact").foreach { name =>
      assert(sql(name).contains(s"OVER (PARTITION BY cell) <= $mc"),
        s"$name oracle must carry the active maxCell guard")
    }
    // the refit oracle guards BOTH pair passes with the active value
    assert(sql("dedup_semantic_refit")
      .sliding(s"csz <= $mc".length).count(_ == s"csz <= $mc") == 4,
      "dedup_semantic_refit must guard all four pair-pass sides with the active maxCell")
    // the thaw execution replays the decision chain over the merged
    // corpus: one guarded pair pass + the nested delta chain's QUALIFY
    assert(sql("dedup_semantic_refit_apply").contains(s"csz <= $mc"),
      "dedup_semantic_refit_apply must guard its pair pass with the active maxCell")
    assert(sql("dedup_semantic_refit_apply")
      .contains(s"OVER (PARTITION BY cell) <= $mc"),
      "dedup_semantic_refit_apply's nested delta chain must carry the active maxCell")
  }

  // the thaw-execution oracle references merged in the pair pass, the
  // closure seed, and the keeper join — inline-per-reference would
  // replay the apply chain each time
  test("the refit-apply oracle's multi-referenced chain CTEs stay MATERIALIZED") {
    val sql = SparkEntry.oracleSql("dedup_semantic_refit_apply")
    Seq("adm AS MATERIALIZED", "merged AS MATERIALIZED",
      "assign AS MATERIALIZED", "edges AS MATERIALIZED").foreach { m =>
      assert(sql.contains(m), s"refit-apply oracle must keep '$m'")
    }
  }

  // the refit oracle re-derives two full pair sets over the merged
  // corpus and references merged/adm/pf/pr repeatedly — inlining them
  // per reference is the tier-report explosion all over again
  test("the refit oracle's multi-referenced chain CTEs stay MATERIALIZED") {
    val sql = SparkEntry.oracleSql("dedup_semantic_refit")
    Seq("adm AS MATERIALIZED", "merged AS MATERIALIZED",
      "frozen_assign AS MATERIALIZED", "refit_assign AS MATERIALIZED",
      "pf AS MATERIALIZED", "pr AS MATERIALIZED").foreach { frag =>
      assert(sql.contains(frag), s"dedup_semantic_refit oracle lost `$frag`")
    }
  }

  // the staged refit oracles share the refit bodies with only the adm
  // CTE swapped to the staged-pairs drop policy — same inlining hazard
  test("the staged refit oracles keep the shared MATERIALIZED chain") {
    for (name <- Seq("dedup_semantic_refit_staged", "dedup_semantic_refit_apply_staged")) {
      val sql = SparkEntry.oracleSql(name)
      Seq("adm AS MATERIALIZED", "merged AS MATERIALIZED").foreach { frag =>
        assert(sql.contains(frag), s"$name oracle lost `$frag`")
      }
      assert(sql.contains("read_parquet") && sql.contains("semdelta_pairs"),
        s"$name oracle must derive adm from the staged pair fixture")
    }
  }

  // the MKN-5 oracle's per-order type tables each feed 3+ consumers
  // (the score join, the context aggregates, the next order's
  // continuation counts, the count-of-counts) — inline-per-reference
  // would re-extract the gram stream per consumer
  test("the MKN-5 oracle's multi-referenced type tables stay MATERIALIZED") {
    val sql = SparkEntry.oracleSql("lm_score_kn5")
    Seq("p5x AS MATERIALIZED", "t5 AS MATERIALIZED", "c4 AS MATERIALIZED",
      "t4 AS MATERIALIZED", "c3 AS MATERIALIZED", "t3 AS MATERIALIZED",
      "c2 AS MATERIALIZED", "t2 AS MATERIALIZED", "c1 AS MATERIALIZED")
      .foreach { frag =>
        assert(sql.contains(frag), s"lm_score_kn5 oracle lost `$frag`")
      }
  }
}
