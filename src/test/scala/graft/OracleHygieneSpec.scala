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
}
