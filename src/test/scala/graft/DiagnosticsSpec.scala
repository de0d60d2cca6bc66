package graft

import org.apache.spark.sql.functions._

import graft.config.{AuditConfig, KAdaptiveConfig}
import graft.eval.QueryDiagnostics
import graft.index.LshIndex
import graft.lsh.{Lsh, LshParams}
import graft.query.AnnQuery

class DiagnosticsSpec extends SparkSpecBase {

  lazy val emb = Tables.embeddings(spark, sf)
  lazy val model = Lsh.fit(emb, "embedding", LshParams())
  lazy val built = LshIndex.build(LshIndex.codes(emb, "vec_id", "embedding", model), 64)

  test("diagnostics: perfect result scores precision 1.0, zero zero-hits") {
    val queries = emb.filter(col("vec_id") < 5)
    val gt = AnnQuery.bruteTopK(emb, queries, 10)
    val diag = QueryDiagnostics.diagnostics(gt, gt, 10).collect()
    assert(diag.length == 5)
    diag.foreach { r =>
      assert(r.getLong(1) == 10 && r.getDouble(2) == 1.0 && r.getInt(3) == 0)
    }
    assert(QueryDiagnostics.zeroHitGate(
      QueryDiagnostics.diagnostics(gt, gt, 10), AuditConfig()) == 0.0)
  }

  test("diagnostics: disjoint result is all zero-hit; gate fails fast when configured") {
    import spark.implicits._
    val queries = emb.filter(col("vec_id") < 5)
    val gt = AnnQuery.bruteTopK(emb, queries, 10)
    // a result that returns ids far outside the GT lists
    val bogus = (0L until 5L).flatMap(q => (1 to 10).map(r =>
      (q, 900000L + q * 100 + r, 0.5, r))).toDF("query_id", "vec_id", "dist", "rnk")
    val diag = QueryDiagnostics.diagnostics(bogus, gt, 10)
    assert(diag.collect().forall(r => r.getInt(3) == 1))
    val gate = AuditConfig(failOnZeroHit = true, zeroHitRateLimit = 0.8, zeroHitMinQueries = 5)
    intercept[IllegalStateException](QueryDiagnostics.zeroHitGate(diag, gate))
    // under the min-query floor the gate only reports
    val small = QueryDiagnostics.diagnostics(bogus.filter(col("query_id") < 2), gt, 10)
    assert(QueryDiagnostics.zeroHitGate(small,
      gate.copy(zeroHitMinQueries = 50)) == 1.0)
  }

  test("worstQueries keeps the worstKeep lowest-precision queries") {
    val queries = emb.filter(col("vec_id") < 10)
    val gt = AnnQuery.bruteTopK(emb, queries, 10)
    // drop half of query 3's correct rows -> its precision sinks
    val degraded = gt.filter(!(col("query_id") === 3 && col("rnk") > 5))
    val worst = QueryDiagnostics.worstQueries(
      QueryDiagnostics.diagnostics(degraded, gt, 10), 1).collect()
    assert(worst.length == 1 && worst.head.getLong(0) == 3L)
    assert(worst.head.getDouble(2) == 0.5)
  }

  test("ann_diagnostics entry: sampled audit returns worst-first rows") {
    val rows = QueryDiagnostics.annDiagnostics(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    // worst-first ordering
    assert(rows.map(_.getDouble(2)).sliding(2).forall {
      case Array(a, b) => a <= b
      case _ => true
    })
  }

  test("kAdaptive rounds: widens until served, respects maxRounds; disabled == single-retry") {
    val queries = emb.filter(col("vec_id") < 3)
    val ka = KAdaptiveConfig(enabled = true, maxRounds = 3, targetReturnRate = 1.0,
      probeFactor = 2.0, maxFanout = 64)
    val served = AnnQuery.lshTopKAdaptiveRounds(spark, emb, queries, 10, model, built, ka)
    assert(served.groupBy("query_id").count().collect().forall(_.getLong(1) == 10))
    val dup = served.groupBy("query_id", "vec_id").count().filter(col("count") > 1).count()
    assert(dup == 0)
    // impossible k: rounds terminate at maxRounds without looping forever
    val n = emb.count().toInt
    val starvedAll = AnnQuery.lshTopKAdaptiveRounds(spark, emb, queries, n + 100, model, built, ka)
    assert(starvedAll.select("query_id").distinct().count() == 3)
    // disabled -> byte-identical to the single-retry wrapper
    val off = AnnQuery.lshTopKAdaptiveRounds(spark, emb, queries, 10, model, built,
      KAdaptiveConfig(enabled = false))
    val single = AnnQuery.lshTopKAdaptive(spark, emb, queries, 10, model, built)
    assert(off.exceptAll(single).count() == 0 && single.exceptAll(off).count() == 0)
  }

  // ---- distance-ratio@K (the reference's PAPER METRIC) ----

  test("distance ratio is exactly 1.0 when the ANN result equals GT, > 1.0 on a planted miss") {
    val queries = emb.filter(col("vec_id") < 5)
    val gt = AnnQuery.bruteTopK(emb, queries, 10).cache()
    val perfect = AnnQuery.distanceRatioEval(gt, gt, Seq(1, 5, 10)).collect()
    assert(perfect.length == 3)
    perfect.foreach { r =>
      // k=1's only pair is the self-match at distance 0 — the reference
      // guard skips it, leaving no usable pair: voided (reference NaN,
      // reported as the -1.0 sentinel — distanceRatioEval scaladoc)
      if (r.getInt(0) == 1) assert(r.getDouble(1) == -1.0, s"k=1 must be voided: $r")
      else assert(r.getDouble(1) == 1.0, s"perfect ratio != 1.0: $r")
    }
    // plant a miss: rank 10 of every query answers with a farther point
    val planted = gt.withColumn("dist",
      when(col("rnk") === 10, col("dist") * 3 + 1).otherwise(col("dist")))
    val withMiss = AnnQuery.distanceRatioEval(planted, gt, Seq(5, 10)).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(withMiss(5) == 1.0, "miss planted at rank 10 must not touch k=5")
    assert(withMiss(10) > 1.0, s"ratio@10 with planted miss = ${withMiss(10)}")
    gt.unpersist()
  }

  test("distance ratio guards: short ANN result voids the query; zero-dist GT pairs skip") {
    import spark.implicits._
    // gt with nonzero distances everywhere; ann returns only 2 of k=3 rows
    val gt = Seq((1L, 11L, 2.0, 1), (1L, 12L, 3.0, 2), (1L, 13L, 4.0, 3))
      .toDF("query_id", "vec_id", "dist", "rnk")
    val short = gt.filter(col("rnk") <= 2)
    val voided = AnnQuery.distRatioByQuery(short, gt, Seq(3)).collect()
    assert(voided.length == 1 && voided(0).isNullAt(2),
      s"short result must void the ratio (reference NaN): ${voided.toSeq}")
    // the self-match pair (d_gt = 0) is skipped, not poisoning the mean:
    // remaining pairs are exact matches, so the ratio stays exactly 1.0
    val gtSelf = Seq((1L, 10L, 0.0, 1), (1L, 12L, 3.0, 2), (1L, 13L, 4.0, 3))
      .toDF("query_id", "vec_id", "dist", "rnk")
    val selfEval = AnnQuery.distanceRatioEval(gtSelf, gtSelf, Seq(3)).collect()
    assert(selfEval.length == 1 && selfEval(0).getDouble(1) == 1.0, selfEval.toSeq.toString)
  }

  test("ratio.source base: base-vector distances reproduce the GT-mode ratio exactly") {
    val queries = emb.filter(col("vec_id") < 5)
    val gt = AnnQuery.bruteTopK(emb, queries, 10).cache()
    val ann = AnnQuery.lshTopKAdaptive(spark, emb, queries, 10, model, built).cache()
    // BASE mode re-derives the pair distances from the corpus (base ==
    // corpus here) with the same rounding — the two modes must agree
    val gtFromBase = AnnQuery.distancesFromBase(
      gt.select("query_id", "vec_id", "rnk"), emb, queries)
    assert(gtFromBase.exceptAll(gt.select("query_id", "vec_id", "dist", "rnk")).count() == 0)
    val viaGt = AnnQuery.distanceRatioEval(ann, gt, Seq(1, 5, 10))
    val viaBase = AnnQuery.distanceRatioEval(ann, gtFromBase, Seq(1, 5, 10))
    assert(viaGt.exceptAll(viaBase).count() == 0 && viaBase.exceptAll(viaGt).count() == 0)
    gt.unpersist(); ann.unpersist()
  }

  test("ann_recall_eval and ann_recall_gtfile carry the avg_dist_ratio column") {
    for (name <- Seq("ann_recall_eval", "ann_recall_gtfile")) {
      val out = SparkEntry.queries(name)(spark, sf)
      assert(out.columns.contains("avg_dist_ratio"), s"$name: ${out.columns.toSeq}")
      val rows = out.collect()
      assert(rows.nonEmpty)
      // queries are corpus members (self at gt rank 1, dist 0): the guard
      // skips that pair and the remaining ANN hits keep the ratio >= 1.
      // A fully-voided k (reference NaN) reports the -1.0 sentinel
      // (distanceRatioEval scaladoc); small k > 1 must be defined.
      val idx = rows.head.fieldIndex("avg_dist_ratio")
      rows.foreach { r =>
        val k = r.getInt(0)
        val v = r.getDouble(idx)
        // k=1 is always voided here (its one pair is the self-match at
        // distance 0, skipped by the guard); large k may be (short results)
        if (v == -1.0) assert(k == 1 || k > 10,
          s"$name: ratio voided at small k=$k")
        else assert(v >= 1.0 && v < 10.0, s"$name k=$k: avg_dist_ratio=$v")
      }
    }
  }

  test("driver-side eval aggregation equals the DataFrame twin row-for-row") {
    // the production entry aggregates metrics driver-side
    // (AnnQuery.evalMetricsLocal); annRecallEvalPlan is the same
    // composition in DataFrame combinators — they must agree exactly
    val local = AnnQuery.annRecallEval(spark, sf)
    val twin = AnnQuery.annRecallEvalPlan(spark, sf)
    assert(local.columns.sameElements(twin.columns),
      s"${local.columns.toSeq} vs ${twin.columns.toSeq}")
    assert(local.count() == twin.count())
    assert(local.exceptAll(twin).count() == 0)
    assert(twin.exceptAll(local).count() == 0)
  }
}
