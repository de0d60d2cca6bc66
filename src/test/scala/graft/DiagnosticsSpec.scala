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
}
