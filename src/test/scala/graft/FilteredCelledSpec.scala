package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.functions._

import graft.query.{AnnQuery, BqSearch, IvfSearch, PqSearch, SqSearch}

/**
 * Metadata-filtered search on the quantized celled tiers
 * (`ann_ivfsq_filtered_topk` / `ann_ivfpq_filtered_topk` /
 * `ann_ivfbq_filtered_topk`): the predicate path of
 * [[AnnQuery.lshTopKSameLabel]] brought to the production serving
 * representations. Contract per tier:
 *  - zero violations: every served row shares the query's label;
 *  - recall@k >= the LSH filtered bar (0.7) vs the exact FILTERED
 *    oracle ([[AnnQuery.bruteTopKSameLabel]]);
 *  - the label predicate lands BELOW the shortlist window (candidates
 *    are pruned before any code-distance ranking spends the AdcKeep /
 *    HamKeep budget);
 *  - no corpus relation is broadcast: with the auto-broadcast
 *    threshold disabled, every BroadcastExchange in the plan feeds
 *    from a bounded local relation (the collected query batch / the
 *    centroid dimension), never a parquet scan.
 */
class FilteredCelledSpec extends SparkSpecBase {

  private val K = graft.config.GraftConfig.active.query.k
  private val NQ = graft.config.GraftConfig.active.query.numQueries

  private def entries: Seq[(String, DataFrame)] = Seq(
    "ivfsq" -> SqSearch.annIvfsqFilteredTopK(spark, sf),
    "ivfpq" -> PqSearch.annIvfpqFilteredTopK(spark, sf),
    "ivfbq" -> BqSearch.annIvfbqFilteredTopK(spark, sf),
    "ivfmrl" -> graft.query.MrlSearch.annIvfmrlFilteredTopK(spark, sf))

  test("filtered celled tiers: zero label violations; k rows max per query") {
    val emb = Tables.embeddings(spark, sf)
    val labels = emb.select(col("vec_id"), col("label"))
    for ((tier, df) <- entries) {
      val got = df.cache()
      val violations = got
        .join(labels.select(col("vec_id").as("query_id"), col("label").as("qlabel")),
          "query_id")
        .join(labels, "vec_id")
        .filter(col("label") =!= col("qlabel")).count()
      assert(violations == 0, s"$tier: $violations label violations")
      // self-query shares its own label -> still rank 1 on every tier
      got.filter(col("rnk") === 1).collect()
        .foreach(r => assert(r.getLong(0) == r.getLong(1),
          s"$tier rank-1 not self: $r"))
      assert(got.groupBy("query_id").count().collect().forall(_.getLong(1) <= K))
      got.unpersist()
    }
  }

  test("filtered celled tiers: recall@k >= the LSH filtered bar vs the filtered exact oracle") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < NQ)
    val gt = AnnQuery.bruteTopKSameLabel(emb, queries, K).cache()
    val gtN = gt.count()
    for ((tier, df) <- entries) {
      val hits = df.select("query_id", "vec_id")
        .join(gt.select("query_id", "vec_id"), Seq("query_id", "vec_id")).count()
      val recall = hits.toDouble / gtN
      assert(recall >= 0.7, s"$tier filtered recall@$K = $recall")
    }
    gt.unpersist()
  }

  test("filtered celled tiers: predicate below the shortlist window; no corpus broadcast") {
    // kill size-based auto-broadcast so the only BroadcastExchanges
    // left are the plan's own hints — then "no corpus broadcast" is a
    // structural fact, not an sf0.001 size accident
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      for ((tier, df) <- entries) {
        val lp = df.queryExecution.optimizedPlan.toString()
        // the optimized logical tree prints parents before children:
        // the label predicate (join condition or filter on qlabel)
        // must appear BELOW the shortlist window (adc_rank/ham_rank),
        // i.e., later in the dump — candidates are label-pruned before
        // any code-distance budget is spent
        val winIdx = lp.indexOf("_rank")
        val predIdx = lp.indexOf("qlabel")
        assert(winIdx >= 0 && predIdx > winIdx,
          s"$tier: label predicate must sit below the shortlist window:\n$lp")
        val phys = df.queryExecution.executedPlan
        def collectBroadcasts(p: SparkPlan): Seq[SparkPlan] =
          p.collect { case b: BroadcastExchangeExec => b.child }
        val bad = collectBroadcasts(phys)
          .filter(_.toString().contains("FileScan"))
        assert(bad.isEmpty,
          s"$tier: corpus-backed relation under a BroadcastExchange:\n${bad.mkString}")
        assert(!phys.toString.contains("CartesianProduct"), s"$tier cartesian")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("over-probe widens the probe budget against selectivity") {
    assert(IvfSearch.FilterOverProbe >= 2)
    // the filtered probe list is a strict superset of the unfiltered
    // one for the same query (array-prefix property of topProbeCells)
    val emb = Tables.embeddings(spark, sf)
    val cents = IvfSearch.centroidsDf(spark,
      Array.tabulate(8)(i => Array.tabulate(4)(j => (i * 4 + j).toFloat)))
      .collect().map(r => r.getSeq[Float](1).toArray)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"),
        PqSearch.topProbeCells(col("embedding").cast("array<float>")
          .cast("array<double>"), Array.tabulate(8, 4)((i, j) => (i + j).toFloat / 8f),
          IvfSearch.NumProbes).as("narrow"),
        PqSearch.topProbeCells(col("embedding").cast("array<float>")
          .cast("array<double>"), Array.tabulate(8, 4)((i, j) => (i + j).toFloat / 8f),
          IvfSearch.NumProbes * IvfSearch.FilterOverProbe).as("wide"))
      .collect()
    q.foreach { r =>
      val narrow = r.getSeq[Int](1)
      val wide = r.getSeq[Int](2)
      assert(wide.take(narrow.length) == narrow,
        "widened probe list must extend the narrow one, not reorder it")
    }
  }
}
