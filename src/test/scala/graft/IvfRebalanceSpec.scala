package graft

import org.apache.spark.sql.functions._

import graft.query.IvfSearch

class IvfRebalanceSpec extends SparkSpecBase {

  test("planted skew: the fat cell splits, children partition it, imbalance drops") {
    import spark.implicits._
    // 3 tight far-apart anchors + one FAT cluster of 60 points: with
    // 4 centroids the fat cluster owns one cell at ~15x the others.
    // vec_ids interleave the first point of each cluster so the
    // vec_id-pinned k-means init spans the clusters (init = first C
    // sample points)
    def pt(cx: Double, i: Int): Array[Float] =
      Array((cx + 0.001 * i).toFloat, (0.001 * i).toFloat)
    val rows =
      Seq((0L, pt(0.0, 0)), (1L, pt(50.0, 0)), (2L, pt(100.0, 0)), (3L, pt(150.0, 0))) ++
      (1 until 4).map(i => (10L + i, pt(0.0, i))) ++
      (1 until 4).map(i => (20L + i, pt(50.0, i))) ++
      (1 until 4).map(i => (30L + i, pt(100.0, i))) ++
      (1 until 60).map(i => (100L + i, pt(150.0, i)))
    val data = rows.toDF("vec_id", "embedding")
    val cents = IvfSearch.fitCentroids(data, 4)
    val before = IvfSearch.assignCells(data, IvfSearch.centroidsDf(spark, cents))
      .groupBy("cell").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val fat = before.maxBy(_._2)._1
    val plan = IvfSearch.rebalancePlan(data, cents, budget = 1)
    // one split: the fat cell, everything else kept
    val children = plan.filter(_._2 == "child")
    assert(children.length == 2 && children.forall(_._3 == fat))
    assert(plan.count(_._2 == "kept") == cents.length - 1)
    // children partition the old fat cell's members: total preserved,
    // and the fat cell's fill is now spread over two cells
    val newCents = plan.map(_._1)
    val after = IvfSearch.assignCells(data,
        IvfSearch.centroidsDf(spark, newCents))
      .groupBy("cell").count().collect().map(_.getLong(1))
    assert(after.sum == rows.length)
    def imbalance(szs: Seq[Long], nlist: Int): Double = {
      val n = szs.sum.toDouble
      nlist * szs.map(s => s.toDouble * s).sum / (n * n)
    }
    assert(imbalance(after.toSeq, plan.length) <
      imbalance(before.values.toSeq, cents.length),
      "splitting the fat cell must reduce the imbalance factor")
    assert(after.max < before.values.max, "max fill must drop")
  }

  test("corpus entry: budget/lineage accounting and fill conservation") {
    val out = IvfSearch.ivfRebalance(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getLong(3)))
    val data = Tables.embeddings(spark, sf)
    val n = data.count()
    assert(out.map(_._4).sum == n, "every vector lands in exactly one new cell")
    val children = out.filter(_._2 == "child")
    val kept = out.filter(_._2 == "kept")
    assert(children.nonEmpty, "the budget always splits at least one cell")
    assert(children.length % 2 == 0, "two children per split cell")
    // lineage: children reference pre-rebalance cells, kept are -1
    assert(kept.forall(_._3 == -1))
    assert(children.forall(_._3 >= 0))
    assert(children.map(_._3).distinct.length == children.length / 2)
    // cell ids are dense 0..n-1 (the new layout is a valid index)
    assert(out.map(_._1).sorted.toSeq == out.indices.toSeq)
  }
}
