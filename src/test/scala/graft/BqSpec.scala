package graft

import org.apache.spark.sql.functions._

import graft.query.BqSearch

class BqSpec extends SparkSpecBase {

  test("embed_bq: packed words match a direct driver-side bit-for-bit re-encode") {
    val thr = BqSearch.fittedThresholds(spark, sf)
    assert(thr.nonEmpty)
    val nWords = (thr.length + BqSearch.WordBits - 1) / BqSearch.WordBits
    val raw = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val words = BqSearch.embedBq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(words.size == raw.size * nWords, "exactly ceil(dim/32) words per vector")
    words.foreach { case ((id, w), word) =>
      assert(word >= 0L && word < (1L << BqSearch.WordBits), s"word range: $word")
      val expect = (w * BqSearch.WordBits until
        math.min((w + 1) * BqSearch.WordBits, thr.length)).map { d =>
        if (raw(id)(d) > thr(d)) 1L << (d % BqSearch.WordBits) else 0L
      }.sum
      assert(word == expect, s"vec $id word $w: got $word expected $expect")
    }
  }

  test("hamming: zero on self, counts exactly the differing sign bits") {
    val thr = BqSearch.fittedThresholds(spark, sf)
    val df = Tables.embeddings(spark, sf).limit(10)
      .select(col("vec_id"), BqSearch.bqWords(col("embedding"), thr).as("w"))
    val self = df.select(BqSearch.hamming(col("w"), col("w"))).collect()
    assert(self.forall(_.getInt(0) == 0), "hamming(x, x) == 0")
    // cross pairs: expression result equals a Long.bitCount replay
    val rows = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val pairs = df.as("a").crossJoin(df.as("b"))
      .select(col("a.vec_id"), col("b.vec_id"),
        BqSearch.hamming(col("a.w"), col("b.w")).as("h"))
      .collect()
    pairs.foreach { r =>
      val (a, b, h) = (r.getLong(0), r.getLong(1), r.getInt(2))
      val expect = rows(a).zip(rows(b)).map { case (x, y) =>
        java.lang.Long.bitCount(x ^ y) }.sum
      assert(h == expect, s"pair ($a,$b): $h != $expect")
    }
  }

  test("ann_bq_topk: self-queries rank first; Hamming shortlist recall is usable after refine") {
    // sf0.01: N=500 > HamKeep=64, so the Hamming shortlist genuinely
    // prunes and the recall number measures the 1-bit codes
    val sfBig = "/root/testdata/sf0.01"
    val out = BqSearch.annBqTopK(spark, sfBig).cache()
    val k = graft.config.GraftConfig.active.query.k
    val nq = graft.config.GraftConfig.active.query.numQueries
    val perQuery = out.groupBy("query_id").count().collect()
    assert(perQuery.length == nq && perQuery.forall(_.getLong(1) <= k))
    // self has Hamming 0, always survives the shortlist, and exact
    // refine ranks it first at distance 0
    assert(out.filter(col("rnk") === 1)
      .filter(col("query_id") === col("vec_id")).count() == nq,
      "every query's rank-1 must be itself")
    val got = out.select(col("query_id"), col("vec_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val brute = graft.query.AnnQuery.annBruteTopK(spark, sfBig)
      .select(col("query_id"), col("vec_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = brute.map { case (q, gt) =>
      got.get(q).map(g => g.intersect(gt).size.toDouble / gt.size).getOrElse(0.0) }
    val mean = recalls.sum / recalls.size
    // 1 bit per dim is the floor of the tier ladder: the shortlist is
    // Hamming-ranked, so recall rides sign-bit agreement only — the
    // bar is "usable after exact refine", not SQ8's near-exactness
    assert(mean >= 0.5, s"BQ recall@k too low: $mean")
    out.unpersist()
    ()
  }

  test("ann_ivfbq_topk: cell-bounded BQ serving keeps self-rank-1 and usable recall") {
    val out = BqSearch.annIvfbqTopK(spark, sf).cache()
    val k = graft.config.GraftConfig.active.query.k
    val nq = graft.config.GraftConfig.active.query.numQueries
    val perQuery = out.groupBy("query_id").count().collect()
    assert(perQuery.length == nq && perQuery.forall(_.getLong(1) <= k))
    // a query's own cell is its first probe; self has Hamming 0 and
    // exact refine ranks it at distance 0
    assert(out.filter(col("rnk") === 1)
      .filter(col("query_id") === col("vec_id")).count() == nq,
      "every query's rank-1 must be itself")
    val got = out.select(col("query_id"), col("vec_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val brute = graft.query.AnnQuery.annBruteTopK(spark, sf)
      .select(col("query_id"), col("vec_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = brute.map { case (q, gt) =>
      got.get(q).map(g => g.intersect(gt).size.toDouble / gt.size).getOrElse(0.0) }
    val mean = recalls.sum / recalls.size
    // cells + 1-bit codes stack two approximations; the bar is the
    // celled family's usability floor, not the exhaustive twin's
    assert(mean >= 0.5, s"IVF-BQ recall@k too low: $mean")
    out.unpersist()
    ()
  }

  test("bq shortlist at HamKeep >= N degenerates to exact: equals brute force") {
    // restrict the corpus below HamKeep: every candidate survives the
    // Hamming shortlist and is exactly refined, so the 1-bit codes
    // can no longer cost ANY recall — the refine stage is doing its
    // job iff the result equals brute force bit for bit
    val thr = BqSearch.fittedThresholds(spark, sf)
    val k = graft.config.GraftConfig.active.query.k
    val small = Tables.embeddings(spark, sf)
      .filter(col("vec_id") < BqSearch.HamKeep)
    val queries = small.filter(col("vec_id") < 5)
    val bq = BqSearch.bqTopKOn(small, queries, thr)
      .select("query_id", "vec_id", "rnk").collect().toSet
    val brute = graft.query.AnnQuery.bruteTopK(small, queries, k)
      .select("query_id", "vec_id", "rnk").collect().toSet
    assert(bq == brute, "with the whole corpus refined, BQ == brute force")
  }
}
