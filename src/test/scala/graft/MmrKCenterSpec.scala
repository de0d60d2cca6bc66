package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.KCenter
import graft.query.MmrRerank

/** MMR diversified re-rank + greedy k-center coreset: hand-checkable
  * geometry fixtures plus invariants on the real embeddings table. */
class MmrKCenterSpec extends SparkSpecBase {

  private def vecs(rows: (Long, Seq[Float])*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, v) => Row(id, v) }, 2),
      StructType(Seq(
        StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType), nullable = false))))

  // q = (1,0); a and its near-copy a' lean one way off q, b mirrors a
  // on the other side: rel4(a)=0.8983 > rel4(a')=0.8981 > rel4(b)=
  // 0.8944 (plain relevance order a, a', b) but sim(a',a)≈1 while
  // sim(b,a)≈0.6071, so MMR (λ=0.7) pays a' the full 0.3 novelty
  // penalty (score 0.3287) and b only 0.18 (score 0.4439): a, b, a'.
  private val mmrQ = Seq((100L, Seq(1f, 0f)))
  private val mmrData = Seq(
    (1L, Seq(0.9f, 0.44f)),    // a
    (2L, Seq(0.9f, 0.4405f)),  // a': near-copy of a
    (3L, Seq(0.9f, -0.45f)))   // b: a's mirror, slightly less relevant

  test("mmr: diversification demotes the near-duplicate a plain top-k ranks second") {
    val got = MmrRerank.mmrTopK(spark, vecs(mmrData: _*), vecs(mmrQ: _*),
        candidates = 3, k = 3, lambda = 0.7)
      .orderBy("mmr_rank").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(1L, 3L, 2L),
      got.mkString(", "))
    // rank-1 is the pure-relevance argmax and its score is λ·rel4
    val first = got.head
    assert(first.getDouble(4) ==
      math.floor(0.7 * first.getDouble(3) * 10000) / 10000)
  }

  test("mmr: lambda=1 degenerates to plain relevance order") {
    val got = MmrRerank.mmrTopK(spark, vecs(mmrData: _*), vecs(mmrQ: _*),
        candidates = 3, k = 3, lambda = 1.0)
      .orderBy("mmr_rank").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
  }

  test("mmr invariants on the embeddings table: k distinct picks per query, deterministic") {
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val qs = e.filter(col("vec_id") < 5)
    val run1 = MmrRerank.mmrTopK(spark, e, qs, candidates = 10, k = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(t => (t._1, t._3))
    val run2 = MmrRerank.mmrTopK(spark, e, qs, candidates = 10, k = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(t => (t._1, t._3))
    assert(run1.toSeq == run2.toSeq)
    val perQuery = run1.groupBy(_._1)
    assert(perQuery.size == 5)
    perQuery.foreach { case (_, picks) =>
      assert(picks.length == 6)
      assert(picks.map(_._2).distinct.length == 6, "no duplicate picks")
      assert(picks.map(_._3).sorted.toSeq == (1 to 6))
    }
  }

  test("mmr composes behind an IVF first stage: rerank() over an ANN shortlist") {
    import graft.functions.VectorFunctions.vec_cosine
    import graft.query.IvfSearch
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val qs = e.filter(col("vec_id") < 5)
    val cents = IvfSearch.fitCentroids(e, 8)
    // IVF retrieval bounds the candidates; MMR diversifies them — the
    // 100 TB shape (phase 1 never needs to be the brute scan)
    val shortlist = IvfSearch.ivfTopK(spark, e, qs, k = 10, nProbe = 4, cents)
      .join(e, "vec_id")
      .join(broadcast(qs.select(col("vec_id").as("query_id"), col("embedding").as("qv"))),
        "query_id")
      .withColumn("rel4", floor(vec_cosine(col("embedding"), col("qv")) * 10000) / 10000)
      .select(col("query_id"), col("vec_id"), col("rel4"), col("embedding"))
    val sl = shortlist.select("query_id", "vec_id", "rel4").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val slIds = sl.map(t => (t._1, t._2)).toSet
    val slMaxRel = sl.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    val got = MmrRerank.rerank(spark, shortlist, k = 5).collect()
    val perQuery = got.groupBy(_.getLong(0))
    assert(perQuery.size == 5)
    perQuery.foreach { case (qid, picks) =>
      assert(picks.length == 5)
      assert(picks.forall(p => slIds.contains((qid, p.getLong(1)))),
        "every pick must come from the ANN shortlist")
      // rank-1 is the shortlist's pure-relevance argmax
      val r1 = picks.minBy(_.getInt(2))
      assert(r1.getDouble(3) == slMaxRel(qid))
    }
  }

  test("kcenter: farthest-point traversal on a line, radius non-increasing") {
    // points at x = 0, 1, 10, 11: seed = id 0 (min id), then the
    // farthest point is x=11 (id 3), then x=1? No — x=1 is 1 away from
    // seed, x=10 is 1 away from center 3; both min-dists are 1.0, the
    // vec_id tie-break picks id 1 third.
    val data = vecs(
      (0L, Seq(0f, 0f)), (1L, Seq(1f, 0f)), (2L, Seq(10f, 0f)), (3L, Seq(11f, 0f)))
    val got = KCenter.kcenterSample(spark, data, k = 4)
      .orderBy("sel_rank").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(0L, 3L, 1L, 2L), got.mkString(", "))
    assert(got.map(_.getDouble(2)).toSeq == Seq(0.0, 11.0, 1.0, 1.0))
  }

  test("kcenter degrades gracefully: partial selection under k vectors, empty frame on empty corpus") {
    val tiny = vecs((5L, Seq(0f, 0f)), (7L, Seq(3f, 4f)))
    val got = KCenter.kcenterSample(spark, tiny, k = 8).orderBy("sel_rank").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(5L, 7L),
      "corpus smaller than k must yield the whole corpus as a partial selection")
    assert(got.map(_.getDouble(2)).toSeq == Seq(0.0, 5.0))
    val empty = KCenter.kcenterSample(spark, vecs().limit(0), k = 3)
    assert(empty.count() == 0, "empty corpus must yield an empty frame, not a throw")
  }

  test("mmr emits min(k, candidates) picks when the pool is smaller than k") {
    val got = MmrRerank.mmrTopK(spark, vecs(mmrData.take(3): _*), vecs(mmrQ: _*),
      candidates = 25, k = 10)
    assert(got.count() == 3, "3-candidate pool must yield 3 ranked picks, not zero rows")
    assert(got.select("mmr_rank").orderBy("mmr_rank").collect()
      .map(_.getInt(0)).toSeq == Seq(1, 2, 3))
  }

  test("kcenter invariants on the embeddings table: distinct centers, non-increasing radius") {
    val got = KCenter.kcenterSample(spark, Tables.embeddings(spark, sf), k = 6)
      .orderBy("sel_rank").collect()
    assert(got.length == 6)
    assert(got.map(_.getLong(1)).distinct.length == 6)
    val radii = got.map(_.getDouble(2)).drop(1) // seed radius is 0.0 by convention
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      radii.mkString(", "))
  }
}
