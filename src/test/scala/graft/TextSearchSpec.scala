package graft

import org.apache.spark.sql.functions._

import graft.text.TextSearch

class TextSearchSpec extends SparkSpecBase {

  test("bm25 hand-computed score on a tiny corpus") {
    import spark.implicits._
    // doc 0 is the query ("cat dog"); "cat" appears twice in doc 1,
    // once in doc 2; "dog" only in doc 0. N=3.
    val docs = Seq(
      (0L, "cat dog"),
      (1L, "cat cat fish"),
      (2L, "cat bird bird bird")).toDF("doc_id", "text")
    val got = TextSearch.bm25(docs, numQueries = 1, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(_._4)
    val n = 3.0
    val avgdl = (2 + 3 + 4).toDouble / 3
    def idf(df: Int) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def tfn(tf: Int, dl: Int) =
      tf.toDouble / (tf + TextSearch.K1 * (1.0 - TextSearch.B + TextSearch.B * dl / avgdl))
    def fl(x: Double) = math.floor(x * 10000) / 10000
    val expected = Map(
      0L -> fl(idf(3) * tfn(1, 2) + idf(1) * tfn(1, 2)), // cat + dog
      1L -> fl(idf(3) * tfn(2, 3)),
      2L -> fl(idf(3) * tfn(1, 4)))
    assert(got.map(_._2).toSet == Set(0L, 1L, 2L))
    got.foreach { case (q, d, s, _) =>
      assert(q == 0L && s == expected(d), s"doc $d: got $s want ${expected(d)}")
    }
  }

  test("bm25 results: contiguous ranks, non-increasing scores, query term containment") {
    val res = TextSearch.textSearchBm25(spark, sf).cache()
    val byQ = res.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .groupBy(_._1)
    assert(byQ.size == TextSearch.NumQueries)
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to sorted.length),
        s"query $q ranks not contiguous")
      assert(sorted.sliding(2).forall(p => p.length < 2 || p(0)._3 >= p(1)._3),
        s"query $q scores increase with rank")
    }
    // every hit shares >= 1 leading query term with its query doc
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
    val qt = docs.filter(col("doc_id") < TextSearch.NumQueries)
      .select(col("doc_id").as("query_id"),
        slice(col("toks"), 1, TextSearch.QueryLen).as("qtoks"))
    val bad = res.join(qt, Seq("query_id")).join(docs, Seq("doc_id"))
      .filter(size(array_intersect(col("qtoks"), col("toks"))) === 0)
      .count()
    assert(bad == 0)
    res.unpersist()
    ()
  }

  test("rrf fusion: both-list docs sum both reciprocal ranks, sentinel 0 otherwise") {
    val fused = graft.text.TextSearch.hybridSearchRrf(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3), r.getInt(4), r.getInt(5)))
    assert(fused.nonEmpty)
    fused.foreach { case (q, d, rrf, bRnk, aRnk, _) =>
      val want = (if (aRnk > 0) 1.0 / (TextSearch.RrfK + aRnk) else 0.0) +
        (if (bRnk > 0) 1.0 / (TextSearch.RrfK + bRnk) else 0.0)
      assert(math.abs(rrf - want) < 1e-6, s"($q,$d): rrf $rrf want ~$want")
      assert(aRnk > 0 || bRnk > 0, s"($q,$d) in neither source list")
    }
    // the ANN side always ranks the query doc itself first (dist 0),
    // so every query's fused list contains the query doc
    val self = fused.filter(t => t._1 == t._2)
    assert(self.length == TextSearch.NumQueries)
    self.foreach { case (_, _, _, _, aRnk, _) => assert(aRnk == 1) }
  }

  test("fused ordering is by rrf desc with doc_id tie-break") {
    val fused = graft.text.TextSearch.hybridSearchRrf(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(5)))
    fused.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._4)
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          assert(x._3 > y._3 || (x._3 == y._3 && x._2 < y._2),
            s"query $q: rank ${x._4} -> ${y._4} not (rrf desc, doc_id)")
        case _ =>
      }
    }
  }

  test("bm25 plan: no cartesian, query side broadcast") {
    val p = TextSearch.textSearchBm25(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }
}
