package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusStats

class CmsSpec extends SparkSpecBase {
  import spark.implicits._

  test("ngram_cms_topk: CM estimates never underestimate; exact top-k carried through") {
    val out = CorpusStats.ngramCmsTopk(spark, sf).collect()
    assert(out.length == CorpusStats.TopGramK ||
      out.length > 0 && out.length < CorpusStats.TopGramK) // corpus may have < k grams
    out.foreach { r =>
      val (tf, est, err) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est >= tf, s"CM underestimated ${r.getString(0)}: est=$est < tf=$tf")
      assert(err == est - tf)
    }
    // the audited grams ARE the exact top-k (same cut as ngram_topk)
    val exact = CorpusStats.ngramTopk(
        Tables.documents(spark, sf), "doc_id", "text",
        CorpusStats.TopGramWidth, CorpusStats.TopGramK)
      .select("gram").collect().map(_.getString(0)).toSet
    assert(out.map(_.getString(0)).toSet == exact)
  }

  test("cmsSketch: every row partitions the gram stream; shards merge cell-wise") {
    val docs = Seq(
      (0L, "a b c a b c a b c"),
      (1L, "x y z x y z"),
      (2L, "a b c x y z")).toDF("doc_id", "text")
    val sk = CorpusStats.cmsSketch(docs, "doc_id", "text", 3).cache()
    // each gram occurrence lands exactly once per row j: row sums equal
    // the total gram count, for every row
    val totalGrams = docs.select(explode(
      graft.dedup.Dedup.shingles(graft.dedup.Dedup.tokens(col("text")), 3))).count()
    val rowSums = sk.groupBy("j").agg(sum("cnt").as("s")).collect()
    assert(rowSums.length == CorpusStats.CmsDepth)
    rowSums.foreach(r => assert(r.getLong(1) == totalGrams,
      s"row ${r.getInt(0)} sum ${r.getLong(1)} != $totalGrams"))
    // mergeability: sketch(A union B) = cell-wise sum of shard sketches
    val a = docs.filter(col("doc_id") < 2)
    val b = docs.filter(col("doc_id") >= 2)
    val merged = CorpusStats.cmsSketch(a, "doc_id", "text", 3)
      .unionAll(CorpusStats.cmsSketch(b, "doc_id", "text", 3))
      .groupBy("j", "cell").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val whole = sk.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(merged == whole, "shard sketches must merge to the whole-corpus sketch")
    sk.unpersist()
    ()
  }
}
