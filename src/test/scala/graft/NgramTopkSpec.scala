package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusStats

/** Corpus-level n-gram heavy hitters: hand-counted frequencies,
  * deterministic tie-break, short-doc fallback, TakeOrdered posture. */
class NgramTopkSpec extends SparkSpecBase {
  import spark.implicits._

  test("ngram_topk: hand-counted tf/df, rank ordering, tie-break on gram") {
    val docs = Seq(
      (1L, "a b c a b c x"),  // "a b c" x2, "b c a", "c a b", "b c x"
      (2L, "a b c d"),        // "a b c", "b c d"
      (3L, "tiny")            // fallback: whole-doc gram
    ).toDF("doc_id", "text")
    val out = CorpusStats.ngramTopk(docs, "doc_id", "text", 3, 10)
      .orderBy("rank").collect()
    assert(out.head.getAs[String]("gram") == "a b c")
    assert(out.head.getAs[Long]("tf") == 3L && out.head.getAs[Long]("df") == 2L)
    // remaining grams all tf=1 -> ranked alphabetically
    val rest = out.tail.map(_.getAs[String]("gram"))
    assert(rest.sameElements(rest.sorted), rest.mkString(", "))
    assert(rest.contains("tiny"), "short-doc fallback gram missing")
    assert(out.forall(r => r.getAs[Long]("tf") >= 1L))
    val ranks = out.map(_.getAs[Int]("rank"))
    assert(ranks.sameElements(1 to out.length))
  }

  test("ngram_topk: global top-k is TakeOrdered, not a full sort") {
    val docs = Tables.documents(spark, sf)
    val plan = CorpusStats.ngramTopk(docs, "doc_id", "text", 3, 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected heap-based top-k:\n$plan")
  }
}
