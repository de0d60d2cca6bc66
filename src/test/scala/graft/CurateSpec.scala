package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curate, Decontaminate}
import graft.text.{TextAnalysis, TextFilters}

/** The end-to-end curation funnel: verdict = first failed stage. */
class CurateSpec extends SparkSpecBase {

  test("funnel verdicts: fixed domain, planted leaks never survive, lm tail cuts a decile") {
    val out = Curate.corpusCurateQuery(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val nTrain = Tables.documents(spark, sf)
      .filter(col("doc_id") % 17 =!= 0).count()
    assert(out.size.toLong == nTrain, s"${out.size} vs $nTrain")
    val domain = Set("too_short", "repetitive", "no_stopwords", "word_length",
      "dup_tokens", "top_bigram", "contaminated", "lm_tail", "keep")
    assert(out.values.forall(domain), out.values.toSet.toString)
    // every planted-leak doc (the decontaminate construction) fails
    // SOME stage — contamination is checked before the LM cut, so a
    // leak can fail an earlier rule but can never reach 'keep'
    val planted = out.keys.filter(id => id % 23 == 5 && id % 17 != 0)
    assert(planted.nonEmpty)
    planted.foreach { id =>
      assert(out(id) != "keep", s"planted leak $id kept: ${out(id)}")
    }
    // at least one doc reaches each of the funnel's three phases
    assert(out.values.exists(_ == "contaminated"), "no contamination drop")
    assert(out.values.exists(_ == "lm_tail"), "no lm tail drop")
    assert(out.values.count(_ == "keep") > 0, "nothing kept")
    // the LM stage cuts (about) the worst decile of survivors: the
    // quantile rank rule means at least floor(0.1*(n-1)) + 1 rows sit
    // at or below the threshold, all of which were stage-4 survivors
    val nSurv = out.values.count(v => v == "keep" || v == "lm_tail")
    val nTail = out.values.count(_ == "lm_tail")
    assert(nTail >= 1 && nTail <= math.max(1, (nSurv * 0.25).toInt),
      s"$nTail of $nSurv survivors cut")
  }

  test("curate equals manual stage composition on a handcrafted corpus") {
    import spark.implicits._
    // docs: one obviously keepable, one too short, one repetitive
    val good = "the quick brown fox and the lazy dog walked to the " +
      "market in the cold morning air of a december day to buy bread " +
      "and cheese for the long winter feast ahead of them all"
    val docs = Seq(
      (1L, good),
      (2L, "tiny doc"),
      (3L, Seq.fill(40)("spam").mkString(" ") + " the a of and to in extra")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "benchmark question about ancient rivers and lakes"))
      .toDF("doc_id", "text")
    val out = Curate.curate(docs, bench).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(2L) == "too_short", out.toString)
    assert(out(3L) == "repetitive", out.toString)
    // doc 1 survives rules and contamination; it is the whole survivor
    // set, so the decile rank-1 threshold is its own score and it keeps
    assert(out(1L) == "keep", out.toString)
  }
}
