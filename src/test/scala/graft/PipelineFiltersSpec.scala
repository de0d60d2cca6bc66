package graft

import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Decontaminate}
import graft.text.TextFilters

/** Ground truth for the round-4 pipeline operators: decontamination,
  * PII scrubbing, composite quality filtering, token-budget mixing. */
class PipelineFiltersSpec extends SparkSpecBase {

  private lazy val docs = Tables.documents(spark, sf)

  test("decontaminate: planted benchmark prefixes are flagged, clean docs are not") {
    import spark.implicits._
    val bench = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (1L, "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
    val train = Seq(
      // carries benchmark doc 0's 5-gram run -> contaminated
      (10L, "xx yy alpha beta gamma delta epsilon zz ww vv uu tt"),
      // no shared 5-gram (only a 3-token run from bench doc 1)
      (11L, "one two three banana apple pear plum cherry grape fig"),
      // fully disjoint
      (12L, "red green blue cyan magenta yellow black white gray pink"))
      .toDF("doc_id", "text")
    val out = Decontaminate.decontaminate(train, bench, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getInt(4))).toMap
    assert(out(10L)._2 == 1 && out(10L)._1 >= 1, s"planted doc not flagged: $out")
    assert(out(11L)._2 == 0, s"3-token run must not trip 5-gram decontamination: $out")
    assert(out(12L)._2 == 0)
  }

  test("decontaminate query: every planted doc flagged; corpus not all-contaminated") {
    val out = Decontaminate.decontaminateQuery(spark, sf).cache()
    val planted = out.filter(col("doc_id") % 23 === 5 && col("doc_id") % 17 =!= 0)
    assert(planted.count() > 0)
    assert(planted.filter(col("contaminated") === 0).count() == 0,
      "planted benchmark prefix must always be caught")
    val total = out.count()
    val flagged = out.filter(col("contaminated") === 1).count()
    assert(flagged < total / 2, s"$flagged/$total contaminated — planting overwhelmed the corpus")
    out.unpersist()
  }

  test("pii_scrub: every planted PII string is redacted; clean text has zero matches") {
    val out = TextFilters.piiScrubQuery(spark, sf).cache()
    // type routing by doc_id mod 7
    assert(out.filter(col("doc_id") % 7 === 0 && col("n_emails") < 1).count() == 0)
    assert(out.filter(col("doc_id") % 7 === 1 && col("n_phones") < 1).count() == 0)
    assert(out.filter(col("doc_id") % 7 === 2 && col("n_ips") < 1).count() == 0)
    // redaction is complete: re-scrubbing the cleaned text finds nothing
    val rescrub = TextFilters.piiScrub(
      out.select(col("doc_id"), col("text_clean").as("text")), "doc_id", "text")
    assert(rescrub.filter(col("n_emails") + col("n_phones") + col("n_ips") > 0).count() == 0)
    // placeholders landed
    assert(out.filter(col("doc_id") % 7 === 0 && !col("text_clean").contains("<EMAIL>")).count() == 0)
    out.unpersist()
  }

  test("pii_scrub counts are redaction counts: a phone-shaped run inside an email is neither") {
    import spark.implicits._
    val tricky = Seq(
      (1L, "mail 555-123-4567@host.com please"), // phone-shaped local part, one EMAIL redaction
      (2L, "call 555-123-4567 please"),          // a real phone
      (3L, "both x@y.io and 10.1.2.3 here"))     // independent types both count
      .toDF("doc_id", "text")
    val out = TextFilters.piiScrub(tricky, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(out(1L)._1 == 1 && out(1L)._2 == 0 && out(1L)._3 == 0, s"doc 1: ${out(1L)}")
    assert(out(1L)._4 == "mail <EMAIL> please")
    assert(out(2L)._2 == 1 && out(2L)._4 == "call <PHONE> please")
    assert(out(3L)._1 == 1 && out(3L)._3 == 1)
  }

  test("quality filter: each rule fires on a crafted doc, reasons in fixed order") {
    import spark.implicits._
    val crafted = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and then runs far away to the old barn in town tonight"), // ok (21 tokens)
      (2L, "short text only"),                                            // too_short
      (3L, Seq.fill(30)("the").mkString(" ")),                            // repetitive (dup frac ~0.97)
      (4L, (1 to 25).map(i => s"w$i").mkString(" ")),                     // no_stopwords
      (5L, "the " * 10 + (1 to 15).map(_ => "zz").mkString(" ")))         // repetitive beats later rules
      .toDF("doc_id", "text")
    val out = TextFilters.qualityFilter(crafted, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(5), r.getInt(6))).toMap
    assert(out(1L) == ("ok", 1), s"doc 1: ${out(1L)}")
    assert(out(2L) == ("too_short", 0))
    assert(out(3L) == ("repetitive", 0))
    assert(out(4L) == ("no_stopwords", 0))
    assert(out(5L)._2 == 0)
    // corpus splits: both outcomes occur at sf
    val q = TextFilters.qualityFilterQuery(spark, sf)
    val keeps = q.groupBy("keep").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(keeps.getOrElse(1, 0L) > 0 && keeps.getOrElse(0, 0L) > 0, s"degenerate split: $keeps")
  }

  test("repetition_filter: planted repetitive docs drop by the right rule") {
    import graft.text.TextAnalysis
    val out = TextAnalysis.repetitionFilterQuery(spark, sf).cache()
    // every dup-token plant drops by rule 1; every top-bigram plant
    // (not shadowed by a dup plant collision) drops by rule 2 with its
    // dup fraction sitting exactly AT the cap (rule 1 must pass it)
    val dupPlants = out.filter(col("doc_id") % 41 === 7)
    assert(dupPlants.count() > 0)
    assert(dupPlants.filter(col("fail_reason") =!= "dup_tokens").count() == 0)
    val bigPlants = out.filter(col("doc_id") % 53 === 29 && col("doc_id") % 41 =!= 7)
    assert(bigPlants.count() > 0)
    assert(bigPlants.filter(col("fail_reason") =!= "top_bigram").count() == 0)
    assert(bigPlants.filter(col("dup_token_frac") > TextAnalysis.RepDupTokenMax)
      .count() == 0)
    // verdicts are exactly the two-rule CASE over the signals (the
    // synthetic corpus is NATURALLY repetitive — many non-planted docs
    // legitimately trip rule 1; the flag must still be consistent)
    val bad = out.filter(
      (col("dup_token_frac") > TextAnalysis.RepDupTokenMax &&
        col("fail_reason") =!= "dup_tokens") ||
      (col("dup_token_frac") <= TextAnalysis.RepDupTokenMax &&
        col("top_bigram_frac") > TextAnalysis.RepTopBigramMax &&
        col("fail_reason") =!= "top_bigram") ||
      ((col("fail_reason") === "ok") =!= (col("keep") === 1)))
    assert(bad.count() == 0)
    out.unpersist()
  }

  test("url_filter: normalization cancels surface noise; verdicts fire in fixed order") {
    import spark.implicits._
    import graft.text.UrlFilter
    val urls = Seq(
      (0L, "https://www.example.com/a/page-1?utm_source=feed"),
      (1L, "http://example.com/a/page-1"),          // same page, other surface
      (2L, "https://blogspam.info/b/page-2"),       // blocklist wins over its TLD
      (3L, "http://papers.xyz/c/page-3"),
      (4L, "https://wiki.org/d/page-4")
    ).toDF("doc_id", "url")
    val got = UrlFilter.urlFilter(urls)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(2), r.getString(3), r.getString(4), r.getString(5), r.getInt(6)))).toMap
    assert(got(0L) == (("example.com/a/page-1", "example", ".com", "ok", 1)), got(0L).toString)
    // the recrawl normalizes to the same URL; min doc_id keeps it
    assert(got(1L) == (("example.com/a/page-1", "example", ".com", "dup_url", 0)), got(1L).toString)
    assert(got(2L)._4 == "blocklist" && got(2L)._5 == 0, got(2L).toString)
    assert(got(3L) == (("papers.xyz/c/page-3", "papers", ".xyz", "low_quality_tld", 0)), got(3L).toString)
    assert(got(4L)._4 == "ok" && got(4L)._5 == 1, got(4L).toString)
  }

  test("url_filter query: planted blocklist domains always drop; all verdicts occur") {
    import graft.text.UrlFilter
    val res = UrlFilter.urlFilterQuery(spark, sf).collect()
    // every doc whose planted identity lands on a blocked domain is dropped as blocklist
    res.foreach { r =>
      if (UrlFilter.BlockedDomains.contains(r.getString(3)))
        assert(r.getString(5) == "blocklist", s"doc ${r.getLong(0)}: ${r.getString(5)}")
    }
    val reasons = res.map(_.getString(5)).toSet
    assert(Set("blocklist", "low_quality_tld", "dup_url", "ok").subsetOf(reasons), reasons.toString)
    // row cardinality preserved: one verdict per document
    assert(res.length == Tables.documents(spark, sf).count())
  }

  test("data mix: greedy budget fill per stratum, deterministic, unknown strata excluded") {
    val out = Corpus.dataMixQuery(spark, sf).cache()
    val budgets = Corpus.MixWeights.map { case (s, w) =>
      s -> math.floor(w * Corpus.MixBudget).toLong }
    val totals = docs.groupBy("lang")
      .agg(sum(size(split(col("text"), " "))).as("avail")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = out.groupBy("lang").agg(
        sum("n_tokens").as("toks"), max("n_tokens").as("max_doc"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    budgets.foreach { case (lang, b) =>
      val (toks, maxDoc, _) = got(lang)
      if (totals(lang) >= b + maxDoc) {
        // enough supply: selection reaches the budget and overshoots by
        // less than one document (greedy crossing-doc rule)
        assert(toks >= b, s"$lang: $toks < budget $b")
        assert(toks - maxDoc < b, s"$lang: overshoot exceeds one doc ($toks, max $maxDoc, budget $b)")
      } else assert(toks == totals(lang) || toks >= b,
        s"$lang: took $toks of ${totals(lang)} available, budget $b")
    }
    // only configured strata appear
    assert(out.filter(!col("lang").isin(budgets.keys.toSeq.map(x => x: Any): _*)).count() == 0)
    // en gets ~4x the tokens of any 0.125-weight stratum with full supply
    val again = Corpus.dataMixQuery(spark, sf)
    assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
    out.unpersist()
  }
}
