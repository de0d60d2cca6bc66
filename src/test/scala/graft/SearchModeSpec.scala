package graft

import org.apache.spark.sql.functions._

import graft.config.{GraftConfig, SearchConfig}
import graft.index.LshIndex
import graft.lsh.{Lsh, LshParams}
import graft.query.AnnQuery

class SearchModeSpec extends SparkSpecBase {

  private lazy val emb = Tables.embeddings(spark, sf).cache()

  test("search.mode round-trips through config JSON, profiles, and rejects junk") {
    assert(!GraftConfig.parse("{}").search.paperBaseline)
    assert(GraftConfig.parse("""{"search":{"mode":"paper_baseline"}}""").search.paperBaseline)
    val profiled = GraftConfig.parse(
      """{"search":{"mode":"optimized"},
        | "profiles":[{"name":"eval","overrides":{"search":{"mode":"paper_baseline"}}}]}""".stripMargin,
      Some("eval"))
    assert(profiled.search.paperBaseline)
    intercept[IllegalArgumentException] {
      GraftConfig.parse("""{"search":{"mode":"fast_and_loose"}}""")
    }
  }

  test("baseline pins the probe budget to the paper default; optimized keeps overrides") {
    val widened = LshParams(maxProbes = 40)
    assert(SearchConfig("paper_baseline").pinParams(widened).maxProbes
      == LshParams().maxProbes)
    assert(SearchConfig("optimized").pinParams(widened).maxProbes == 40)
  }

  test("OPTIMIZED differs from PAPER_BASELINE where the refinement bound bites") {
    // a refinement limit of 1 forces optimized mode to exactly-refine
    // only the single best-Hamming candidate per query — the true
    // nearest neighbor can hide behind a better-coded decoy, which the
    // baseline profile (refine EVERYTHING probed) always finds
    val params = LshParams(refinementLimit = 1, maxGlobalCandidates = 1)
    val model = Lsh.fit(emb, "embedding", params)
    val built = LshIndex.build(LshIndex.codes(emb, "vec_id", "embedding", model), 64)
    val queries = emb.filter(col("vec_id") < 10)
    val opt = AnnQuery.lshTopK(spark, emb, queries, 10, model, built,
      search = SearchConfig("optimized"))
    val paper = AnnQuery.lshTopK(spark, emb, queries, 10, model, built,
      search = SearchConfig("paper_baseline"))
    val nOpt = opt.count(); val nPaper = paper.count()
    assert(nOpt < nPaper,
      s"optimized's bound must cut results under refinementLimit=1 ($nOpt vs $nPaper)")
    // baseline always refines at least the optimized candidate set
    assert(opt.select("query_id", "vec_id")
      .except(paper.select("query_id", "vec_id")).count() <= nOpt,
      "sanity: both modes produce per-query ranked rows")
  }

  test("baseline mode never retries: starved queries stay starved") {
    val model = Lsh.fit(emb, "embedding", LshParams())
    val built = LshIndex.build(LshIndex.codes(emb, "vec_id", "embedding", model), 64)
    val queries = emb.filter(col("vec_id") < 3)
    val k = emb.count().toInt + 100 // k beyond the corpus starves every query
    val paper = AnnQuery.lshTopKAdaptive(spark, emb, queries, k, model, built,
      search = SearchConfig("paper_baseline"))
    val single = AnnQuery.lshTopK(spark, emb, queries, k, model, built,
      search = SearchConfig("paper_baseline"))
    // byte-identical to the single pass: the retry never ran
    assert(paper.exceptAll(single).count() == 0 && single.exceptAll(paper).count() == 0)
  }

  test("the default path is OPTIMIZED and unchanged by the new parameter") {
    assert(!GraftConfig.active.search.paperBaseline)
    val model = Lsh.fit(emb, "embedding", LshParams())
    val built = LshIndex.build(LshIndex.codes(emb, "vec_id", "embedding", model), 64)
    val queries = emb.filter(col("vec_id") < 5)
    val dflt = AnnQuery.lshTopK(spark, emb, queries, 10, model, built)
    val opt = AnnQuery.lshTopK(spark, emb, queries, 10, model, built,
      search = SearchConfig("optimized"))
    assert(dflt.exceptAll(opt).count() == 0 && opt.exceptAll(dflt).count() == 0)
  }
}
