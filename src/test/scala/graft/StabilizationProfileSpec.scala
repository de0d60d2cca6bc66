package graft

import org.apache.spark.sql.functions._

import graft.config.StabilizationConfig
import graft.eval.QueryProfile
import graft.index.LshIndex
import graft.lsh.{Lsh, LshParams}
import graft.query.AnnQuery

class StabilizationProfileSpec extends SparkSpecBase {

  lazy val emb = Tables.embeddings(spark, sf)
  lazy val model = Lsh.fit(emb, "embedding", LshParams())
  lazy val built = LshIndex.build(LshIndex.codes(emb, "vec_id", "embedding", model), 64)
  lazy val queries = emb.filter(col("vec_id") < 5)
  lazy val probed = AnnQuery.probeBlocks(spark, queries, model, built)

  test("stabilized refine bound: D1 limiter floor and ceiling semantics") {
    val p = model.params
    // raw per-query candidates at this sf comfortably exceed 20
    val raw = AnnQuery.candidateCounts(probed, built).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(raw.values.forall(_ > 20))
    // k=10, targetRatio=1.25 -> proposed=13; minFloor=max(10, 20)=20;
    // final = max(20, min(raw, 13)) = 20
    val tight = StabilizationConfig(enabled = true, minCandidates = 20, targetRatio = 1.25)
    val perQ = AnnQuery.boundedCandidates(probed, built, p, None, 10, tight)
      .groupBy("qid").count().collect()
    assert(perQ.length == 5 && perQ.forall(_.getLong(1) == 20),
      s"stabilized counts ${perQ.mkString(",")}")
    // disabled -> bound is refinementLimit alone (all raw candidates here)
    val off = StabilizationConfig(enabled = false)
    val perQOff = AnnQuery.boundedCandidates(probed, built, p, None, 10, off)
      .groupBy("qid").count().collect()
    perQOff.foreach(r => assert(raw(r.getLong(0)) == r.getLong(1)))
    // default config: limiter disabled (reference production behavior)
    // -> refinementLimit bound alone, everything kept at this sf
    val dflt = StabilizationConfig()
    assert(!dflt.enabled)
    val perQDflt = AnnQuery.boundedCandidates(probed, built, p, None, 10, dflt)
      .groupBy("qid").count().collect()
    perQDflt.foreach(r => assert(raw(r.getLong(0)) == r.getLong(1)))
  }

  test("stabilized bound never starves the top-k") {
    val tight = StabilizationConfig(enabled = true, minCandidates = 1, targetRatio = 1.0)
    // minFloor = max(k, 1) = k: even the tightest limiter keeps >= k
    val bounded = AnnQuery.boundedCandidates(probed, built, model.params, None, 10, tight)
    val perQ = bounded.groupBy("qid").count().collect()
    assert(perQ.forall(_.getLong(1) >= 10))
  }

  test("per-query profile: probe fan, candidate surface, distance envelope") {
    val result = AnnQuery.refineFromProbes(probed, emb, queries, 10, model, built)
    val prof = QueryProfile.profile(probed, built, result).collect()
    assert(prof.length == 5)
    prof.foreach { r =>
      assert(r.getLong(1) == model.params.tables.toLong * model.params.divisions *
        model.params.maxProbes, s"n_probes ${r.getLong(1)}")
      assert(r.getLong(2) > 0) // candidates
      // per-table fanout (SearchDiagnostics.fanoutPerTable): tables in
      // range, and per-table unique ids cover the distinct union
      val fanout = r.getMap[Int, Long](3)
      assert(fanout.nonEmpty && fanout.keys.forall(t => t >= 0 && t < model.params.tables))
      assert(fanout.values.sum >= r.getLong(2), s"fanout $fanout < union ${r.getLong(2)}")
      assert(fanout.values.forall(_ <= r.getLong(2)))
      assert(r.getLong(4) == 10) // results
      assert(r.getDouble(5) <= r.getDouble(6)) // best <= worst
    }
  }

  test("csv export writes one artifact row per input row") {
    val result = AnnQuery.refineFromProbes(probed, emb, queries, 10, model, built)
    val file = "/root/repo/target/tmp/profile-spec/per_query.csv"
    QueryProfile.exportCsv(QueryProfile.profile(probed, built, result), file)
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(file))
    assert(lines.size == 6) // header + 5 queries
    assert(lines.get(0).startsWith("query_id,n_probes,n_candidates,fanout_per_table"))
    // the map column renders with commas: every row must still carry
    // exactly the header's field count once quoted segments collapse
    val nFields = lines.get(0).split(",").length
    (1 until lines.size).foreach { i =>
      val outsideQuotes = lines.get(i).split("\"").zipWithIndex
        .collect { case (seg, idx) if idx % 2 == 0 => seg }.mkString
      assert(outsideQuotes.count(_ == ',') == nFields - 1, s"row $i: ${lines.get(i)}")
    }
  }
}
