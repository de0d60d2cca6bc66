package graft

import org.apache.spark.sql.functions._

import graft.query.SqSearch

class SqSpec extends SparkSpecBase {

  test("embed_sq: codes are byte-ranged; reconstruction error within delta/2 per dim") {
    val (vmin, delta) = SqSearch.fittedParams(spark, sf)
    assert(vmin.length == delta.length && vmin.nonEmpty)
    assert(delta.forall(_ >= 0.0))
    val codes = SqSearch.embedSq(spark, sf).cache()
    val rng = codes.agg(min("code"), max("code")).head()
    assert(rng.getInt(0) >= 0 && rng.getInt(1) <= 255)
    // reconstruction: |x - (vmin + code*delta)| <= delta/2 + ulp slop
    val data = Tables.embeddings(spark, sf)
      .select(col("vec_id"), posexplode(col("embedding").cast("array<double>")).as(Seq("d", "v")))
    val err = codes.join(data, Seq("vec_id", "d"))
      .select(col("d"), col("v"), col("code")).collect()
    err.foreach { r =>
      val (d, v, c) = (r.getInt(0), r.getDouble(1), r.getInt(2))
      val recon = vmin(d) + c * delta(d)
      assert(math.abs(v - recon) <= delta(d) / 2 + 1e-9,
        s"dim $d: |$v - $recon| > ${delta(d) / 2}")
    }
    codes.unpersist()
    ()
  }

  test("ann_sq_topk: self-queries rank first; recall@k beats PQ's coarser codes") {
    val out = SqSearch.annSqTopK(spark, sf).cache()
    val k = graft.config.GraftConfig.active.query.k
    val nq = graft.config.GraftConfig.active.query.numQueries
    val perQuery = out.groupBy("query_id").count().collect()
    assert(perQuery.length == nq && perQuery.forall(_.getLong(1) <= k))
    assert(out.filter(col("rnk") === 1)
      .filter(col("query_id") === col("vec_id")).count() == nq,
      "every query's rank-1 must be itself (distance 0)")
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select(col("query_id"), col("vec_id")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val brute = graft.query.AnnQuery.annBruteTopK(spark, sf)
        .select(col("query_id"), col("vec_id")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val rs = brute.map { case (q, gt) =>
        got.get(q).map(g => g.intersect(gt).size.toDouble / gt.size).getOrElse(0.0)
      }
      rs.sum / rs.size
    }
    val sqRecall = recallOf(out)
    // per-dim 8-bit codes keep far more geometry than 8 subspace
    // codewords: SQ8 should be near-exact on this corpus
    assert(sqRecall >= 0.9, s"SQ8 recall@k too low: $sqRecall")
    out.unpersist()
    ()
  }

  test("ann_ivfsq_topk: cell-bounded SQ serving keeps self-rank-1 and usable recall") {
    val out = SqSearch.annIvfsqTopK(spark, sf).cache()
    val k = graft.config.GraftConfig.active.query.k
    val nq = graft.config.GraftConfig.active.query.numQueries
    val perQuery = out.groupBy("query_id").count().collect()
    assert(perQuery.length == nq && perQuery.forall(_.getLong(1) <= k))
    // a query's own cell is always its first probe, so self survives
    // the cell cut and ADC ranks it at distance ~0
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
    // cells cost recall vs the exhaustive SQ scan (probe misses), but
    // the composition must stay usable — the IVF-PQ bar
    assert(mean >= 0.6, s"IVF-SQ recall@k too low: $mean")
    out.unpersist()
    ()
  }

  test("ann_tier_report: one row per tier, sane metrics, SQ8 recall >= PQ at equal shortlist") {
    val rows = graft.query.TierReport.annTierReport(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // the expected row set comes from the producer's OWN registry —
    // a new tier row updates TierNames (the producer asserts that) and
    // this consumer follows automatically instead of going stale
    assert(rows.keySet == graft.query.TierReport.TierNames.toSet)
    rows.foreach { case (tier, (r1, r10, ratio, cand, refine, bytes)) =>
      assert(r1 >= 0.0 && r1 <= 1.0, s"$tier recall@1 $r1")
      assert(r10 >= 0.0 && r10 <= 1.0, s"$tier recall@10 $r10")
      assert(ratio >= 1.0 || ratio == -1.0, s"$tier dist ratio $ratio below 1")
      assert(cand > 0 && refine > 0 && refine <= cand, s"$tier counts $cand/$refine")
      assert(bytes > 0, s"$tier bytes")
    }
    // every tier refines its shortlist exactly, so recall@1 is the
    // self-match for corpus queries whenever any candidate survives
    assert(rows("lsh_refine")._1 == 1.0, "lsh self-match recall@1")
    // SQ8 keeps every dimension (reconstruction error <= delta/2);
    // PQ loses geometry to codeword clustering — at the SAME cells,
    // probes, and AdcKeep shortlist, SQ8's recall cannot be worse
    assert(rows("ivf_sq8")._2 >= rows("ivf_pq")._2,
      s"sq8 recall@10 ${rows("ivf_sq8")._2} below pq ${rows("ivf_pq")._2}")
    // the celled tiers share routing, so their candidate counts agree;
    // the exhaustive rotated-PQ twin scans the whole corpus per query
    assert(rows("ivf_sq8")._4 == rows("ivf_pq")._4, "celled tiers share routing")
    val n = Tables.embeddings(spark, sf).count()
    assert(rows("opq_pq")._4 == n * graft.query.TierReport.NumQueries, "opq scans N per query")
    // 4x vs ~32x compression: SQ8 scans more candidate bytes than PQ
    assert(rows("ivf_sq8")._6 > rows("ivf_pq")._6, "sq8 must cost more bytes than pq")
    // the BQ tier is the exhaustive-Hamming twin: N x queries scanned,
    // HamKeep refined, dim/8 code bytes; exact refine keeps self-match
    assert(rows("bq_hamming")._4 == n * graft.query.TierReport.NumQueries, "bq scans N per query")
    assert(rows("bq_hamming")._1 == 1.0, "bq self-match recall@1")
    // the rotated-prefix MRL tier rides the SAME IVF routing as SQ8
    // and scores dim/4 floats = dim bytes per candidate — identical
    // candidate counts, identical refine counts, byte-identical scan
    // cost (the MrlSearch scaladoc claim, pinned here)
    assert(rows("ivf_mrl_rot")._4 == rows("ivf_sq8")._4, "mrl shares IVF routing with sq8")
    assert(rows("ivf_mrl_rot")._5 == rows("ivf_sq8")._5, "mrl shares refine budget with sq8")
    assert(rows("ivf_mrl_rot")._6 == rows("ivf_sq8")._6,
      s"mrl scan bytes ${rows("ivf_mrl_rot")._6} must equal sq8 ${rows("ivf_sq8")._6}")
  }

  test("ann_probe_curve: recall and cost both monotone in the probe budget") {
    val rows = graft.query.TierReport.annProbeCurve(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(rows.keySet == graft.query.TierReport.ProbeGrid.toSet)
    val ordered = graft.query.TierReport.ProbeGrid.sorted.map(rows)
    ordered.foreach { case (r1, r10, cand, share) =>
      assert(r1 >= 0.0 && r1 <= 1.0 && r10 >= 0.0 && r10 <= 1.0)
      assert(cand > 0 && share > 0.0 && share <= 1.0)
    }
    // more probes can only widen the candidate set: recall and cost
    // are both non-decreasing in the budget
    ordered.sliding(2).foreach {
      case Seq((r1a, r10a, ca, sa), (r1b, r10b, cb, sb)) =>
        assert(r1b >= r1a && r10b >= r10a, "recall must not drop with more probes")
        assert(cb >= ca && sb >= sa, "cost must not drop with more probes")
      case _ => ()
    }
    // a probed scan must stay a sliver of brute force at the widest
    // budget on this corpus (cells ~ sqrt N, 8 of them probed)
    assert(ordered.last._4 < 1.0, "widest budget must still prune")
    // self-match survives any budget >= 1 (the query's own cell is
    // always probed first)
    assert(ordered.head._1 > 0.99, "self-match recall@1 at nProbe=1")
  }

  test("ann_probe_autotune: minimal budget per met target, max-grid fallback flagged") {
    val curve = graft.query.TierReport.annProbeCurve(spark, sf).collect()
      .map(r => (r.getInt(0), r.getDouble(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    val rows = graft.query.TierReport.annProbeAutotune(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getInt(1), r.getInt(2), r.getDouble(3), r.getLong(4), r.getDouble(5)))
    assert(rows.map(_._1).toSeq == graft.query.TierReport.RecallTargets,
      "one row per target, target order")
    rows.foreach { case (t, np, met, r10, cand, share) =>
      val point = curve.find(_._1 == np).get
      assert((r10, cand, share) == ((point._2, point._3, point._4)),
        "carried metrics must be the chosen curve point's")
      if (met == 1) {
        assert(r10 >= t, s"met row below target: $r10 < $t")
        // minimality: no smaller grid budget meets the target
        curve.filter(_._1 < np).foreach(p =>
          assert(p._2 < t, s"smaller budget ${p._1} already met $t"))
      } else {
        // unmet -> the max-grid leg is served and no budget meets
        assert(np == curve.last._1, "unmet target must fall back to max grid")
        assert(curve.forall(_._2 < t), "unmet flag requires no leg meeting")
      }
    }
    // the SLO ladder is ordered: chosen budgets are non-decreasing in
    // the target (a stricter SLO can never need fewer probes)
    rows.sliding(2).foreach {
      case Array((_, a, _, _, _, _), (_, b, _, _, _, _)) => assert(b >= a)
      case _ => ()
    }
  }

  test("ann_tier_autotune: max-recall tier within each byte budget, cheapest fallback flagged") {
    val data = Tables.embeddings(spark, sf)
    val n = data.count()
    val dim = data.select(org.apache.spark.sql.functions.size(
      org.apache.spark.sql.functions.col("embedding"))).head().getInt(0)
    val brute = n * graft.query.TierReport.NumQueries.toLong * dim * 4L
    def share(b: Long): Double = math.floor(b.toDouble / brute * 10000) / 10000
    val report = graft.query.TierReport.annTierReport(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getLong(6)))
    val rows = graft.query.TierReport.annTierAutotune(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getString(1), r.getInt(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5)))
    assert(rows.map(_._1).toSeq == graft.query.TierReport.ByteBudgets,
      "one row per budget, ladder order")
    rows.foreach { case (bud, tier, met, r10, bytes, bshare) =>
      val point = report.find(_._1 == tier).get
      assert((r10, bytes) == ((point._2, point._3)),
        "carried metrics must be the chosen report row's")
      assert(bshare == share(bytes), "byte_share must be the floored share")
      if (met == 1) {
        assert(bshare <= bud, "met row over budget")
        // optimality: no fitting tier strictly beats the choice
        report.filter(t => share(t._3) <= bud).foreach { t =>
          assert(t._2 < r10 || (t._2 == r10 &&
              (t._3 > bytes || (t._3 == bytes && t._1 >= tier))),
            s"tier ${t._1} beats $tier within budget $bud")
        }
      } else {
        assert(report.forall(t => share(t._3) > bud), "unmet flag requires nothing fits")
        assert(bytes == report.map(_._3).min, "fallback must be the cheapest tier")
      }
    }
    // the 1.0 leg: at least the sub-brute tiers fit (BQ is ~1/32 of
    // brute by construction), and the pick is max recall among the
    // FITTING tiers — NOT the global max: lsh_refine's cand·8 +
    // refine·dim·4 can exceed the brute-force bytes on a small corpus
    // (its recall-1.0 row is then honestly out of budget)
    val full = rows.last
    assert(full._1 == 1.0 && full._3 == 1)
    val fitting = report.filter(t => share(t._3) <= 1.0)
    assert(fitting.nonEmpty && full._4 == fitting.map(_._2).max,
      "1.0 budget must pick max recall among fitting tiers")
    // among met legs, a bigger budget can never lose recall
    val met = rows.filter(_._3 == 1)
    met.sliding(2).foreach {
      case Array((_, _, _, a, _, _), (_, _, _, b, _, _)) => assert(b >= a)
      case _ => ()
    }
  }

  test("ann_tier_autotune_staged: staged board + staged pick equal the in-plan forms") {
    // the staged board holds the measured tier rows verbatim ...
    val board = graft.query.TierReport.tierReportExport(spark, sf).collect().toSeq
    val live = graft.query.TierReport.annTierReport(spark, sf).collect().toSeq
    assert(board.toSet == live.toSet,
      "the staged board must hold the measured tier rows")
    // ... and the staged pick applies the identical policy to them —
    // the production re-tune never re-measures (r14 VERDICT missing #2)
    val inPlan = graft.query.TierReport.annTierAutotune(spark, sf).collect().toSeq
    val staged = graft.query.TierReport.annTierAutotuneStaged(spark, sf).collect().toSeq
    assert(staged == inPlan,
      "the staged pick must equal the measure-and-pick form row-for-row")
  }

  test("ann_probe_autotune_staged: staged curve + staged pick equal the in-plan forms") {
    import graft.query.TierReport
    val board = TierReport.probeCurveExport(spark, sf).collect().toSeq
    val live = TierReport.annProbeCurve(spark, sf).collect().toSeq
    assert(board.toSet == live.toSet,
      "the staged curve must hold the measured probe rows")
    val inPlan = TierReport.annProbeAutotune(spark, sf).collect().toSeq
    val staged = TierReport.annProbeAutotuneStaged(spark, sf).collect().toSeq
    assert(staged == inPlan,
      "the staged pick must equal the measure-and-pick form row-for-row")
  }

  test("ann_search_probe_autotuned: the served rows ARE the picked budget's own serving plan") {
    import graft.query.TierReport
    val pick = TierReport.annProbeAutotuneStaged(spark, sf)
      .filter(col("target") === TierReport.ServeRecallTarget).head()
    val nProbe = pick.getInt(1)
    val served = TierReport.annSearchProbeAutotuned(spark, sf).collect().toSeq
    assert(served.nonEmpty &&
      served.forall(r => r.getInt(4) == nProbe && r.getInt(5) == pick.getInt(2)),
      s"every served row must carry the board's pick (n_probe=$nProbe, met=${pick.getInt(2)})")
    // value identity with the serving plan at that budget (the same
    // plan the curve measured)
    val data = Tables.embeddings(spark, sf)
    val cents = graft.query.IvfSearch.fittedCorpusCentroids(spark, sf, data)
    val queries = data.filter(col("vec_id") < graft.query.TierReport.NumQueries)
    val expected = graft.query.IvfSearch.ivfTopK(spark, data, queries,
        graft.query.TierReport.K, nProbe, cents).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(served.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      == expected,
      s"the served rows must equal the n_probe=$nProbe serving plan's output")
  }

  test("ann_search_autotuned: the served rows ARE the picked tier's own serving plan") {
    import graft.query.TierReport
    val pick = TierReport.annTierAutotuneStaged(spark, sf)
      .filter(col("budget_share") === TierReport.ServeBudgetShare).head()
    val tier = pick.getString(1)
    val served = graft.query.TierReport.annSearchAutotuned(spark, sf).collect().toSeq
    // tag faithfulness: one serving tier, the board's own met flag
    assert(served.nonEmpty &&
      served.forall(r => r.getString(4) == tier && r.getInt(5) == pick.getInt(2)),
      s"every served row must carry the board's pick ($tier, met=${pick.getInt(2)})")
    // value identity with the dispatched tier's FIRST-CLASS entry —
    // through the public registry, so the dispatch cannot drift from
    // the entries a user of that tier already runs
    val entryName = Map(
      "lsh_refine" -> "ann_lsh_topk", "ivf_sq8" -> "ann_ivfsq_topk",
      "ivf_pq" -> "ann_ivfpq_topk", "opq_pq" -> "ann_pcapq_topk",
      "bq_hamming" -> "ann_bq_topk", "ivf_mrl_rot" -> "ann_ivfmrl_topk")(tier)
    val expected = SparkEntry.queries(entryName)(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(served.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      == expected,
      s"the served rows must equal $entryName's own output")
  }
}
