package graft

import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, SemDedup}
import graft.query.IvfSearch

class SemDedupSpec extends SparkSpecBase {

  private lazy val result = SemDedup.dedupSemantic(spark, sf)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getBoolean(3), r.getDouble(4)))

  test("planted exact + jittered copies form one component per seed") {
    val byComp = result.groupBy(_._2)
    (0L until 10L).foreach { i =>
      val comp = byComp(i).map(_._1).toSet
      assert(comp == Set(i, i + Dedup.PlantOffset, i + 2 * Dedup.PlantOffset),
        s"seed $i component = $comp")
    }
  }

  test("exactly one keeper per component; keeper is argmin (csim, vec_id)") {
    result.groupBy(_._2).foreach { case (comp, members) =>
      val keepers = members.filter(_._4)
      assert(keepers.length == 1, s"component $comp has ${keepers.length} keepers")
      val expected = members.minBy(m => (m._5, m._1))._1
      assert(keepers.head._1 == expected,
        s"component $comp kept ${keepers.head._1}, SemDeDup policy says $expected")
    }
  }

  test("non-planted vectors are kept singletons; row count covers the corpus") {
    val singles = result.filter(_._3 == 1L)
    assert(singles.forall(_._4), "a singleton was dropped")
    val n = Tables.embeddings(spark, sf).count()
    assert(result.length == n + 20, s"${result.length} decision rows for $n + 20 corpus")
    assert(singles.length == result.length - 30)
  }

  test("decision table is deterministic across invocations") {
    val again = SemDedup.dedupSemantic(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getDouble(4)))
    assert(result.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("edge plan is a cell equi-join — no cartesian, no nested-loop") {
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val cents = IvfSearch.fitCentroids(e, SemDedup.SemCells)
    val edges = SemDedup.semanticEdges(
      SemDedup.assignWithCentSim(e, cents), SemDedup.SemTau, SemDedup.SemMaxCell)
    val p = edges.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("hot-cell guard drops oversized cells from pairing") {
    import spark.implicits._
    // 40 identical vectors in one degenerate cell + 2 dups elsewhere
    val hot = (0 until 40).map(i => (i.toLong, Array.fill(4)(1.0f)))
    val pair = Seq((100L, Array(9f, 0f, 0f, 0f)), (101L, Array(9f, 0f, 0f, 0f)))
    val e = (hot ++ pair).toDF("vec_id", "embedding")
    val cents = Array(Array(1f, 1f, 1f, 1f), Array(9f, 0f, 0f, 0f))
    val guarded = SemDedup.semanticDedupPlan(e, cents, tau = 0.999, maxCell = 10)
    // the hot cell never pairs: all 40 stay singletons; the small cell still dedups
    assert(guarded.filter(col("vec_id") < 100 && col("n_comp") > 1).count() == 0)
    assert(guarded.filter(col("vec_id") >= 100).select("comp").distinct().count() == 1)
    guarded.unpersist()
    ()
  }

  test("cell sizing is config-driven: explicit wins, 0 auto-sizes to ~sqrt(N)") {
    import graft.config.{GraftConfig, SemDedupConfig}
    // default config: the demo constant, corpus size never consulted
    assert(SemDedup.resolveCells(sys.error("count must not run")) == SemDedup.SemCells)
    // explicit override
    assert(SemDedup.resolveCells(1L << 30, SemDedupConfig(cells = 64)) == 64)
    // auto: sqrt-N clamped exactly like the IVF entries
    val auto = SemDedupConfig(cells = 0)
    assert(SemDedup.resolveCells(200000L, auto) == 448)   // ceil(sqrt(200k))
    assert(SemDedup.resolveCells(1L << 30, auto) == 4096) // production cap
    assert(SemDedup.resolveCells(100L, auto) == 4)        // tiny-corpus floor of 4
    // config JSON round-trip
    val cfg = GraftConfig.parse("""{"semdedup": {"cells": 0, "maxCell": 1024}}""")
    assert(cfg.semdedup == SemDedupConfig(cells = 0, maxCell = 1024))
  }

  test("dedup_semantic_tune: monotone over tau, reconciles with the decision plan at SemTau") {
    val rows = SemDedup.dedupSemanticTune(spark, sf).collect()
      .map(r => r.getDouble(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(rows.keySet == SemDedup.TuneTaus.toSet)
    // tightening tau can only shed edges and flagged docs
    val ordered = SemDedup.TuneTaus.sorted.map(rows)
    ordered.sliding(2).foreach { case Seq((e1, f1, s1), (e2, f2, s2)) =>
      assert(e2 <= e1 && f2 <= f1 && s2 <= s1, "grid must be monotone")
    case _ => ()
    }
    // the planted 10 exact + 10 jittered copies are flagged at EVERY
    // grid tau (cosine 1.0 and ~1-1e-8 both round to 1.0)
    assert(rows.values.forall(_._2 >= 20L))
    // at the library default SemTau the flagged set equals the docs
    // the decision plan puts in non-singleton components
    val nonSingleton = result.filter(_._3 > 1).map(_._1).toSet
    assert(rows(SemDedup.SemTau)._2 == nonSingleton.size.toLong,
      "planner's flagged count at SemTau must reconcile with the decision plan")
  }

  test("dedup_semantic_delta: equals the full pair set restricted to delta-touching, both legs occur") {
    import org.apache.spark.sql.functions._
    val got = SemDedup.dedupSemanticDelta(spark, sf)
      .select("a", "b", "leg").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getString(2)))
    // the full-run twin at the SAME base-frozen centroids: pair every
    // guarded cell over base∪delta, restrict to delta-touching pairs
    val corpus = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val planted = corpus.unionByName(
        corpus.filter(col("vec_id") < 10)
          .select((col("vec_id") + graft.dedup.Dedup.PlantOffset).as("vec_id"), col("embedding")))
      .unionByName(
        corpus.filter(col("vec_id") < 10)
          .select((col("vec_id") + 2 * graft.dedup.Dedup.PlantOffset).as("vec_id"),
            transform(col("embedding"),
              (x, i) => when(i === 0, x + lit(0.001f)).otherwise(x)).as("embedding")))
    val isDelta = graft.Carves.deltaSplit(col("vec_id"), graft.dedup.Dedup.PlantOffset)
    val base = planted.filter(!isDelta)
    val sd = graft.config.GraftConfig.active.semdedup
    val c = SemDedup.resolveCells(base.count(), sd)
    val cents = graft.query.IvfSearch.fitCentroids(base, c, Some(s"semdelta:$sf"))
    val full = SemDedup.semanticEdges(
        SemDedup.assignWithCentSim(planted, cents), SemDedup.SemTau, sd.maxCell)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val deltaIds = planted.filter(isDelta).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val want = full.filter(p => deltaIds.contains(p._1) || deltaIds.contains(p._2))
    assert(got.map(_._1).toSet == want,
      "delta pair set must equal the full run restricted to delta-touching pairs")
    // leg labels faithful, and the carve makes both legs occur
    got.foreach { case ((a, b), leg) =>
      val wantLeg = if (deltaIds.contains(a) && deltaIds.contains(b)) "delta_delta"
        else "delta_base"
      assert(leg == wantLeg, s"leg mislabeled for ($a,$b)")
    }
    assert(got.exists(_._2 == "delta_delta") && got.exists(_._2 == "delta_base"),
      "the carve must produce both legs")
    // every planted copy pairs with something (cosine ~1 survives any
    // grid tau); the exact copies are in the delta by construction
    val plantPaired = got.map(_._1).flatMap(p => Seq(p._1, p._2))
      .count(_ >= graft.dedup.Dedup.PlantOffset)
    assert(plantPaired > 0, "planted copies must appear in the delta report")
  }

  test("dedup_semantic_delta_apply: drops are delta-side only, no duplicate pair survives intact") {
    import org.apache.spark.sql.functions._
    val isDelta = (id: Long) =>
      id >= graft.dedup.Dedup.PlantOffset || id % graft.Carves.DeltaMod == 0
    val pairs = SemDedup.dedupSemanticDelta(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    val survivors = SemDedup.dedupSemanticDeltaApply(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // survivors are delta rows; the base is untouched by construction
    assert(survivors.forall(isDelta), "apply must only emit delta rows")
    pairs.foreach { case (a, b, leg) =>
      if (leg == "delta_delta")
        assert(!(survivors.contains(a) && survivors.contains(b)),
          s"delta_delta pair ($a,$b) survived intact")
      else {
        // keep-the-base policy: the delta side of a delta_base pair
        // is never admitted
        val deltaSide = if (isDelta(a)) a else b
        assert(!survivors.contains(deltaSide),
          s"delta side $deltaSide of a delta_base pair was admitted")
      }
    }
  }

  test("dedup_semantic_compact: carried+fresh equals a fresh frozen-model assignment of the merged corpus") {
    import org.apache.spark.sql.functions._
    val compacted = SemDedup.dedupSemanticCompact(spark, sf).cache()
    val rows = compacted.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val isDelta = (id: Long) =>
      id >= graft.dedup.Dedup.PlantOffset || id % graft.Carves.DeltaMod == 0
    // provenance faithful: carried = base rows, fresh = delta rows
    rows.foreach { case (id, _, src) =>
      assert((src == "fresh") == isDelta(id), s"provenance mislabeled for $id")
    }
    // fresh set == exactly the apply survivors
    val admitted = SemDedup.dedupSemanticDeltaApply(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(rows.filter(_._3 == "fresh").map(_._1).toSet == admitted,
      "fresh rows must be exactly the admitted delta")
    // frozen centroids make carrying exact: the whole compacted table
    // equals one fresh assignment of (base ∪ admitted)
    val planted = {
      val base = graft.Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
      base.unionByName(base.filter(col("vec_id") < 10)
          .select((col("vec_id") + graft.dedup.Dedup.PlantOffset).as("vec_id"), col("embedding")))
        .unionByName(base.filter(col("vec_id") < 10)
          .select((col("vec_id") + 2 * graft.dedup.Dedup.PlantOffset).as("vec_id"),
            transform(col("embedding"),
              (x, i) => when(i === 0, x + lit(0.001f)).otherwise(x)).as("embedding")))
    }
    val mergedIds = rows.map(_._1).toSet
    val sd = graft.config.GraftConfig.active.semdedup
    val baseOnly = planted.filter(!graft.Carves.deltaSplit(col("vec_id"), graft.dedup.Dedup.PlantOffset))
    val cents = graft.query.IvfSearch.fitCentroids(baseOnly,
      SemDedup.resolveCells(baseOnly.count(), sd), Some(s"semdelta:$sf"))
    val fresh = SemDedup.assignWithCentSim(
        planted.filter(col("vec_id").isInCollection(mergedIds)), cents)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    rows.foreach { case (id, cell, _) =>
      assert(fresh(id) == cell, s"compacted cell for $id diverges from a fresh assignment")
    }
    compacted.unpersist()
    ()
  }

  test("dedup_semantic_refit: no-drift merge keeps the frozen state (gained = lost = 0)") {
    val row = SemDedup.dedupSemanticRefit(spark, sf).head()
    // the demo merge's delta is carved from the SAME distribution, so
    // the thaw buys nothing — the report must say so (this honest
    // verdict is the entry's point: refit is a paid decision)
    assert(row.getLong(6) == 0 && row.getLong(7) == 0,
      s"non-drifting merge must gain/lose nothing: $row")
    // the compacted corpus is POST-dedup: the apply already dropped
    // every near-copy, so a clean resident state has NO within-cell
    // pairs under either fit — the strongest keep-the-frozen-state
    // reading the report can give
    assert(row.getLong(3) == 0 && row.getLong(4) == 0 && row.getLong(5) == 0,
      s"post-dedup resident state must be pair-free under both fits: $row")
    assert(row.getLong(0) > 0 && row.getLong(1) > 0 && row.getLong(2) > 0)
  }

  test("dedup_semantic_refit_apply: the no-drift thaw is a no-op re-cluster (all singleton keepers)") {
    val out = SemDedup.dedupSemanticRefitApply(spark, sf).cache()
    val n = out.count()
    assert(n > 0)
    // the merged state is POST-dedup and the demo delta does not
    // drift, so the refit finds no pairs: every vector is its own
    // singleton keeper — executing a thaw the report said to skip
    // must change nothing (the honest no-op, the gate's other half)
    assert(out.filter(!col("keep")).count() == 0, "no-drift thaw dropped a vector")
    assert(out.filter(col("n_comp") =!= 1).count() == 0, "no-drift thaw built a component")
    // same merged corpus as the report prices
    val nv = SemDedup.dedupSemanticRefit(spark, sf).head().getLong(0)
    assert(n == nv, s"thaw row count $n != report n_vectors $nv")
    out.unpersist()
    ()
  }

  test("refit fidelity catches a drifted merge: stale cells cross the guard, refit recovers the pairs") {
    import org.apache.spark.sql.functions._
    val base = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    // drifted delta: 400 base vectors NEGATED (a region the base fit
    // never saw) + 10 exact copies inside the drifted region — the
    // near-dups a post-drift crawl actually contains
    val drifted = base.filter(col("vec_id") < 400)
      .select((col("vec_id") + 1000L).as("vec_id"),
        transform(col("embedding"), x => -x).as("embedding"))
    val plants = drifted.filter(col("vec_id") < 1010L)
      .select((col("vec_id") + 2000L).as("vec_id"), col("embedding"))
    val merged = base.unionByName(drifted).unionByName(plants).cache()
    val frozenCents = graft.query.IvfSearch.fitCentroids(base, 16)
    val refitCents = graft.query.IvfSearch.fitCentroids(merged, 16)
    def assignOf(cents: Array[Array[Float]]) =
      SemDedup.assignWithCentSim(merged, cents).select(col("vec_id"), col("cell"))
    val frozenAssign = assignOf(frozenCents).cache()
    val refitAssign = assignOf(refitCents).cache()
    // SELF-CALIBRATED guard: the drifted mass piles into the few base
    // cells nearest the negated region, the refit spreads the merged
    // corpus — pick the guard between the two measured extremes and
    // ASSERT the planted geometry actually holds (a vacuous pass is
    // worse than a failure here)
    def maxFill(a: org.apache.spark.sql.DataFrame): Long =
      a.groupBy("cell").count().agg(max("count")).head().getLong(0)
    val refitMax = maxFill(refitAssign)
    val plantCells = frozenAssign.filter(col("vec_id") >= 3000L)
      .select(col("cell")).distinct()
    val hottestPlantCell = frozenAssign
      .join(plantCells, Seq("cell"), "left_semi")
      .groupBy("cell").count().agg(max("count")).head().getLong(0)
    assert(hottestPlantCell > refitMax,
      s"planted geometry failed: hottest frozen plant cell $hottestPlantCell " +
        s"must exceed the refit's max fill $refitMax — grow the drift plant")
    val guard = refitMax.toInt // keeps every refit cell, drops the pile-up
    val (nf, nr, common) = SemDedup.pairFidelity(merged,
      frozenAssign, refitAssign, SemDedup.SemTau, maxCell = guard)
    assert(nr >= 10, s"the 10 planted drifted pairs must pair under the refit: $nr")
    assert(nr - common > 0,
      s"refit must recover pairs the guarded stale cells hid: frozen=$nf refit=$nr common=$common")
    // the thaw EXECUTION payoff: re-clustering under the refit fit
    // actually dedupes what the frozen state was blind to — every
    // planted (drifted original, exact copy) pair co-clusters and the
    // pair never keeps both members; globally each component keeps
    // exactly one
    val out = SemDedup.semanticDedupPlan(merged, refitCents, SemDedup.SemTau, guard).cache()
    val byId = out.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    (1000L until 1010L).foreach { d =>
      val (c1, k1) = byId(d); val (c2, k2) = byId(d + 2000L)
      assert(c1 == c2, s"planted drifted pair $d not co-clustered after the thaw")
      assert(!(k1 && k2), s"planted drifted pair $d kept both members after the thaw")
    }
    val badComps = out.groupBy("comp")
      .agg(sum(when(col("keep"), 1).otherwise(0)).as("nk"))
      .filter(col("nk") =!= 1).count()
    assert(badComps == 0, "every component must keep exactly one member")
    out.unpersist()
    frozenAssign.unpersist(); refitAssign.unpersist(); merged.unpersist()
    ()
  }
}
