package graft

import graft.dedup.{Dedup, SemDedup}

/**
 * The staged pair-report twins (`dedup_minhash_apply_staged` /
 * `_compact_staged`, `dedup_semantic_apply_staged` /
 * `_compact_staged`): each must be VERDICT-IDENTICAL to its in-plan
 * form — the staged read changes what a merge COSTS (no chain
 * recompute), never what it decides. The in-plan forms remain the
 * recompute cross-check; these twins are what a production pipeline
 * actually runs per merge.
 */
class StagedTwinsSpec extends SparkSpecBase {

  test("minhash: staged apply/compact verdict-identical to the in-plan forms") {
    // the in-plan delta runs first (stages the pair report in-JVM) —
    // the staged twins then route off the read
    val applyInPlan = Dedup.dedupMinhashDeltaApply(spark, sf).collect().toSet
    val applyStaged = Dedup.dedupMinhashApplyStaged(spark, sf).collect().toSet
    assert(applyStaged == applyInPlan,
      "staged minhash apply must admit exactly the in-plan survivors")

    val compactInPlan = Dedup.dedupMinhashCompact(spark, sf).collect().toSet
    val compactStaged = Dedup.dedupMinhashCompactStaged(spark, sf).collect().toSet
    assert(compactStaged == compactInPlan,
      "staged minhash compact must be bit-identical to the in-plan fold")
  }

  test("semantic: staged apply/compact verdict-identical to the in-plan forms") {
    val applyInPlan = SemDedup.dedupSemanticDeltaApply(spark, sf).collect().toSet
    val applyStaged = SemDedup.dedupSemanticApplyStaged(spark, sf).collect().toSet
    assert(applyStaged == applyInPlan,
      "staged semantic apply must admit exactly the in-plan survivors")

    val compactInPlan = SemDedup.dedupSemanticCompact(spark, sf).collect().toSet
    val compactStaged = SemDedup.dedupSemanticCompactStaged(spark, sf).collect().toSet
    assert(compactStaged == compactInPlan,
      "staged semantic compact must carry/admit exactly the in-plan rows")
  }

  test("staged twins run WITHOUT the delta chain once the report is staged") {
    // prime the stage (idempotent if the prior tests ran)
    Dedup.dedupMinhashDelta(spark, sf)
    SemDedup.dedupSemanticDelta(spark, sf)
    // the staged twins' plans must read the pair report from parquet —
    // no band self-join / no cell self-join anywhere in the plan
    val mh = Dedup.dedupMinhashApplyStaged(spark, sf)
      .queryExecution.optimizedPlan.toString()
    assert(!mh.contains("band_hash"),
      s"staged minhash apply must not re-run the band join:\n$mh")
    val sem = SemDedup.dedupSemanticApplyStaged(spark, sf)
      .queryExecution.optimizedPlan.toString()
    assert(!sem.contains("csim"),
      s"staged semantic apply must not re-run the assignment chain:\n$sem")
    // the physical scan names the staged parquet (the optimized
    // logical plan prints relations without their paths)
    val mhPhys = Dedup.dedupMinhashApplyStaged(spark, sf)
      .queryExecution.executedPlan.toString()
    val semPhys = SemDedup.dedupSemanticApplyStaged(spark, sf)
      .queryExecution.executedPlan.toString()
    assert(mhPhys.contains("minhash_delta_pairs") && semPhys.contains("semdelta_pairs"),
      "staged twins must read the staged pair parquet")
  }

  test("refit: staged report and staged thaw verdict-identical to the in-plan forms") {
    val reportInPlan = SemDedup.dedupSemanticRefit(spark, sf).collect().toSeq
    val reportStaged = SemDedup.dedupSemanticRefitStaged(spark, sf).collect().toSeq
    assert(reportStaged == reportInPlan,
      "the staged fidelity report must read the in-plan report's exact integers")

    val applyInPlan = SemDedup.dedupSemanticRefitApply(spark, sf).collect().toSet
    val applyStaged = SemDedup.dedupSemanticRefitApplyStaged(spark, sf).collect().toSet
    assert(applyStaged == applyInPlan,
      "the staged thaw must produce the in-plan next-generation decision table")
  }

  test("refit staged twins run WITHOUT the delta-apply/compact chains") {
    // prime the stage (idempotent if the prior tests ran)
    SemDedup.dedupSemanticDelta(spark, sf)
    // the staged merged corpus is the refresh family's input: its plan
    // must derive the admitted delta from the staged pair parquet, not
    // the delta-apply chain (whose pair computation carries the
    // least/greatest pair orientation and the csim assignment chain)
    val merged = SemDedup.mergedCorpusStaged(spark, sf)
    val opt = merged.queryExecution.optimizedPlan.toString()
    assert(!opt.contains("least(") && !opt.contains("csim"),
      s"staged merged corpus must not re-run the delta pair chain:\n$opt")
    assert(merged.queryExecution.executedPlan.toString().contains("semdelta_pairs"),
      "staged merged corpus must read the staged pair parquet")
  }
}
