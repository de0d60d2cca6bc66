package graft
import org.apache.spark.sql.SparkSession

/**
 * Per-round bench: one JSON line of per-query wall times at the
 * target scale factor. Each query first runs once at sf0.001 to pay
 * JIT + codegen compilation outside the timed region (the timed run
 * still executes the full pipeline at the target sf — caches are
 * per-DataFrame and not shared across the two invocations).
 */
object Bench {
  /**
   * Materialize the FULL result through the noop sink. A bare
   * `count()` lets Catalyst prune the plan down to whatever decides
   * the row count — Spark 4's distinct-key join elimination collapses
   * every "docs LEFT JOIN per-doc-aggregate" entry (lm_score family,
   * substring/url/decontamination reports) to a bare corpus scan, so
   * counted timings under-measured those entries in earlier rounds.
   * The noop writer requires every output column, so the timed work is
   * exactly what Verify writes to parquet, minus the parquet encoding.
   */
  private def materialize(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // let AQE coalesce CACHED plans' output partitioning too (off by
      // default): the r15 round caches model-sized intermediates inside
      // the LM/semantic chains, and without this flag every cached scan
      // keeps the full shuffle partition count — measured 952 tasks vs
      // ~100 for one lm_score_kn5 pass. Scale-adaptive (AQE sizes
      // partitions from bytes), not a local-core-count constant.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_ONLY=a,b,c restricts the run (iteration aid)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // ANN QUERY-phase entries are timed against a resident index, like
    // the reference server (SETUP -> INDEX -> FINALIZE once, then
    // serve): the untimed prep below re-materializes the index after
    // the cache clear. Build cost itself stays measured cold by
    // `lsh_partition_build` (deliberately NOT in this set).
    val residentIndex = Set("ann_lsh_topk", "ann_lsh_topk_distjoin", "ann_recall_eval",
      "ann_recall_gtfile", "ann_diagnostics", "query_token", "ann_lsh_filtered_topk",
      "ann_tier_report")
    // Reported time = MINIMUM over `reps` timed runs: machine contention
    // only ever ADDS time, so the min is the least-contaminated estimate
    // and one noisy rep cannot poison a round artifact.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    // Fixed-cost calibration row (data- and SF-independent: 64M-row
    // range -> modulo keys -> one 9973-cell hash agg): cross-round host
    // drift becomes one division against the previous round's
    // _calibration value instead of a re-litigated family-by-family
    // argument. Excluded from `value` (the entries-only total) so
    // totals stay comparable with earlier rounds.
    val calibration: Double = {
      def run(): Double = {
        val t0 = System.nanoTime()
        materialize(spark.range(0L, 64L << 20, 1L, 32)
          .selectExpr("id % 9973 AS k", "id")
          .groupBy("k").agg(org.apache.spark.sql.functions.sum("id"),
            org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1))))
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm the codegen path outside the timed reps
      val secs = (1 to reps).map(_ => run())
      System.err.println(s"[bench] _calibration reps: ${secs.map(s => f"$s%.3f").mkString(", ")}")
      secs.min
    }
    val results = selected.map { case (name, fn) =>
      // prep failures are LOGGED, never fatal: a cold-path timing must be
      // distinguishable from the documented warm/resident one
      def prep(step: String)(body: => Unit): Unit =
        try body catch { case e: Throwable =>
          System.err.println(s"[bench] $name prep '$step' failed (timing will be cold): $e")
        }
      if (warmDir != sfDir) prep("warmup")(materialize(fn(spark, warmDir)))
      val secs = (1 to reps).map { _ =>
        // drop accumulated intermediate caches (both the previous rep's
        // and the warmup's): storage memory otherwise squeezes execution
        // memory mid-bench, and each timed rep should pay its own caching
        spark.catalog.clearCache()
        if (residentIndex(name))
          prep("ensureResident")(graft.query.AnnQuery.ensureResident(spark, sfDir))
        if (name == "ann_lsh_topk_delta")
          prep("ensureResidentDelta")(graft.index.IndexMaintenance.ensureResidentDelta(spark, sfDir))
        if (name == "ann_multidim_topk")
          prep("ensureResidentTwoDim")(graft.query.DimRegistry.ensureResidentTwoDim(spark, sfDir))
        if (name == "simsearch_ivf" || name == "neardup_embedding" ||
            name == "sample_cluster_balanced" || name == "ann_tier_report")
          prep("ensureFitted")(graft.query.IvfSearch.ensureFitted(spark, sfDir))
        if (name == "embed_pq" || name == "ann_ivfpq_topk" || name == "ann_tier_report")
          prep("ensureFittedPq")(graft.query.PqSearch.ensureFitted(spark, sfDir))
        val t0 = System.nanoTime()
        // a failed rep reports -1, not a bogus tiny wall time
        try { materialize(fn(spark, sfDir)); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
        }
      }
      System.err.println(s"[bench] $name reps: ${secs.map(s => f"$s%.3f").mkString(", ")}")
      name -> (if (secs.exists(_ < 0)) -1.0 else secs.min)
    }
    val qs = (("_calibration" -> calibration) +: results)
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // Persist the complete per-query artifact in the repo BEFORE the
    // stdout lines (so no [bench] stderr chatter lands after them): the
    // driver's BENCH_rNN.json capture truncates its tail at 2000 chars,
    // which silently drops the alphabetically-first rows once the query
    // count is large. Round number = max committed CORRECTNESS_rNN + 1
    // (the current round's file lands only after this run), overridable
    // via SPARK_GRAFT_ROUND. Only full (unfiltered) runs are persisted.
    // r16: the filename carries the cpu count — the driver benches the
    // SAME round at two core counts and the unsuffixed name made the
    // second run overwrite the first (the r15 8-cpu/32-cpu collision).
    if (only.isEmpty) {
      val round = sys.env.get("SPARK_GRAFT_ROUND").map(_.toInt).getOrElse {
        val rx = "CORRECTNESS_r(\\d+)\\.json".r
        val prev = Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
          .flatMap(f => rx.findFirstMatchIn(f.getName).map(_.group(1).toInt))
        if (prev.isEmpty) 1 else prev.max + 1
      }
      val path = f"bench_full_r$round%02d_c$cpus.json"
      val w = new java.io.PrintWriter(path); try w.println(line) finally w.close()
      System.err.println(s"[bench] full artifact written to $path")
    }
    println(line)
    // Compact always-fits summary as the VERY LAST stdout line: at 193
    // entries the full per-query line is ~6 KB and the driver keeps a
    // 2000-char tail, so its head (and the "value" total) was cut off
    // and the parse failed two rounds running (r15 verdict item 2).
    // Same methodology, same numbers — one short parseable recap.
    println(s"""{"metric":"total","value":$total,"unit":"sec","calibration":$calibration,"n":${results.size},"cpus":$cpus,"sf":"$sfDir"}""")
    spark.stop()
  }
}
