package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{vec_cosine, vec_l2}
import graft.query.IvfSearch
import graft.Tables

/**
 * SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023,
 * arXiv:2303.09540): cluster the embedding corpus with k-means,
 * find near-identical pairs WITHIN each cluster (cosine >= tau),
 * group them transitively, and keep exactly one representative per
 * group — the member LEAST similar to its cluster centroid (the
 * paper's keep-the-atypical policy, preserving diversity), ties to
 * the lowest id. Everything else in the group is a drop decision.
 *
 * This is the decision layer the `knn_join` / `neardup_embedding`
 * candidate machinery feeds in a curation pipeline; like
 * [[Dedup.dedupClusters]] it emits one decision row per corpus
 * vector (`keep` flag + component + component size), and
 * [[Dedup.dedupApply]] materializes the surviving corpus.
 *
 * Scale posture: centroid assignment and centroid-similarity are ONE
 * map-side pass over the corpus (the centroid table rides the plan as
 * a literal — no join, no shuffle); the within-cell self-join is the
 * only data-sized shuffle and its quadratic term is bounded by the
 * fitted cell size (C ~ sqrt N keeps cells ~ sqrt N; a `maxCell`
 * guard drops degenerate boilerplate cells exactly like
 * [[Dedup.neardupPlan]]); components run on the near-clique dup
 * graph via [[Dedup.connectedComponents]] (iterations ~ component
 * diameter); the keeper cut is a window over (component) — component
 * groups are dup-group-sized, never corpus-sized partitions.
 *
 * Reference anchor: the reference's dedup surface stops at pair
 * candidates (fspann uses LSH buckets for near-dup detection only);
 * the decision policy here is the published SemDeDup rule, which is
 * the curation step a 100 TB training pipeline actually ships.
 */
object SemDedup {

  /** Cosine threshold above which two same-cell vectors are semantic
    * duplicates (compared on 4-dp ROUNDED cosine so the cut is
    * engine-portable, the [[Dedup.neardupPlan]] discipline). */
  val SemTau: Double = 0.995

  /** Cells for the demo-corpus fit (corpus is small; production sizes
    * via [[IvfSearch.scaledCells]]). Config-overridable:
    * `semdedup.cells` (0 = auto sqrt-N sizing). */
  val SemCells: Int = 16

  /** The fitted cell count under `cfg`: explicit wins, 0 auto-sizes to
    * ~sqrt(N) clamped exactly as the IVF entries do. */
  def resolveCells(n: => Long,
      sd: graft.config.SemDedupConfig = graft.config.GraftConfig.active.semdedup): Int =
    if (sd.cells > 0) sd.cells else IvfSearch.scaledCells(n)

  /** Degenerate-cell guard: cells larger than this skip pairing (the
    * `neardup.maxCell` posture — near-identical boilerplate cells
    * would contribute O(cell^2) join rows). */
  val SemMaxCell: Int = 4096

  val SemCentroidExportPath = graft.FixturePaths.fixture("semdedup_centroids.parquet")

  private def exportCentroids(spark: SparkSession, key: String,
      cents: Array[Array[Float]]): Unit =
    graft.FixtureExport.ensure(key, SemCentroidExportPath) {
      IvfSearch.centroidsDf(spark, cents)
        .coalesce(1).write.mode("overwrite").parquet(SemCentroidExportPath)
    }

  /**
   * Per-vector home cell + centroid similarity in ONE map-side
   * projection: sort the (distance, cell, cosine) struct array built
   * from the centroid literal and take the head — the
   * [[IvfSearch.probeCellsRanked]] shape with the keeper signal
   * (4-dp rounded cosine-to-centroid) carried along.
   */
  private[graft] def assignWithCentSim(e: DataFrame,
      cents: Array[Array[Float]]): DataFrame = {
    val centLit = typedLit(cents.zipWithIndex.map { case (cv, cell) => (cell, cv.toSeq) }.toSeq)
    e.select(col("vec_id"), col("embedding"),
        element_at(array_sort(transform(centLit,
          c => struct(vec_l2(col("embedding"), c.getField("_2")).as("cdist"),
            c.getField("_1").as("cell"),
            round(vec_cosine(col("embedding"), c.getField("_2")), 4).as("csim")))), 1).as("h"))
      .select(col("vec_id"), col("embedding"),
        col("h.cell").as("cell"), col("h.csim").as("csim"))
  }

  /**
   * The full decision plan over an (vec_id, embedding) corpus: one row
   * per vector with its duplicate component (`comp` = component min
   * id), component size, centroid similarity, and the SemDeDup `keep`
   * verdict (argmin (csim, vec_id) within the component; singletons
   * keep themselves).
   */
  /** The lazy within-cell duplicate-pair plan (kept separate so specs
    * can assert its shape — cell equi-join, no cartesian). */
  private[graft] def semanticEdges(assigned: DataFrame,
      tau: Double, maxCell: Int): DataFrame = {
    val wCell = Window.partitionBy("cell")
    val guarded = assigned
      .withColumn("csz", count(lit(1)).over(wCell))
      .filter(col("csz") <= maxCell)
      .select(col("vec_id"), col("cell"), col("embedding"))
    guarded.as("x").join(guarded.as("y"),
        col("x.cell") === col("y.cell") && col("x.vec_id") < col("y.vec_id"))
      .filter(round(vec_cosine(col("x.embedding"), col("y.embedding")), 4) >= tau)
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
  }

  def semanticDedupPlan(e: DataFrame, cents: Array[Array[Float]],
      tau: Double = SemTau, maxCell: Int = SemMaxCell): DataFrame = {
    val assigned = assignWithCentSim(e, cents)
    val edges = semanticEdges(assigned, tau, maxCell)
    val cc = Dedup.connectedComponents(edges, e.select(col("vec_id").as("id")))
    val wComp = Window.partitionBy("comp")
    val wKeep = Window.partitionBy("comp").orderBy(col("csim"), col("vec_id"))
    val out = cc.select(col("id").as("vec_id"), col("keeper").as("comp"))
      .join(assigned.select(col("vec_id"), col("csim")), Seq("vec_id"))
      .withColumn("n_comp", count(lit(1)).over(wComp))
      .withColumn("keep", row_number().over(wKeep) === 1)
      .select(col("vec_id"), col("comp"), col("n_comp"), col("keep"), col("csim"))
      .cache()
    out.count() // materialize the decision table, release the label cache
    cc.unpersist()
    out
  }

  /** Demo corpus: the embeddings table plus, for vec_id < 10, one
    * EXACT copy (same vector, new id — cosine exactly 1, same cell by
    * construction) and one JITTERED copy (+0.001 on coordinate 0 —
    * cosine ~1 - 1e-8, still home-cell-stable for non-boundary
    * vectors). Both are float-exact and replayed verbatim in SQL. */
  private[dedup] def semCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val seeds = base.filter(col("vec_id") < 10)
    base
      .unionByName(seeds.select((col("vec_id") + Dedup.PlantOffset).as("vec_id"),
        col("embedding")))
      .unionByName(seeds.select((col("vec_id") + 2 * Dedup.PlantOffset).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + lit(0.001f)).otherwise(x)).as("embedding")))
  }

  def dedupSemantic(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus = semCorpus(spark, sfDir)
    val sd = graft.config.GraftConfig.active.semdedup
    // auto-sizing pays a memoized count only when configured (cells=0)
    val c = resolveCells(IvfSearch.memoCount(corpus, s"semdedup:$sfDir"), sd)
    val cents = IvfSearch.fitCentroids(corpus, c, Some(s"semdedup:$sfDir"))
    exportCentroids(spark, s"semdedup:$sfDir|c=$c", cents)
    semanticDedupPlan(corpus, cents, maxCell = sd.maxCell)
  }

  /** The planted corpus → assignment → guarded-cell CTE prefix,
    * shared verbatim between the decision oracle and the tau-grid
    * planner oracle (the funnel-CTE discipline: one chain, no drift). */
  private def semChainCtes: String =
    s"""corpus AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + ${Dedup.PlantOffset}, embedding FROM embeddings WHERE vec_id < 10
       |  UNION ALL
       |  SELECT vec_id + ${2 * Dedup.PlantOffset},
       |    list_transform(embedding, (x, i) ->
       |      CASE WHEN i = 1 THEN CAST(x + CAST(0.001 AS FLOAT) AS FLOAT) ELSE x END)
       |  FROM embeddings WHERE vec_id < 10),
       |c AS (SELECT cell, cv FROM read_parquet('$SemCentroidExportPath/*.parquet')),
       |scored AS (
       |  SELECT e.vec_id, c.cell,
       |    ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |                                 CAST(c.cv AS DOUBLE[])), 4) + 0.0 AS csim,
       |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |      ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]),
       |                             CAST(c.cv AS DOUBLE[])), c.cell) AS r
       |  FROM corpus e CROSS JOIN c),
       |assign AS (SELECT vec_id, cell, csim FROM scored WHERE r = 1),
       |guarded AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell, COUNT(*) OVER (PARTITION BY cell) AS csz FROM assign)
       |  WHERE csz <= $SemMaxCell)""".stripMargin

  /** DuckDB twin: planted corpus -> literal-centroid assignment with
    * centroid cosine -> within-cell pairs at 4-dp tau -> recursive-CTE
    * transitive closure -> per-component SemDeDup keeper. */
  val dedupSemanticSql: String =
    s"""WITH RECURSIVE $semChainCtes,
       |edges AS (
       |  SELECT x.vec_id AS a, y.vec_id AS b
       |  FROM guarded x JOIN guarded y ON x.cell = y.cell AND x.vec_id < y.vec_id
       |  JOIN corpus ex ON ex.vec_id = x.vec_id
       |  JOIN corpus ey ON ey.vec_id = y.vec_id
       |  WHERE ROUND(list_cosine_similarity(CAST(ex.embedding AS DOUBLE[]),
       |                                     CAST(ey.embedding AS DOUBLE[])), 4) >= $SemTau),
       |sym AS (SELECT a AS src, b AS dst FROM edges
       |        UNION ALL SELECT b, a FROM edges),
       |walk(id, label) AS (
       |  SELECT vec_id, vec_id FROM corpus
       |  UNION
       |  SELECT s.src, w.label FROM walk w JOIN sym s ON s.dst = w.id),
       |cc AS (SELECT id, MIN(label) AS comp FROM walk GROUP BY id)
       |SELECT vec_id, comp, n_comp, (kr = 1) AS keep, csim FROM (
       |  SELECT a.vec_id, cc.comp, a.csim,
       |    COUNT(*) OVER (PARTITION BY cc.comp) AS n_comp,
       |    ROW_NUMBER() OVER (PARTITION BY cc.comp ORDER BY a.csim, a.vec_id) AS kr
       |  FROM assign a JOIN cc ON cc.id = a.vec_id)""".stripMargin

  /** The tau grid the planner sweeps (the SemDeDup paper's eps axis;
    * DOUBLE literals compared against 4-dp ROUNDED cosines — the
    * minhashTune compare-on-rounded rule). */
  val TuneTaus: Seq[Double] = Seq(0.9, 0.95, 0.99, 0.995, 0.999)

  /**
   * `dedup_semantic_tune`: the tau (eps) PLANNER for [[dedupSemantic]]
   * — the SemDeDup paper's threshold sweep as one entry: within-cell
   * pair cosines are computed ONCE (unthresholded — the same guarded
   * cell join the decision plan prunes with), then every grid tau
   * reads off its duplicate-edge count, the number of distinct
   * vectors flagged, and the flagged share of the corpus. The
   * `quality_ablation` posture applied to semantic dedup: five
   * threshold candidates, one corpus pass, no five re-clusterings
   * (the exact kept-fraction at the chosen tau is then one
   * [[dedupSemantic]] run — components need the threshold fixed).
   *
   * Scale posture: the one data-sized shuffle is the within-cell
   * self-join the decision plan already pays, quadratic term bounded
   * by the cell guard; the grid explode multiplies the PAIR table
   * (cells-bounded, corpus-sliver) by 5, and the flagged-count
   * distinct runs per tau over those exploded pair endpoints, never
   * over the corpus.
   */
  def dedupSemanticTune(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus = semCorpus(spark, sfDir)
    val sd = graft.config.GraftConfig.active.semdedup
    val c = resolveCells(IvfSearch.memoCount(corpus, s"semdedup:$sfDir"), sd)
    val cents = IvfSearch.fitCentroids(corpus, c, Some(s"semdedup:$sfDir"))
    exportCentroids(spark, s"semdedup:$sfDir|c=$c", cents)
    val assigned = assignWithCentSim(corpus, cents)
    // unthresholded pair cosines: semanticEdges' join with the filter
    // lifted to the grid stage
    val wCell = Window.partitionBy("cell")
    val guarded = assigned
      .withColumn("csz", count(lit(1)).over(wCell))
      .filter(col("csz") <= sd.maxCell)
      .select(col("vec_id"), col("cell"), col("embedding"))
    val pairs = guarded.as("x").join(guarded.as("y"),
        col("x.cell") === col("y.cell") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        round(vec_cosine(col("x.embedding"), col("y.embedding")), 4).as("cos"))
    val grid = array(TuneTaus.map(lit): _*)
    val byTau = pairs.withColumn("tau", explode(grid))
      .filter(col("cos") >= col("tau"))
    val edges = byTau.groupBy("tau").agg(count(lit(1)).as("n_edges"))
    val flagged = byTau
      .select(col("tau"), explode(array(col("a"), col("b"))).as("id"))
      .groupBy("tau").agg(countDistinct("id").as("n_flagged"))
    val total = corpus.agg(count(lit(1)).as("n_total"))
    // every tau appears even when nothing crosses it (LEFT from the grid)
    val spark2 = spark
    import spark2.implicits._
    TuneTaus.toDF("tau")
      .join(edges, Seq("tau"), "left")
      .join(flagged, Seq("tau"), "left")
      .crossJoin(broadcast(total))
      .select(col("tau"),
        coalesce(col("n_edges"), lit(0L)).as("n_edges"),
        coalesce(col("n_flagged"), lit(0L)).as("n_flagged"),
        (floor(coalesce(col("n_flagged"), lit(0L)).cast("double") /
          col("n_total") * 10000) / 10000).as("flag_share"))
  }

  /** Oracle: the shared chain CTEs + the unthresholded pair cosines +
    * the same grid legs. */
  def dedupSemanticTuneSql: String = {
    val gridValues = TuneTaus.map(t => s"(CAST($t AS DOUBLE))").mkString(", ")
    s"""WITH $semChainCtes,
       |pairs AS (
       |  SELECT x.vec_id AS a, y.vec_id AS b,
       |    ROUND(list_cosine_similarity(CAST(ex.embedding AS DOUBLE[]),
       |                                 CAST(ey.embedding AS DOUBLE[])), 4) AS cos
       |  FROM guarded x JOIN guarded y ON x.cell = y.cell AND x.vec_id < y.vec_id
       |  JOIN corpus ex ON ex.vec_id = x.vec_id
       |  JOIN corpus ey ON ey.vec_id = y.vec_id),
       |grid AS (SELECT * FROM (VALUES $gridValues) g(tau)),
       |bytau AS (SELECT g.tau, p.a, p.b FROM grid g JOIN pairs p ON p.cos >= g.tau),
       |e AS (SELECT tau, CAST(COUNT(*) AS BIGINT) AS n_edges FROM bytau GROUP BY tau),
       |f AS (SELECT tau, CAST(COUNT(DISTINCT id) AS BIGINT) AS n_flagged FROM (
       |  SELECT tau, a AS id FROM bytau UNION ALL SELECT tau, b FROM bytau)
       |  GROUP BY tau),
       |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM corpus)
       |SELECT g.tau,
       |  COALESCE(e.n_edges, 0) AS n_edges,
       |  COALESCE(f.n_flagged, 0) AS n_flagged,
       |  FLOOR(CAST(COALESCE(f.n_flagged, 0) AS DOUBLE)
       |        / (SELECT n_total FROM t) * 10000) / 10000 AS flag_share
       |FROM grid g
       |LEFT JOIN e ON e.tau = g.tau
       |LEFT JOIN f ON f.tau = g.tau""".stripMargin
  }
}
