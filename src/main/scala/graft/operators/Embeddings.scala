package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Embedding-pipeline operators beyond the reference surface:
 * symmetric int8 quantization (the standard storage/serving compression
 * for ANN corpora — 4x smaller vectors, distance error bounded by
 * scale). Pure built-ins (`transform`/`aggregate` are codegen'd), no
 * UDF; floor-based so the DuckDB oracle reproduces it exactly.
 */
object Embeddings {

  def embedQuantize(spark: SparkSession, sfDir: String): DataFrame = {
    val v = col("embedding").cast("array<double>")
    val amax = array_max(transform(v, x => abs(x)))
    val scale = lit(127.0) / greatest(amax, lit(1e-30))
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), v.as("e"), scale.as("scale"))
      .select(
        col("vec_id"),
        (floor(col("scale") * 1e6) / 1e6).as("scale_t"),
        transform(col("e"), x => floor(x * col("scale")).cast("int")).as("qv"))
      .select(
        col("vec_id"),
        col("scale_t"),
        aggregate(col("qv"), lit(0L), (acc, x) => acc + x).as("sum_q"),
        array_min(col("qv")).as("min_q"),
        array_max(col("qv")).as("max_q"))
  }

  // ---- random-projection (JL) dimensionality reduction ----

  /** Target dimension and seed of the demo projection. */
  val ProjTargetDim = 16
  val ProjSeed = 926L

  /** Fixture: the projection matrix (tgtDim x srcDim doubles — KBs),
    * so the DuckDB oracle replays the exact dot products. */
  val ProjExportPath = "/root/repo/tmp/oracle_fixtures/proj_matrix.parquet"

  /** Deterministic N(0,1)/sqrt(tgtDim) rows (the polar-Box-Muller +
    * SplittableRandom recipe of `Lsh.fitG` — reproducible across JVMs
    * by spec, no engine-portability burden because the matrix ships as
    * a fixture, not a formula). */
  private[graft] def projMatrix(srcDim: Int, tgtDim: Int): Array[Array[Double]] = {
    val rnd = new java.util.SplittableRandom(ProjSeed)
    var spare = Double.NaN
    def gaussian(): Double =
      if (!spare.isNaN) { val s = spare; spare = Double.NaN; s }
      else {
        var u = 0.0; var v = 0.0; var s2 = 0.0
        while ({ u = rnd.nextDouble() * 2 - 1; v = rnd.nextDouble() * 2 - 1; s2 = u * u + v * v; s2 >= 1.0 || s2 == 0.0 }) ()
        val mul = math.sqrt(-2.0 * math.log(s2) / s2)
        spare = v * mul
        u * mul
      }
    val inv = 1.0 / math.sqrt(tgtDim)
    Array.fill(tgtDim)(Array.fill(srcDim)(gaussian() * inv))
  }

  /**
   * Johnson–Lindenstrauss random projection: srcDim floats -> tgtDim
   * doubles via a seeded Gaussian matrix scaled by 1/sqrt(tgtDim)
   * (expected-norm-preserving), the standard cheap transform before
   * brute/IVF search when the raw dimension is wasteful. Map-only: the
   * matrix rides the plan as a literal (tgtDim x srcDim doubles — KBs;
   * broadcast() it if a deployment's matrix outgrows plan literals),
   * each output coordinate one in-order `aggregate(zip_with(...))` —
   * the SAME operation order as DuckDB's list_dot_product over the
   * exported fixture, so the doubles match bit-for-bit (rounded 4 for
   * artifact hygiene). Output exploded to (vec_id, r, v): scalar rows
   * for the gate; [[projectEmbedding]] is the array-column form
   * downstream pipelines compose.
   */
  def projectEmbedding(data: DataFrame, vecCol: String,
      matrix: Array[Array[Double]]): DataFrame = {
    val rows = typedLit(matrix.zipWithIndex.map { case (w, r) => (r, w.toSeq) }.toSeq)
    data.withColumn("proj",
      transform(rows, row => struct(row.getField("_1").as("r"),
        round(aggregate(
          zip_with(col(vecCol).cast("array<double>"), row.getField("_2"), (x, w) => x * w),
          lit(0.0), (acc, x) => acc + x), 4).as("v"))))
  }

  def embedProject(spark: SparkSession, sfDir: String): DataFrame = {
    val data = Tables.embeddings(spark, sfDir)
    val srcDim = data.select(size(col("embedding"))).head().getInt(0)
    val m = projMatrix(srcDim, ProjTargetDim)
    graft.FixtureExport.ensure(s"$srcDim", ProjExportPath) {
      import spark.implicits._
      m.zipWithIndex.map { case (w, r) => (r, w.toSeq) }.toSeq.toDF("r", "w")
        .coalesce(1).write.mode("overwrite").parquet(ProjExportPath)
    }
    projectEmbedding(data, "embedding", m)
      .select(col("vec_id"), explode(col("proj")).as("p"))
      .select(col("vec_id"), col("p.r").as("r"), col("p.v").as("v"))
  }

  val embedProjectSql: String =
    s"""SELECT e.vec_id, m.r,
       |  ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), m.w), 4) AS v
       |FROM embeddings e, read_parquet('$ProjExportPath/*.parquet') m""".stripMargin

  val embedQuantizeSql: String =
    """WITH s AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
      |    127.0 / GREATEST(list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))), 1e-30) AS scale
      |  FROM embeddings),
      |q AS (
      |  SELECT vec_id, scale,
      |    list_transform(e, x -> CAST(FLOOR(x * scale) AS INTEGER)) AS qv
      |  FROM s)
      |SELECT vec_id,
      |  FLOOR(scale * 1e6) / 1e6 AS scale_t,
      |  CAST(list_aggregate(qv, 'sum') AS BIGINT) AS sum_q,
      |  list_min(qv) AS min_q,
      |  list_max(qv) AS max_q
      |FROM q""".stripMargin
}
