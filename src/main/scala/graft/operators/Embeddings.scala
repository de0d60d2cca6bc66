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
