package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions.vec_l2

/**
 * `ann_mrl_topk`: progressive prefix-dimension search — the
 * CODEBOOK-FREE compression tier (the Matryoshka representation
 * learning serving trick, Kusupati et al. 2022: when the encoder
 * front-loads information into the leading dimensions, the first
 * dim/[[PrefixShare]] coordinates are a usable coarse representation).
 * The shortlist metric is exact L2 over the PREFIX (a 4x byte cut
 * with no model at all — no codebook, no thresholds, no training
 * pass), refined exactly over the full vectors.
 *
 * Tier position: between SQ8 (4x, per-dim model) and PQ (~32x,
 * codebook) in bytes-scanned, but with ZERO fit/fixture surface —
 * the one tier that survives an encoder swap with no maintenance
 * round, which is exactly when [[graft.operators.Embeddings.embedDriftQuery]]
 * fires and every fitted tier's models are stale.
 *
 * Honest recall note: the prefix's recall tracks how much information
 * the encoder front-loads. On this repo's synthetic near-iid
 * embeddings (nothing front-loaded — the worst case) the 4x prefix
 * measures ~0.52 recall@10 vs ~0.9+ for the fitted 4x SQ8 tier; a
 * real MRL-trained encoder, or composing
 * [[graft.operators.Embeddings.embedProject]]'s variance-ordered PCA
 * rotation in front, is what buys the published MRL curves. The tier
 * report prices that trade next to the fitted tiers.
 *
 * This entry is the exhaustive isolation twin (the
 * [[SqSearch.annSqTopK]] convention: quantization-quality path
 * isolated from routing); compose IVF cells in front for the
 * corpus-scale serving form, exactly as the SQ8/PQ/BQ tiers do.
 * Scale posture: the prefix table is dim/4 floats per row — a
 * map-only slice, no shuffle; the scan reads 4x fewer candidate
 * bytes; refine is bounded at AdcKeep embedding fetches per query.
 */
object MrlSearch {

  def K: Int = PqSearch.K
  def NumQueries: Int = PqSearch.NumQueries
  def AdcKeep: Int = PqSearch.AdcKeep

  /** Prefix denominator: serve on the first dim/4 coordinates (the
    * 4x rung, byte-comparable to SQ8's code table). */
  val PrefixShare = 4

  def annMrlTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val data = Tables.embeddings(spark, sfDir)
    val dim = data.select(size(col("embedding"))).head().getInt(0)
    mrlTopKOn(data, data.filter(col("vec_id") < NumQueries),
      dim / PrefixShare, AdcKeep)
  }

  /** Frame-level core of [[annMrlTopK]] (corpus/query frames, prefix
    * length, and shortlist budget injectable — the spec's handle for
    * the keep ≥ N ⇒ exact-equality degenerate case). */
  def mrlTopKOn(data: DataFrame, queries: DataFrame, pd: Int, keep: Int): DataFrame = {
    val spark = data.sparkSession
    val pvecs = data.select(col("vec_id"),
      slice(col("embedding"), 1, pd).cast("array<double>").as("pvec"))
    val prep = queries
      .select(col("vec_id").as("query_id"),
        slice(col("embedding"), 1, pd).cast("array<double>").as("qp"),
        col("embedding").as("qraw"))
    val probeSide = spark.createDataFrame(
      java.util.Arrays.asList(prep.collect(): _*), prep.schema)
    val fetch = data.select(col("vec_id"), col("embedding"))
    val wp = Window.partitionBy("query_id").orderBy(col("pdist"), col("vec_id"))
    val wk = Window.partitionBy("query_id").orderBy(col("dist"), col("vec_id"))
    pvecs.crossJoin(broadcast(probeSide))
      .withColumn("pdist",
        floor(vec_l2(col("qp"), col("pvec")) * vec_l2(col("qp"), col("pvec")) * 10000) / 10000)
      .withColumn("p_rank", row_number().over(wp))
      .filter(col("p_rank") <= keep)
      .join(fetch, Seq("vec_id"))
      .withColumn("dist", vec_l2(col("embedding"), col("qraw")))
      .withColumn("rnk", row_number().over(wk))
      .filter(col("rnk") <= K)
      .select(col("query_id"), col("vec_id"), round(col("dist"), 4).as("dist"), col("rnk"))
  }

  /** Oracle: the identical progressive chain — prefix length derived
    * from the data in-query (`len(embedding) // PrefixShare`, exactly
    * the Spark side's dim/4), floored squared prefix distance,
    * AdcKeep shortlist, exact refine. */
  def annMrlTopKSql: String =
    s"""WITH meta AS (SELECT len(embedding) // $PrefixShare AS pd FROM embeddings LIMIT 1),
       |pdist AS (
       |  SELECT q.vec_id AS query_id, c.vec_id,
       |    FLOOR(list_distance(list_slice(CAST(q.embedding AS DOUBLE[]), 1, m.pd),
       |                        list_slice(CAST(c.embedding AS DOUBLE[]), 1, m.pd))
       |        * list_distance(list_slice(CAST(q.embedding AS DOUBLE[]), 1, m.pd),
       |                        list_slice(CAST(c.embedding AS DOUBLE[]), 1, m.pd)) * 10000) / 10000 AS pdist
       |  FROM embeddings c CROSS JOIN embeddings q CROSS JOIN meta m
       |  WHERE q.vec_id < $NumQueries),
       |shortlist AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY pdist, vec_id) AS p_rank
       |    FROM pdist)
       |  WHERE p_rank <= $AdcKeep)
       |SELECT query_id, vec_id, ROUND(dist, 4) AS dist, rnk FROM (
       |  SELECT s.query_id, s.vec_id,
       |    list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) AS dist,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY s.query_id ORDER BY
       |      list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), s.vec_id) AS INTEGER) AS rnk
       |  FROM shortlist s
       |  JOIN embeddings e ON e.vec_id = s.vec_id
       |  JOIN embeddings q ON q.vec_id = s.query_id)
       |WHERE rnk <= $K""".stripMargin
}
