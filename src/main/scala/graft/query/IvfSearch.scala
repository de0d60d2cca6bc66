package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions.vec_l2

/**
 * IVF-style approximate nearest neighbour: vectors are routed to
 * coarse cells (nearest of C centroids); a query probes only its
 * `nProbe` nearest cells and refines exactly inside them.
 *
 * Spark posture: centroids are a broadcast dimension (KBs). Cell
 * assignment is a broadcast join + argmin window — one pass, no
 * shuffle of the corpus beyond the (cell) hash partitioning, which at
 * 100 TB is the layout you bucket/partition the stored table by, so a
 * probe only scans `nProbe / C` of the data. Deterministic
 * centroid choice (first C vectors) keeps the oracle reproducible;
 * k-means iterations would slot into the same plan unchanged.
 */
object IvfSearch {

  val NumCentroids = 16
  val NumProbes = 4
  val K = 10
  val NumQueries = 20

  /** (vec_id, cell): nearest-centroid assignment via broadcast argmin. */
  def assignCells(data: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("cdist"), col("cell"))
    data.join(broadcast(centroids))
      .withColumn("cdist", vec_l2(col("embedding"), col("cv")))
      .withColumn("crnk", row_number().over(w))
      .filter(col("crnk") === 1)
      .select(col("vec_id"), col("cell"))
  }

  def ivfTopK(spark: SparkSession, data: DataFrame, queries: DataFrame,
      k: Int, nProbe: Int): DataFrame = {
    val centroids = data.orderBy("vec_id").limit(NumCentroids)
      .select(col("vec_id").cast("int").as("cell"), col("embedding").as("cv"))
    val cells = assignCells(data, centroids)

    // queries probe their nProbe nearest cells
    val wp = Window.partitionBy("query_id").orderBy(col("cdist"), col("cell"))
    val probes = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .join(broadcast(centroids))
      .withColumn("cdist", vec_l2(col("qv"), col("cv")))
      .withColumn("crnk", row_number().over(wp))
      .filter(col("crnk") <= nProbe)
      .select(col("query_id"), col("cell"))

    // scan only probed cells, refine exactly
    val wk = Window.partitionBy("query_id").orderBy(col("dist"), col("vec_id"))
    probes
      .join(cells, "cell")
      .join(data.select(col("vec_id"), col("embedding")), "vec_id")
      .join(broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))),
        "query_id")
      .withColumn("dist", vec_l2(col("embedding"), col("qv")))
      .withColumn("rnk", row_number().over(wk))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id"), round(col("dist"), 4).as("dist"), col("rnk"))
  }

  def simsearchIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val data = Tables.embeddings(spark, sfDir)
    ivfTopK(spark, data, data.filter(col("vec_id") < NumQueries), K, NumProbes)
  }
}
