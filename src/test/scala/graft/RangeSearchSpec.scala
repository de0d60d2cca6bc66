package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions.vec_l2
import graft.query.IvfSearch

/** Exactness of the triangle-inequality-pruned radius search: pruning
  * may only discard cells that provably contain no result, so the
  * output must EQUAL brute force — on the real corpus and on clustered
  * data where pruning actually fires.
  */
class RangeSearchSpec extends SparkSpecBase {

  private def bruteRange(data: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, r: Double): Set[(Long, Long, Double)] =
    queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .crossJoin(data.select(col("vec_id"), col("embedding")))
      .withColumn("dist", round(vec_l2(col("embedding"), col("qv")), 4))
      .filter(col("dist") <= r)
      .select("query_id", "vec_id", "dist")
      .collect().map(w => (w.getLong(0), w.getLong(1), w.getDouble(2))).toSet

  test("rangeSearch equals brute force on the sf0.001 corpus") {
    val data = Tables.embeddings(spark, sf)
    val queries = data.filter(col("vec_id") < 20)
    val cents = IvfSearch.fitCentroids(data, 8)
    val pruned = IvfSearch.rangeSearch(data, queries, IvfSearch.RangeRadius, cents)
      .collect().map(w => (w.getLong(0), w.getLong(1), w.getDouble(2))).toSet
    val brute = bruteRange(data, queries, IvfSearch.RangeRadius)
    assert(pruned == brute)
    assert(brute.nonEmpty) // self-match at dist 0 guarantees results
  }

  test("rangeSearch stays exact when pruning fires (separated clusters)") {
    val dim = 8
    val rnd = new scala.util.Random(7)
    // two clusters 100 apart; r=2.0 never crosses clusters, so the far
    // cluster's cells are provably prunable for every query
    val rows = (0 until 400).map { i =>
      val base = if (i % 2 == 0) 0f else 100f
      Row(i.toLong, Array.fill(dim)(base + rnd.nextFloat()))
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val data = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val queries = data.filter(col("vec_id") < 10)
    val cents = IvfSearch.fitCentroids(data, 8)
    val r = 2.0
    val pruned = IvfSearch.rangeSearch(data, queries, r, cents)
      .collect().map(w => (w.getLong(0), w.getLong(1), w.getDouble(2))).toSet
    assert(pruned == bruteRange(data, queries, r))
    // every hit stays within the query's own cluster (parity 2 apart)
    assert(pruned.forall { case (q, v, _) => (q - v) % 2 == 0 })
  }
}
