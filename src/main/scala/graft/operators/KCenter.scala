package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.VectorFunctions.vec_l2

/**
 * Greedy k-center coreset selection (Gonzalez 1985 farthest-point
 * traversal) — the geometry-coverage rung of the curation sampling
 * ladder: [[Corpus.sampleStratified]] balances by metadata,
 * [[graft.query.IvfSearch]]'s `sample_cluster_balanced` balances by
 * cluster population, k-center instead picks the k embeddings that
 * MINIMIZE the maximum distance from any corpus point to its nearest
 * pick (2-approximation to the optimal k-center cover) — the standard
 * seed set for diverse few-shot selection and coreset-based data
 * pruning. Beyond-reference operator (the reference has no sampling
 * surface).
 *
 * Distributed shape — the textbook scalable form: the traversal is k−1
 * rounds, each round ONE corpus scan computing
 * `min_{c∈centers} L2(x, c)` in whole-stage codegen (centers ride the
 * plan as literals — k is small by definition, the cost of `least()`
 * over k native expressions) finished by a TakeOrdered(1) argmax —
 * no shuffle of corpus rows at any point, no pairwise anything. The
 * k selected rows (ids + k·dim floats) are the only driver-side state,
 * the documented bounded-collect discipline. At 100 TB: k scans, each
 * embarrassingly parallel, each cheaper than one aggregation pass.
 *
 * Determinism (SURVEY §5): seed = MIN(vec_id); each round's winner is
 * the max of the 4dp-FLOORED min-distance with vec_id tie-break;
 * `radius4` records that floored distance at selection time (the
 * traversal's coverage radius — non-increasing by construction; 0.0
 * for the seed by convention). DuckDB `list_distance` over `DOUBLE[]`
 * casts reproduces [[graft.functions.VectorKernels.l2]]'s doubles
 * exactly (same float→double sequential accumulation).
 */
object KCenter {

  private def cfg = graft.config.GraftConfig.active
  def K: Int = cfg.kcenter.k

  /** Farthest-point traversal over `data` (vec_id, embedding).
    * Output: (sel_rank, vec_id, radius4) — k rows, or the PARTIAL
    * selection when the corpus has fewer than k vectors (the whole
    * corpus is then a perfect cover; the SQL twin's maximal-step
    * selection degrades identically, and an empty corpus yields an
    * empty frame rather than a throw). */
  def kcenterSample(spark: SparkSession, data: DataFrame, k: Int = K): DataFrame = {
    val e = data.select(col("vec_id"), col("embedding"))
    var centers = List.empty[(Long, Array[Float], Double)]
    e.orderBy(col("vec_id")).limit(1).take(1).foreach { seed =>
      centers = List((seed.getLong(0), seed.getSeq[Float](1).toArray, 0.0))
      var rank = 1
      var exhausted = false
      while (rank < k && !exhausted) {
        val minDist = centers
          .map { case (_, v, _) => vec_l2(col("embedding"), typedLit(v.toSeq)) }
          .reduce(least(_, _))
        val chosen = e
          .filter(!col("vec_id").isInCollection(centers.map(_._1)))
          .withColumn("d4", floor(minDist * 10000) / 10000)
          .orderBy(col("d4").desc, col("vec_id"))
          .limit(1).take(1)
        if (chosen.isEmpty) exhausted = true
        else {
          centers ::= ((chosen(0).getLong(0), chosen(0).getSeq[Float](1).toArray,
            chosen(0).getDouble(2)))
          rank += 1
        }
      }
    }
    val rows = centers.reverse.zipWithIndex.map { case ((id, _, r4), i) =>
      Row(i + 1, id, r4)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("sel_rank", IntegerType, nullable = false),
        StructField("vec_id", LongType, nullable = false),
        StructField("radius4", DoubleType, nullable = false))))
  }

  def kcenterQuery(spark: SparkSession, sfDir: String): DataFrame =
    kcenterSample(spark, Tables.embeddings(spark, sfDir))

  /** DuckDB replay of the traversal: one recursive step per center,
    * the winner = max (floored min-distance, vec_id asc) over points
    * outside the selection — identical floored arithmetic. */
  def kcenterSql: String =
    s"""WITH RECURSIVE
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |r AS (
       |  SELECT CAST([(SELECT MIN(vec_id) FROM e)] AS BIGINT[]) AS cs,
       |         CAST([0.0] AS DOUBLE[]) AS rad, 1 AS n
       |  WHERE (SELECT COUNT(*) FROM e) > 0
       |  UNION ALL
       |  SELECT list_append(cs, vec_id), list_append(rad, d4), n + 1
       |  FROM (
       |    SELECT cs, rad, n, vec_id, d4,
       |      ROW_NUMBER() OVER (ORDER BY d4 DESC, vec_id) AS rn
       |    FROM (
       |      SELECT r.cs AS cs, r.rad AS rad, r.n AS n, x.vec_id AS vec_id,
       |        FLOOR(MIN(list_distance(x.v, c.v)) * 10000) / 10000 AS d4
       |      FROM r, e x, e c
       |      WHERE NOT list_contains(r.cs, x.vec_id)
       |        AND list_contains(r.cs, c.vec_id)
       |      GROUP BY r.cs, r.rad, r.n, x.vec_id))
       |  WHERE rn = 1 AND n < $K)
       |SELECT CAST(i AS INTEGER) AS sel_rank, cs[i] AS vec_id, rad[i] AS radius4
       |FROM (SELECT cs, rad FROM r ORDER BY n DESC LIMIT 1),
       |     LATERAL (SELECT unnest(range(1, len(cs) + 1)) AS i) u""".stripMargin
}
