package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Decoy query injection (reference `query/core/DecoyQueryGenerator`):
 * synthetic queries mixed into every batch obfuscate which lookups are
 * real; decoys run through the identical plan (same codes, probes,
 * refinement — indistinguishable server-side) and their results are
 * stripped before returning to the caller.
 *
 * Decoy vectors are Gaussian with a deterministic per-id seed so tests
 * reproduce; a deployment would swap in SecureRandom seeds. Decoy ids
 * are negative — disjoint from real query ids by construction.
 */
object Decoys {

  /** One decoy per `ratioOneIn` real queries, Gaussian components, ids < 0. */
  def inject(spark: SparkSession, queries: DataFrame, dim: Int,
      nDecoys: Int, seed: Long): DataFrame = {
    import spark.implicits._
    val decoys = (1 to nDecoys).map { i =>
      val rnd = new java.util.SplittableRandom(seed + i)
      def gaussian(): Float = {
        var u = 0.0; var v = 0.0; var s = 0.0
        while ({ u = rnd.nextDouble() * 2 - 1; v = rnd.nextDouble() * 2 - 1; s = u * u + v * v; s >= 1.0 || s == 0.0 }) ()
        (u * math.sqrt(-2.0 * math.log(s) / s)).toFloat
      }
      (-i.toLong, Array.fill(dim)(gaussian()))
    }.toDF("vec_id", "embedding")
    queries.select(col("vec_id").cast("long"), col("embedding").cast("array<float>"))
      .unionByName(decoys)
  }

  /** Drop decoy results (negative query ids) before returning to the caller. */
  def strip(results: DataFrame): DataFrame =
    results.filter(col("query_id") >= 0)
}
