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
 * The decoy vector distribution is selectable like the reference's
 * `-Ddecoy.distribution` (ForwardSecureANNSystem.java:174-179,
 * DecoyQueryGenerator.DecoyDistribution): `gaussian` (components ~
 * N(0,1)), `uniform` (components ~ U[-1,1]), `clustered` (the
 * reference's own fallback: "same as Gaussian for now",
 * DecoyQueryGenerator.java:134-138). One deliberate departure: the
 * reference L2-normalizes its decoys; graft does not, because decoys
 * must blend with the stored corpus and an exactly-unit-norm vector in
 * an unnormalized corpus is a decoy fingerprint.
 *
 * Decoy vectors use a deterministic per-id seed so tests reproduce; a
 * deployment would swap in SecureRandom seeds. Decoy ids are negative —
 * disjoint from real query ids by construction.
 */
object Decoys {

  val Distributions: Set[String] = Set("gaussian", "uniform", "clustered")

  /** One synthetic vector, per the selected distribution. */
  private def components(rnd: java.util.SplittableRandom, dim: Int,
      distribution: String): Array[Float] = {
    def gaussian(): Float = {
      var u = 0.0; var v = 0.0; var s = 0.0
      while ({ u = rnd.nextDouble() * 2 - 1; v = rnd.nextDouble() * 2 - 1; s = u * u + v * v; s >= 1.0 || s == 0.0 }) ()
      (u * math.sqrt(-2.0 * math.log(s) / s)).toFloat
    }
    distribution.toLowerCase match {
      case "gaussian" | "clustered" => Array.fill(dim)(gaussian())
      case "uniform" => Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
      case other => throw new IllegalArgumentException(
        s"decoy distribution must be one of $Distributions, got '$other'")
    }
  }

  /** One decoy per `ratioOneIn` real queries, ids < 0. */
  def inject(spark: SparkSession, queries: DataFrame, dim: Int,
      nDecoys: Int, seed: Long, distribution: String = "gaussian"): DataFrame = {
    import spark.implicits._
    val decoys = (1 to nDecoys).map { i =>
      val rnd = new java.util.SplittableRandom(seed + i)
      (-i.toLong, components(rnd, dim, distribution))
    }.toDF("vec_id", "embedding")
    queries.select(col("vec_id").cast("long"), col("embedding").cast("array<float>"))
      .unionByName(decoys)
  }

  /** Drop decoy results (negative query ids) before returning to the caller. */
  def strip(results: DataFrame): DataFrame =
    results.filter(col("query_id") >= 0)

  /**
   * Data-side decoys (reference
   * `ForwardSecureANNSystem.insertFakePointsInBatches`): synthetic
   * points mixed into the CORPUS before indexing, so the stored set's
   * size and content are obfuscated the same way [[inject]] obfuscates
   * the query stream. Fake ids are negative — disjoint from real ids —
   * and [[stripPoints]] removes them from any result or export. The
   * union is a plain plan node: indexing, encryption, and serving all
   * treat fakes identically to real points, which is the point.
   *
   * Metadata columns (label, …) are PRESERVED: each fake borrows the
   * metadata of a real row so fakes blend in with the filtered search
   * paths instead of carrying give-away nulls. The borrow is an EAGER
   * bounded sample at injection time (first nFakes rows in vec_id
   * order — one TakeOrderedAndProject job, never a full collect):
   * injection happens once per corpus build, where a bounded scan is
   * already in the noise of the index build that follows. An empty
   * input yields typed-null metadata rather than malformed rows.
   */
  def injectPoints(spark: SparkSession, data: DataFrame, dim: Int,
      nFakes: Int, seed: Long, distribution: String = "gaussian"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val metaCols = data.columns.toSeq.filterNot(c => c == "vec_id" || c == "embedding")
    val metaRows: Array[Row] =
      if (metaCols.isEmpty) Array.empty
      else data.orderBy("vec_id").select(metaCols.map(col): _*)
        .limit(math.max(nFakes, 1)).collect()
    val rows = (1 to nFakes).map { i =>
      val rnd = new java.util.SplittableRandom(seed ^ (0x9e3779b97f4a7c15L * i))
      val meta =
        if (metaCols.isEmpty) Seq.empty
        // empty input: fakes still match the declared schema (null meta)
        else if (metaRows.isEmpty) metaCols.map(_ => null)
        else metaRows((i - 1) % metaRows.length).toSeq
      Row.fromSeq(Seq(-i.toLong, components(rnd, dim, distribution).toSeq) ++ meta)
    }
    val schema = StructType(
      StructField("vec_id", LongType) +: StructField("embedding", ArrayType(FloatType)) +:
        metaCols.map(c => data.schema(c)))
    val fakes = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    data.select(col("vec_id").cast("long") +: col("embedding").cast("array<float>") +:
        metaCols.map(col): _*)
      .unionByName(fakes)
  }

  /** Drop fake points (negative vec ids) from results or exports. */
  def stripPoints(results: DataFrame): DataFrame =
    results.filter(col("vec_id") >= 0)
}
