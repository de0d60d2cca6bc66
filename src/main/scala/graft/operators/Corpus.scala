package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Corpus-assembly operators for training-data pipelines: stratified
 * sampling (data mixing) and sequence packing (token binning). Both
 * are deterministic — sampling order comes from a cross-engine hash,
 * not an RNG — so runs are reproducible and DuckDB-checkable.
 */
object Corpus {

  /** Deterministic per-row uniform in [0, 1): the first 32 digest bits
    * of sha-256(key) — the same exact dyadic value in any engine. */
  def hashUniform(key: Column): Column =
    conv(substring(sha2(key.cast("string"), 256), 1, 8), 16, 10).cast("long") /
      lit(4294967296.0)

  /**
   * Stratified quota sampling: up to `quota` docs per stratum, chosen
   * by hash order — a uniform without-replacement draw per stratum
   * that every engine and every rerun reproduces. The window
   * partitions by stratum, so parallelism = number of strata and no
   * global sort exists; at 100 TB each stratum's sort is its own
   * shuffle partition (skewed strata: pre-filter `u < k * quota /
   * est_size` bounds the sorted set before ranking).
   */
  def sampleStratified(docs: DataFrame, stratumCol: String, quota: Int): DataFrame = {
    val w = Window.partitionBy(stratumCol).orderBy(col("u"), col("doc_id"))
    docs.select(col("doc_id"), col(stratumCol),
        hashUniform(col("doc_id")).as("u"))
      .withColumn("draw_rank", row_number().over(w))
      .filter(col("draw_rank") <= quota)
  }

  /**
   * Sequence packing (concat-then-chunk): lay every stratum's token
   * stream end to end and cut a pack every `budget` tokens — the
   * block-packing step a GPT-style pretraining pipeline runs after
   * filtering/dedup. Per doc: its pack id and offset, from an exact
   * integer running sum. Packing is PER STRATUM (window partitions by
   * the stratum column): parallel across strata, deterministic within
   * one — a single global concat order would serialize the window at
   * scale.
   */
  def seqPack(docs: DataFrame, stratumCol: String, budget: Int): DataFrame = {
    val w = Window.partitionBy(stratumCol).orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), col(stratumCol),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum_after", sum(col("n_tokens")).over(w))
      .withColumn("cum_before", col("cum_after") - col("n_tokens"))
      .select(col("doc_id"), col(stratumCol), col("n_tokens"),
        (col("cum_before") / budget).cast("long").as("pack_id"),
        (col("cum_before") % budget).as("pack_offset"))
  }

  /**
   * Token-budget mixture sampling (data mixing): each stratum gets
   * `floor(weight · budget)` tokens; docs are drawn in deterministic
   * hash order until the stratum's budget is reached (the doc that
   * crosses the boundary is included — greedy fill). The pretraining
   * "mix sources to target proportions" step, as one window per
   * stratum: parallelism = #strata, no global sort, no shuffle beyond
   * the window's hash partitioning.
   */
  def dataMix(docs: DataFrame, stratumCol: String, weights: Map[String, Double],
      budget: Long): DataFrame = {
    val budgets = weights.map { case (s, w) => s -> math.floor(w * budget).toLong }
    val budgetCol = budgets.foldLeft(lit(0L)) { case (acc, (s, b)) =>
      when(col(stratumCol) === s, lit(b)).otherwise(acc)
    }
    val w = Window.partitionBy(stratumCol).orderBy(col("u"), col("doc_id"))
    docs.select(col("doc_id"), col(stratumCol),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        hashUniform(col("doc_id")).as("u"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("cum_before") < budgetCol)
      .select(col("doc_id"), col(stratumCol), col("n_tokens"),
        row_number().over(w).as("mix_rank"))
  }

  // ---- SparkEntry wiring ----

  def sampleStratifiedQuery(spark: SparkSession, sfDir: String): DataFrame =
    sampleStratified(Tables.documents(spark, sfDir), "lang", quota = 50)

  val sampleStratifiedSql: String =
    """SELECT doc_id, lang, u, CAST(draw_rank AS INTEGER) AS draw_rank FROM (
      |  SELECT doc_id, lang,
      |    ('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT / 4294967296.0 AS u,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY ('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT, doc_id)
      |      AS draw_rank
      |  FROM documents)
      |WHERE draw_rank <= 50""".stripMargin

  /** Standard mixture: half the token budget to `en`, the rest split
    * evenly — a non-uniform target so the op demonstrably reweights. */
  val MixWeights: Map[String, Double] =
    Map("en" -> 0.5, "de" -> 0.125, "fr" -> 0.125, "es" -> 0.125, "zh" -> 0.125)
  val MixBudget: Long = 8000L

  def dataMixQuery(spark: SparkSession, sfDir: String): DataFrame =
    dataMix(Tables.documents(spark, sfDir), "lang", MixWeights, MixBudget)

  val dataMixSql: String = {
    val cases = MixWeights.toSeq.sortBy(_._1).map { case (s, w) =>
      s"WHEN '$s' THEN ${math.floor(w * MixBudget).toLong}"
    }.mkString(" ")
    s"""WITH d AS (
       |  SELECT doc_id, lang,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    ('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT / 4294967296.0 AS u
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, lang, n_tokens,
       |    COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY u, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
       |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY u, doc_id) AS mix_rank
       |  FROM d)
       |SELECT doc_id, lang, n_tokens, CAST(mix_rank AS INTEGER) AS mix_rank
       |FROM c WHERE cum_before < CASE lang $cases ELSE 0 END""".stripMargin
  }

  def seqPackQuery(spark: SparkSession, sfDir: String): DataFrame =
    seqPack(Tables.documents(spark, sfDir), "lang", budget = 2048)

  val seqPackSql: String =
    """SELECT doc_id, lang, n_tokens,
      |  CAST(FLOOR(CAST(cum_after - n_tokens AS DOUBLE) / 2048) AS BIGINT) AS pack_id,
      |  CAST((cum_after - n_tokens) % 2048 AS BIGINT) AS pack_offset
      |FROM (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER (
      |      PARTITION BY lang ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_after
      |  FROM documents)""".stripMargin
}
