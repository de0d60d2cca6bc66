package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Exact rank-based quantiles of a quality-score distribution WITHOUT
 * a global sort — the "pick the filter threshold" step a pipeline
 * runs between scoring (`lm_score`, `quality_classifier`) and
 * filtering: keep the top 75% by LM score means knowing the exact
 * p25 cutoff.
 *
 * Scale posture: scores in graft are 4-dp quantized (SURVEY §5), so
 * `round(score·1e4)` is an EXACT integer bucket and the r-th smallest
 * score IS its bucket's value. One partial-agg shuffle builds the
 * (bucket, count) table — bounded by the score RANGE (≤ a few 100k
 * rows), never the corpus — a prefix sum over that tiny table locates
 * each target rank's bucket, and no row of the corpus is ever sorted
 * or windowed. This is the same tiny-table prefix-sum recipe as
 * `seq_pack`/`corpus_shuffle`, keyed on the score. `percentile_approx`
 * would be cheaper still but engine-specific; this is exact and
 * cross-engine reproducible.
 */
object Quantiles {

  /** Default probe points: the deciles/quartiles a filter sweep reads. */
  val DefaultPs: Seq[Double] = Seq(0.1, 0.25, 0.5, 0.75, 0.9)

  /**
   * (p, rnk, threshold, n_at_or_below) per requested quantile:
   * `rnk = floor(p·(n-1)) + 1` (1-based rank of the lower
   * interpolation neighbor), `threshold` = the rnk-th smallest score,
   * `n_at_or_below` = how many rows sit at or below it. `scoreCol`
   * must be 4-dp quantized (the SURVEY §5 discipline all graft scores
   * follow) so the bucket map is exact.
   */
  def exactQuantiles(scores: DataFrame, scoreCol: String,
      ps: Seq[Double] = DefaultPs): DataFrame =
    fromBuckets(bucketize(scores, scoreCol), ps)

  /** The one corpus-sized pass: exact integer score buckets -> (bkt,
    * count). Round, not truncate: k/1e4 stored as double sits within
    * 1 ulp of k·1e-4, and cast-to-long truncation toward zero would
    * misbucket every negative score. */
  def bucketize(scores: DataFrame, scoreCol: String): DataFrame =
    scores.select(round(col(scoreCol) * 10000).cast("long").as("bkt"))
      .groupBy("bkt").agg(count(lit(1)).as("c"))

  /**
   * Quantiles from an already-aggregated (bkt, c) table — tiny from
   * here on (bounded by score range, not corpus). Split out so the
   * STREAMING twin can maintain the bucket table as complete-mode
   * state and re-derive thresholds per trigger
   * ([[graft.streaming.StreamingQuantiles]]).
   */
  def fromBuckets(bucketed: DataFrame, ps: Seq[Double] = DefaultPs): DataFrame = {
    val spark = bucketed.sparkSession
    val w = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, 0)
    val cum = bucketed.withColumn("cum", sum(col("c")).over(w))
    // n derives IN-PLAN from the same bucketed subtree (its shuffle is
    // computed once and ReusedExchange feeds the second consumer), so
    // the corpus-sized bucketing aggregate runs exactly one partial-agg
    // pass — no eager driver-side count action. An empty score set
    // yields an empty result.
    import spark.implicits._
    val nDf = bucketed.agg(sum(col("c")).as("n"))
    val ranks = ps.toDF("p").crossJoin(broadcast(nDf))
      .select(col("p"),
        (floor(col("p") * (col("n") - 1)) + 1).cast("long").as("rnk"))
    cum.join(broadcast(ranks), col("cum") >= col("rnk"))
      .groupBy(col("p"), col("rnk"))
      .agg(min(struct(col("bkt"), col("cum"))).as("hit"))
      .select(col("p"), col("rnk"),
        (col("hit.bkt") / 10000.0).as("threshold"),
        col("hit.cum").as("n_at_or_below"))
  }

  /** The lm_score distribution's filter thresholds over documents. */
  def qualityThresholdQuery(spark: SparkSession, sfDir: String): DataFrame =
    exactQuantiles(
      graft.text.TextAnalysis.lmScore(Tables.documents(spark, sfDir), "doc_id", "text"),
      "lm_score")

  /** The percentile whose threshold [[thresholdApply]]'s demo entry
    * cuts at (drop the worst decile — the standard first pass). */
  val ApplyP: Double = 0.1

  /**
   * Apply a quantile cutoff to the scored corpus: one verdict row per
   * document, keep iff score >= the p-quantile threshold (ties at the
   * threshold keep — the rank row itself is AT the cutoff). The
   * threshold is ONE broadcast row, so the apply is map-only over the
   * score table; in production the score table is materialized once
   * and both the quantile pass and the verdict read it.
   */
  def thresholdApply(scores: DataFrame, idCol: String, scoreCol: String,
      p: Double = ApplyP): DataFrame = {
    val thr = exactQuantiles(scores, scoreCol, Seq(p)).select("threshold")
    scores.crossJoin(broadcast(thr))
      .select(col(idCol), col(scoreCol),
        (col(scoreCol) >= col("threshold")).cast("int").as("keep"))
  }

  /** Drop-the-worst-decile verdict over the lm_score distribution. */
  def qualityThresholdApplyQuery(spark: SparkSession, sfDir: String): DataFrame =
    thresholdApply(
      graft.text.TextAnalysis.lmScore(Tables.documents(spark, sfDir), "doc_id", "text"),
      "doc_id", "lm_score")

  /** The CCNet tertile cuts (head = best-scoring third). Exact decimal
    * literals, NOT 1/3 doubles: `floor(p·(n-1))` must see the same
    * IEEE value on both engines, and 0.33/0.67 are exact in decimal
    * SQL text where 0.3333… invites a last-ulp mismatch. */
  val BucketPs: Seq[Double] = Seq(0.33, 0.67)

  /**
   * CCNet-style perplexity bucketing (Wenzek et al. 2020): partition
   * the scored corpus into head / middle / tail thirds by LM score —
   * the pipeline step that lets a trainer oversample the head and
   * drop or downweight the tail. High score = low perplexity = head
   * (the score is mean ln P, so bigger is more fluent); ties at a
   * threshold fall to the LOWER bucket (strict > mirrors the rank
   * rule: the threshold row itself is AT the cut).
   *
   * Scale: the two thresholds come from [[exactQuantiles]] (one
   * partial-agg shuffle + tiny-table prefix sum, no global sort) and
   * ride as ONE broadcast row; the bucketing itself is map-only.
   */
  def perplexityBucket(scores: DataFrame, idCol: String,
      scoreCol: String): DataFrame = {
    val thr = exactQuantiles(scores, scoreCol, BucketPs)
    val t = thr.agg(
      min(when(col("p") === BucketPs.head, col("threshold"))).as("t_lo"),
      min(when(col("p") === BucketPs(1), col("threshold"))).as("t_hi"))
    scores.crossJoin(broadcast(t))
      .select(col(idCol), col(scoreCol),
        when(col(scoreCol) > col("t_hi"), "head")
          .when(col(scoreCol) > col("t_lo"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** Head/middle/tail partition of the lm_score distribution. */
  def perplexityBucketQuery(spark: SparkSession, sfDir: String): DataFrame =
    perplexityBucket(
      graft.text.TextAnalysis.lmScore(Tables.documents(spark, sfDir), "doc_id", "text"),
      "doc_id", "lm_score")

  val perplexityBucketSql: String =
    s"""WITH ${lmQuantileCtes(BucketPs.map(p => s"($p)").mkString(", "))},
       |thr AS (
       |  SELECT r.p, o.bkt / 10000.0 AS threshold
       |  FROM r JOIN o ON r.rnk > o.cum_before AND r.rnk <= o.cum),
       |t AS (SELECT
       |  MIN(CASE WHEN p = ${BucketPs.head} THEN threshold END) AS t_lo,
       |  MIN(CASE WHEN p = ${BucketPs(1)} THEN threshold END) AS t_hi
       |FROM thr)
       |SELECT s.doc_id, s.lm_score,
       |  CASE WHEN s.lm_score > t.t_hi THEN 'head'
       |       WHEN s.lm_score > t.t_lo THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM s, t""".stripMargin

  /** Shared oracle CTE chain: per-doc lm_score -> exact bucket
    * quantile machinery (the [[qualityThresholdSql]] body). */
  private def lmQuantileCtes(ps: String): String =
    s"""tok AS (
       |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents),
       |freq AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
       |tot AS (SELECT SUM(c) AS n FROM freq),
       |s AS (
       |  SELECT doc_id, FLOOR(AVG(ln(c / n)) * 10000) / 10000 AS lm_score
       |  FROM tok JOIN freq USING (t), tot GROUP BY doc_id),
       |b AS (SELECT CAST(ROUND(lm_score * 10000) AS BIGINT) AS bkt FROM s),
       |g AS (SELECT bkt, COUNT(*) AS c FROM b GROUP BY bkt),
       |o AS (SELECT bkt, c,
       |        CAST(SUM(c) OVER (ORDER BY bkt) AS BIGINT) AS cum,
       |        CAST(SUM(c) OVER (ORDER BY bkt) - c AS BIGINT) AS cum_before
       |      FROM g),
       |nn AS (SELECT SUM(c) AS n FROM g),
       |ps(p) AS (VALUES $ps),
       |r AS (SELECT p, CAST(FLOOR(p * (n - 1)) AS BIGINT) + 1 AS rnk FROM ps, nn)""".stripMargin

  val qualityThresholdApplySql: String =
    s"""WITH ${lmQuantileCtes(s"($ApplyP)")},
       |thr AS (
       |  SELECT o.bkt / 10000.0 AS threshold
       |  FROM r JOIN o ON r.rnk > o.cum_before AND r.rnk <= o.cum)
       |SELECT s.doc_id, s.lm_score,
       |  CAST(s.lm_score >= thr.threshold AS INTEGER) AS keep
       |FROM s, thr""".stripMargin

  val qualityThresholdSql: String = {
    val vals = DefaultPs.map(p => s"($p)").mkString(", ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents),
       |freq AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
       |tot AS (SELECT SUM(c) AS n FROM freq),
       |s AS (
       |  SELECT doc_id, FLOOR(AVG(ln(c / n)) * 10000) / 10000 AS lm_score
       |  FROM tok JOIN freq USING (t), tot GROUP BY doc_id),
       |b AS (SELECT CAST(ROUND(lm_score * 10000) AS BIGINT) AS bkt FROM s),
       |g AS (SELECT bkt, COUNT(*) AS c FROM b GROUP BY bkt),
       |o AS (SELECT bkt, c,
       |        CAST(SUM(c) OVER (ORDER BY bkt) AS BIGINT) AS cum,
       |        CAST(SUM(c) OVER (ORDER BY bkt) - c AS BIGINT) AS cum_before
       |      FROM g),
       |nn AS (SELECT SUM(c) AS n FROM g),
       |ps(p) AS (VALUES $vals),
       |r AS (SELECT p, CAST(FLOOR(p * (n - 1)) AS BIGINT) + 1 AS rnk FROM ps, nn)
       |SELECT r.p, r.rnk, o.bkt / 10000.0 AS threshold, o.cum AS n_at_or_below
       |FROM r JOIN o ON r.rnk > o.cum_before AND r.rnk <= o.cum""".stripMargin
  }
}
