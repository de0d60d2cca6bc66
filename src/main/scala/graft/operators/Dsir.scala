package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Data Selection with Importance Resampling (DSIR, Xie et al. 2023):
 * choose pretraining documents that LOOK LIKE a small high-quality
 * target set by scoring each document with the log-likelihood RATIO
 * of two hashed-n-gram bag models — one fitted on the target, one on
 * the raw corpus — then keeping the top mass by importance weight.
 * This is the model-based complement to `quality_classifier`: no
 * labels, no training loop, just two count vectors.
 *
 * Feature space: unigrams hashed into [[DsirBuckets]] fixed buckets
 * (the paper's hashed n-gram trick — the model size is CONSTANT in
 * corpus size, which is what makes the importance model exact to fit
 * at any scale). Bucket = `floor(hashUniform(token)·B)` — the repo's
 * sha-256 cross-engine uniform, so DuckDB replays the bucketing
 * bit-for-bit (an xxhash64 pmod would be faster at scale; the swap is
 * one expression and changes no plan shape).
 *
 * `log_w(doc) = Σ_tokens [ ln p̂_target(bkt) − ln p̂_raw(bkt) ]` with
 * add-1 smoothing over the B buckets; kept iff `log_w` reaches the
 * [[DsirKeepP]] quantile of the corpus (the paper resamples with
 * Gumbel noise to diversify; the deterministic top-mass cut keeps the
 * oracle exact and is the variant production reruns can reproduce).
 *
 * Scale posture: the two bucket-count tables are partial aggs whose
 * result is ≤ B rows — the importance model rides the plan as ONE
 * broadcast of a fixed-size table (correct at ANY corpus size, unlike
 * an n-gram vocab); scoring is the token stream map-joined against it
 * plus one per-doc partial agg; the threshold reuses
 * [[Quantiles.exactQuantiles]] (bucketed prefix sum, no global sort)
 * and broadcasts back as one row. No corpus-sized sort, window, or
 * unbounded-vocab join anywhere.
 */
object Dsir {

  /** Hashed-feature buckets (fixed model size; the paper uses 10k for
    * production corpora — the 256 default keeps the demo fixtures
    * readable and the plan shape identical). Config-backed
    * (`dsir.buckets` etc.), the Chunking/UrlFilter discipline. */
  def DsirBuckets: Int = graft.config.GraftConfig.active.dsir.buckets

  /** Keep quantile (default: the top quarter by importance weight). */
  def DsirKeepP: Double = graft.config.GraftConfig.active.dsir.keepP

  /** The target language: `lang = 'en'` is the stand-in "trusted
    * high-quality distribution" (the same proxy the quality classifier
    * trains against — in production this is Wikipedia/books). */
  def DsirTargetLang: String = graft.config.GraftConfig.active.dsir.targetLang

  private def bucket(tok: org.apache.spark.sql.Column) =
    floor(Corpus.hashUniform(tok) * DsirBuckets).cast("long")

  /**
   * One verdict row per document: `(doc_id, n_tokens, log_w, keep)`.
   * `targetPred` marks the target-distribution rows (injectable for
   * specs; the entry uses the language proxy).
   *
   * NOTE: the returned plan references `cache()`d intermediates (the
   * per-doc weight table) that are NOT unpersisted here — the repo's
   * returned-plan-cache convention. Long-lived direct callers should
   * `spark.catalog.clearCache()` between invocations (Bench/Verify
   * do), or storage memory accumulates across calls. Same contract:
   * [[dsirSample]], [[graft.operators.SplitOverlap.splitOverlap]],
   * [[graft.index.IndexMaintenance]]'s insert entry, and
   * `knnJoinDeltaCompact`.
   */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
      targetPred: org.apache.spark.sql.Column,
      keepP: Double = DsirKeepP): DataFrame = {
    // CACHED (one row per doc): the weight table feeds BOTH the
    // quantile cut's aggregate and the verdict projection — uncached,
    // the whole scoring chain (tokenize + explode + model join)
    // evaluated twice per run (guide §1.2). Released by the session's
    // per-entry clearCache like the other returned-plan caches.
    val scored = dsirScores(docs, idCol, textCol, targetPred).cache()
    // the quantile cut rides back as ONE broadcast row (the
    // thresholdApply shape, inlined to keep n_tokens in the verdict)
    val thr = Quantiles.exactQuantiles(scored, "log_w", Seq(keepP))
      .select("threshold")
    scored.crossJoin(broadcast(thr))
      .select(col("doc_id"), col("n_tokens"), col("log_w"),
        (col("log_w") >= col("threshold")).cast("int").as("keep"))
  }

  /** The shared scoring stage: one weight row per doc, no verdict —
    * both cuts ([[dsirSelect]], [[dsirSample]]) build on this, so
    * neither pays the other's quantile pass. */
  def dsirScores(docs: DataFrame, idCol: String, textCol: String,
      targetPred: org.apache.spark.sql.Column): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"), targetPred.as("is_t"),
        explode(graft.text.TextAnalysis.tokens(col(textCol))).as("t"))
      .select(col("doc_id"), col("is_t"), bucket(col("t")).as("b"))
    // raw + target counts in ONE grouped aggregate over the token
    // stream (r15, the lm5ModelFromTypes fusion): the target count is a
    // conditional count in the same pass — previously a second
    // corpus-sized tokenize+explode+aggregate plus a bucket join.
    // Values identical: ct counts exactly the is_t rows (0 where the
    // old LEFT join found no target bucket), cr counts all.
    val counts = tok.groupBy("b").agg(count(lit(1)).as("cr"),
      count(when(col("is_t"), lit(1))).as("ct"))
    val nr = counts.agg(sum("cr").as("vnr"))
    // an EMPTY target set degrades to the pure add-1 prior (uniform
    // target model, every bucket 1/B) instead of a silent all-null
    // weight column: the verdict table still has one row per doc
    val nt = counts.agg(coalesce(sum("ct"), lit(0L)).as("vnt"))
    // the importance model: per observed bucket, ln p̂_t − ln p̂_r with
    // add-1 smoothing (identical term order on both engines). Every
    // scored token's bucket is in the counts table by construction;
    // absent target buckets smooth to ct = 0.
    val lr = counts
      .crossJoin(broadcast(nr)).crossJoin(broadcast(nt))
      .select(col("b"),
        (log((col("ct") + 1) / (col("vnt") + lit(DsirBuckets.toDouble))) -
          log((col("cr") + 1) / (col("vnr") + lit(DsirBuckets.toDouble)))).as("lr"))
    val scored = tok.join(broadcast(lr), "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (floor(sum(col("lr")) * 10000) / 10000).as("log_w"))
    scored
  }

  /** Fitted importance model: dense per-bucket log-ratio (every bucket
    * materialized, including never-observed ones — a serving-time token
    * can hash anywhere) + the fit-corpus keep threshold. ~2 KB. */
  final case class DsirModel(lr: Array[Double], threshold: Double) {
    require(lr.length == DsirBuckets, s"model has ${lr.length} buckets")
  }

  /**
   * Fit the importance model on a static corpus: collect the two
   * bucket-count tables (≤ B rows each — the Bpe/QcModel driver-fit
   * discipline, bounded by construction) and densify with the same
   * add-1 smoothing the in-plan scorer uses; the keep threshold is the
   * exact [[DsirKeepP]] quantile of the fit corpus's own weights.
   */
  def fit(docs: DataFrame, idCol: String, textCol: String,
      targetPred: org.apache.spark.sql.Column,
      keepP: Double = DsirKeepP): DsirModel = {
    val tok = docs.select(targetPred.as("is_t"),
        explode(graft.text.TextAnalysis.tokens(col(textCol))).as("t"))
      .select(col("is_t"), bucket(col("t")).as("b"))
    // one corpus-sized aggregate + one collect for both count tables
    // (r15, the dsirScores fusion — previously two passes)
    val both = tok.groupBy("b").agg(count(lit(1)).as("cr"),
        count(when(col("is_t"), lit(1))).as("ct"))
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1), r.getLong(2)))
    val raw = both.map { case (b, cr, _) => b -> cr }.toMap
    val tgt = both.collect { case (b, _, ct) if ct > 0 => b -> ct }.toMap
    val vnr = raw.values.sum.toDouble
    val vnt = tgt.values.sum.toDouble
    val lr = Array.tabulate(DsirBuckets) { b =>
      math.log((tgt.getOrElse(b, 0L) + 1) / (vnt + DsirBuckets)) -
        math.log((raw.getOrElse(b, 0L) + 1) / (vnr + DsirBuckets))
    }
    val thr = Quantiles.exactQuantiles(
        dsirScores(docs, idCol, textCol, targetPred)
          .select(col("log_w")), "log_w", Seq(keepP))
      .select("threshold").head().getDouble(0)
    DsirModel(lr, thr)
  }

  /**
   * MAP-ONLY scoring against a fitted model — the serving shape: the
   * 256-double model rides the plan as a literal array and each doc
   * folds its own token array (no explode, no shuffle, no join). This
   * is what a streaming intake runs per micro-batch. Summation is in
   * document order (deterministic), where the batch plan's partial agg
   * is partition-ordered — the two agree to within one 4-dp floor step.
   */
  def scoreWith(docs: DataFrame, idCol: String, textCol: String,
      m: DsirModel): DataFrame = {
    val arr = typedLit(m.lr.toSeq)
    val toks = graft.text.TextAnalysis.tokens(col(textCol))
    docs.select(col(idCol).as("doc_id"),
      (floor(aggregate(toks, lit(0.0),
        (acc, t) => acc + element_at(arr, bucket(t).cast("int") + 1)) * 10000) / 10000)
        .as("dsir_w"))
      .withColumn("dsir_keep", (col("dsir_w") >= m.threshold).cast("int"))
  }

  def dsirSelectQuery(spark: SparkSession, sfDir: String): DataFrame =
    dsirSelect(Tables.documents(spark, sfDir), "doc_id", "text",
      col("lang") === DsirTargetLang)

  /** Seed for the resampling noise; 2⁻³² floors the uniform away from
    * ln(0) (the one value [[Corpus.hashUniform]] can emit that the
    * Gumbel transform cannot take). */
  val DsirSampleSeed: String = "dsir1"
  private val UFloor: Double = 2.3283064365386963e-10

  /**
   * The paper's actual RESAMPLING: keep by `log_w + Gumbel` instead of
   * raw weight — Gumbel-perturbed selection draws a sample distributed
   * AS the importance weights rather than a hard top slice, preserving
   * diversity in the tail (Xie et al. 2023 §2; Gumbel-top-k). The
   * noise is the closed-form inverse `g = −ln(−ln u)` over the
   * repo's seeded sha-256 uniform, so the "random" draw is exactly
   * reproducible on both engines and stable under re-runs — sampling
   * you can audit. The perturbed key is floored to 4dp and cut at the
   * [[DsirKeepP]] quantile through the same no-sort machinery.
   */
  def dsirSample(docs: DataFrame, idCol: String, textCol: String,
      targetPred: org.apache.spark.sql.Column,
      keepP: Double = DsirKeepP): DataFrame = {
    val weighted = dsirScores(docs, idCol, textCol, targetPred)
      .select("doc_id", "log_w")
    val u = greatest(Corpus.hashUniform(
      concat(lit(DsirSampleSeed + ":"), col("doc_id").cast("string"))), lit(UFloor))
    // CACHED (one row per doc): feeds both the quantile aggregate and
    // the verdict — the dsirSelect rationale
    val keyed = weighted.select(col("doc_id"), col("log_w"),
      (floor((col("log_w") - log(-log(u))) * 10000) / 10000).as("gumbel_key"))
      .cache()
    val thr = Quantiles.exactQuantiles(keyed, "gumbel_key", Seq(keepP))
      .select(col("threshold").as("gthr"))
    keyed.crossJoin(broadcast(thr))
      .select(col("doc_id"), col("log_w"), col("gumbel_key"),
        (col("gumbel_key") >= col("gthr")).cast("int").as("keep"))
  }

  def dsirSampleQuery(spark: SparkSession, sfDir: String): DataFrame =
    dsirSample(Tables.documents(spark, sfDir), "doc_id", "text",
      col("lang") === DsirTargetLang)

  /** Shared oracle CTE prefix: token bucketing -> smoothed log-ratio
    * model -> per-doc weights (the `s` table both verdicts cut). */
  private def dsirScoreCtes: String =
    s"""tok AS (
       |  SELECT doc_id, lang = '$DsirTargetLang' AS is_t,
       |    CAST(FLOOR(('0x' || substr(sha256(t), 1, 8))::UBIGINT
       |      / 4294967296.0 * $DsirBuckets) AS BIGINT) AS b
       |  FROM (SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS t
       |        FROM documents)),
       |raw AS (SELECT b, COUNT(*) AS cr FROM tok GROUP BY b),
       |tgt AS (SELECT b, COUNT(*) AS ct FROM tok WHERE is_t GROUP BY b),
       |nr AS (SELECT SUM(cr) AS vnr FROM raw),
       |nt AS (SELECT COALESCE(SUM(ct), 0) AS vnt FROM tgt),
       |lr AS (
       |  SELECT raw.b,
       |    ln((COALESCE(tgt.ct, 0) + 1) / (nt.vnt + ${DsirBuckets}.0)) -
       |    ln((raw.cr + 1) / (nr.vnr + ${DsirBuckets}.0)) AS lr
       |  FROM raw LEFT JOIN tgt ON raw.b = tgt.b, nr, nt),
       |s AS (
       |  SELECT doc_id, COUNT(*) AS n_tokens,
       |    FLOOR(SUM(lr) * 10000) / 10000 AS log_w
       |  FROM tok JOIN lr USING (b) GROUP BY doc_id)""".stripMargin

  /** Exact-quantile cut over `src`.`keyCol`, yielding one `thr` row
    * (the Quantiles oracle machinery, parameterized). */
  private def quantileThrCtes(src: String, keyCol: String, p: Double): String =
    s"""b2 AS (SELECT CAST(ROUND($keyCol * 10000) AS BIGINT) AS bkt FROM $src),
       |g AS (SELECT bkt, COUNT(*) AS c FROM b2 GROUP BY bkt),
       |o AS (SELECT bkt, c,
       |        CAST(SUM(c) OVER (ORDER BY bkt) AS BIGINT) AS cum,
       |        CAST(SUM(c) OVER (ORDER BY bkt) - c AS BIGINT) AS cum_before
       |      FROM g),
       |nn AS (SELECT SUM(c) AS n FROM g),
       |r AS (SELECT CAST(FLOOR($p * (n - 1)) AS BIGINT) + 1 AS rnk FROM nn),
       |thr AS (
       |  SELECT o.bkt / 10000.0 AS threshold
       |  FROM r JOIN o ON r.rnk > o.cum_before AND r.rnk <= o.cum)""".stripMargin

  def dsirSelectSql: String =
    s"""WITH $dsirScoreCtes,
       |${quantileThrCtes("s", "log_w", DsirKeepP)}
       |SELECT s.doc_id, s.n_tokens, s.log_w,
       |  CAST(s.log_w >= thr.threshold AS INTEGER) AS keep
       |FROM s, thr""".stripMargin

  def dsirSampleSql: String =
    s"""WITH $dsirScoreCtes,
       |keyed AS (
       |  SELECT doc_id, log_w,
       |    FLOOR((log_w - ln(-ln(GREATEST(
       |      ('0x' || substr(sha256('$DsirSampleSeed:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
       |        / 4294967296.0, $UFloor)))) * 10000) / 10000 AS gumbel_key
       |  FROM s),
       |${quantileThrCtes("keyed", "gumbel_key", DsirKeepP)}
       |SELECT keyed.doc_id, keyed.log_w, keyed.gumbel_key,
       |  CAST(keyed.gumbel_key >= thr.threshold AS INTEGER) AS keep
       |FROM keyed, thr""".stripMargin
}
