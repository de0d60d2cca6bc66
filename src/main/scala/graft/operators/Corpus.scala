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
 *
 * Scale posture: none of these operators sorts a whole stratum in one
 * shuffle partition. A 100 TB corpus with ~5 language strata would
 * otherwise put ~20 TB through a single reducer per stratum:
 *  - [[seqPack]] numbers tokens with deterministic doc_id-range
 *    buckets + a prefix sum over the tiny per-bucket count table (the
 *    same recipe as [[graft.index.LshIndex.build]]), so parallelism is
 *    strata x buckets;
 *  - [[sampleStratified]] / [[dataMix]] bound their per-stratum sort
 *    input with a one-pass u-histogram prefix ([[admitPrefix]]): only
 *    the provably-sufficient sliver of each stratum (≈ quota +
 *    stratum/nBins rows) reaches the ranking window.
 * Windowed twins ([[seqPackWindowed]] etc.) are kept as cross-check
 * oracles for the scalable paths, mirroring `LshIndex.buildWindowed`.
 */
object Corpus {

  /** Deterministic per-row uniform in [0, 1): the first 32 digest bits
    * of sha-256(key) — the same exact dyadic value in any engine. */
  def hashUniform(key: Column): Column =
    conv(substring(sha2(key.cast("string"), 256), 1, 8), 16, 10).cast("long") /
      lit(4294967296.0)

  /** Histogram bins for the u-prefix bound: a stratum of N rows sends
    * ≈ target + N/1024 rows into the ranking window instead of N. */
  private val UBins = 1024

  /** Whitespace token count WITHOUT materializing the token array:
    * spaces + 1 == size(split(text, " ")) exactly (single-space split
    * keeps empty fields in Spark and DuckDB alike, so both count
    * separators + 1). The corpus operators only need the COUNT, and
    * at corpus scale allocating a substring array per doc just to take
    * its length is pure GC pressure. */
  private[graft] def nTokens(text: Column): Column =
    (length(text) - length(translate(text, " ", "")) + 1).cast("long")

  /**
   * Bound the per-stratum window input: keep, per stratum, every row in
   * u-histogram bins up to the FIRST bin where the cumulative weight
   * reaches that stratum's target — a u-order prefix that provably
   * contains every row the full window would keep (the target-th
   * smallest u lies inside the first cumulative-weight >= target bins,
   * and any row past them has prefix weight >= target). One extra
   * column-pruned scan builds the histogram (strata x [[UBins]] rows —
   * tiny); the threshold bin is picked with a window over that tiny
   * table, and rows join it broadcast. Ranks and running sums computed
   * on the kept prefix equal the global ones, because the prefix is
   * closed under the (u, doc_id) order.
   *
   * `weight` is 1 per row for count quotas, `n_tokens` for token
   * budgets; `targetOf` maps the stratum column to its target. A
   * stratum whose total weight never reaches its target keeps all rows
   * (its threshold bin is absent -> no filter).
   */
  private[graft] def admitPrefix(base: DataFrame, stratumCol: String,
      weight: Column, targetOf: Column => Column): DataFrame = {
    val bin = floor(col("u") * UBins).cast("int")
    val hist = base
      .groupBy(col(stratumCol).as("_sk"), bin.as("_b"))
      .agg(sum(weight).as("_w"))
    val wCum = Window.partitionBy("_sk").orderBy("_b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val thr = hist
      .withColumn("_cum", sum(col("_w")).over(wCum))
      .filter(col("_cum") >= targetOf(col("_sk")))
      .groupBy("_sk").agg(min("_b").as("_bstar"))
    base.join(broadcast(thr), col(stratumCol) <=> col("_sk"), "left")
      .filter(col("_bstar").isNull || bin <= col("_bstar"))
      .drop("_sk", "_bstar")
  }

  /**
   * Stratified quota sampling: up to `quota` docs per stratum, chosen
   * by hash order — a uniform without-replacement draw per stratum
   * that every engine and every rerun reproduces. The ranking window
   * partitions by stratum, but its input is first bounded by
   * [[admitPrefix]] to ≈ quota + stratum/1024 rows, so no reducer ever
   * sorts a whole stratum.
   */
  def sampleStratified(docs: DataFrame, stratumCol: String, quota: Int): DataFrame = {
    val base = docs.select(col("doc_id"), col(stratumCol),
      hashUniform(col("doc_id")).as("u"))
    val kept = admitPrefix(base, stratumCol, lit(1L), _ => lit(quota.toLong))
    val w = Window.partitionBy(stratumCol).orderBy(col("u"), col("doc_id"))
    kept.withColumn("draw_rank", row_number().over(w))
      .filter(col("draw_rank") <= quota)
  }

  /** Unbounded-window twin of [[sampleStratified]]; cross-check oracle. */
  private[graft] def sampleStratifiedWindowed(docs: DataFrame, stratumCol: String,
      quota: Int): DataFrame = {
    val w = Window.partitionBy(stratumCol).orderBy(col("u"), col("doc_id"))
    docs.select(col("doc_id"), col(stratumCol),
        hashUniform(col("doc_id")).as("u"))
      .withColumn("draw_rank", row_number().over(w))
      .filter(col("draw_rank") <= quota)
  }

  /** Deterministic doc_id-range bucket per stratum: `n` equal-width
    * ranges over the stratum's [min, max] doc_id span (per-stratum
    * bounds broadcast-joined from a tiny agg). Monotone in doc_id, a
    * pure function of the row — counts and numbering agree across
    * recomputation, cache eviction, or task retry (the property a
    * sampled range partitioner would NOT give, since this plan is
    * executed twice: once for the offsets table, once for the window).
    *
    * Ids clustered in a sliver of their stratum's span degrade bucket
    * balance — parallelism, never correctness. If a real corpus hits
    * that, swap equal-width bounds for once-collected per-stratum
    * quantile boundaries embedded as literals (collect once so both
    * executions see identical buckets; the tiny-table size is the same). */
  private[graft] def withRangeBucket(df: DataFrame, stratumCol: String, n: Int): DataFrame =
    if (graft.config.GraftConfig.active.corpus.bucketBoundaries == "quantile")
      withRangeBucketQuantile(df, stratumCol, n)
    else withRangeBucketWidth(df, stratumCol, n)

  private[graft] def withRangeBucketWidth(df: DataFrame, stratumCol: String, n: Int): DataFrame = {
    val stats = df.groupBy(col(stratumCol).as("_sk"))
      .agg(min("doc_id").as("_lo"), max("doc_id").as("_hi"))
    val span = col("_hi").cast("double") - col("_lo").cast("double") + 1.0
    val b = least(
      floor((col("doc_id").cast("double") - col("_lo").cast("double")) * n / span),
      lit((n - 1).toLong))
    df.join(broadcast(stats), col(stratumCol) <=> col("_sk"))
      .withColumn("bkt", b.cast("int"))
      .drop("_sk", "_lo", "_hi")
  }

  /** The quantile-boundary variant (config `corpus.bucketBoundaries =
    * quantile`), for corpora whose ids cluster in a sliver of their
    * stratum's span: per-stratum approx-quantile bounds are collected
    * ONCE and re-enter the plan as a broadcast LOCAL relation of
    * literals — both executions of the downstream plan (offsets table
    * + window) see identical buckets by construction, which is the
    * invariant the equal-width variant gets from being a pure function
    * of the row. Still monotone in doc_id within a stratum (bucket =
    * count of bounds below the id), so numbering is unchanged; only
    * balance differs. One extra column-pruned pass at build time. */
  private[graft] def withRangeBucketQuantile(df: DataFrame, stratumCol: String, n: Int): DataFrame = {
    if (n <= 1) return df.withColumn("bkt", lit(0))
    val spark = df.sparkSession
    val probs = (1 until n).map(p => p.toDouble / n)
    val collected = df.groupBy(col(stratumCol).as("_sk"))
      .agg(expr(s"approx_percentile(doc_id, array(${probs.mkString(", ")}), 10000)")
        .as("_bounds"))
      .collect()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_sk", df.schema(stratumCol).dataType),
      org.apache.spark.sql.types.StructField("_bounds",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))))
    val local = spark.createDataFrame(
      java.util.Arrays.asList(collected: _*), schema)
    df.join(broadcast(local), col(stratumCol) <=> col("_sk"))
      .withColumn("bkt",
        expr("CAST(aggregate(_bounds, 0, (a, b) -> a + IF(doc_id > b, 1, 0)) AS INT)"))
      .drop("_sk", "_bounds")
  }

  /**
   * Sequence packing (concat-then-chunk): lay every stratum's token
   * stream end to end and cut a pack every `budget` tokens — the
   * block-packing step a GPT-style pretraining pipeline runs after
   * filtering/dedup. Per doc: its pack id and offset, from an exact
   * integer running sum.
   *
   * Scalable numbering (the `LshIndex.build` recipe): docs get a
   * deterministic doc_id-range bucket within their stratum; a tiny
   * (stratum x bucket) token-sum table yields each bucket's starting
   * offset via an exclusive prefix sum (a window over that tiny table);
   * the running sum then needs only a per-(stratum, bucket) window —
   * parallelism = strata x buckets, not strata. Bucket order is doc_id
   * order by construction, so `base + within-bucket running sum` equals
   * the global per-stratum running sum exactly.
   *
   * `counter` picks the token-count semantics (default: whitespace;
   * pass `Bpe.bpe_count(_, model)` to pack by subword tokens).
   */
  def seqPack(docs: DataFrame, stratumCol: String, budget: Int,
      counter: Column => Column = nTokens): DataFrame =
    seqPackWith(docs, stratumCol, budget, counter, withRangeBucket)

  private[graft] def seqPackWith(docs: DataFrame, stratumCol: String, budget: Int,
      counter: Column => Column,
      bucketer: (DataFrame, String, Int) => DataFrame): DataFrame = {
    val n = docs.sparkSession.sparkContext.defaultParallelism
    val sized = docs.select(col("doc_id"), col(stratumCol),
      counter(col("text")).as("n_tokens"))
    val bucketed = bucketer(sized, stratumCol, n)
    // tiny (stratum x bucket) token sums -> per-bucket starting offsets
    val wOff = Window.partitionBy("_sk").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed
      .groupBy(col(stratumCol).as("_sk"), col("bkt"))
      .agg(sum("n_tokens").as("_bt"))
      .withColumn("_base", coalesce(sum(col("_bt")).over(wOff), lit(0L)))
      .select(col("_sk"), col("bkt").as("_bkt"), col("_base"))
    val wRun = Window.partitionBy(stratumCol, "bkt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .join(broadcast(offsets),
        col(stratumCol) <=> col("_sk") && col("bkt") === col("_bkt"))
      .withColumn("cum_before",
        col("_base") + sum(col("n_tokens")).over(wRun) - col("n_tokens"))
      .select(col("doc_id"), col(stratumCol), col("n_tokens"),
        (col("cum_before") / budget).cast("long").as("pack_id"),
        (col("cum_before") % budget).as("pack_offset"))
  }

  /** Per-stratum running-sum-window twin of [[seqPack]]; cross-check oracle. */
  private[graft] def seqPackWindowed(docs: DataFrame, stratumCol: String,
      budget: Int, counter: Column => Column = nTokens): DataFrame = {
    val w = Window.partitionBy(stratumCol).orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), col(stratumCol),
        counter(col("text")).as("n_tokens"))
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
   * "mix sources to target proportions" step. The running-sum window
   * partitions by stratum, but [[admitPrefix]] (weighted by n_tokens)
   * first bounds its input to the u-prefix whose token mass covers the
   * stratum budget — the boundary-crossing doc is inside that prefix by
   * construction, so ranks and running sums are unchanged.
   *
   * `counter` picks the token-count semantics (default: whitespace;
   * pass `Bpe.bpe_count(_, model)` to budget by subword tokens — a
   * whitespace count mispacks real text 2-4x against tokenizer tokens).
   */
  def dataMix(docs: DataFrame, stratumCol: String, weights: Map[String, Double],
      budget: Long, counter: Column => Column = nTokens): DataFrame =
    dataMixWithBudgets(docs, stratumCol,
      weights.map { case (s, w) => s -> math.floor(w * budget).toLong }, counter)

  /** [[dataMix]] body with the per-stratum token budgets already
    * resolved to exact longs (shared by the explicit-weights and
    * temperature entrypoints). */
  def dataMixWithBudgets(docs: DataFrame, stratumCol: String,
      budgets: Map[String, Long],
      counter: Column => Column = nTokens): DataFrame = {
    def budgetOf(stratum: Column): Column =
      budgets.foldLeft(lit(0L)) { case (acc, (s, b)) =>
        when(stratum === s, lit(b)).otherwise(acc)
      }
    val base = docs.select(col("doc_id"), col(stratumCol),
      counter(col("text")).as("n_tokens"),
      hashUniform(col("doc_id")).as("u"))
    val kept = admitPrefix(base, stratumCol, col("n_tokens"), budgetOf)
    val w = Window.partitionBy(stratumCol).orderBy(col("u"), col("doc_id"))
    kept
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("cum_before") < budgetOf(col(stratumCol)))
      .select(col("doc_id"), col(stratumCol), col("n_tokens"),
        row_number().over(w).as("mix_rank"))
  }

  /**
   * Temperature-scaled data mixing (the pretraining "alpha sampling"
   * of GPT-3 / PaLM mixture design, here at temperature α = 0.5):
   * stratum budgets proportional to sqrt(stratum token mass), which
   * upweights small strata relative to natural sampling. Budgets are
   * CROSS-ENGINE EXACT: `floor(sqrt(c))` is IEEE-correctly-rounded in
   * any engine, and everything after it is integer arithmetic —
   * `budget_s = budget * isqrt_s div Σ isqrt` — so no pow/division
   * double can flip a greedy-fill boundary. The stratum count table is
   * one partial agg with #strata rows (bounded by the mixture design,
   * never the corpus), collected like the Bpe vocab table.
   */
  def dataMixTemperature(docs: DataFrame, stratumCol: String, budget: Long,
      counter: Column => Column = nTokens): DataFrame = {
    val counts: Array[(String, Long)] = docs
      .groupBy(col(stratumCol)).agg(sum(counter(col("text"))).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val isq = counts.map { case (s, c) => s -> math.floor(math.sqrt(c.toDouble)).toLong }
    val tot = isq.map(_._2).sum
    require(tot > 0, "temperature mix: empty corpus")
    val budgets = isq.map { case (s, q) => s -> budget * q / tot }.toMap
    dataMixWithBudgets(docs, stratumCol, budgets, counter)
  }

  /** Unbounded-window twin of [[dataMix]]; cross-check oracle. */
  private[graft] def dataMixWindowed(docs: DataFrame, stratumCol: String,
      weights: Map[String, Double], budget: Long): DataFrame = {
    val budgets = weights.map { case (s, w) => s -> math.floor(w * budget).toLong }
    val budgetCol = budgets.foldLeft(lit(0L)) { case (acc, (s, b)) =>
      when(col(stratumCol) === s, lit(b)).otherwise(acc)
    }
    val w = Window.partitionBy(stratumCol).orderBy(col("u"), col("doc_id"))
    docs.select(col("doc_id"), col(stratumCol),
        nTokens(col("text")).as("n_tokens"),
        hashUniform(col("doc_id")).as("u"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("cum_before") < budgetCol)
      .select(col("doc_id"), col(stratumCol), col("n_tokens"),
        row_number().over(w).as("mix_rank"))
  }

  /**
   * Deterministic global corpus shuffle (training-order
   * randomization): every doc draws a seeded cross-engine uniform `u`
   * and receives its EXACT global rank in (u, doc_id) order plus its
   * output shard — the step that fixes a pretraining data order and
   * shards it for the loader, reproducible across engines and reruns.
   *
   * Scalable numbering, same recipe as [[seqPack]] but keyed on `u`
   * itself: u-buckets are uniform by construction, the per-bucket
   * count table (nBuckets rows) takes an exclusive prefix sum, and the
   * corpus-side window partitions by bucket — no global window or
   * global sort ever sees the corpus. The rank is independent of
   * `nBuckets` (prefix sums are exact), so parallelism is a pure
   * tuning knob.
   */
  def corpusShuffle(docs: DataFrame, seed: String, shardSize: Long,
      nBuckets: Int): DataFrame = {
    val base = docs.select(col("doc_id"),
      hashUniform(concat(lit(seed), lit(":"), col("doc_id"))).as("u"))
    val bucketed = base.withColumn("bkt",
      least(floor(col("u") * nBuckets), lit((nBuckets - 1).toLong)).cast("int"))
    // tiny per-bucket counts -> starting rank of each bucket (the
    // window is global but runs over nBuckets rows, not the corpus)
    val wOff = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("bkt").agg(count(lit(1)).as("_n"))
      .withColumn("_base", coalesce(sum(col("_n")).over(wOff), lit(0L)))
      .select(col("bkt").as("_bkt"), col("_base"))
    val wIn = Window.partitionBy("bkt").orderBy(col("u"), col("doc_id"))
    bucketed.join(broadcast(offsets), col("bkt") === col("_bkt"))
      .withColumn("shuffle_rank", col("_base") + row_number().over(wIn))
      .select(col("doc_id"), col("u"), col("shuffle_rank"),
        ((col("shuffle_rank") - 1) / shardSize).cast("long").as("shard_id"))
  }

  /** Global-window twin of [[corpusShuffle]]; cross-check oracle. */
  private[graft] def corpusShuffleWindowed(docs: DataFrame, seed: String,
      shardSize: Long): DataFrame = {
    val w = Window.orderBy(col("u"), col("doc_id"))
    docs.select(col("doc_id"),
        hashUniform(concat(lit(seed), lit(":"), col("doc_id"))).as("u"))
      .withColumn("shuffle_rank", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("u"), col("shuffle_rank"),
        ((col("shuffle_rank") - 1) / shardSize).cast("long").as("shard_id"))
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

  def dataMixTemperatureQuery(spark: SparkSession, sfDir: String): DataFrame =
    dataMixTemperature(Tables.documents(spark, sfDir), "lang", MixBudget)

  /** DuckDB twin of [[dataMixTemperature]]: recompute the integer
    * budgets from the same count table (floor(sqrt) + integer div are
    * engine-exact), then replay the greedy fill. */
  val dataMixTemperatureSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, lang,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    ('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT / 4294967296.0 AS u
       |  FROM documents),
       |cnt AS (SELECT lang, SUM(n_tokens) AS c FROM d GROUP BY lang),
       |sq AS (SELECT lang, CAST(FLOOR(SQRT(CAST(c AS DOUBLE))) AS BIGINT) AS s FROM cnt),
       |tot AS (SELECT SUM(s) AS ts FROM sq),
       |b AS (SELECT lang, ($MixBudget * s) // ts AS bud FROM sq, tot),
       |c2 AS (
       |  SELECT doc_id, lang, n_tokens,
       |    COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY u, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
       |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY u, doc_id) AS mix_rank
       |  FROM d)
       |SELECT c2.doc_id, c2.lang, c2.n_tokens, CAST(c2.mix_rank AS INTEGER) AS mix_rank
       |FROM c2 JOIN b ON b.lang = c2.lang WHERE c2.cum_before < b.bud""".stripMargin

  /** [[dataMixPlan]]'s budget as a multiple of the corpus token mass:
    * 2x forces repetition somewhere (weights sum to 1, so SOME stratum
    * must repeat), which is exactly the regime the planner exists
    * for. */
  val PlanBudgetMult = 2L

  /** The repetition ceiling the plan flags against: up to ~4 epochs,
    * repeated data retains most of its training value; past that the
    * return decays rapidly (Muennighoff et al. 2023, "Scaling
    * Data-Constrained Language Models" — the paper's headline
    * operating rule). */
  val MaxGoodEpochs = 4.0

  /**
   * `data_mix_plan`: the epochs/repetition planner — BEFORE running
   * [[dataMix]] at a token budget, the table that answers "can this
   * corpus deliver the target mix, and what does each stratum repeat?"
   * Per stratum: available token mass, target share, needed tokens at
   * the budget, the fresh/repeated split, the epoch count
   * (needed/available), and a feasibility flag against the
   * [[MaxGoodEpochs]] rule — the data-constrained-scaling counterpart
   * of [[graft.dedup.Dedup.minhashTune]]: derive the knob from a
   * measured table instead of asserting it.
   *
   * Scale posture: ONE partial-agg shuffle to the #strata-row count
   * table; the budget total rides back as a broadcast one-row cross
   * join (the quantile-cut discipline); everything downstream is
   * arithmetic over #strata rows. Cross-engine: all integer except the
   * per-stratum epochs division, FLOORed at 4dp before the
   * feasibility compare (the minhashTune selection-on-rounded-value
   * rule).
   */
  def dataMixPlan(docs: DataFrame): DataFrame = {
    val per = docs.groupBy(col("lang"))
      .agg(sum(nTokens(col("text"))).as("available_tokens"))
    val tot = per.agg(sum(col("available_tokens")).as("t"))
    val wCol = MixWeights.toSeq.sortBy(_._1).foldLeft(lit(0.0)) {
      case (acc, (s, w)) => when(col("lang") === s, lit(w)).otherwise(acc) }
    def f4(c: Column): Column = floor(c * 10000) / 10000
    per.crossJoin(broadcast(tot))
      .select(col("lang"), col("available_tokens"), wCol.as("target_share"),
        floor(wCol * (col("t") * PlanBudgetMult).cast("double"))
          .cast("long").as("needed_tokens"))
      .withColumn("fresh_tokens",
        least(col("needed_tokens"), col("available_tokens")))
      .withColumn("repeated_tokens",
        greatest(lit(0L), col("needed_tokens") - col("available_tokens")))
      .withColumn("epochs",
        when(col("available_tokens") === 0L, lit(0.0))
          .otherwise(f4(col("needed_tokens").cast("double") /
            col("available_tokens").cast("double"))))
      .withColumn("feasible_4ep", (col("epochs") <= MaxGoodEpochs).cast("int"))
  }

  def dataMixPlanQuery(spark: SparkSession, sfDir: String): DataFrame =
    dataMixPlan(Tables.documents(spark, sfDir))

  /** DuckDB twin: same count table, same integer arithmetic, same
    * FLOORed division. DOUBLE casts are explicit everywhere a bare
    * SQL literal would parse as DECIMAL. */
  val dataMixPlanSql: String = {
    val shareCase = "CASE lang " + MixWeights.toSeq.sortBy(_._1).map {
      case (s, w) => s"WHEN '$s' THEN CAST($w AS DOUBLE)"
    }.mkString(" ") + " ELSE CAST(0.0 AS DOUBLE) END"
    s"""WITH per AS (
       |  SELECT lang,
       |    CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS available_tokens
       |  FROM documents GROUP BY lang),
       |tot AS (SELECT CAST(SUM(available_tokens) AS BIGINT) AS t FROM per),
       |base AS (
       |  SELECT lang, available_tokens,
       |    $shareCase AS target_share,
       |    CAST(FLOOR(($shareCase) * CAST(t * $PlanBudgetMult AS DOUBLE)) AS BIGINT) AS needed_tokens
       |  FROM per, tot),
       |ep AS (
       |  SELECT lang, available_tokens, target_share, needed_tokens,
       |    LEAST(needed_tokens, available_tokens) AS fresh_tokens,
       |    GREATEST(CAST(0 AS BIGINT), needed_tokens - available_tokens) AS repeated_tokens,
       |    CASE WHEN available_tokens = 0 THEN CAST(0.0 AS DOUBLE)
       |         ELSE FLOOR(CAST(needed_tokens AS DOUBLE) / CAST(available_tokens AS DOUBLE) * 10000) / 10000
       |    END AS epochs
       |  FROM base)
       |SELECT lang, available_tokens, target_share, needed_tokens,
       |  fresh_tokens, repeated_tokens, epochs,
       |  CAST(epochs <= $MaxGoodEpochs AS INTEGER) AS feasible_4ep
       |FROM ep""".stripMargin
  }

  def seqPackQuery(spark: SparkSession, sfDir: String): DataFrame =
    seqPack(Tables.documents(spark, sfDir), "lang", budget = 2048)

  /**
   * Deterministic train/validation/test split: each doc draws the
   * seeded cross-engine uniform and lands in the band its value falls
   * into — the standard "hash the id, don't sample" split that stays
   * STABLE as the corpus grows (a doc never migrates between splits
   * when new data arrives, unlike any count-based partitioning).
   * Map-only; the bands are exact dyadic-vs-literal comparisons, so
   * every engine draws the identical split.
   */
  def corpusSplit(docs: DataFrame, seed: String,
      trainFrac: Double, valFrac: Double): DataFrame = {
    require(trainFrac > 0 && valFrac >= 0 && trainFrac + valFrac < 1.0,
      s"invalid split fractions ($trainFrac, $valFrac)")
    val u = hashUniform(concat(lit(seed + ":"), col("doc_id").cast("string")))
    docs.select(col("doc_id"), u.as("u"))
      .withColumn("split",
        when(col("u") < trainFrac, "train")
          .when(col("u") < trainFrac + valFrac, "val")
          .otherwise("test"))
  }

  val SplitSeed = "split1"
  val TrainFrac = 0.96
  val ValFrac = 0.02

  def corpusSplitQuery(spark: SparkSession, sfDir: String): DataFrame =
    corpusSplit(Tables.documents(spark, sfDir), SplitSeed, TrainFrac, ValFrac)

  val corpusSplitSql: String =
    s"""SELECT doc_id, u,
       |  CASE WHEN u < $TrainFrac THEN 'train'
       |       WHEN u < ${TrainFrac + ValFrac} THEN 'val'
       |       ELSE 'test' END AS split
       |FROM (
       |  SELECT doc_id,
       |    ('0x' || substr(sha256('$SplitSeed:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
       |      / 4294967296.0 AS u
       |  FROM documents)""".stripMargin

  val ShuffleSeed = "shuffle7"
  val ShuffleShardSize = 100L

  def corpusShuffleQuery(spark: SparkSession, sfDir: String): DataFrame =
    corpusShuffle(Tables.documents(spark, sfDir), ShuffleSeed, ShuffleShardSize,
      spark.sparkContext.defaultParallelism)

  val corpusShuffleSql: String =
    s"""SELECT doc_id, u, shuffle_rank, (shuffle_rank - 1) // $ShuffleShardSize AS shard_id
       |FROM (
       |  SELECT doc_id, u,
       |    CAST(ROW_NUMBER() OVER (ORDER BY u, doc_id) AS BIGINT) AS shuffle_rank
       |  FROM (
       |    SELECT doc_id,
       |      ('0x' || substr(sha256('$ShuffleSeed:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
       |        / 4294967296.0 AS u
       |    FROM documents))""".stripMargin

  /** Curriculum seed — distinct from the IID shuffle's so the two
    * orders are independent draws. */
  val CurriculumSeed = "curriculum9"

  /**
   * `curriculum_order`: one GLOBAL training position per document for
   * quality-curriculum schedules (clean-first annealing — Bengio et
   * al. 2009's curriculum posture with the CCNet buckets as the
   * difficulty axis): every `head` doc trains before every `middle`
   * doc before every `tail` doc, and WITHIN a bucket the order is an
   * IID seeded shuffle (a curriculum that preserves in-bucket
   * randomness, so batches stay mixed).
   *
   * Scale posture: [[corpusShuffle]]'s two-level layout with the
   * curriculum bucket LEADING the key — window partitions are
   * (bucket × hash-subbucket)-sized, bucket starting offsets are a
   * (3 × nBuckets)-row broadcast prefix sum, no global sort anywhere;
   * the (bord, sub, u, id) order equals the global (bord, u, id)
   * order because `sub` is a monotone function of `u` (the shuffle
   * entry's equivalence, with the bucket prefix in front). The
   * windowed twin is the spec's cross-check oracle.
   */
  def curriculumOrder(scored: DataFrame, seed: String, nBuckets: Int): DataFrame = {
    val bord = when(col("bucket") === "head", 0)
      .when(col("bucket") === "middle", 1).otherwise(2)
    val base = scored.select(col("doc_id"), col("bucket"), bord.as("bord"),
      hashUniform(concat(lit(seed), lit(":"), col("doc_id"))).as("u"))
    val bucketed = base.withColumn("sub",
      least(floor(col("u") * nBuckets), lit((nBuckets - 1).toLong)).cast("int"))
    val wOff = Window.orderBy("bord", "sub").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("bord", "sub").agg(count(lit(1)).as("_n"))
      .withColumn("_base", coalesce(sum(col("_n")).over(wOff), lit(0L)))
      .select(col("bord").as("_bord"), col("sub").as("_sub"), col("_base"))
    val wIn = Window.partitionBy("bord", "sub").orderBy(col("u"), col("doc_id"))
    bucketed.join(broadcast(offsets),
        col("bord") === col("_bord") && col("sub") === col("_sub"))
      .withColumn("train_pos", col("_base") + row_number().over(wIn))
      .select(col("doc_id"), col("bucket"), col("u"), col("train_pos"))
  }

  /** Global-window twin (cross-check oracle; serializes at scale). */
  private[graft] def curriculumOrderWindowed(scored: DataFrame, seed: String): DataFrame = {
    val bord = when(col("bucket") === "head", 0)
      .when(col("bucket") === "middle", 1).otherwise(2)
    val w = Window.orderBy(col("bord"), col("u"), col("doc_id"))
    scored.select(col("doc_id"), col("bucket"), bord.as("bord"),
        hashUniform(concat(lit(seed), lit(":"), col("doc_id"))).as("u"))
      .withColumn("train_pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("bucket"), col("u"), col("train_pos"))
  }

  def curriculumOrderQuery(spark: SparkSession, sfDir: String): DataFrame =
    curriculumOrder(
      graft.operators.Quantiles.perplexityBucketQuery(spark, sfDir),
      CurriculumSeed, spark.sparkContext.defaultParallelism)

  /** Oracle: the perplexity-bucket chain nested verbatim, then the
    * windowed global order (the bucketed plan equals it by the
    * monotone-subbucket argument above). */
  def curriculumOrderSql: String =
    s"""WITH pb AS (${graft.operators.Quantiles.perplexityBucketSql})
       |SELECT doc_id, bucket, u, CAST(ROW_NUMBER() OVER (ORDER BY bord, u, doc_id) AS BIGINT) AS train_pos
       |FROM (
       |  SELECT doc_id, bucket,
       |    CASE bucket WHEN 'head' THEN 0 WHEN 'middle' THEN 1 ELSE 2 END AS bord,
       |    ('0x' || substr(sha256('$CurriculumSeed:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
       |      / 4294967296.0 AS u
       |  FROM pb)""".stripMargin

  /**
   * [[seqPack]] budgeted by SUBWORD tokens (the r5-verdict integration:
   * a whitespace count mispacks real text 2-4x against tokenizer
   * tokens, so a trainer-facing packer counts with the fitted BPE
   * model). Same bucketed one-shuffle plan; only the counter changes —
   * the codegen'd `BpeCountTokens` expression rides the projection.
   */
  def seqPackBpeQuery(spark: SparkSession, sfDir: String): DataFrame = {
    // Dispatches to the ACTIVE trainer tokenizer (unigram import >
    // BPE, graft.text.Tokenizers): a packer budgets by the tokenizer
    // the downstream model actually trains with.
    val tok = graft.text.Tokenizers.active(spark, sfDir)
    seqPack(Tables.documents(spark, sfDir), "lang", budget = 2048,
      // cast: the whitespace counter is LONG, the subword expression
      // INT — the two entries must share one output schema
      counter = c => tok.count(c).cast("long"))
  }

  /** DuckDB twin: per-doc subword counts replayed from the active
    * vocab fixture (the `token_count_bpe` oracle chain), then the same
    * windowed cumulative pack math as `seq_pack`. */
  def seqPackBpeSql: String =
    s"""WITH v AS (SELECT * FROM read_parquet('${graft.text.Tokenizers.activeDictPath()}/*.parquet')),
       |${graft.text.Tokenizers.activeWordsSql()},
       |s AS (SELECT w.doc_id, SUM(v.n_sub) AS t FROM w JOIN v USING (word) GROUP BY w.doc_id),
       |d AS (SELECT doc.doc_id, doc.lang, CAST(COALESCE(s.t, 0) AS BIGINT) AS n_tokens
       |      FROM documents doc LEFT JOIN s ON s.doc_id = doc.doc_id),
       |c AS (
       |  SELECT doc_id, lang, n_tokens,
       |    SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_after
       |  FROM d)
       |SELECT doc_id, lang, n_tokens,
       |  CAST(FLOOR(CAST(cum_after - n_tokens AS DOUBLE) / 2048) AS BIGINT) AS pack_id,
       |  CAST((cum_after - n_tokens) % 2048 AS BIGINT) AS pack_offset
       |FROM c""".stripMargin

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
