package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Corpus composition report: per-(source, lang) document counts,
 * char/token volume, and corpus share — the observability half of the
 * mixing pipeline (`data_mix` consumes exactly these proportions; at
 * 100 TB you run this report first to decide the mixture weights).
 *
 * One partial-agg shuffle over (source, lang) — the cell count is
 * sources x langs, tiny at any corpus size — then the grand totals
 * join back as a broadcast single row. Derived ratios are computed in
 * exact integer arithmetic (scaled `div`), never engine-varying float
 * division, so the report hashes identically on any engine.
 */
object CorpusStats {

  /** The corpus-sized stage: one partial-agg shuffle to cells. Also
    * the state a STREAMING composition report maintains
    * ([[graft.streaming.StreamingStats]]) — its aggregation state is
    * exactly these cells, bounded by sources x langs. */
  def perCell(docs: DataFrame): DataFrame = docs
    .groupBy(col("source"), col("lang"))
    .agg(count(lit(1)).as("n_docs"),
      sum(length(col("text"))).as("chars_sum"),
      // separators + 1 — the allocation-free whitespace token count
      // (Corpus.nTokens discipline)
      sum((length(col("text")) -
        length(translate(col("text"), " ", "")) + 1).cast("long")).as("tokens_sum"))

  /** Derived report over an already-aggregated cell table. */
  def derive(cells: DataFrame): DataFrame = {
    // grand total via a window over the ALREADY-AGGREGATED cell table
    // (sources x langs rows — single-partition is fine at that size,
    // and it avoids a second scan of the corpus)
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    cells.withColumn("total_docs", sum(col("n_docs")).over(w))
      .select(col("source"), col("lang"), col("n_docs"), col("chars_sum"),
        col("tokens_sum"),
        // floor-truncated 4dp, exact: scaled integer division
        (expr("tokens_sum * 10000L div n_docs") / 10000.0).as("avg_tokens"),
        (expr("n_docs * 1000000L div total_docs") / 10000.0).as("pct_docs"))
  }

  def corpusStats(docs: DataFrame): DataFrame = derive(perCell(docs))

  def corpusStatsQuery(spark: SparkSession, sfDir: String): DataFrame =
    corpusStats(Tables.documents(spark, sfDir))

  /**
   * `dataset_card`: the dataset-card rollup — per (source, lang), the
   * volume numbers [[corpusStats]] reports PLUS the quality-signal
   * summary a data statement ships: mean stopword/punctuation/
   * duplicate-token ratios, language-ID agreement with the declared
   * lang, and mean lang-ID confidence. Built straight off
   * [[graft.text.TextAnalysis.signalsOver]] carried next to the
   * (source, lang) keys — one map-only signal pass into one
   * sources×langs partial agg, NO join (the signals-as-data payoff
   * again: at 100 TB this reads the materialized signals table
   * joined to doc metadata instead).
   *
   * Cross-engine: signal values are 4-dp FLOORed; each mean
   * re-scales them to exact integers (`round(x*10000)`), sums as
   * BIGINT, and divides with integer `div` — no float accumulation
   * order anywhere, the [[derive]] discipline.
   */
  def datasetCard(docs: DataFrame): DataFrame = {
    val sigDocs = graft.text.TextAnalysis.signalsOver(docs, Seq("source", "lang"))
    def s4(c: String): org.apache.spark.sql.Column =
      sum(round(col(c) * 10000).cast("long")).as(s"${c}_s")
    def mean4(c: String): org.apache.spark.sql.Column =
      (expr(s"${c}_s div n_docs") / 10000.0).as(s"avg_$c")
    sigDocs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("tokens_sum"),
        s4("stopword_ratio"), s4("punct_ratio"), s4("dup_token_frac"),
        s4("lang_score"),
        sum(when(col("pred_lang") === col("lang"), 1L).otherwise(0L)).as("agree"))
      .select(col("source"), col("lang"), col("n_docs"), col("tokens_sum"),
        mean4("stopword_ratio"), mean4("punct_ratio"), mean4("dup_token_frac"),
        mean4("lang_score"),
        (expr("agree * 10000L div n_docs") / 10000.0).as("lang_agree_share"))
  }

  def datasetCardQuery(spark: SparkSession, sfDir: String): DataFrame =
    datasetCard(Tables.documents(spark, sfDir))

  /** Oracle: the signals chain as a CTE joined back to doc metadata
    * (the join-free Spark plan and the join replay agree row-wise by
    * construction), every mean the same scaled-integer division. */
  def datasetCardSql: String = {
    def s4(c: String) = s"SUM(CAST(ROUND($c * 10000) AS BIGINT))"
    def mean4(c: String) = s"(${s4(c)} // COUNT(*)) / 10000.0 AS avg_$c"
    s"""WITH sig AS (${graft.text.TextAnalysis.qualitySignalsSql}),
       |d AS (SELECT doc_id, source, lang FROM documents)
       |SELECT d.source, d.lang,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CAST(sig.n_tokens AS BIGINT)) AS BIGINT) AS tokens_sum,
       |  ${mean4("stopword_ratio")},
       |  ${mean4("punct_ratio")},
       |  ${mean4("dup_token_frac")},
       |  ${mean4("lang_score")},
       |  ((SUM(CASE WHEN sig.pred_lang = d.lang THEN 1 ELSE 0 END) * 10000)
       |    // COUNT(*)) / 10000.0 AS lang_agree_share
       |FROM d JOIN sig USING (doc_id)
       |GROUP BY d.source, d.lang""".stripMargin
  }

  // ---- snapshot-to-snapshot signal drift ----

  /** The [0,1] ratio signals the drift report histograms (all 4-dp
    * FLOORed by `quality_signals`, so the re-scale to integers is
    * exact). */
  val DriftSignals: Seq[String] = Seq("punct_ratio", "stopword_ratio",
    "digit_ratio", "upper_ratio", "dup_token_frac", "top_bigram_frac",
    "lang_score")

  /**
   * `quality_drift`: per-signal distribution shift between the
   * resident base and an incoming crawl delta — the monitoring row a
   * merge owner checks BEFORE admitting: a large L1 distance on
   * `punct_ratio` or `lang_score` means the new crawl is a different
   * kind of text than the corpus being served (crawler regression,
   * new seed list, spam wave), and no per-document filter threshold
   * catches a distribution-level shift. Per signal: doc counts, means,
   * and the L1 histogram distance over ten fixed decile bins in basis
   * points (`l1_bp` = Σ|p_base − p_delta|, = 2 × total variation).
   *
   * Scale posture: two bounded signal passes (at 100 TB: two scans of
   * the materialized signals table — the signals-as-data payoff) into
   * per-(signal, bin) partial aggs; everything downstream operates on
   * the ≤ 7×10-row histogram tables. Cross-engine: the [[datasetCard]]
   * discipline — 4-dp signals re-scale to exact integers, bins are
   * integer `div` deciles, shares are integer `div` basis points, so
   * no float accumulation order exists anywhere.
   */
  def qualityDrift(baseSignals: DataFrame, deltaSignals: DataFrame): DataFrame =
    driftFromHists(signalHist(baseSignals, "nb", "sb"),
      signalHist(deltaSignals, "nd", "sd"))

  /** The per-(signal, decile-bin) histogram of a signals frame —
    * shared by the batch drift and its streaming twin
    * ([[graft.streaming.StreamingDrift]]): as a STREAMING aggregation
    * its state is these ≤ 7×10 rows, constant in the stream length
    * (the StreamingCms bounded-state argument). */
  private[graft] def signalHist(df: DataFrame, n: String, s: String): DataFrame =
    df.select(explode(array(DriftSignals.map(c =>
        struct(lit(c).as("signal"),
          round(col(c) * 10000).cast("long").as("v4"))): _*)).as("sv"))
      .select(col("sv.signal").as("signal"), col("sv.v4").as("v4"))
      .withColumn("bin", least(expr("v4 div 1000"), lit(9L)).cast("int"))
      .groupBy("signal", "bin")
      .agg(count(lit(1)).as(n), sum("v4").as(s))

  /** The drift finish over two histogram tables (base columns nb/sb,
    * delta columns nd/sd) — tiny-table joins and integer arithmetic
    * only; the streaming twin calls this per micro-batch. */
  private[graft] def driftFromHists(hb: DataFrame, hd: DataFrame): DataFrame = {
    val j = hb.join(hd, Seq("signal", "bin"), "full_outer")
      .select(col("signal"), col("bin"),
        coalesce(col("nb"), lit(0L)).as("nb"),
        coalesce(col("nd"), lit(0L)).as("nd"),
        coalesce(col("sb"), lit(0L)).as("sb"),
        coalesce(col("sd"), lit(0L)).as("sd"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("signal")
    j.withColumn("tb", sum("nb").over(w))
      .withColumn("td", sum("nd").over(w))
      .groupBy("signal")
      .agg(max("tb").as("n_base"), max("td").as("n_delta"),
        sum("sb").as("ssb"), sum("sd").as("ssd"),
        // nullif guards: Spark 4 runs ANSI mode, where integer div by
        // zero THROWS — an empty merge delta must yield a null-bearing
        // report, not a crashed job (DuckDB's // already nulls;
        // NULLIF keeps the two engines' degenerate semantics aligned)
        sum(abs(expr("nb * 10000L div nullif(tb, 0L)") -
          expr("nd * 10000L div nullif(td, 0L)"))).as("l1_bp"))
      .select(col("signal"), col("n_base"), col("n_delta"),
        (expr("ssb div nullif(n_base, 0L)") / 10000.0).as("base_mean"),
        (expr("ssd div nullif(n_delta, 0L)") / 10000.0).as("delta_mean"),
        col("l1_bp"))
  }

  /** Entry carve: base = the old snapshot ([[CorpusDiff.carveOld]],
    * stale text included — that IS what the resident signals were
    * computed over); delta = added ∪ changed docs of the new snapshot,
    * derivable as pure id predicates both engines replay. */
  def qualityDriftQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    val delta = docs.filter(graft.Carves.isDelta(col("doc_id")))
    qualityDrift(
      graft.text.TextAnalysis.qualitySignalsOn(CorpusDiff.carveOld(docs)),
      graft.text.TextAnalysis.qualitySignalsOn(delta))
  }

  def qualityDriftSql: String = {
    def union(src: String): String = DriftSignals.map(c =>
      s"SELECT '$c' AS signal, CAST(ROUND($c * 10000) AS BIGINT) AS v4 FROM $src")
      .mkString("\n  UNION ALL ")
    val oldSrc = s"(SELECT doc_id, ${graft.Carves.oldTextSql("doc_id", "text")}" +
      s" AS text FROM documents WHERE ${graft.Carves.inOldSql("doc_id")}) o"
    val deltaSrc = s"(SELECT doc_id, text FROM documents WHERE ${graft.Carves.inNewSql("doc_id")} " +
      s"AND (${graft.Carves.isAddedSql("doc_id")} OR ${graft.Carves.isChangedSql("doc_id")})) dl"
    s"""WITH base AS (SELECT * FROM (
       |  ${graft.text.TextAnalysis.qualitySignalsSqlFrom(oldSrc)}) q1),
       |delta AS (SELECT * FROM (
       |  ${graft.text.TextAnalysis.qualitySignalsSqlFrom(deltaSrc)}) q2),
       |ub AS (${union("base")}),
       |ud AS (${union("delta")}),
       |hb AS (SELECT signal, LEAST(v4 // 1000, 9) AS bin,
       |         COUNT(*) AS nb, SUM(v4) AS sb FROM ub GROUP BY 1, 2),
       |hd AS (SELECT signal, LEAST(v4 // 1000, 9) AS bin,
       |         COUNT(*) AS nd, SUM(v4) AS sd FROM ud GROUP BY 1, 2),
       |j AS (
       |  SELECT COALESCE(hb.signal, hd.signal) AS signal,
       |    COALESCE(hb.bin, hd.bin) AS bin,
       |    COALESCE(nb, 0) AS nb, COALESCE(nd, 0) AS nd,
       |    COALESCE(sb, 0) AS sb, COALESCE(sd, 0) AS sd
       |  FROM hb FULL OUTER JOIN hd
       |    ON hb.signal = hd.signal AND hb.bin = hd.bin),
       |t AS (SELECT *,
       |    SUM(nb) OVER (PARTITION BY signal) AS tb,
       |    SUM(nd) OVER (PARTITION BY signal) AS td
       |  FROM j)
       |SELECT signal,
       |  CAST(MAX(tb) AS BIGINT) AS n_base,
       |  CAST(MAX(td) AS BIGINT) AS n_delta,
       |  (SUM(sb) // NULLIF(MAX(tb), 0)) / 10000.0 AS base_mean,
       |  (SUM(sd) // NULLIF(MAX(td), 0)) / 10000.0 AS delta_mean,
       |  CAST(SUM(ABS(nb * 10000 // NULLIF(tb, 0) - nd * 10000 // NULLIF(td, 0))) AS BIGINT) AS l1_bp
       |FROM t GROUP BY signal""".stripMargin
  }

  // ---- corpus-level n-gram heavy hitters ----

  /** Gram width / result size of the demo entry (trigram boilerplate
    * detection — the corpus-level complement of the per-doc
    * repetition signals in `text_repetition`/`repetition_filter`). */
  val TopGramWidth = 3
  val TopGramK = 50

  /**
   * Exact corpus-wide top-k n-grams by total occurrence count, with
   * document frequency — the heavy-hitters report a curation pipeline
   * runs to find boilerplate (nav bars, license headers, SEO spam)
   * worth a targeted filter rule.
   *
   * Spark posture (100 TB): shingling is map-only off the token
   * array; the occurrence count is ONE hash-partial agg on gram
   * (map-side combine collapses each partition's repeats before the
   * shuffle, so shuffle bytes scale with per-partition DISTINCT
   * grams, not occurrences); df rides the same shuffle via a
   * two-phase count-distinct. The global top-k is TakeOrdered (per-
   * partition heaps + a k-row driver merge) — NO full sort of the
   * gram table; the rank window runs over the already-collected k
   * rows. Ties break on the gram string, so the cut is deterministic.
   */
  def ngramTopk(docs: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.dedup.Dedup.{shingles, tokens}
    val top = docs
      .select(col(idCol).as("doc_id"),
        explode(shingles(tokens(col(textCol)), n)).as("gram"))
      .groupBy("gram")
      .agg(count(lit(1)).as("tf"), count_distinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("gram").asc)
      .limit(k)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("tf").desc, col("gram").asc)))
  }

  def ngramTopkQuery(spark: SparkSession, sfDir: String): DataFrame =
    ngramTopk(Tables.documents(spark, sfDir), "doc_id", "text",
      TopGramWidth, TopGramK)

  val ngramTopkSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
       |gr AS (
       |  SELECT doc_id,
       |    unnest(CASE WHEN len(toks) >= $TopGramWidth THEN
       |        list_transform(range(1, len(toks) - ${TopGramWidth - 2}),
       |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
       |      ELSE [array_to_string(toks, ' ')] END) AS gram
       |  FROM tok),
       |agg AS (
       |  SELECT gram, CAST(COUNT(*) AS BIGINT) AS tf,
       |    CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
       |  FROM gr GROUP BY gram),
       |top AS (
       |  SELECT gram, tf, df FROM agg ORDER BY tf DESC, gram LIMIT $TopGramK)
       |SELECT gram, tf, df,
       |  CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, gram) AS INTEGER) AS rank
       |FROM top""".stripMargin

  // ---- Count-Min sketch over corpus n-grams ----

  /** Sketch geometry: depth x width cells of BIGINT counts — 4 x 1024
    * by default (32 KB), fixed regardless of corpus size; config-backed
    * (`cms.depth`/`cms.width`, the GraftConfig discipline) so a
    * deployment sizes width ~ e/eps for additive error eps*N and
    * depth ~ ln(1/delta) without touching code. */
  def CmsDepth: Int = graft.config.GraftConfig.active.cms.depth
  def CmsWidth: Int = graft.config.GraftConfig.active.cms.width

  val CmsSketchExportPath = graft.FixturePaths.fixture("cms_sketch.parquet")
  val CmsCellsExportPath = graft.FixturePaths.fixture("cms_cells.parquet")

  /** Row-j cell of a gram: xxhash64 seeded by the row index (the
    * pairwise-independent family stand-in), folded to [0, width). */
  private def cmsCell(j: Int, gram: org.apache.spark.sql.Column) =
    pmod(xxhash64(lit(j), gram), lit(CmsWidth.toLong)).cast("int")

  /**
   * The Count-Min sketch (Cormode & Muthukrishnan 2005) of the
   * corpus's n-gram frequencies: counts[j][cell] = total occurrences
   * of grams hashing to `cell` under row j.
   *
   * THE 100 TB frequency-estimation shape: [[ngramTopk]]'s exact
   * report shuffles every DISTINCT gram (corpus-dependent, unbounded);
   * the sketch's shuffle keys are depth x width = 4096 cells no matter
   * the corpus, map-side combine collapses virtually everything before
   * the exchange, and sketches from disjoint corpus shards MERGE by
   * cell-wise addition — the re-aggregation property that lets a
   * 1000-executor fleet build one global sketch with a 32 KB reduce.
   */
  def cmsSketch(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    import graft.dedup.Dedup.{shingles, tokens}
    val grams = docs.select(
      explode(shingles(tokens(col(textCol)), n)).as("gram"))
    grams
      .select(posexplode(array((0 until CmsDepth).map(j => cmsCell(j, col("gram"))): _*))
        .as(Seq("j", "cell")))
      .groupBy("j", "cell").agg(count(lit(1)).as("cnt"))
  }

  /**
   * `ngram_cms_topk`: the sketch's point estimates audited against the
   * exact heavy hitters — for each of the exact top-k grams, the CM
   * estimate (min over rows of the gram's cell counts), the true
   * count, and the overestimate (CM never underestimates; the error is
   * collision inflation, bounded in expectation by N/width per row).
   * A pipeline serving frequency queries from the sketch runs exactly
   * this audit before trusting it; the exact pass exists to GRADE the
   * sketch, and is what the sketch replaces at 100 TB.
   */
  def ngramCmsTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val sketch = cmsSketch(docs, "doc_id", "text", TopGramWidth)
    val exact = ngramTopk(docs, "doc_id", "text", TopGramWidth, TopGramK)
      .select(col("gram"), col("tf"), col("rank"))
    // fixtures: the sketch table and the top grams' cell coordinates
    // (both bounded) — the oracle replays estimate = MIN over rows
    // from these, re-deriving the exact side from the corpus (the
    // LSH full-chain fixture-oracle discipline: DuckDB has no
    // xxhash64, so the hash assignments ship as data, every count
    // and the min/err logic re-derive)
    // fixture keys carry the geometry: flipping cms.depth/width
    // mid-JVM re-exports what the oracle replays
    graft.FixtureExport.ensure(s"cms:$CmsDepth:$CmsWidth:$sfDir", CmsSketchExportPath) {
      sketch.coalesce(1).write.mode("overwrite").parquet(CmsSketchExportPath)
    }
    graft.FixtureExport.ensure(s"cms-cells:$CmsDepth:$CmsWidth:$sfDir", CmsCellsExportPath) {
      exact.select(col("gram"),
          posexplode(array((0 until CmsDepth).map(j => cmsCell(j, col("gram"))): _*))
            .as(Seq("j", "cell")))
        .coalesce(1).write.mode("overwrite").parquet(CmsCellsExportPath)
    }
    val est = exact
      .select(col("gram"), col("tf"), col("rank"),
        posexplode(array((0 until CmsDepth).map(j => cmsCell(j, col("gram"))): _*))
          .as(Seq("j", "cell")))
      .join(sketch, Seq("j", "cell"))
      .groupBy("gram", "tf", "rank").agg(min("cnt").as("est"))
    est.select(col("gram"), col("tf"), col("est"),
      (col("est") - col("tf")).as("err"), col("rank"))
  }

  def ngramCmsTopkSql: String =
    s"""WITH sk AS (SELECT j, cell, cnt FROM read_parquet('$CmsSketchExportPath/*.parquet')),
       |cl AS (SELECT gram, j, cell FROM read_parquet('$CmsCellsExportPath/*.parquet')),
       |tok AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
       |gr AS (
       |  SELECT doc_id,
       |    unnest(CASE WHEN len(toks) >= $TopGramWidth THEN
       |        list_transform(range(1, len(toks) - ${TopGramWidth - 2}),
       |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
       |      ELSE [array_to_string(toks, ' ')] END) AS gram
       |  FROM tok),
       |agg AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS tf FROM gr GROUP BY gram),
       |top AS (
       |  SELECT gram, tf,
       |    CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, gram) AS INTEGER) AS rank
       |  FROM agg ORDER BY tf DESC, gram LIMIT $TopGramK),
       |est AS (
       |  SELECT cl.gram, CAST(MIN(sk.cnt) AS BIGINT) AS est
       |  FROM cl JOIN sk ON sk.j = cl.j AND sk.cell = cl.cell
       |  GROUP BY cl.gram)
       |SELECT t.gram, t.tf, e.est, e.est - t.tf AS err, t.rank
       |FROM top t JOIN est e ON e.gram = t.gram""".stripMargin

  val corpusStatsSql: String =
    """WITH c AS (
      |  SELECT source, lang, COUNT(*) AS n_docs,
      |    CAST(SUM(length(text)) AS BIGINT) AS chars_sum,
      |    CAST(SUM(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT) AS tokens_sum
      |  FROM documents GROUP BY source, lang),
      |t AS (SELECT SUM(n_docs) AS total_docs FROM c)
      |SELECT source, lang, n_docs, chars_sum, tokens_sum,
      |  (tokens_sum * 10000 // n_docs) / 10000.0 AS avg_tokens,
      |  (n_docs * 1000000 // total_docs) / 10000.0 AS pct_docs
      |FROM c, t""".stripMargin
}
