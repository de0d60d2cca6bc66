package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.{Normalize, TextAnalysis, TextFilters}

/**
 * The END-TO-END curation funnel: normalize → PII scrub → Gopher
 * quality rules → Gopher repetition rules → benchmark n-gram
 * decontamination → LM-score tail cut, composed from the library's
 * individually hash-verified stages into ONE per-document verdict —
 * `(doc_id, verdict, keep)` where `verdict` is the FIRST stage that
 * dropped the document (the pipeline-level first-failed-rule
 * discipline) or `keep`. This is the "run my whole cleaning pass"
 * call a pipeline owner actually makes, and the whole chain is
 * DuckDB-replayed as one oracle — every stage boundary, not just each
 * stage, is hash-checked.
 *
 * Stage order is fixed and semantic: transforms first (normalize,
 * scrub — they never drop), then per-doc rules cheapest-first
 * (quality, repetition — map-only), then the benchmark join
 * (broadcast bench side), and LAST the model-based cut, whose LM is
 * fitted on — and whose threshold quantile is taken over — the
 * SURVIVORS of every earlier stage (scoring the cleaned corpus, the
 * CCNet ordering; dropping the worst decile of garbage you already
 * removed would be double-counting).
 *
 * Scale posture: stages 1-4 are map-only signal chains; the
 * decontamination shuffle is the per-doc hit count with the bench
 * gram set broadcast (eval suites are MBs by construction — the
 * [[Decontaminate.decontaminateQuery]] demo-scale caveat applies to
 * this entry's in-query bench carve too); the LM pass is the lm_score
 * two-partial-agg shape over survivors plus the no-sort quantile cut
 * riding back as one broadcast row. No corpus-sized sort or window.
 *
 * As a single self-contained plan, the normalize+scrub prefix and the
 * rule-verdict subtree are REFERENCED multiple times; measured at
 * sf0.1 (round 9), Spark's exchange reuse already shares most of that
 * — the in-plan funnel pays only ~0.5s over the staged-read funnel
 * (clean pass alone: ~0.35s) — so the local materialization win is
 * ~0.8×, not the ~1.7× this scaladoc once estimated from summed stage
 * costs. The production argument stands on I/O, not local CPU: at
 * 100 TB every re-evaluation the self-contained plan pays is a full
 * corpus re-scan, while [[corpusCurateMaterializedQuery]] (the staged
 * form of this funnel; the [[graft.streaming.StreamingIntake]] sink
 * is its continuous twin) re-reads columnar cleaned text.
 */
object Curate {

  /** Drop the worst decile of survivors by LM score. */
  val CurateLmP: Double = 0.1

  /** Normalize + scrub: the transform prefix every signal reads. */
  private def cleanChain(df: DataFrame): DataFrame = {
    val normed = df.select(col("doc_id"), Normalize.normalize(col("text")).as("text"))
    TextFilters.piiScrub(normed, "doc_id", "text")
      .select(col("doc_id"), col("text_clean").as("text"))
  }

  /**
   * One verdict row per training document over any (doc_id, text)
   * corpus + benchmark pair.
   */
  def curate(train: DataFrame, bench: DataFrame): DataFrame =
    curateClean(cleanChain(train), cleanChain(bench))

  /**
   * The funnel stages over ALREADY-CLEANED text: quality + repetition
   * rules, benchmark decontamination, LM tail cut. Factored out so the
   * clean prefix can come either from the in-plan [[cleanChain]]
   * (self-contained single plan, the oracle's shape) or from a
   * MATERIALIZED stage table ([[corpusCurateMaterializedQuery]] — the
   * production path where `clean` is one corpus-scan write and every
   * verdict branch re-reads the staged parquet instead of re-running
   * the normalize+scrub regex prefix).
   */
  def curateClean(clean: DataFrame, benchClean: DataFrame): DataFrame =
    lmFinish(ruleVerdicts(clean, benchClean))

  /** Stages 2-4 over cleaned text: per-doc rules + benchmark
    * decontamination folded into the first-failed-rule column `v1`
    * (with `text` carried through for the LM stage). The quality and
    * repetition rules are both map-only signals over the SAME token
    * array, so they ride ONE fused projection
    * ([[TextFilters.qualityFailReason]] /
    * [[TextAnalysis.repetitionFailReason]] — the quality_signals
    * one-pass discipline) instead of two scans joined back on doc_id;
    * the only join left is the decontamination hit count, which needs
    * its own explode-aggregate shape. The second natural stage-table
    * boundary: everything upstream is decided, everything downstream
    * (the LM fit) only reads survivors. */
  private[graft] def ruleVerdicts(clean: DataFrame, benchClean: DataFrame): DataFrame = {
    val d = Decontaminate.decontaminate(clean, benchClean, "doc_id", "text", n = 5)
      .select(col("doc_id"), col("contaminated"))
    val toks = TextAnalysis.tokens(col("text"))
    clean.select(col("doc_id"), col("text"),
        TextFilters.qualityFailReason(toks).as("q_reason"),
        TextAnalysis.repetitionFailReason(toks).as("r_reason"))
      .join(d, "doc_id")
      .select(col("doc_id"), col("text"),
        when(col("q_reason") =!= "ok", col("q_reason"))
          .when(col("r_reason") =!= "ok", col("r_reason"))
          .when(col("contaminated") === 1, "contaminated")
          .otherwise("ok").as("v1"))
  }

  /** The model-based final stage: LM fitted on — and decile-cut over —
    * the survivors of every earlier stage, then the first-failed
    * verdict fold. `v1` is referenced twice (the survivor branch and
    * the final join), which is why it is a stage-table candidate. */
  private[graft] def lmFinish(v1: DataFrame): DataFrame = {
    val surv = v1.filter(col("v1") === "ok").select("doc_id", "text")
    val scored = TextAnalysis.lmScore(surv, "doc_id", "text")
    val thr = Quantiles.exactQuantiles(scored, "lm_score", Seq(CurateLmP))
      .select("threshold")
    val lmVerdict = scored.crossJoin(broadcast(thr))
      .select(col("doc_id"),
        when(col("lm_score") < col("threshold"), "lm_tail")
          .otherwise("keep").as("v2"))
    v1.join(lmVerdict, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("v1") =!= "ok", col("v1")).otherwise(col("v2")).as("verdict"))
      .withColumn("keep", (col("verdict") === "keep").cast("int"))
  }

  /** The shared planted corpus: bench carve (doc_id ≡ 0 mod 17) +
    * leak plant (bench prefix-6 appended on doc_id ≡ 5 mod 23, per the
    * [[Decontaminate.decontaminateQuery]] construction) — one builder
    * so the in-plan, materialized, and URL-gated entries cannot drift. */
  private[operators] def plantedTrainAndBench(
      spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val bench = docs.filter(col("doc_id") % 17 === 0)
    val prefix6 = concat_ws(" ", slice(split(col("text"), " "), 1, 6))
    val planted = docs.filter(col("doc_id") % 17 =!= 0).as("t")
      .join(broadcast(bench.select((col("doc_id") / 17).cast("long").as("b3"),
        prefix6.as("p6"))), (col("doc_id") % 3) === col("b3"), "left")
      .select(col("doc_id"),
        when(col("doc_id") % 23 === 5 && col("p6").isNotNull,
          concat(col("text"), lit(" "), col("p6"))).otherwise(col("text")).as("text"))
    // spread the train side (no-op at scale): the funnel is a
    // regex-heavy map chain (normalize + scrub + quality/repetition
    // signals + 5-gram decontamination) and the single test-SF parquet
    // split ran EVERY funnel job on one task (profiled: 23 jobs, 23
    // tasks, wall 4.3 s for 2.8 s of single-core task time). Per-doc
    // values are partitioning-independent (map signals; the LM stage's
    // per-doc float sums ride each doc's own token order — spreading
    // happens before any explode).
    (graft.index.LshIndex.spread(planted), bench)
  }

  /** Bench = doc_id ≡ 0 (mod 17), leaks planted per the
    * [[Decontaminate.decontaminateQuery]] construction, so the
    * contamination stage has ground truth. */
  def corpusCurateQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val (planted, bench) = plantedTrainAndBench(spark, sfDir)
    curate(planted, bench)
  }

  /** Filesystem-safe stage-table location per corpus dir (repo tmp,
    * the oracle-fixture discipline; at scale this is a warehouse
    * table, not a scratch file). */
  private def cleanStagePath(sfDir: String): String =
    graft.FixturePaths.stage("curate_clean_" + sfDir.replaceAll("[^A-Za-z0-9.]+", "_"))

  /**
   * `corpus_curate_materialized`: the funnel as a STAGED pipeline —
   * the production path the in-plan [[corpusCurateQuery]] scaladoc
   * promises. Two stage tables at the funnel's natural boundaries:
   *
   *  1. cleaned text ([[cleanChain]] — the regex-heavy prefix runs
   *     EXACTLY once, into parquet, instead of once per signal branch
   *     of the self-contained plan);
   *  2. rule verdicts `v1` ([[ruleVerdicts]] — referenced twice
   *     downstream, by the LM-survivor branch and the final verdict
   *     join, so the in-plan form evaluates the whole rule stage
   *     twice modulo exchange reuse).
   *
   * Each invocation re-writes both stages (mode overwrite), so a
   * bench rep times the true production cost — two stage writes plus
   * the staged reads — not a warm-table replay. At 100 TB the stages
   * are warehouse tables and the win is strictly larger: every
   * re-evaluation the in-plan form pays is a full corpus re-scan
   * there, while the staged form re-reads columnar cleaned text.
   *
   * Verdicts are equal row-for-row with [[corpusCurateQuery]] (the
   * parquet roundtrip is value-faithful for (doc_id, text, v1)), so
   * the entry shares `corpus_curate`'s oracle verbatim; CurateSpec
   * asserts the equality directly as well.
   */
  def corpusCurateMaterializedQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val (planted, bench) = plantedTrainAndBench(spark, sfDir)
    curateMaterialized(planted, bench, cleanStagePath(sfDir))
  }

  /** The staged funnel over arbitrary (train, bench) frames: both
    * stage tables land under `stageDir` (re-written per invocation —
    * the production cost, see [[corpusCurateMaterializedQuery]]),
    * final verdicts come from the staged reads. Shared by the entry
    * and the scale ramp. */
  def curateMaterialized(train: DataFrame, bench: DataFrame,
      stageDir: String): DataFrame = {
    val spark = train.sparkSession
    cleanChain(train).write.mode("overwrite").parquet(s"$stageDir/clean")
    ruleVerdicts(spark.read.parquet(s"$stageDir/clean"), cleanChain(bench))
      .write.mode("overwrite").parquet(s"$stageDir/v1")
    lmFinish(spark.read.parquet(s"$stageDir/v1"))
  }

  /**
   * `corpus_curate_web`: the funnel with the URL-hygiene gate IN
   * FRONT (RefinedWeb/CCNet ordering — a blocklisted, spam-TLD, or
   * recrawled page drops before a byte of its content is normalized,
   * tokenized, or scored). Verdict = the url_filter fail reason for
   * gate-failed docs, else the content funnel's verdict; the LM tail
   * cut is fitted on — and quantiled over — the survivors of the URL
   * gate AND every content stage, so the gate genuinely reorders the
   * model-based stage's training set (composition, not concatenation).
   * Demonstrates the funnel is a COMPOSABLE chain: the inner
   * [[curate]] is reused untouched behind the gate.
   */
  def corpusCurateWebQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val all = Tables.documents(spark, sfDir)
    val (planted, bench) = plantedTrainAndBench(spark, sfDir)
    val urls = all.filter(col("doc_id") % 17 =!= 0)
      .select(col("doc_id"), graft.text.UrlFilter.plantedUrlCol.as("url"))
    val uv = graft.text.UrlFilter.urlFilter(urls)
      .select(col("doc_id"), col("fail_reason").as("u_reason"))
    val failed = uv.filter(col("u_reason") =!= "ok")
      .select(col("doc_id"), col("u_reason").as("verdict"), lit(0).as("keep"))
    val okIds = uv.filter(col("u_reason") === "ok").select("doc_id")
    failed.unionByName(
      curate(planted.join(okIds, "doc_id"), bench)
        .select(col("doc_id"), col("verdict"), col("keep")))
  }

  def corpusCurateWebSql: String = {
    def sqlList(xs: Seq[String]): String = xs.map(x => s"'$x'").mkString(", ")
    import graft.text.UrlFilter.{BlockedDomains, Domains, LowQualityTlds, Tlds}
    s"""$plantedCtes
       |uu AS (
       |  SELECT doc_id,
       |    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END)
       |    || (CASE WHEN doc_id % 5 = 0 THEN 'www.' ELSE '' END)
       |    || ([${sqlList(Domains)}])[(doc_id % 100) % 11 + 1]
       |    || ([${sqlList(Tlds)}])[(doc_id % 100) % 7 + 1]
       |    || '/' || source || '/page-' || (doc_id % 100)
       |    || (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed' ELSE '' END) AS url
       |  FROM documents WHERE doc_id % 17 <> 0),
       |un AS (SELECT doc_id,
       |  regexp_replace(regexp_replace(regexp_replace(url,
       |    '^https?://', ''), '^www\\.', ''), '\\?.*$$', '') AS url_norm FROM uu),
       |up AS (SELECT *, string_split(url_norm, '/')[1] AS host FROM un),
       |ud AS (SELECT *, string_split(host, '.')[1] AS domain,
       |         substr(host, len(string_split(host, '.')[1]) + 1, 10) AS tld
       |       FROM up),
       |uo AS (SELECT url_norm, MIN(doc_id) AS owner FROM ud GROUP BY url_norm),
       |uv AS (
       |  SELECT ud.doc_id,
       |    CASE WHEN domain IN (${sqlList(BlockedDomains)}) THEN 'blocklist'
       |         WHEN tld IN (${sqlList(LowQualityTlds)}) THEN 'low_quality_tld'
       |         WHEN ud.doc_id <> uo.owner THEN 'dup_url'
       |         ELSE 'ok' END AS u_reason
       |  FROM ud JOIN uo USING (url_norm)),
       |uok AS (
       |  SELECT p.doc_id, p.text FROM planted p
       |  JOIN uv ON uv.doc_id = p.doc_id AND uv.u_reason = 'ok'),
       |${funnelCtes("uok")}
       |SELECT doc_id, u_reason AS verdict, CAST(0 AS INTEGER) AS keep
       |FROM uv WHERE u_reason <> 'ok'
       |UNION ALL
       |SELECT doc_id, verdict, CAST(verdict = 'keep' AS INTEGER) AS keep
       |FROM fin""".stripMargin
  }

  /** The funnel CTE chain from the cleaned-train CTE (`src` must
    * provide (doc_id, text)) through `fin` (doc_id, verdict) — shared
    * verbatim by [[corpusCurateSql]] and the URL-gated
    * [[corpusCurateWebSql]], so the two oracles cannot drift. */
  private def funnelCtes(src: String): String = {
    val ctrl = Normalize.CtrlRe
    val email = TextFilters.EmailRe
    val phone = TextFilters.PhoneRe
    val ip = TextFilters.Ipv4Re
    // normalize + scrub as one expression chain over a text column
    def clean(t: String): String =
      s"""regexp_replace(regexp_replace(regexp_replace(
         |      trim(regexp_replace(regexp_replace(nfc_normalize($t),
         |        '$ctrl', ' ', 'g'), '\\s+', ' ', 'g')),
         |    '$email', '<EMAIL>', 'g'), '$phone', '<PHONE>', 'g'), '$ip', '<IP>', 'g')"""
    val gram5 =
      """list_distinct(CASE WHEN len(toks) >= 5 THEN
        |        list_transform(range(1, len(toks) - 3),
        |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4])
        |      ELSE [array_to_string(toks, ' ')] END)"""
    s"""cn AS (SELECT doc_id, ${clean("text")} AS text FROM $src),
       |bn AS (SELECT doc_id, ${clean("text")} AS text FROM bench0),
       |t AS (SELECT doc_id, text, string_split(lower(text), ' ') AS toks FROM cn),
       |qs AS (
       |  SELECT doc_id,
       |    CAST(len(toks) AS INTEGER) AS n_tokens,
       |    FLOOR((1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / GREATEST(len(toks), 1)) * 10000) / 10000 AS dup_token_frac,
       |    FLOOR(CAST(list_aggregate(list_transform(toks, x -> len(x)), 'sum') AS DOUBLE)
       |          / GREATEST(len(toks), 1) * 10000) / 10000 AS avg_token_len,
       |    FLOOR(CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE)
       |          / GREATEST(len(toks), 1) * 10000) / 10000 AS stopword_ratio,
       |    list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS grams
       |  FROM t),
       |vq AS (
       |  SELECT doc_id,
       |    CASE WHEN n_tokens < 20 THEN 'too_short'
       |         WHEN dup_token_frac > 0.65 THEN 'repetitive'
       |         WHEN stopword_ratio <= 0.0 THEN 'no_stopwords'
       |         WHEN avg_token_len < 3.0 OR avg_token_len > 10.0 THEN 'word_length'
       |         ELSE 'ok' END AS q_reason,
       |    CASE WHEN dup_token_frac > ${TextAnalysis.RepDupTokenMax} THEN 'dup_tokens'
       |         WHEN n_tokens >= 2 AND
       |           FLOOR(CAST(list_max(list_transform(list_distinct(grams),
       |                   g -> len(list_filter(grams, x -> x = g)))) AS DOUBLE)
       |                 / len(grams) * 10000) / 10000 > ${TextAnalysis.RepTopBigramMax}
       |           THEN 'top_bigram'
       |         ELSE 'ok' END AS r_reason
       |  FROM qs),
       |gr AS (SELECT doc_id, $gram5 AS gs FROM t),
       |bg AS (
       |  SELECT DISTINCT unnest($gram5) AS g
       |  FROM (SELECT string_split(lower(text), ' ') AS toks FROM bn)),
       |ex AS (SELECT doc_id, unnest(gs) AS g FROM gr),
       |hits AS (
       |  SELECT e.doc_id, COUNT(b.g) AS n_hits
       |  FROM ex e LEFT JOIN bg b USING (g) GROUP BY e.doc_id),
       |v1 AS (
       |  SELECT t.doc_id, t.text,
       |    CASE WHEN vq.q_reason <> 'ok' THEN vq.q_reason
       |         WHEN vq.r_reason <> 'ok' THEN vq.r_reason
       |         WHEN hits.n_hits > 0 THEN 'contaminated'
       |         ELSE 'ok' END AS v1
       |  FROM t JOIN vq ON t.doc_id = vq.doc_id
       |  JOIN hits ON t.doc_id = hits.doc_id),
       |surv AS (SELECT doc_id, text FROM v1 WHERE v1 = 'ok'),
       |tok2 AS (
       |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tk FROM surv),
       |freq AS (SELECT tk, COUNT(*) AS c FROM tok2 GROUP BY tk),
       |tot AS (SELECT SUM(c) AS n FROM freq),
       |s AS (
       |  SELECT doc_id, FLOOR(AVG(ln(c / n)) * 10000) / 10000 AS lm_score
       |  FROM tok2 JOIN freq USING (tk), tot GROUP BY doc_id),
       |b2 AS (SELECT CAST(ROUND(lm_score * 10000) AS BIGINT) AS bkt FROM s),
       |g2 AS (SELECT bkt, COUNT(*) AS c FROM b2 GROUP BY bkt),
       |o AS (SELECT bkt, c,
       |        CAST(SUM(c) OVER (ORDER BY bkt) AS BIGINT) AS cum,
       |        CAST(SUM(c) OVER (ORDER BY bkt) - c AS BIGINT) AS cum_before
       |      FROM g2),
       |nn AS (SELECT SUM(c) AS n FROM g2),
       |rk AS (SELECT CAST(FLOOR($CurateLmP * (n - 1)) AS BIGINT) + 1 AS rnk FROM nn),
       |thr AS (
       |  SELECT o.bkt / 10000.0 AS threshold
       |  FROM rk JOIN o ON rk.rnk > o.cum_before AND rk.rnk <= o.cum),
       |v2 AS (
       |  SELECT s.doc_id,
       |    CASE WHEN s.lm_score < thr.threshold THEN 'lm_tail' ELSE 'keep' END AS v2
       |  FROM s, thr),
       |fin AS (
       |  SELECT v1.doc_id,
       |    CASE WHEN v1.v1 <> 'ok' THEN v1.v1 ELSE v2.v2 END AS verdict
       |  FROM v1 LEFT JOIN v2 ON v1.doc_id = v2.doc_id)""".stripMargin
  }

  /** The shared planted-corpus prefix (bench carve + leak plant). */
  private val plantedCtes: String =
    """WITH bench0 AS (SELECT doc_id, text FROM documents WHERE doc_id % 17 = 0),
      |planted AS (
      |  SELECT t.doc_id,
      |    CASE WHEN t.doc_id % 23 = 5 AND b.doc_id IS NOT NULL
      |         THEN t.text || ' ' ||
      |              array_to_string(string_split(b.text, ' ')[1:6], ' ')
      |         ELSE t.text END AS text
      |  FROM documents t LEFT JOIN bench0 b ON b.doc_id = (t.doc_id % 3) * 17
      |  WHERE t.doc_id % 17 <> 0),""".stripMargin

  def corpusCurateSql: String =
    s"""$plantedCtes
       |${funnelCtes("planted")}
       |SELECT doc_id, verdict,
       |  CAST(verdict = 'keep' AS INTEGER) AS keep
       |FROM fin""".stripMargin
}
