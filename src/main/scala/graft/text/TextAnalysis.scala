package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Text-analysis operators for training-data pipelines: language ID
 * (stopword n-gram heuristic), quality scoring, token counting, and
 * content fingerprinting — all built from codegen'd string built-ins
 * (no UDFs) except the fingerprint, which is a native expression.
 *
 * Tokenization is a single-space split everywhere so the DuckDB
 * oracle can reproduce it verbatim (engine-portable, SURVEY §5).
 */
object TextAnalysis {

  def tokens(text: Column): Column = split(lower(text), " ")

  // ---- language ID ----

  /** Tiny per-language stopword profiles (public-knowledge function words). */
  val StopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "de", "que", "pas"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "de", "que", "no"),
    "it" -> Seq("il", "la", "e", "di", "che", "un", "una", "per", "non", "sono"))

  /** Fraction of tokens that are stopwords of `lang`. */
  private def stopwordScore(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(w => w: Any): _*))).cast("double") /
      greatest(size(toks), lit(1))

  /**
   * Predicted language = argmax stopword score (ties resolve by profile
   * order via strict > on a running max — deterministic). The score is
   * FLOOR-truncated, not rounded: it is an int/int quotient that can
   * land on dyadic half-ties where engine ROUNDs disagree (SURVEY §5).
   *
   * The whole scoring is list_filter/CASE logic a DuckDB oracle
   * reproduces verbatim ([[langIdSql]]) — sql-checked, not rows-only.
   */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    // seed 0.0: a doc with zero stopword signal in every profile keeps "und"
    val scored = StopwordProfiles.foldLeft(
      docs.select(col(idCol).as("doc_id"), lit("und").as("pred_lang"),
        lit(0.0).as("best_score"), toks.as("toks"))) {
      case (df, (lang, words)) =>
        val s = stopwordScore(col("toks"), words)
        df.withColumn("pred_lang", when(s > col("best_score"), lit(lang)).otherwise(col("pred_lang")))
          .withColumn("best_score", greatest(s, col("best_score")))
    }
    scored.select(col("doc_id"), col("pred_lang"),
      (floor(col("best_score") * 10000) / 10000).as("score"))
  }

  def langIdQuery(spark: SparkSession, sfDir: String): DataFrame =
    langId(Tables.documents(spark, sfDir), "doc_id", "text")

  /** DuckDB twin of [[langId]]: per-language stopword ratios, first-match
    * CASE = the fold's strict-> tie-break (first profile at the max wins). */
  val langIdSql: String = {
    val scores = StopwordProfiles.map { case (lang, words) =>
      val set = words.map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter(toks, x -> x IN ($set))) AS DOUBLE) / GREATEST(len(toks), 1) AS s_$lang"
    }.mkString(",\n  ")
    val langs = StopwordProfiles.map(_._1)
    val best = s"GREATEST(${langs.map(l => s"s_$l").mkString(", ")})"
    val cases = langs.map(l => s"WHEN s_$l = best THEN '$l'").mkString("\n    ")
    s"""WITH t AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
       |s AS (SELECT doc_id,
       |  $scores
       |FROM t),
       |b AS (SELECT *, $best AS best FROM s)
       |SELECT doc_id,
       |  CASE WHEN best <= 0 THEN 'und'
       |    $cases
       |    ELSE 'und' END AS pred_lang,
       |  FLOOR(best * 10000) / 10000 AS score
       |FROM b""".stripMargin
  }

  // ---- quality scoring ----

  private val QualityStopwords = Seq("the", "a", "of", "and", "to", "in")

  /** All int/int ratios floor-truncated — dyadic quotients (k/32 etc.)
    * hit ROUND half-ties where engines disagree (SURVEY §5). */
  def textQuality(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = tokens(col("text"))
    def trunc4(c: org.apache.spark.sql.Column) = floor(c * 10000) / 10000
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      size(toks).as("n_tokens"),
      trunc4(aggregate(transform(toks, t => length(t)), lit(0L),
        (acc, x) => acc + x).cast("double") / greatest(size(toks), lit(1))).as("avg_token_len"),
      trunc4(length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("double") /
        greatest(length(col("text")), lit(1))).as("punct_ratio"),
      trunc4(size(filter(toks, t => t.isin(QualityStopwords.map(w => w: Any): _*))).cast("double") /
        greatest(size(toks), lit(1))).as("stopword_ratio"))
      .withColumn("quality_score",
        floor((lit(0.5) * col("stopword_ratio") +
          lit(0.5) * least(lit(1.0), col("n_tokens") / lit(400.0))) * 10000) / 10000)
  }

  val textQualitySql: String =
    """WITH t AS (
      |  SELECT doc_id, text, string_split(lower(text), ' ') AS toks FROM documents)
      |SELECT doc_id,
      |  CAST(len(text) AS INTEGER) AS n_chars,
      |  CAST(len(toks) AS INTEGER) AS n_tokens,
      |  FLOOR(CAST(list_aggregate(list_transform(toks, x -> len(x)), 'sum') AS DOUBLE)
      |        / GREATEST(len(toks), 1) * 10000) / 10000 AS avg_token_len,
      |  FLOOR(CAST(len(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
      |        / GREATEST(len(text), 1) * 10000) / 10000 AS punct_ratio,
      |  FLOOR(CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE)
      |        / GREATEST(len(toks), 1) * 10000) / 10000 AS stopword_ratio,
      |  FLOOR((0.5 * (FLOOR(CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE)
      |        / GREATEST(len(toks), 1) * 10000) / 10000)
      |      + 0.5 * LEAST(1.0, len(toks) / 400.0)) * 10000) / 10000 AS quality_score
      |FROM t""".stripMargin

  // ---- consolidated quality signals ----

  /**
   * `quality_signals`: the materialize-once per-document signal table
   * (the RedPajama-V2 posture — quality signals ship as first-class
   * DATA so a pipeline computes them once and experiments with filter
   * thresholds many times, instead of re-scanning 100 TB per filter
   * tweak). One wide map-only projection unioning the text_quality,
   * repetition, lang-ID, and case/digit signals off a single token
   * array — no shuffle, no joins; the per-signal entries stay as the
   * individually-oracled units, this is their one-pass composition
   * (the `corpus_curate` scaladoc's "materialize once" production
   * path, as a queryable artifact).
   */
  def qualitySignals(spark: SparkSession, sfDir: String): DataFrame =
    qualitySignalsOn(Tables.documents(spark, sfDir))

  /** Frame-level core of [[qualitySignals]] (corpus injectable — the
    * scale ramp's handle). */
  def qualitySignalsOn(docs: DataFrame): DataFrame =
    signalsOver(docs, Seq("doc_id"))

  /**
   * `keys ++ signal columns` over a `text` column — shared between the
   * batch projections ([[qualitySignalsOn]],
   * [[graft.operators.CorpusStats.datasetCard]]) and the streaming
   * maintenance gate ([[graft.streaming.StreamingSignals]]) so the
   * emitted rows are the same expressions bit-for-bit.
   *
   * The shared subtrees — the token array, the per-language stopword
   * scores, and their max — are STAGED as real columns across
   * separate projections instead of being repeated inside every
   * signal expression. Higher-order functions evaluate interpreted
   * (outside codegen), so codegen subexpression elimination never
   * sees them: the single-projection form re-ran the split per signal
   * and the whole score block per language arm of `pred_lang` —
   * measured 20s vs 2s for the full 12-column pass over 200k docs.
   * CollapseProject preserves the staged boundaries because inlining
   * would duplicate non-cheap expressions referenced many times —
   * the same optimizer contract [[graft.operators.Corpus]] relies on
   * for its bucket columns. Still map-only: a chain of projections,
   * no exchange (plan-asserted).
   */
  private[graft] def signalsOver(docs: DataFrame, keys: Seq[String]): DataFrame = {
    val langs = StopwordProfiles.map(_._1)
    val scored = docs
      .withColumn("__toks", tokens(col("text")))
      .select(keys.map(col) ++ Seq(col("text"), col("__toks")) ++
        StopwordProfiles.map { case (lang, words) =>
          stopwordScore(col("__toks"), words).as(s"__s_$lang") }: _*)
      .withColumn("__best", greatest(langs.map(l => col(s"__s_$l")): _*))
    val toks = col("__toks")
    val best = col("__best")
    def t4(c: Column) = floor(c * 10000) / 10000
    val pred = langs.foldRight(lit("und")) { (lang, els) =>
      when(best > 0.0 && col(s"__s_$lang") === best, lit(lang)).otherwise(els) }
    // Character-class ratios count via translate-deletion, NOT
    // regexp_replace: the counts are identical (ASCII classes — the
    // DuckDB oracle keeps its regex form and the hash gate proves the
    // equality), but mixing heterogeneous regex patterns in one
    // codegen'd projection pollutes java.util.regex's JIT profiles
    // (positive-class and negated-class patterns drive the same
    // Pattern internals megamorphic) — measured 20s vs 0.8s for this
    // exact three-column set over 200k docs. The nTokens discipline,
    // applied to the signal pass.
    def charCount(chars: String) =
      length(col("text")) - length(translate(col("text"), chars, ""))
    val lowerDigitSpace = ('a' to 'z').mkString + "0123456789 "
    scored.select(keys.map(col) ++ Seq(
      length(col("text")).as("n_chars"),
      size(toks).as("n_tokens"),
      t4(aggregate(transform(toks, t => length(t)), lit(0L),
        (acc, x) => acc + x).cast("double") / greatest(size(toks), lit(1)))
        .as("avg_token_len"),
      t4((length(col("text")) - charCount(lowerDigitSpace)).cast("double") /
        greatest(length(col("text")), lit(1))).as("punct_ratio"),
      t4(size(filter(toks, t => t.isin(QualityStopwords.map(w => w: Any): _*))).cast("double") /
        greatest(size(toks), lit(1))).as("stopword_ratio"),
      t4(charCount("0123456789").cast("double") /
        greatest(length(col("text")), lit(1))).as("digit_ratio"),
      t4(charCount(('A' to 'Z').mkString).cast("double") /
        greatest(length(col("text")), lit(1))).as("upper_ratio"),
      t4(lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks))
        .as("dup_token_frac"),
      topRunFrac(bigramsOf(toks)).as("top_bigram_frac"),
      pred.as("pred_lang"),
      t4(best).as("lang_score")): _*)
  }

  /** DuckDB twin: the same fragments as the per-signal oracles,
    * assembled over one token CTE. */
  def qualitySignalsSql: String = qualitySignalsSqlFrom("documents")

  /** [[qualitySignalsSql]] over any (doc_id, text) source clause —
    * the incremental-maintenance oracle
    * ([[graft.operators.SignalsMaintenance]]) recomputes the FULL
    * signals table over the new snapshot with this, so equality with
    * the Spark-side base+delta merge IS the maintenance invariant. */
  def qualitySignalsSqlFrom(src: String): String = {
    val scores = StopwordProfiles.map { case (lang, words) =>
      val set = words.map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter(toks, x -> x IN ($set))) AS DOUBLE) / GREATEST(len(toks), 1) AS s_$lang"
    }.mkString(",\n  ")
    val langs = StopwordProfiles.map(_._1)
    val best = s"GREATEST(${langs.map(l => s"s_$l").mkString(", ")})"
    val cases = langs.map(l => s"WHEN s_$l = best THEN '$l'").mkString("\n    ")
    s"""WITH t AS (
       |  SELECT doc_id, text, string_split(lower(text), ' ') AS toks FROM $src),
       |s AS (SELECT doc_id, text, toks,
       |  $scores
       |FROM t),
       |b AS (SELECT *, $best AS best,
       |  list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS grams
       |FROM s)
       |SELECT doc_id,
       |  CAST(len(text) AS INTEGER) AS n_chars,
       |  CAST(len(toks) AS INTEGER) AS n_tokens,
       |  FLOOR(CAST(list_aggregate(list_transform(toks, x -> len(x)), 'sum') AS DOUBLE)
       |        / GREATEST(len(toks), 1) * 10000) / 10000 AS avg_token_len,
       |  FLOOR(CAST(len(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
       |        / GREATEST(len(text), 1) * 10000) / 10000 AS punct_ratio,
       |  FLOOR(CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE)
       |        / GREATEST(len(toks), 1) * 10000) / 10000 AS stopword_ratio,
       |  FLOOR(CAST(len(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
       |        / GREATEST(len(text), 1) * 10000) / 10000 AS digit_ratio,
       |  FLOOR(CAST(len(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)
       |        / GREATEST(len(text), 1) * 10000) / 10000 AS upper_ratio,
       |  FLOOR((1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 10000) / 10000
       |    AS dup_token_frac,
       |  CASE WHEN len(toks) >= 2 THEN
       |    FLOOR(CAST(list_max(list_transform(list_distinct(grams),
       |            g -> len(list_filter(grams, x -> x = g)))) AS DOUBLE)
       |          / len(grams) * 10000) / 10000
       |  END AS top_bigram_frac,
       |  CASE WHEN best <= 0 THEN 'und'
       |    $cases
       |    ELSE 'und' END AS pred_lang,
       |  FLOOR(best * 10000) / 10000 AS lang_score
       |FROM b""".stripMargin
  }

  /** The ablation grid: NESTED profiles (each threshold dominates the
    * previous one's), so keep rates are provably monotone
    * lenient ≥ standard ≥ strict — the spec's invariant.
    * (name, minTokens, maxPunct, minStopword, maxTopBigram). */
  val AblationProfiles: Seq[(String, Int, Double, Double, Double)] = Seq(
    ("lenient", 10, 0.9, 0.0, 0.5),
    ("standard", 20, 0.3, 0.02, 0.2),
    ("strict", 40, 0.1, 0.05, 0.08))

  /**
   * `quality_ablation`: the payoff of the signals-as-data posture —
   * evaluate a GRID of filter-threshold profiles in one pass over the
   * [[qualitySignals]] projection, reporting per profile the keep
   * rate and the first-failed-rule attrition (the `corpus_curate`
   * verdict discipline applied to threshold experiments). This is the
   * experiment loop RedPajama-V2 ships signals for: compare three
   * filter candidates WITHOUT three corpus re-scans.
   *
   * Scale posture: the signals subtree evaluates once per document
   * (map-only, no shuffle), each doc explodes to #profiles verdict
   * rows, and the only exchange is the #profiles-row final partial
   * agg. Against a PRE-materialized signals table (the
   * production form — quality_signals' own output) the same grid is
   * a small-table scan; this entry keeps the one-pass in-plan form so
   * the oracle replays end to end.
   *
   * Cross-engine: every comparison is a FLOORed-at-4dp signal value
   * vs a DOUBLE literal (the minhashTune compare-on-rounded rule);
   * counts are integers; keep_share is one FLOORed division.
   */
  def qualityAblation(spark: SparkSession, sfDir: String): DataFrame =
    qualityAblationOn(Tables.documents(spark, sfDir))

  /** Frame-level core of [[qualityAblation]] (the ramp's handle). */
  def qualityAblationOn(docs: DataFrame): DataFrame = {
    val s = qualitySignalsOn(docs)
    def failOf(minT: Int, maxP: Double, minS: Double, maxB: Double): Column =
      when(col("n_tokens") < minT, "length")
        .when(col("punct_ratio") > maxP, "punct")
        .when(col("stopword_ratio") < minS, "stopword")
        .when(col("top_bigram_frac") > maxB, "repetition")
    val verdicts = array(AblationProfiles.map { case (nm, minT, maxP, minS, maxB) =>
      struct(lit(nm).as("profile"), failOf(minT, maxP, minS, maxB).as("fail"))
    }: _*)
    def nFail(rule: String): Column =
      sum(when(col("fail") === rule, 1L).otherwise(0L)).as(s"n_fail_$rule")
    s.select(explode(verdicts).as("v"))
      .select(col("v.profile").as("profile"), col("v.fail").as("fail"))
      .groupBy("profile")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("fail").isNull, 1L).otherwise(0L)).as("n_keep"),
        nFail("length"), nFail("punct"), nFail("stopword"), nFail("repetition"))
      .withColumn("keep_share",
        floor(col("n_keep").cast("double") / col("n_docs") * 10000) / 10000)
  }

  /** Oracle shares [[qualitySignalsSql]] verbatim as its signals CTE
    * (the funnel-CTE discipline) and replays the same first-fail
    * ladder per profile. */
  def qualityAblationSql: String = {
    val legs = AblationProfiles.map { case (nm, minT, maxP, minS, maxB) =>
      s"""SELECT '$nm' AS profile,
         |  CASE WHEN n_tokens < $minT THEN 'length'
         |       WHEN punct_ratio > CAST($maxP AS DOUBLE) THEN 'punct'
         |       WHEN stopword_ratio < CAST($minS AS DOUBLE) THEN 'stopword'
         |       WHEN top_bigram_frac > CAST($maxB AS DOUBLE) THEN 'repetition'
         |  END AS fail
         |FROM sig""".stripMargin
    }.mkString("\nUNION ALL\n")
    def nFail(rule: String): String =
      s"CAST(SUM(CASE WHEN fail = '$rule' THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_$rule"
    s"""WITH sig AS (${qualitySignalsSql}),
       |v AS (
       |$legs)
       |SELECT profile,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN fail IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       |  ${nFail("length")}, ${nFail("punct")}, ${nFail("stopword")}, ${nFail("repetition")},
       |  FLOOR(CAST(SUM(CASE WHEN fail IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |        / COUNT(*) * 10000) / 10000 AS keep_share
       |FROM v GROUP BY profile""".stripMargin
  }

  // ---- token counting ----

  val BpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  def tokenCount(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      // spaces + 1 == size(split(text, " ")) with zero allocation
      // (Corpus.nTokens rationale); the regex count runs the native
      // counting matcher instead of materializing every match
      (length(col("text")) - length(translate(col("text"), " ", "")) + 1).as("ws_tokens"),
      RegexpCount.re_count(lower(col("text")), BpeishPattern).as("regex_tokens"))

  val tokenCountSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
      |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INTEGER) AS regex_tokens
      |FROM documents""".stripMargin

  // ---- statistical LM quality (unigram surprisal) ----

  /**
   * Corpus-relative unigram surprisal — the one-gram form of the
   * CCNet-style "score documents with a language model" filter:
   * `lm_score(doc) = mean over tokens of ln P(token)` with `P` the
   * corpus unigram frequency. Very negative scores = rare-token-heavy
   * documents (gibberish, hex dumps, mangled encodings); scores near
   * zero = function-word soup. A MODEL-based signal the corpus itself
   * fits, complementing [[textQuality]]'s hand rules.
   *
   * Scale: two passes over the token stream — one partial-agg count
   * per token (the vocab table) and one equi-join of tokens against it
   * feeding a per-doc avg. The vocab join keys on the token (a plain
   * shuffle join — vocab needn't fit anywhere); a deployment wanting a
   * broadcast cuts the vocab to top-V + an OOV floor probability
   * without changing the plan shape. Score floor-truncated (SURVEY §5).
   */
  def lmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // tokens shuffle as 8-byte xxhash64 keys (the n-gram family
    // posture; counts agree with string keys modulo a 64-bit collision)
    val tok = docs.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("ht"))
    val freq = tok.groupBy("ht").agg(count(lit(1)).as("c"))
    val total = freq.agg(sum("c").as("n"))
    tok.join(freq, "ht")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (floor(avg(log(col("c") / col("n"))) * 10000) / 10000).as("lm_score"))
  }

  def lmScoreQuery(spark: SparkSession, sfDir: String): DataFrame =
    lmScore(Tables.documents(spark, sfDir), "doc_id", "text")

  /** Resident unigram LM: the top-V vocabulary by count (hashed keys)
    * + the corpus token total; out-of-vocab tokens score as hapaxes
    * (count 1). This is the broadcast cut [[lmScore]]'s Scaladoc
    * promises: the model is a FIXED-size artifact a serving/streaming
    * chain carries as a plan literal. */
  final case class LmModel(keys: Array[Long], counts: Array[Long], n: Long) {
    require(keys.length == counts.length && n > 0,
      s"malformed LM model (${keys.length}/${counts.length}/$n)")
  }

  /** Collect the top-V vocabulary (bounded driver fit — the
    * Bpe/QcModel/DsirModel discipline; V rows, not the vocab). */
  def fitLmTopV(docs: DataFrame, textCol: String, v: Int = 4096): LmModel = {
    val freq = docs.select(explode(tokens(col(textCol))).as("t"))
      .select(xxhash64(col("t")).as("ht"))
      .groupBy("ht").agg(count(lit(1)).as("c"))
    val n = freq.agg(sum("c")).head().getLong(0)
    val top = freq.orderBy(col("c").desc, col("ht").asc).limit(v).collect()
    LmModel(top.map(_.getLong(0)), top.map(_.getLong(1)), n)
  }

  /**
   * MAP-ONLY unigram surprisal against a resident [[LmModel]]: each
   * doc folds its own token array against the literal top-V count
   * map — no vocab join, no shuffle (the [[graft.operators.Dsir]]
   * `scoreWith` serving shape). With V >= the corpus vocabulary the
   * scores equal [[lmScore]]'s to within one 4-dp floor step (the
   * fold sums in document order, the batch partial agg in partition
   * order); with a cut vocabulary, tail tokens score as hapaxes —
   * the standard top-V + OOV-floor deployment trade.
   */
  def lmScoreWith(docs: DataFrame, idCol: String, textCol: String,
      m: LmModel): DataFrame = {
    val counts = map_from_arrays(
      typedLit(m.keys.toSeq), typedLit(m.counts.toSeq))
    val toks = tokens(col(textCol))
    docs.select(col(idCol).as("doc_id"), size(toks).as("n_tokens"),
      (floor(aggregate(toks, lit(0.0), (acc, t) =>
        acc + log(coalesce(element_at(counts, xxhash64(t)), lit(1L)) /
          lit(m.n.toDouble))) / greatest(size(toks), lit(1)) * 10000) / 10000)
        .as("lm_topv"))
  }

  /**
   * Conditional BIGRAM surprisal — one step up the n-gram ladder from
   * [[lmScore]] toward the CCNet 5-gram filter:
   * `lm2(doc) = mean over adjacent pairs of ln P(w_i | w_{i-1})` with
   * `P(b|a) = c(a b) / c(a·)`, where `c(a·)` counts `a` as a bigram
   * PREFIX (so the conditional normalizes exactly and ML-estimates
   * P(b|a) with no smoothing — the corpus is its own training set, so
   * no bigram is unseen).
   *
   * Scale: bigram extraction is MAP-ONLY (zip each token array with
   * its own tail — no self-join), then the same two-partial-agg +
   * equi-join shape as [[lmScore]]; the bigram vocab keys a plain
   * shuffle join. Single-token docs have no bigrams and report the
   * 0.0 sentinel with n_bigrams = 0.
   */
  def lmScoreBigram(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    // hashed bigram + prefix keys computed map-side at extraction (the
    // lmScoreTrigram posture): the join shuffles 8-byte keys instead of
    // concatenated word pairs, the variadic hash needs no separator
    // convention, and the prefix hash rides alongside so prefix counts
    // still derive from the (tiny) bigram vocab table.
    val big = docs.select(col(idCol).as("doc_id"),
        explode(arrays_zip(
          slice(toks, lit(1), greatest(size(toks) - 1, lit(0))).as("b1"),
          slice(toks, lit(2), greatest(size(toks) - 1, lit(0))).as("b2"))).as("z"))
      .select(col("doc_id"), xxhash64(col("z.b1"), col("z.b2")).as("hb"),
        xxhash64(col("z.b1")).as("hpb"))
    val bfreq0 = big.groupBy("hpb", "hb").agg(count(lit(1)).as("cb"))
    val pfreq = bfreq0.groupBy("hpb").agg(sum("cb").as("cp"))
    // prefix count joined into the vocab table (vocab-sized), so the
    // bigram STREAM is joined exactly once; UNHINTED — AQE picks the
    // strategy from runtime sizes (broadcast at bench SFs, sort-merge
    // once the vocab outgrows the threshold; the r14 kn5 unhinting
    // finding applied family-wide this round)
    val bfreq = bfreq0.join(pfreq, "hpb").select("hb", "cb", "cp")
    val scored = big.join(bfreq, "hb")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        (floor(avg(log(col("cb") / col("cp"))) * 10000) / 10000).as("lm2_score"))
    docs.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm2_score"), lit(0.0)).as("lm2_score"))
  }

  def lmScoreBigramQuery(spark: SparkSession, sfDir: String): DataFrame =
    lmScoreBigram(Tables.documents(spark, sfDir), "doc_id", "text")

  val lmScoreBigramSql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents),
      |big AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(ts)),
      |    i -> ts[i] || chr(1) || ts[i + 1])) AS bg
      |  FROM tok),
      |bfreq AS (SELECT bg, COUNT(*) AS cb FROM big GROUP BY bg),
      |pfreq AS (SELECT string_split(bg, chr(1))[1] AS pfx, SUM(cb) AS cp
      |          FROM bfreq GROUP BY 1),
      |s AS (
      |  SELECT doc_id, COUNT(*) AS n_bigrams,
      |    FLOOR(AVG(ln(cb / cp)) * 10000) / 10000 AS lm2_score
      |  FROM big JOIN bfreq USING (bg)
      |  JOIN pfreq ON string_split(bg, chr(1))[1] = pfx
      |  GROUP BY doc_id)
      |SELECT d.doc_id, COALESCE(s.n_bigrams, 0) AS n_bigrams,
      |  COALESCE(s.lm2_score, 0.0) AS lm2_score
      |FROM documents d LEFT JOIN s ON s.doc_id = d.doc_id""".stripMargin

  /**
   * Interpolated TRIGRAM surprisal — the next rung from [[lmScoreBigram]]
   * toward the CCNet/KenLM 5-gram quality filter:
   * `lm3(doc) = mean over positions i>=3 of
   *   ln(λ1·P(w_i) + λ2·P(w_i|w_{i-1}) + λ3·P(w_i|w_{i-2} w_{i-1}))`
   * with λ = (0.2, 0.3, 0.5) (Jelinek-Mercer interpolation — the
   * backoff mass comes from the lower orders, so a trigram seen once
   * isn't scored as certainty and the estimate degrades gracefully
   * exactly the way a KenLM-style filter's does). All probabilities
   * are ML estimates from the corpus itself: P(w) = c(w)/N,
   * P(b|a) = c(ab)/c(a·), P(c|ab) = c(abc)/c(ab·), prefix counts
   * derived from the n-gram vocab tables, never a third corpus pass.
   *
   * Scale: trigram extraction is MAP-ONLY (three shifted slices of the
   * token array zipped positionally — no self-join); then the
   * [[lmScore]] shape times three: partial-agg vocab tables for
   * uni/bi/tri-grams (each keys a plain shuffle join, nothing must fit
   * in memory) and one equi-join chain over the trigram stream. The
   * interpolation is written in the identical literal order on both
   * engines so the IEEE double result is bit-equal before the 4-dp
   * floor (SURVEY §5). Docs with < 3 tokens report the 0.0 sentinel
   * with n_trigrams = 0.
   */
  def lmScoreTrigram(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    def sliceAt(off: Int) =
      slice(toks, lit(off), greatest(size(toks) - 2, lit(0)))
    // every gram key shuffles as its 8-byte xxhash64, computed map-side
    // at extraction (joining on up-to-3 word strings dominated shuffle
    // bytes at scale); counts agree with string keys modulo a 64-bit
    // collision merging two grams — the substring/minhash argument.
    // Prefix hashes ride ALONGSIDE the gram hash so prefix counts still
    // derive from the vocab tables (hashing destroys the prefix
    // structure a string regroup would have used), never a second
    // corpus-sized shuffle.
    val tri = docs
      .select(col(idCol).as("doc_id"),
        explode(arrays_zip(sliceAt(1).as("w1"), sliceAt(2).as("w2"),
          sliceAt(3).as("w3"))).as("z"))
      .select(col("doc_id"),
        xxhash64(col("z.w1"), col("z.w2"), col("z.w3")).as("h3"),
        xxhash64(col("z.w1"), col("z.w2")).as("hp3"),
        xxhash64(col("z.w2"), col("z.w3")).as("hb"),
        xxhash64(col("z.w3")).as("h1"))
    // unigram vocab + total over the FULL token stream (the lmScore vocab)
    val uni = docs.select(explode(toks).as("t"))
      .groupBy(xxhash64(col("t")).as("h1")).agg(count(lit(1)).as("c1"))
    val tot = uni.agg(sum("c1").as("n"))
    // bigram vocab over ALL adjacent pairs (len-1 per doc, not just
    // trigram-interior ones) — the same estimator lmScoreBigram fits
    val pairs = docs.select(
      explode(arrays_zip(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))).as("b1"),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))).as("b2"))).as("z"))
      .select(xxhash64(col("z.b1"), col("z.b2")).as("hb"),
        xxhash64(col("z.b1")).as("hpb"))
    // the gram hash determines its prefix hash, so the prefix count is
    // joined into the VOCAB table (vocab-sized join) and the trigram
    // stream is joined only 3 times (tri, bi, uni), not 5. The vocab
    // joins are UNHINTED (r15): AQE decides from the shuffle's RUNTIME
    // size, not a static estimate — it broadcasts the vocab at bench
    // SFs and falls back to the same sort-merge the old hint forced
    // once the vocab outgrows the threshold, so the hint only ever
    // removed the cheap case (the r14 kn5 finding, VERDICT-endorsed,
    // applied family-wide).
    val bfreq0 = pairs.groupBy("hpb", "hb").agg(count(lit(1)).as("cb"))
    val bpfx = bfreq0.groupBy("hpb").agg(sum("cb").as("cp"))
    val bfreq = bfreq0.join(bpfx, "hpb").select("hb", "cb", "cp")
    val tfreq0 = tri.groupBy("hp3", "h3").agg(count(lit(1)).as("ct"))
    val tpfx = tfreq0.groupBy("hp3").agg(sum("ct").as("ctp"))
    val tfreq = tfreq0.join(tpfx, "hp3").select("h3", "ct", "ctp")
    val scored = tri
      .join(tfreq, "h3")
      .join(bfreq, "hb")
      .join(uni, "h1")
      .crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"),
        (floor(avg(log(
          lit(0.2) * (col("c1") / col("n")) +
          lit(0.3) * (col("cb") / col("cp")) +
          lit(0.5) * (col("ct") / col("ctp")))) * 10000) / 10000).as("lm3_score"))
    docs.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("lm3_score"), lit(0.0)).as("lm3_score"))
  }

  def lmScoreTrigramQuery(spark: SparkSession, sfDir: String): DataFrame =
    lmScoreTrigram(Tables.documents(spark, sfDir), "doc_id", "text")

  val lmScoreTrigramSql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents),
      |uni AS (SELECT t, COUNT(*) AS c1 FROM (
      |  SELECT unnest(ts) AS t FROM tok) GROUP BY t),
      |tot AS (SELECT SUM(c1) AS n FROM uni),
      |big AS (SELECT unnest(list_transform(range(1, len(ts)),
      |    i -> ts[i] || chr(1) || ts[i + 1])) AS bg FROM tok),
      |bfreq AS (SELECT bg, COUNT(*) AS cb FROM big GROUP BY bg),
      |bpfx AS (SELECT string_split(bg, chr(1))[1] AS pfx, SUM(cb) AS cp
      |         FROM bfreq GROUP BY 1),
      |tri AS (SELECT doc_id, unnest(list_transform(range(1, len(ts) - 1),
      |    i -> ts[i] || chr(1) || ts[i + 1] || chr(1) || ts[i + 2])) AS tg
      |  FROM tok),
      |tfreq AS (SELECT tg, COUNT(*) AS ct FROM tri GROUP BY tg),
      |tpfx AS (SELECT string_split(tg, chr(1))[1] || chr(1) ||
      |           string_split(tg, chr(1))[2] AS pfx2, SUM(ct) AS ctp
      |         FROM tfreq GROUP BY 1),
      |s AS (
      |  SELECT doc_id, COUNT(*) AS n_trigrams,
      |    FLOOR(AVG(ln(
      |      0.2 * (u.c1 / tot.n) +
      |      0.3 * (b.cb / p.cp) +
      |      0.5 * (f.ct / q.ctp))) * 10000) / 10000 AS lm3_score
      |  FROM tri
      |  JOIN tfreq f USING (tg)
      |  JOIN tpfx q ON string_split(tg, chr(1))[1] || chr(1) ||
      |    string_split(tg, chr(1))[2] = q.pfx2
      |  JOIN bfreq b ON string_split(tg, chr(1))[2] || chr(1) ||
      |    string_split(tg, chr(1))[3] = b.bg
      |  JOIN bpfx p ON string_split(tg, chr(1))[2] = p.pfx
      |  JOIN uni u ON string_split(tg, chr(1))[3] = u.t
      |  , tot
      |  GROUP BY doc_id)
      |SELECT d.doc_id, COALESCE(s.n_trigrams, 0) AS n_trigrams,
      |  COALESCE(s.lm3_score, 0.0) AS lm3_score
      |FROM documents d LEFT JOIN s ON s.doc_id = d.doc_id""".stripMargin

  // ---- 5-gram stupid-backoff LM (the CCNet-rung of the ladder) ----

  /** Stupid-backoff discount (Brants et al. 2007, "Large Language
    * Models in Machine Translation" — the backoff chosen FOR
    * MapReduce-scale distributed LMs: no normalization pass, scores
    * need only raw n-gram counts). */
  val SboAlpha: Double = 0.4
  /** Train band: the LM is fitted on this hash-banded fraction of the
    * corpus and scores EVERYTHING — held-out docs genuinely contain
    * unseen grams, so the backoff chain actually fires (a corpus that
    * is its own training set never backs off: every gram has count
    * >= 1, which is why [[lmScoreTrigram]] interpolates instead). */
  val Lm5Seed: String = "lm5band"
  /** Config-backed (`lm5.trainFrac`); default 0.7. */
  def Lm5TrainFrac: Double = graft.config.GraftConfig.active.lm5.trainFrac

  /**
   * 5-gram stupid-backoff surprisal — the target rung of the n-gram
   * ladder ([[lmScore]] -> [[lmScoreBigram]] -> [[lmScoreTrigram]] ->
   * here): the CCNet/LLaMA quality stack scores documents with a
   * 5-gram LM trained on a reference corpus; this is that filter with
   * the train corpus = a hash-banded split of the data itself.
   *
   * Score per position i >= 5 (context `a b c d`, word `e`):
   * `S = c5(abcde)/c4(abcd)` when the 5-gram was seen in train, else
   * `α·c4(bcde)/c3(bcd)`, else `α²·c3(cde)/c2(cd)`, else
   * `α³·c2(de)/c1(d)`, else `α⁴·max(c1(e),1)/N` (the OOV floor scores
   * an unseen word as a hapax). All counts RAW (stupid backoff is
   * deliberately unnormalized — that is what makes it embarrassingly
   * distributable); a seen k-gram's (k-1)-prefix is necessarily seen,
   * so no branch divides by zero. `lm5_score = mean ln S`, floored 4dp
   * (SURVEY §5); docs with < 5 tokens report the 0.0 sentinel.
   *
   * Scale: gram extraction is MAP-ONLY (five shifted slices zipped);
   * each order's vocab is one partial-agg over the train band keyed by
   * 8-byte xxhash64 grams, with its denominator (the gram's own
   * (k-1)-prefix count) joined in at VOCAB size — the prefix hash
   * rides alongside the gram hash from extraction, so the corpus-sized
   * gram stream is joined exactly once per order (5 merge joins), the
   * [[lmScoreTrigram]] recipe extended. Nothing is normalized, nothing
   * must fit in memory, and the five vocab tables ARE the shardable
   * artifact Brants' distributed LM serves from.
   */
  def lmScore5gram(docs: DataFrame, idCol: String, textCol: String,
      trainPred: Column): DataFrame = {
    val toks = tokens(col(textCol))
    val train = docs.filter(trainPred)

    // raw k-gram vocab of the train band: (hg, ck) keyed by the hashed
    // gram, plus the gram's (k-1)-prefix hash for the denominator join
    def kslice(k: Int, off: Int) =
      slice(toks, lit(off), greatest(size(toks) - (k - 1), lit(0)))
    def kgrams(k: Int): DataFrame = {
      val zipped = explode(arrays_zip((1 to k).map(o =>
        kslice(k, o).as(s"w$o")): _*)).as("z")
      val ws = (1 to k).map(o => col(s"z.w$o"))
      train.select(zipped)
        .select(xxhash64(ws: _*).as("hg"),
          (if (k == 1) lit(0L) else xxhash64(ws.init: _*)).as("hp"))
    }
    // RAW per-order count tables, each one partial agg over its own
    // extraction pass; the gram hash determines its prefix hash, so
    // (hp, hg) groups are keyed by hg with hp as payload
    val r1 = kgrams(1).groupBy("hg").agg(count(lit(1)).as("c1"))
    val tot = r1.agg(sum("c1").as("n"))
    def rawK(k: Int): DataFrame =
      kgrams(k).groupBy("hp", "hg").agg(count(lit(1)).as(s"c$k"))
    val r2 = rawK(2); val r3 = rawK(3); val r4 = rawK(4); val r5 = rawK(5)
    // each vocab joins its denominator (the gram's own (k-1)-prefix
    // raw count) FLAT against the raw lower-order table — vocab x
    // vocab, UNHINTED (r15: AQE picks broadcast vs sort-merge from the
    // runtime shuffle size — the r14 kn5 unhinting finding applied
    // family-wide). Flat, not nested through the enriched
    // vk tables: nesting re-derived every lower order inside every
    // higher one (O(k²) passes — 36 scans in the explain); flat, each
    // raw table is derived at most twice (24 scans, 2.8→2.6 s at
    // sf0.1). The residual duplication is structural: the two
    // consumers prune the aggregate to different column sets, so its
    // exchange does not canonicalize equal and Spark will not reuse
    // it — full sharing means MATERIALIZING the count tables, which
    // is exactly the production posture (they are the LM artifact a
    // Brants-style deployment writes once and serves from) and stays
    // out of this one-shot self-contained query.
    def cnt(r: DataFrame, c: String, d: String) =
      r.select(col("hg").as("hp"), col(c).as(d))
    val v5 = r5.join(cnt(r4, "c4", "d4"), "hp").select("hg", "c5", "d4")
    val v4 = r4.join(cnt(r3, "c3", "d3"), "hp").select("hg", "c4", "d3")
    val v3 = r3.join(cnt(r2, "c2", "d2"), "hp").select("hg", "c3", "d2")
    val v2 = r2.join(cnt(r1, "c1", "d1"), "hp").select("hg", "c2", "d1")
    val v1 = r1

    // score stream over ALL docs: one row per position i >= 5, keyed by
    // the five suffix grams the backoff chain consults
    def s5(off: Int) = slice(toks, lit(off), greatest(size(toks) - 4, lit(0)))
    val grams = docs.select(col(idCol).as("doc_id"),
        explode(arrays_zip(s5(1).as("w1"), s5(2).as("w2"), s5(3).as("w3"),
          s5(4).as("w4"), s5(5).as("w5"))).as("z"))
      .select(col("doc_id"),
        xxhash64(col("z.w1"), col("z.w2"), col("z.w3"), col("z.w4"), col("z.w5")).as("g5"),
        xxhash64(col("z.w2"), col("z.w3"), col("z.w4"), col("z.w5")).as("g4"),
        xxhash64(col("z.w3"), col("z.w4"), col("z.w5")).as("g3"),
        xxhash64(col("z.w4"), col("z.w5")).as("g2"),
        xxhash64(col("z.w5")).as("g1"))
    def at(v: DataFrame, key: String) =
      v.withColumnRenamed("hg", key)
    // LEFT joins: held-out docs carry grams the train band never saw;
    // the stream meets each vocab exactly once, flat -- a per-level
    // filter cascade would be the serving shape, but without
    // materializing each residue Spark recomputes the upstream chain
    // per branch (measured 2.6x worse), and caching a corpus-sized
    // stream is the wrong trade at scale. α^k as exact literals,
    // identical multiply order on both engines (SURVEY §5).
    val joined = grams
      .join(at(v5, "g5"), Seq("g5"), "left")
      .join(at(v4, "g4"), Seq("g4"), "left")
      .join(at(v3, "g3"), Seq("g3"), "left")
      .join(at(v2, "g2"), Seq("g2"), "left")
      .join(at(v1, "g1").withColumnRenamed("c1", "u1"), Seq("g1"), "left")
      .crossJoin(broadcast(tot))
    val sc = when(col("c5").isNotNull, log(col("c5") / col("d4")))
      .when(col("c4").isNotNull, log(lit(0.4) * (col("c4") / col("d3"))))
      .when(col("c3").isNotNull, log(lit(0.16) * (col("c3") / col("d2"))))
      .when(col("c2").isNotNull, log(lit(0.064) * (col("c2") / col("d1"))))
      .otherwise(log(lit(0.0256) * (coalesce(col("u1"), lit(1L)) / col("n"))))
    val scored = joined.groupBy("doc_id")
      .agg(count(lit(1)).as("n_5grams"),
        (floor(avg(sc) * 10000) / 10000).as("lm5_score"))
    docs.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_5grams"), lit(0L)).as("n_5grams"),
        coalesce(col("lm5_score"), lit(0.0)).as("lm5_score"))
  }

  def lmScore5gramQuery(spark: SparkSession, sfDir: String): DataFrame =
    lmScore5gram(Tables.documents(spark, sfDir), "doc_id", "text",
      graft.operators.Corpus.hashUniform(
        concat(lit(Lm5Seed + ":"), col("doc_id").cast("string"))) < Lm5TrainFrac)

  /** DuckDB twin: string grams (counts agree with the hashed keys
    * modulo a 64-bit collision), train band replayed via the shared
    * sha-256 uniform, gram + prefix extracted as ZIPPED unnests. */
  def lmScore5gramSql: String = {
    val d = "chr(1)"
    def gram(parts: Seq[String]) = parts.mkString(s" || $d || ")
    def lvl(k: Int): String = { // extraction CTE: gram + its prefix
      val g = gram((0 until k).map(j => s"ts[i+$j]"))
      val p = if (k == 1) "''" else gram((0 until k - 1).map(j => s"ts[i+$j]"))
      s"""u$k AS (
         |  SELECT unnest(list_transform(range(1, len(ts) - ${k - 2}), i -> $g)) AS g,
         |         unnest(list_transform(range(1, len(ts) - ${k - 2}), i -> $p)) AS p
         |  FROM trn)"""
    }
    s"""WITH tok AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents),
       |band AS (
       |  SELECT doc_id,
       |    ('0x' || substr(sha256('$Lm5Seed:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
       |      / 4294967296.0 AS u
       |  FROM documents),
       |trn AS (SELECT t.doc_id, ts FROM tok t JOIN band b
       |        ON t.doc_id = b.doc_id AND b.u < $Lm5TrainFrac),
       |${lvl(1)},
       |v1 AS (SELECT g, COUNT(*) AS c1 FROM u1 GROUP BY g),
       |tot AS (SELECT SUM(c1) AS n FROM v1),
       |${lvl(2)},
       |v2 AS (SELECT r.g, r.c2, l.c1 AS d1 FROM
       |  (SELECT g, any_value(p) AS p, COUNT(*) AS c2 FROM u2 GROUP BY g) r
       |  JOIN v1 l ON r.p = l.g),
       |${lvl(3)},
       |v3 AS (SELECT r.g, r.c3, l.c2 AS d2 FROM
       |  (SELECT g, any_value(p) AS p, COUNT(*) AS c3 FROM u3 GROUP BY g) r
       |  JOIN v2 l ON r.p = l.g),
       |${lvl(4)},
       |v4 AS (SELECT r.g, r.c4, l.c3 AS d3 FROM
       |  (SELECT g, any_value(p) AS p, COUNT(*) AS c4 FROM u4 GROUP BY g) r
       |  JOIN v3 l ON r.p = l.g),
       |${lvl(5)},
       |v5 AS (SELECT r.g, r.c5, l.c4 AS d4 FROM
       |  (SELECT g, any_value(p) AS p, COUNT(*) AS c5 FROM u5 GROUP BY g) r
       |  JOIN v4 l ON r.p = l.g),
       |grams AS (
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, len(ts) - 3), i ->
       |      ${gram((0 to 4).map(j => s"ts[i+$j]"))})) AS g5,
       |    unnest(list_transform(range(1, len(ts) - 3), i ->
       |      ${gram((1 to 4).map(j => s"ts[i+$j]"))})) AS g4,
       |    unnest(list_transform(range(1, len(ts) - 3), i ->
       |      ${gram((2 to 4).map(j => s"ts[i+$j]"))})) AS g3,
       |    unnest(list_transform(range(1, len(ts) - 3), i ->
       |      ${gram((3 to 4).map(j => s"ts[i+$j]"))})) AS g2,
       |    unnest(list_transform(range(1, len(ts) - 3), i -> ts[i+4])) AS g1
       |  FROM tok),
       |j AS (
       |  SELECT doc_id,
       |    v5.c5, v5.d4, v4.c4, v4.d3, v3.c3, v3.d2, v2.c2, v2.d1,
       |    v1.c1 AS u1, tot.n
       |  FROM grams
       |  LEFT JOIN v5 ON grams.g5 = v5.g
       |  LEFT JOIN v4 ON grams.g4 = v4.g
       |  LEFT JOIN v3 ON grams.g3 = v3.g
       |  LEFT JOIN v2 ON grams.g2 = v2.g
       |  LEFT JOIN v1 ON grams.g1 = v1.g
       |  , tot),
       |s AS (
       |  SELECT doc_id, COUNT(*) AS n_5grams,
       |    FLOOR(AVG(CASE
       |      WHEN c5 IS NOT NULL THEN ln(c5 / d4)
       |      WHEN c4 IS NOT NULL THEN ln(0.4 * (c4 / d3))
       |      WHEN c3 IS NOT NULL THEN ln(0.16 * (c3 / d2))
       |      WHEN c2 IS NOT NULL THEN ln(0.064 * (c2 / d1))
       |      ELSE ln(0.0256 * (COALESCE(u1, 1) / n)) END) * 10000) / 10000
       |      AS lm5_score
       |  FROM j GROUP BY doc_id)
       |SELECT d.doc_id, COALESCE(s.n_5grams, 0) AS n_5grams,
       |  COALESCE(s.lm5_score, 0.0) AS lm5_score
       |FROM documents d LEFT JOIN s ON s.doc_id = d.doc_id""".stripMargin
  }

  // ---- interpolated Kneser-Ney trigram LM (the normalized rung) ----

  /** Absolute discount (Kneser & Ney 1995; 0.75 is the classic fixed
    * value — an exact binary double, so both engines subtract the
    * identical constant). */
  val KnDiscount: Double = 0.75

  /**
   * Interpolated Kneser–Ney trigram surprisal — the NORMALIZED rung
   * above [[lmScore5gram]]'s stupid backoff: where stupid backoff is
   * deliberately unnormalized (scores are ratios scaled by α^k — fine
   * for ranking, meaningless as probabilities), interpolated KN is a
   * proper distribution, and this implementation is EXACTLY normalized
   * over the event space (train vocabulary + one OOV bucket):
   * Σ_w P(w|ctx) = 1 for every context, which the ladder spec proves
   * by scoring enumeration documents through this very kernel.
   *
   * Per position (context `a b`, word `w`):
   *   P(w|ab)  = max(c(abw) − D, 0)/d(ab·) + D·N1+(ab·)/d(ab·) · Pc(w|b)
   *   Pc(w|b)  = max(N1+(·bw) − D, 0)/N1+(·b·)
   *              + D·|{x: N1+(·bx)>0}|/N1+(·b·) · Pc(w)
   *   Pc(w)    = max(N1+(·w) − D, 0)/B + D·V1/B · 1/(V+1)
   * with d(ab·) = the trigram-POSITION count of prefix (a,b) — not the
   * raw bigram count, which over-counts document-final bigrams that
   * continue nowhere and would leak probability mass (this corpus has
   * no sentence sentinels); N1+ = continuation type counts (the KN
   * idea: "how many distinct contexts has w completed", so a word
   * frequent only inside one collocation gets low unigram backoff
   * mass); B = total distinct bigram types, V1 = words with any
   * left-context, V = train vocabulary size; the 1/(V+1) uniform term
   * holds the OOV bucket's share — an unseen word scores the floor
   * instead of −∞. Unseen context (a,b) backs off to Pc(w|b); unseen
   * middle b to Pc(w).
   *
   * `lm_kn_score` = mean ln P, floored 4 dp (SURVEY §5); docs with
   * < 3 tokens report the 0.0 sentinel. Train band = the SAME
   * hash-banded split as [[lmScore5gram]] so the ladder spec compares
   * the two models on identical held-out documents.
   *
   * Scale posture: identical to the other LM rungs — gram extraction
   * map-only; the model is four vocab-sized type/position aggregates
   * over the train band ("continuation counts = one more partial agg
   * per order"); the corpus-sized score stream meets each model table
   * exactly once through five merge-hinted LEFT joins; three one-row
   * constants broadcast.
   */
  def lmScoreKn(docs: DataFrame, idCol: String, textCol: String,
      trainPred: Column): DataFrame = {
    val toks = tokens(col(textCol))
    val train = docs.filter(trainPred)
    val D = lit(KnDiscount)

    def sl(n: Int, off: Int) =
      slice(toks, lit(off), greatest(size(toks) - (n - 1), lit(0)))
    // trigram POSITIONS of the train band, carrying every dependent key
    val triPos = train.select(explode(arrays_zip(
        sl(3, 1).as("w1"), sl(3, 2).as("w2"), sl(3, 3).as("w3"))).as("z"))
      .select(
        xxhash64(col("z.w1"), col("z.w2"), col("z.w3")).as("g123"),
        xxhash64(col("z.w1"), col("z.w2")).as("g12"),
        xxhash64(col("z.w2"), col("z.w3")).as("g23"),
        xxhash64(col("z.w2")).as("g2"))
    // distinct trigram TYPES (dependent keys ride the group-by) —
    // CACHED (r15): t3 feeds four model tables (pre/preBi/mid + the
    // score join) and t2 two; uncached, every consumer re-ran the
    // corpus-sized extraction+aggregation (profiled: 29 jobs for one
    // scoring pass). The tables are vocab-sized; the bench's per-rep
    // clearCache (and Verify's per-entry clearCache) releases them.
    // (r16 A/B'd this rung with the kn5 treatment — spread scans,
    // eager fills, endu cached — and every variant was SLOWER at
    // sf0.1: 1.49 s as-is vs 2.13-2.42 s; the rung is too light to
    // amortize extra exchanges/actions. Left exactly as r15.)
    val t3 = triPos.groupBy("g123", "g12", "g23", "g2")
      .agg(count(lit(1)).as("c123")).cache()
    val biPos = train.select(explode(arrays_zip(
        sl(2, 1).as("w1"), sl(2, 2).as("w2"))).as("z"))
      .select(xxhash64(col("z.w1"), col("z.w2")).as("g12"),
        xxhash64(col("z.w2")).as("gw2"))
    val t2 = biPos.groupBy("g12", "gw2").agg(count(lit(1)).as("c2")).cache()
    val uni = train.select(explode(toks).as("w"))
      .select(xxhash64(col("w")).as("g")).groupBy("g").agg(count(lit(1)).as("c1"))

    // model tables (each one partial agg over a type/position table).
    // d12 (trigram-POSITION count per prefix) = Σ c123 over the type
    // table grouped by g12 — exactly the positions-per-prefix count the
    // old second corpus pass re-derived from triPos, so `pre` is ONE
    // vocab-sized aggregate instead of corpus-pass + type-pass + join.
    val pre = t3.groupBy("g12")
      .agg(sum("c123").as("d12"), count(lit(1)).as("nm"))
    val preBi = t3.groupBy("g23").agg(count(lit(1)).as("np"))
    val mid = t3.groupBy("g2")
      .agg(count(lit(1)).as("nma"), countDistinct("g23").as("nsuf"))
    val endu = t2.groupBy("gw2").agg(count(lit(1)).as("ne"))
    val consts = t2.agg(count(lit(1)).as("b"))
      .crossJoin(uni.agg(count(lit(1)).as("v")))
      .crossJoin(endu.agg(count(lit(1)).as("v1")))

    // score stream over ALL docs, one row per position i >= 3 — NOT
    // spread (unlike kn5's): this rung's per-position work is 5
    // hashes + 5 probes, and the round-robin text shuffle cost
    // exceeded the parallelism gain (A/B'd: 1.49 s unspread vs 2.13 s
    // spread at sf0.1)
    def s3(off: Int) = slice(toks, lit(off), greatest(size(toks) - 2, lit(0)))
    val grams = docs.select(col(idCol).as("doc_id"),
        explode(arrays_zip(s3(1).as("w1"), s3(2).as("w2"), s3(3).as("w3"))).as("z"))
      .select(col("doc_id"),
        xxhash64(col("z.w1"), col("z.w2"), col("z.w3")).as("g123"),
        xxhash64(col("z.w1"), col("z.w2")).as("g12"),
        xxhash64(col("z.w2"), col("z.w3")).as("g23"),
        xxhash64(col("z.w2")).as("g2"),
        xxhash64(col("z.w3")).as("g3"))
    // UNHINTED joins (r15): AQE broadcasts the vocab-sized model tables
    // at bench SFs from their runtime shuffle sizes and falls back to
    // sort-merge once they outgrow the threshold — the r14 kn5
    // unhinting finding applied to this rung (the old hints forced five
    // consecutive exchange+sort passes of the corpus-sized gram stream).
    val joined = grams
      .join(t3.select("g123", "c123"), Seq("g123"), "left")
      .join(pre, Seq("g12"), "left")
      .join(preBi, Seq("g23"), "left")
      .join(mid, Seq("g2"), "left")
      .join(endu.withColumnRenamed("gw2", "g3"), Seq("g3"), "left")
      .crossJoin(broadcast(consts))
    // the three levels, IDENTICAL float structure on both engines
    val pcUni = (greatest(coalesce(col("ne"), lit(0L)).cast("double") - D, lit(0.0))
      + D * col("v1").cast("double") / (col("v").cast("double") + lit(1.0)))
      ./(col("b").cast("double"))
    val pcBi = when(col("nma").isNotNull,
      (greatest(coalesce(col("np"), lit(0L)).cast("double") - D, lit(0.0))
        + D * col("nsuf").cast("double") * pcUni) / col("nma").cast("double"))
      .otherwise(pcUni)
    val p = when(col("d12").isNotNull,
      (greatest(coalesce(col("c123"), lit(0L)).cast("double") - D, lit(0.0))
        + D * col("nm").cast("double") * pcBi) / col("d12").cast("double"))
      .otherwise(pcBi)
    val scored = joined.groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"),
        (floor(avg(log(p)) * 10000) / 10000).as("lm_kn_score"))
    docs.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("lm_kn_score"), lit(0.0)).as("lm_kn_score"))
  }

  def lmScoreKnQuery(spark: SparkSession, sfDir: String): DataFrame =
    lmScoreKn(Tables.documents(spark, sfDir), "doc_id", "text",
      graft.operators.Corpus.hashUniform(
        concat(lit(Lm5Seed + ":"), col("doc_id").cast("string"))) < Lm5TrainFrac)

  /** DuckDB twin: string grams (counts agree with the hashed keys
    * modulo a 64-bit collision), the SAME sha-256 train band, type and
    * position aggregates mirrored, the identical three-level CASE.
    * Multi-referenced chain CTEs MATERIALIZED (the inlining rule). */
  def lmScoreKnSql: String = {
    val d = "chr(1)"
    val D = KnDiscount
    val pcUni = s"""(GREATEST(CAST(COALESCE(ne, 0) AS DOUBLE) - $D, 0.0)
       |      + $D * CAST(v1 AS DOUBLE) / (CAST(v AS DOUBLE) + 1.0)) / CAST(b AS DOUBLE)""".stripMargin
    val pcBi = s"""CASE WHEN nma IS NOT NULL THEN
       |      (GREATEST(CAST(COALESCE(np, 0) AS DOUBLE) - $D, 0.0)
       |       + $D * CAST(nsuf AS DOUBLE) * ($pcUni)) / CAST(nma AS DOUBLE)
       |      ELSE ($pcUni) END""".stripMargin
    val pExpr = s"""CASE WHEN d12 IS NOT NULL THEN
       |      (GREATEST(CAST(COALESCE(c123, 0) AS DOUBLE) - $D, 0.0)
       |       + $D * CAST(nm AS DOUBLE) * ($pcBi)) / CAST(d12 AS DOUBLE)
       |      ELSE ($pcBi) END""".stripMargin
    s"""WITH tok AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents),
       |band AS (
       |  SELECT doc_id,
       |    ('0x' || substr(sha256('$Lm5Seed:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
       |      / 4294967296.0 AS u
       |  FROM documents),
       |trn AS MATERIALIZED (SELECT t.doc_id, ts FROM tok t JOIN band b
       |        ON t.doc_id = b.doc_id AND b.u < $Lm5TrainFrac),
       |u3k AS MATERIALIZED (
       |  SELECT
       |    unnest(list_transform(range(1, len(ts) - 1), i ->
       |      ts[i] || $d || ts[i+1] || $d || ts[i+2])) AS g123,
       |    unnest(list_transform(range(1, len(ts) - 1), i ->
       |      ts[i] || $d || ts[i+1])) AS g12,
       |    unnest(list_transform(range(1, len(ts) - 1), i ->
       |      ts[i+1] || $d || ts[i+2])) AS g23,
       |    unnest(list_transform(range(1, len(ts) - 1), i -> ts[i+1])) AS g2
       |  FROM trn),
       |t3 AS MATERIALIZED (
       |  SELECT g123, any_value(g12) AS g12, any_value(g23) AS g23,
       |         any_value(g2) AS g2, COUNT(*) AS c123
       |  FROM u3k GROUP BY g123),
       |t2 AS MATERIALIZED (
       |  SELECT g12, any_value(gw2) AS gw2, COUNT(*) AS c2 FROM (
       |    SELECT
       |      unnest(list_transform(range(1, len(ts)), i -> ts[i] || $d || ts[i+1])) AS g12,
       |      unnest(list_transform(range(1, len(ts)), i -> ts[i+1])) AS gw2
       |    FROM trn) GROUP BY g12),
       |pre AS (
       |  SELECT p.g12, p.d12, m.nm FROM
       |    (SELECT g12, COUNT(*) AS d12 FROM u3k GROUP BY g12) p
       |    JOIN (SELECT g12, COUNT(*) AS nm FROM t3 GROUP BY g12) m USING (g12)),
       |prebi AS (SELECT g23, COUNT(*) AS np FROM t3 GROUP BY g23),
       |mid AS (SELECT g2, COUNT(*) AS nma, COUNT(DISTINCT g23) AS nsuf
       |        FROM t3 GROUP BY g2),
       |endu AS MATERIALIZED (SELECT gw2, COUNT(*) AS ne FROM t2 GROUP BY gw2),
       |consts AS (SELECT
       |    (SELECT COUNT(*) FROM t2) AS b,
       |    (SELECT COUNT(DISTINCT t) FROM (SELECT unnest(ts) AS t FROM trn)) AS v,
       |    (SELECT COUNT(*) FROM endu) AS v1),
       |grams AS (
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, len(ts) - 1), i ->
       |      ts[i] || $d || ts[i+1] || $d || ts[i+2])) AS g123,
       |    unnest(list_transform(range(1, len(ts) - 1), i ->
       |      ts[i] || $d || ts[i+1])) AS g12,
       |    unnest(list_transform(range(1, len(ts) - 1), i ->
       |      ts[i+1] || $d || ts[i+2])) AS g23,
       |    unnest(list_transform(range(1, len(ts) - 1), i -> ts[i+1])) AS g2,
       |    unnest(list_transform(range(1, len(ts) - 1), i -> ts[i+2])) AS g3
       |  FROM tok),
       |j AS (
       |  SELECT doc_id, t3.c123, pre.d12, pre.nm, prebi.np,
       |         mid.nma, mid.nsuf, endu.ne, consts.b, consts.v, consts.v1
       |  FROM grams
       |  LEFT JOIN t3 ON grams.g123 = t3.g123
       |  LEFT JOIN pre ON grams.g12 = pre.g12
       |  LEFT JOIN prebi ON grams.g23 = prebi.g23
       |  LEFT JOIN mid ON grams.g2 = mid.g2
       |  LEFT JOIN endu ON grams.g3 = endu.gw2
       |  , consts),
       |s AS (
       |  SELECT doc_id, COUNT(*) AS n_trigrams,
       |    FLOOR(AVG(ln($pExpr)) * 10000) / 10000 AS lm_kn_score
       |  FROM j GROUP BY doc_id)
       |SELECT d.doc_id, COALESCE(s.n_trigrams, 0) AS n_trigrams,
       |  COALESCE(s.lm_kn_score, 0.0) AS lm_kn_score
       |FROM documents d LEFT JOIN s ON s.doc_id = d.doc_id""".stripMargin
  }

  // ---- modified Kneser-Ney 5-gram (Chen-Goodman 1999) ----

  /**
   * Modified-Kneser–Ney 5-gram surprisal — the top of the LM ladder:
   * [[lmScore5gram]]'s order-5 reach with [[lmScoreKn]]'s exact
   * normalization, plus the Chen–Goodman refinement both lack:
   * ORDER-SPECIFIC, COUNT-SPECIFIC discounts. Instead of one fixed
   * D = 0.75 everywhere, each order o estimates THREE discounts from
   * its own count-of-counts (n_i = types at that order seen exactly i
   * times):
   *   Y = n1/(n1 + 2·n2),  D1 = 1 − 2Y·n2/n1,
   *   D2 = 2 − 3Y·n3/n2,   D3+ = 3 − 4Y·n4/n3
   * applied by the type's own count (c=1 → D1, c=2 → D2, c≥3 → D3+).
   * Discounts are clamped into [0, c-class] so the removed mass equals
   * the redistributed mass EXACTLY, and degenerate count-of-counts
   * (n_i = 0 at tiny corpora) fall back to fixed constants — the
   * clamps and fallbacks are what keep Σ_w P(w|ctx) = 1 at every
   * backoff level over the event space (train vocab + one OOV bucket),
   * which the ladder spec proves through this very kernel.
   *
   * Structure per position (context w1..w4, target w5):
   *   P5 uses RAW 5-gram counts over 4-gram-prefix POSITION
   *   denominators (the [[lmScoreKn]] trigram-position rule, order 5);
   *   P4..P1 use CONTINUATION type counts, each order k reading the
   *   distinct (k+1)-gram types of the train band ("how many distinct
   *   left contexts complete this k-gram"); the base is the uniform
   *   1/(V+1) holding the OOV bucket's share. Unseen context at any
   *   level backs off to the full lower-order probability.
   *
   * `lm_kn5_score` = mean ln P, floored 4 dp; docs with < 5 tokens
   * report the 0.0 sentinel. Train band = the SAME hash-banded split
   * as the whole ladder, so the spec compares all rungs on identical
   * held-out documents.
   *
   * Scale posture: the model is the five per-order type/position
   * aggregates (the shardable Brants-style artifact) plus FIVE one-row
   * count-of-counts aggregates (the discounts are corpus constants —
   * broadcast, never a shuffle); the corpus-sized score stream meets
   * each model table exactly once through nine merge-hinted LEFT
   * joins keyed by the gram hashes it extracted map-side.
   */
  def lmScoreKn5(docs: DataFrame, idCol: String, textCol: String,
      trainPred: Column): DataFrame =
    lm5ScorePlan(docs, idCol, textCol, lm5Fit(docs.filter(trainPred), textCol))

  /** The fitted MKN-5 model: the nine score-ready per-order tables
    * (hash-keyed counts / position denominators / count-classes) plus
    * the one-row constants frame (per-order count-of-counts,
    * continuation total, vocab) — what [[lm5ScorePlan]] joins the
    * gram stream against. Built in-plan by [[lm5Fit]], or read
    * RESIDENT off the [[lmModelExport]] fixtures by
    * [[lm5StagedModel]]. */
  private[graft] case class Lm5Model(t5: DataFrame, o5: DataFrame,
      c4: DataFrame, o4: DataFrame, c3: DataFrame, o3: DataFrame,
      c2: DataFrame, o2: DataFrame, c1: DataFrame, consts: DataFrame)

  /** The five per-order TYPE tables (orders 5..1) — the shardable
    * Brants-style model artifact: every [[Lm5Model]] table is a
    * bounded MODEL-sized aggregate of these, so they (plus the one-row
    * count-of-counts) are exactly what [[lmModelExport]] stages. */
  private[graft] case class Lm5Types(t5: DataFrame, t4: DataFrame,
      t3: DataFrame, t2: DataFrame, uni: DataFrame)

  /** Extract the five type tables from the train band — the ONLY
    * corpus-sized passes in the model build (order 5 keeps raw
    * position counts `c5`; orders 4..2 are DISTINCT type sets; order 1
    * is the train vocabulary, NOT derivable from t2 whose g5 misses
    * each document's first token). */
  private[graft] def lm5TypeTables(train0: DataFrame, textCol: String): Lm5Types = {
    // spread the few-split corpus scan (no-op at scale): the five
    // extraction passes are map-heavy tokenize+hash chains that
    // otherwise run in the source's single test-SF parquet split
    // (the r15 lang_id_trained finding). All outputs are integer
    // counts / distinct sets — partitioning cannot change them.
    val train = graft.index.LshIndex.spread(train0)
    val toks = tokens(col(textCol))
    def sl(off: Int, span: Int) =
      slice(toks, lit(off), greatest(size(toks) - (span - 1), lit(0)))
    def posK(k: Int): DataFrame =
      train.select(explode(arrays_zip((1 to k).map(o =>
        sl(o, k).as(s"w$o")): _*)).as("z"))
    def w(o: Int) = col(s"z.w$o")
    def h(cs: Column*) = xxhash64(cs: _*)
    // order 5: raw position counts; context keys ride the group-by
    val t5 = posK(5).select(
        h(w(1), w(2), w(3), w(4), w(5)).as("g12345"),
        h(w(1), w(2), w(3), w(4)).as("g1234"),
        h(w(2), w(3), w(4), w(5)).as("g2345"),
        h(w(2), w(3), w(4)).as("g234"))
      .groupBy("g12345", "g1234", "g2345", "g234")
      .agg(count(lit(1)).as("c5"))
    val t4 = posK(4).select(h(w(1), w(2), w(3), w(4)).as("t4"),
      h(w(2), w(3), w(4)).as("g345"), h(w(2), w(3)).as("g34")).distinct()
    val t3 = posK(3).select(h(w(1), w(2), w(3)).as("t3"),
      h(w(2), w(3)).as("g45"), h(w(2)).as("g4")).distinct()
    val t2 = posK(2).select(h(w(1), w(2)).as("t2"), h(w(2)).as("g5")).distinct()
    val uni = train.select(explode(toks).as("t"))
      .select(xxhash64(col("t")).as("g")).distinct()
    Lm5Types(t5, t4, t3, t2, uni)
  }

  private def lm5Coc(t: DataFrame, c: String, p: String) = t.agg(
    sum(when(col(c) === 1, 1L).otherwise(0L)).as(s"${p}1"),
    sum(when(col(c) === 2, 1L).otherwise(0L)).as(s"${p}2"),
    sum(when(col(c) === 3, 1L).otherwise(0L)).as(s"${p}3"),
    sum(when(col(c) === 4, 1L).otherwise(0L)).as(s"${p}4"))

  /** Assemble the score-ready [[Lm5Model]] from the type tables —
    * bounded model-sized aggregates only (the order-5 position
    * denominator d5 is Σc5 over t5, identical to counting positions
    * directly). `stagedConsts` substitutes the fixture-read
    * count-of-counts row on the staged path so the resident model is
    * self-consistent with its own staged type tables.
    *
    * r16: the multi-consumer continuation tables c4..c1 are CACHED and
    * eagerly filled in one action ([[eagerFill]]) — each fed three
    * consumers (its own score join's build, the next o-table, the
    * count-of-counts row) and was re-aggregated per consumer before,
    * with the consumers racing any lazy fill. The single-consumer
    * o-tables stay uncached lazy aggregates over the filled caches.
    * The per-order tables deliberately remain SEPARATE cached frames
    * (not one fused generic union): the score joins' build sides then
    * carry accurate InMemoryRelation size stats, which is what lets
    * the planner pick broadcast statically at bench SFs and fall back
    * to sort-merge when a table outgrows the threshold — a fused
    * filter-over-union was measured to lose those stats (10 static
    * SMJ, the gram stream exchanged per join, kn5 7→11 s). */
  private[graft] def lm5ModelFromTypes(ty: Lm5Types,
      stagedConsts: Option[DataFrame] = None): Lm5Model = {
    // r15: each per-order model table is ONE grouped aggregate. The
    // position/type denominator that used to come from a second
    // aggregation of the same source joined back by key is a grouped
    // SUM of the finer aggregate it sits next to — d5 = Σc5 per g1234;
    // d4 = (t5 rows per g234) = Σcc4 per g234 (cc4 already counts t5
    // rows per (g2345, g234)); likewise d3/d2 — so every order drops
    // one aggregation pass and one join (guide §2.4). Values are
    // identical: long sums of the same rows, identical key sets.
    val o5 = ty.t5.groupBy("g1234").agg(sum("c5").as("d5"),
      sum(when(col("c5") === 1, 1L).otherwise(0L)).as("k51"),
      sum(when(col("c5") === 2, 1L).otherwise(0L)).as("k52"),
      sum(when(col("c5") >= 3, 1L).otherwise(0L)).as("k53"))
    // order 4: continuation counts from distinct 5-gram types. CACHED
    // r16: the r15 "cache serializes the concurrent broadcast builds"
    // finding applied to a LAZY cache, whose fill the first consumer
    // paid while the others blocked; with the eager pre-fill below the
    // score-time consumers only read. Three consumers each (join
    // build, o-table, count-of-counts) — cached, that work runs once.
    val c4 = ty.t5.groupBy("g2345", "g234").agg(count(lit(1)).as("cc4")).cache()
    val o4 = c4.groupBy("g234").agg(sum("cc4").as("d4"),
      sum(when(col("cc4") === 1, 1L).otherwise(0L)).as("k41"),
      sum(when(col("cc4") === 2, 1L).otherwise(0L)).as("k42"),
      sum(when(col("cc4") >= 3, 1L).otherwise(0L)).as("k43"))
    // order 3: from distinct 4-gram types (suffix = the score row's w3 w4 w5)
    val c3 = ty.t4.groupBy("g345", "g34").agg(count(lit(1)).as("cc3")).cache()
    val o3 = c3.groupBy("g34").agg(sum("cc3").as("d3"),
      sum(when(col("cc3") === 1, 1L).otherwise(0L)).as("k31"),
      sum(when(col("cc3") === 2, 1L).otherwise(0L)).as("k32"),
      sum(when(col("cc3") >= 3, 1L).otherwise(0L)).as("k33"))
    // order 2: from distinct trigram types
    val c2 = ty.t3.groupBy("g45", "g4").agg(count(lit(1)).as("cc2")).cache()
    val o2 = c2.groupBy("g4").agg(sum("cc2").as("d2"),
      sum(when(col("cc2") === 1, 1L).otherwise(0L)).as("k21"),
      sum(when(col("cc2") === 2, 1L).otherwise(0L)).as("k22"),
      sum(when(col("cc2") >= 3, 1L).otherwise(0L)).as("k23"))
    // order 1: from distinct bigram types (the KN continuation unigram)
    val c1 = ty.t2.groupBy("g5").agg(count(lit(1)).as("cc1")).cache()
    // eager one-action fill of the four continuation caches (their
    // inputs — the type tables — are already filled by lm5Fit on the
    // in-plan path and are parquet fixtures on the staged one), so the
    // score-time consumers below never race a lazy fill
    eagerFill(Seq(c4, c3, c2, c1))
    val consts = stagedConsts.getOrElse(
      lm5Coc(ty.t5, "c5", "a").crossJoin(lm5Coc(c4, "cc4", "b"))
        .crossJoin(lm5Coc(c3, "cc3", "e")).crossJoin(lm5Coc(c2, "cc2", "f"))
        .crossJoin(lm5Coc(c1, "cc1", "m"))
        .crossJoin(c1.agg(sum("cc1").as("btot"),
          sum(when(col("cc1") === 1, 1L).otherwise(0L)).as("k11"),
          sum(when(col("cc1") === 2, 1L).otherwise(0L)).as("k12"),
          sum(when(col("cc1") >= 3, 1L).otherwise(0L)).as("k13")))
        .crossJoin(ty.uni.agg(count(lit(1)).as("v"))))
    Lm5Model(ty.t5.select("g12345", "c5"), o5,
      c4.select("g2345", "cc4"), o4, c3.select("g345", "cc3"), o3,
      c2.select("g45", "cc2"), o2, c1, consts)
  }

  /** Eagerly fill a set of cached tables with ONE action carrying
    * exactly one count-aggregate branch per cache. Why this exists:
    * the fused model build ([[fuseModelParts]]) scans each type table
    * from several concurrent union branches, and a lazily-filled
    * InMemoryRelation makes those branches RACE to compute the same
    * partitions — the corpus-sized gram extraction ran once per branch
    * (profiled at 26.9 s summed task time vs 9.9 s for a sequential
    * cached build; the "Block already exists; not re-adding"
    * BlockManager signature). Uncached is no better: column pruning
    * gives each branch's extraction a different projection, so the
    * exchanges don't canonicalize equal and nothing is reused
    * (profiled 18.6 s / 39 MB shuffled). One fill branch per cache
    * computes each extraction exactly once, concurrently across
    * tables (guide §2.6), before any consumer touches them. */
  private def eagerFill(cached: Seq[DataFrame]): Unit =
    cached.map(_.agg(count(lit(1)).as("n"))).reduce(_.unionByName(_)).count()

  /** Fit the MKN-5 model over `train` in-plan: the five type tables
    * cached (r15 — the only corpus-sized passes) and eagerly filled in
    * one action (r16 — see [[eagerFill]]), then the fused one-action
    * model build over them. The staged path ([[lm5StagedModel]] /
    * `lm_score_kn5_staged`) remains the structural fix — resident
    * fixtures, no model build at all. */
  private[graft] def lm5Fit(train: DataFrame, textCol: String): Lm5Model = {
    val ty0 = lm5TypeTables(train, textCol)
    // uni is cached too (r16): its only consumer is the consts row,
    // but uncached its corpus-sized vocab pass ran SEQUENTIALLY inside
    // the consts head() action — filled here it runs concurrently
    // with the other four extraction passes and consts reads a cache
    val ty = Lm5Types(ty0.t5.cache(), ty0.t4.cache(), ty0.t3.cache(),
      ty0.t2.cache(), ty0.uni.cache())
    eagerFill(Seq(ty.t5, ty.t4, ty.t3, ty.t2, ty.uni))
    lm5ModelFromTypes(ty)
  }

  /** Score `docs` against a fitted [[Lm5Model]]: the corpus-sized gram
    * stream meets each model table exactly once through nine
    * merge-hinted LEFT joins keyed by the hashes it extracted
    * map-side; the discount arithmetic lands as driver literals. */
  private def lm5ScorePlan(docs: DataFrame, idCol: String, textCol: String,
      m: Lm5Model): DataFrame = {
    val toks = tokens(col(textCol))
    def h(cs: Column*) = xxhash64(cs: _*)
    def w(o: Int) = col(s"z.w$o")

    // the five one-row count-of-counts (the discount estimators) +
    // globals — COLLECTED driver-side (the fitCentroids discipline:
    // corpus constants become plan literals). Left as plan columns,
    // each discount's Y/CASE tree re-inlines at every use site inside
    // the score projection and the fused stage blows Janino's method
    // budget (measured InternalCompilerException → interpreted
    // fallback); as literals the projection stays codegen'd.
    val consts = m.consts.head()

    // score stream over ALL docs, one row per position i >= 5. The
    // scan is SPREAD (no-op at scale): the per-position 9-hash
    // projection + 9 join probes + the log/CASE chain are the
    // dominant per-task CPU of the whole entry, and the single
    // test-SF parquet split ran them on one core. Per-doc float
    // ordering is unchanged — spreading happens BEFORE the explode,
    // so every doc's positions stay inside one partition and the
    // per-doc avg sums in position order exactly as before.
    def s5(off: Int) = slice(toks, lit(off), greatest(size(toks) - 4, lit(0)))
    val grams = graft.index.LshIndex.spread(docs).select(col(idCol).as("doc_id"),
        explode(arrays_zip(s5(1).as("w1"), s5(2).as("w2"), s5(3).as("w3"),
          s5(4).as("w4"), s5(5).as("w5"))).as("z"))
      .select(col("doc_id"),
        h(w(1), w(2), w(3), w(4), w(5)).as("g12345"),
        h(w(1), w(2), w(3), w(4)).as("g1234"),
        h(w(2), w(3), w(4), w(5)).as("g2345"),
        h(w(2), w(3), w(4)).as("g234"),
        h(w(3), w(4), w(5)).as("g345"),
        h(w(3), w(4)).as("g34"),
        h(w(4), w(5)).as("g45"),
        h(w(4)).as("g4"),
        h(w(5)).as("g5"))
    // UNHINTED joins: the model tables are type-count-sized, so at
    // bench SFs AQE broadcasts all nine and the corpus-sized gram
    // stream flows through ZERO shuffles until the doc_id aggregate —
    // the r14 bench measured the previous merge-hinted form paying
    // nine consecutive exchange+sort passes of the gram stream (7.2 s
    // vs 2.5 s unhinted at sf0.1). At 100 TB model tables outgrow the
    // broadcast threshold and AQE falls back to the same sort-merge
    // joins the hint forced — the hint only ever removed the cheap
    // case, never added the scale case.
    val joined = grams
      .join(m.t5, Seq("g12345"), "left")
      .join(m.o5, Seq("g1234"), "left")
      .join(m.c4, Seq("g2345"), "left")
      .join(m.o4, Seq("g234"), "left")
      .join(m.c3, Seq("g345"), "left")
      .join(m.o3, Seq("g34"), "left")
      .join(m.c2, Seq("g45"), "left")
      .join(m.o2, Seq("g4"), "left")
      .join(m.c1, Seq("g5"), "left")

    // Chen-Goodman discounts per order, clamped + degenerate-count
    // fallbacks — driver doubles (same IEEE ops/order as the oracle's
    // in-query arithmetic), landing in the plan as literals
    def cl(name: String): Long = {
      val i = consts.fieldIndex(name)
      if (consts.isNullAt(i)) 0L else consts.getLong(i)
    }
    def disc(p: String): (Column, Column, Column) = {
      val (n1, n2, n3, n4) = (cl(p + "1"), cl(p + "2"), cl(p + "3"), cl(p + "4"))
      val y = n1.toDouble / (n1.toDouble + 2.0 * n2.toDouble)
      (lit(if (n1 > 0)
          math.min(math.max(1.0 - 2.0 * y * n2.toDouble / n1.toDouble, 0.0), 1.0)
        else 0.5),
       lit(if (n1 > 0 && n2 > 0)
          math.min(math.max(2.0 - 3.0 * y * n3.toDouble / n2.toDouble, 0.0), 2.0)
        else 1.0),
       lit(if (n1 > 0 && n3 > 0)
          math.min(math.max(3.0 - 4.0 * y * n4.toDouble / n3.toDouble, 0.0), 3.0)
        else 1.5))
    }
    def dbl(c: Column) = c.cast("double")
    val (d51, d52, d53) = disc("a")
    val (d41, d42, d43) = disc("b")
    val (d31, d32, d33) = disc("e")
    val (d21, d22, d23) = disc("f")
    val (d11, d12, d13) = disc("m")
    def numOf(c: Column, dd: (Column, Column, Column)) = {
      val cz = coalesce(c, lit(0L))
      greatest(dbl(cz) - when(cz === 1, dd._1).when(cz === 2, dd._2)
        .otherwise(dd._3), lit(0.0))
    }
    def gma(dd: (Column, Column, Column), k1: Column, k2: Column, k3: Column) =
      dd._1 * dbl(k1) + dd._2 * dbl(k2) + dd._3 * dbl(k3)
    val p1 = (numOf(col("cc1"), (d11, d12, d13))
      + gma((d11, d12, d13),
          lit(cl("k11")), lit(cl("k12")), lit(cl("k13")))
        * (lit(1.0) / (lit(cl("v").toDouble) + lit(1.0)))) / lit(cl("btot").toDouble)
    def lvl(d: Column, c: Column, dd: (Column, Column, Column),
        k1: Column, k2: Column, k3: Column, lower: Column) =
      when(d.isNotNull,
        (numOf(c, dd) + gma(dd, k1, k2, k3) * lower) / dbl(d))
        .otherwise(lower)
    val p2 = lvl(col("d2"), col("cc2"), (d21, d22, d23),
      col("k21"), col("k22"), col("k23"), p1)
    val p3 = lvl(col("d3"), col("cc3"), (d31, d32, d33),
      col("k31"), col("k32"), col("k33"), p2)
    val p4 = lvl(col("d4"), col("cc4"), (d41, d42, d43),
      col("k41"), col("k42"), col("k43"), p3)
    val p5 = lvl(col("d5"), col("c5"), (d51, d52, d53),
      col("k51"), col("k52"), col("k53"), p4)

    // ln P projected BEFORE the aggregate: the five-level CASE chain
    // inlined into the hash aggregate blows Janino's method budget
    // (InternalCompilerException → whole-stage fallback, ~2x slower);
    // as a Project it splits into sub-methods and stays codegen'd
    val scored = joined.select(col("doc_id"), log(p5).as("lnp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_5grams"),
        (floor(avg(col("lnp")) * 10000) / 10000).as("lm_kn5_score"))
    docs.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_5grams"), lit(0L)).as("n_5grams"),
        coalesce(col("lm_kn5_score"), lit(0.0)).as("lm_kn5_score"))
  }

  /** The ladder's shared train-band predicate over `doc_id`. */
  private[graft] def lm5TrainPredCol: Column =
    graft.operators.Corpus.hashUniform(
      concat(lit(Lm5Seed + ":"), col("doc_id").cast("string"))) < Lm5TrainFrac

  /** Where [[lmModelExport]] stages the MKN-5 model artifact (five
    * type tables + the one-row count-of-counts) for the resident-model
    * scoring path — the embed_sq/centroid fixture discipline on the
    * one fitted family that still refit per scoring run. */
  val Lm5ModelExportBase: String = graft.FixturePaths.fixture("lm5_model")
  private def lm5PartPath(part: String): String =
    s"$Lm5ModelExportBase/$part.parquet"

  private def lm5StagedTypes(spark: SparkSession): Lm5Types =
    Lm5Types(spark.read.parquet(lm5PartPath("t5")),
      spark.read.parquet(lm5PartPath("t4")),
      spark.read.parquet(lm5PartPath("t3")),
      spark.read.parquet(lm5PartPath("t2")),
      spark.read.parquet(lm5PartPath("uni")))

  /** Stage the model ONCE per (JVM, corpus): the five type tables are
    * each written from their single corpus pass, then the
    * count-of-counts row is derived FROM THE STAGED READS, so the
    * fixture set is self-consistent by construction (a reader
    * recomputing consts from the staged tables gets the same row). */
  private def ensureLm5Export(spark: SparkSession, sfDir: String): Unit =
    graft.FixtureExport.ensure(s"lm5:$sfDir|f=$Lm5TrainFrac", Lm5ModelExportBase) {
      val train = Tables.documents(spark, sfDir).filter(lm5TrainPredCol)
      val ty = lm5TypeTables(train, "text")
      Seq("t5" -> ty.t5, "t4" -> ty.t4, "t3" -> ty.t3, "t2" -> ty.t2,
          "uni" -> ty.uni).foreach { case (n, df) =>
        df.write.mode("overwrite").parquet(lm5PartPath(n))
      }
      lm5ModelFromTypes(lm5StagedTypes(spark)).consts
        .coalesce(1).write.mode("overwrite").parquet(lm5PartPath("consts"))
    }

  /** The RESIDENT model: staged type tables + the staged consts row —
    * no corpus pass, no count-of-counts job over fresh extraction. */
  private[graft] def lm5StagedModel(spark: SparkSession, sfDir: String): Lm5Model = {
    ensureLm5Export(spark, sfDir)
    lm5ModelFromTypes(lm5StagedTypes(spark),
      stagedConsts = Some(spark.read.parquet(lm5PartPath("consts"))))
  }

  /**
   * `lm_model_export`: stage the MKN-5 model and report the artifact's
   * shape — one ALL-INTEGER row per staged part (row count + a content
   * total: Σc5 for the order-5 table, the continuation total for the
   * consts row, the type/vocab count for the distinct tables), READ
   * BACK from the fixtures so the entry checks what is actually on
   * disk. The per-row content check is `lm_score_kn5_staged`, whose
   * staged-scoring output must hash-match the full-chain oracle.
   *
   * Scale posture: the model artifact is Brants-style shardable (plain
   * hash-keyed parquet); the export is five corpus passes paid once
   * per corpus generation, after which every scoring run is one pass.
   */
  def lmModelExport(spark: SparkSession, sfDir: String): DataFrame = {
    ensureLm5Export(spark, sfDir)
    def stat(part: String, total: DataFrame => Column): DataFrame = {
      val df = spark.read.parquet(lm5PartPath(part))
      df.agg(count(lit(1)).as("n_rows"), total(df).as("total"))
        .select(lit(part).as("part"), col("n_rows"), col("total"))
    }
    val nRows = (df: DataFrame) => count(lit(1))
    stat("t5", _ => sum("c5"))
      .unionByName(stat("t4", nRows))
      .unionByName(stat("t3", nRows))
      .unionByName(stat("t2", nRows))
      .unionByName(stat("uni", nRows))
      .unionByName(stat("consts", _ => max("btot")))
  }

  /** `lm_score_kn5_staged`: the MKN-5 rung at MARGINAL cost — the
    * [[lm5ScorePlan]] scoring tail over the RESIDENT staged model, so
    * a scoring run pays one corpus gram pass + the nine model joins
    * instead of ~two full model builds. Oracle = [[lmScoreKn5Sql]]
    * VERBATIM (the staged scores must hash-match the full chain — the
    * knn_join_sharded discipline). */
  def lmScoreKn5Staged(spark: SparkSession, sfDir: String): DataFrame =
    lm5ScorePlan(Tables.documents(spark, sfDir), "doc_id", "text",
      lm5StagedModel(spark, sfDir))

  // ---- incremental LM model maintenance (corpus merges) ----

  /** Base-generation model fixture for [[lmModelDelta]]: the five type
    * tables fit over the train band MINUS the delta docs — the
    * resident state a corpus merge updates. */
  val Lm5BaseExportBase: String = graft.FixturePaths.fixture("lm5_model_base")
  private def lm5BasePartPath(part: String): String =
    s"$Lm5BaseExportBase/$part.parquet"

  /** The merge carve on the train band: every
    * [[graft.Carves.DeltaMod]]-th doc arrives with the new crawl. */
  private def lm5DeltaPred: Column =
    col("doc_id") % graft.Carves.DeltaMod === 0

  private def ensureLm5BaseExport(spark: SparkSession, sfDir: String): Unit =
    graft.FixtureExport.ensure(s"lm5base:$sfDir|f=$Lm5TrainFrac", Lm5BaseExportBase) {
      val train = Tables.documents(spark, sfDir)
        .filter(lm5TrainPredCol && !lm5DeltaPred)
      val ty = lm5TypeTables(train, "text")
      Seq("t5" -> ty.t5, "t4" -> ty.t4, "t3" -> ty.t3, "t2" -> ty.t2,
          "uni" -> ty.uni).foreach { case (n, df) =>
        df.write.mode("overwrite").parquet(lm5BasePartPath(n))
      }
    }

  /** Merge the resident base type tables with the delta docs' freshly
    * counted types: raw 5-gram position counts are ADDITIVE (sum per
    * gram — the context-key columns are functions of the gram, so
    * grouping on all four keys groups exactly by g12345), and the
    * distinct-type tables merge by union-distinct — so the merged
    * tables equal a full re-fit EXACTLY, which is what the oracle (and
    * LmKn5Spec's bit-for-bit score proof) checks. */
  private[graft] def lm5MergedTypes(spark: SparkSession, sfDir: String): Lm5Types = {
    ensureLm5BaseExport(spark, sfDir)
    val delta = Tables.documents(spark, sfDir)
      .filter(lm5TrainPredCol && lm5DeltaPred)
    val dty = lm5TypeTables(delta, "text")
    Lm5Types(
      spark.read.parquet(lm5BasePartPath("t5")).unionByName(dty.t5)
        .groupBy("g12345", "g1234", "g2345", "g234").agg(sum("c5").as("c5")),
      spark.read.parquet(lm5BasePartPath("t4")).unionByName(dty.t4).distinct(),
      spark.read.parquet(lm5BasePartPath("t3")).unionByName(dty.t3).distinct(),
      spark.read.parquet(lm5BasePartPath("t2")).unionByName(dty.t2).distinct(),
      spark.read.parquet(lm5BasePartPath("uni")).unionByName(dty.uni).distinct())
  }

  /** Bridge for LmKn5Spec: score the corpus against the model
    * ASSEMBLED FROM THE MERGED TYPE TABLES — must equal the
    * full-rebuild scores bit-for-bit (the delta-merge correctness
    * proof at the score level, not just the stat level). */
  private[graft] def lm5ScoreFromMergedTypes(spark: SparkSession,
      sfDir: String): DataFrame =
    lm5ScorePlan(Tables.documents(spark, sfDir), "doc_id", "text",
      lm5ModelFromTypes(lm5MergedTypes(spark, sfDir)))

  /**
   * `lm_model_delta`: incremental maintenance for the ONE fitted
   * family that still paid a full corpus re-count per merge (r14
   * verdict missing #3 — signatures, assignments, signals, and
   * centroids all have delta paths; the LM model did not). When the
   * train corpus grows by a crawl, only the DELTA docs' grams are
   * counted (the sole corpus-touching pass, and it is delta-sized);
   * the resident base type tables merge by key — counts add, distinct
   * types union — and every score-ready model aggregate re-derives
   * from the merged tables (model-sized work). Emits the
   * [[lmModelExport]] stat shape over the MERGED tables; oracle =
   * [[lmModelExportSql]] VERBATIM — the merged model must equal
   * refit-from-scratch EXACTLY (the knn_join_sharded discipline).
   *
   * Scale posture: at 100 TB the full refit is five corpus passes; the
   * merge is five delta passes + model-sized shuffles keyed by gram
   * hash (Brants-style shardable). The count-of-counts and discounts
   * re-derive from the merged tables, so incremental maintenance
   * never approximates the discount estimators.
   */
  def lmModelDelta(spark: SparkSession, sfDir: String): DataFrame = {
    val ty = lm5MergedTypes(spark, sfDir)
    def stat(part: String, df: DataFrame, total: Column): DataFrame =
      df.agg(count(lit(1)).as("n_rows"), total.as("total"))
        .select(lit(part).as("part"), col("n_rows"), col("total"))
    stat("t5", ty.t5, sum("c5"))
      .unionByName(stat("t4", ty.t4, count(lit(1))))
      .unionByName(stat("t3", ty.t3, count(lit(1))))
      .unionByName(stat("t2", ty.t2, count(lit(1))))
      .unionByName(stat("uni", ty.uni, count(lit(1))))
      .unionByName(
        // the consts row a refit derives: btot = Σ continuation counts
        // over merged-t2 grouped by g5 = |merged t2|
        ty.t2.agg(count(lit(1)).cast("long").as("total"))
          .select(lit("consts").as("part"), lit(1L).as("n_rows"), col("total")))
  }

  /**
   * `lm_ladder_eval`: the LM ladder's held-out scoreboard — per
   * held-out document (the shared hash band's complement, restricted
   * to docs long enough to carry a 5-gram), which NORMALIZED rung
   * assigns it the higher per-position log-likelihood: the
   * interpolated-KN trigram or the modified-KN 5-gram. Both scores are
   * proper mean-ln-probabilities over the SAME train band, so the
   * per-doc comparison is the standard held-out surprisal contest;
   * stupid backoff is deliberately absent (its scores are α-scaled
   * ratios, not likelihoods — ordering-only, which the specs compare
   * separately). ALL-INTEGER output (win/tie counts), so the oracle
   * hash has zero float surface — the per-doc scores themselves are
   * bit-identical across engines (both entries hash-green), making the
   * comparisons exact.
   *
   * Scale posture: two already-bounded scoring plans joined doc-keyed,
   * one global integer aggregate.
   */
  def lmLadderEval(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val trainPred = graft.operators.Corpus.hashUniform(
      concat(lit(Lm5Seed + ":"), col("doc_id").cast("string"))) < Lm5TrainFrac
    val kn = lmScoreKn(docs, "doc_id", "text", trainPred)
      .select(col("doc_id"), col("lm_kn_score"))
    // the 5-gram rung reads the STAGED scores (resident model — the
    // r13 ladder rebuilt BOTH rungs' models from scratch per eval);
    // the trigram rung's in-plan build is the cheap one (~1.6 s)
    val kn5 = lmScoreKn5Staged(spark, sfDir)
      .filter(col("n_5grams") > 0)
      .select(col("doc_id"), col("lm_kn5_score"))
    docs.filter(!trainPred).select(col("doc_id"))
      .join(kn, Seq("doc_id")).join(kn5, Seq("doc_id"))
      .agg(count(lit(1)).as("n_held_out"),
        sum(when(col("lm_kn5_score") > col("lm_kn_score"), 1L).otherwise(0L))
          .as("kn5_wins"),
        sum(when(col("lm_kn_score") > col("lm_kn5_score"), 1L).otherwise(0L))
          .as("kn3_wins"),
        sum(when(col("lm_kn5_score") === col("lm_kn_score"), 1L).otherwise(0L))
          .as("ties"))
  }

  /**
   * `lm_rung_autotune`: close the ladder's loop the way probe/tier
   * did — per corpus, CHOOSE the scoring rung from the
   * [[lmLadderEval]] scoreboard instead of printing it. Policy:
   * majority of decided (non-tie) held-out contests WITH a margin —
   * the winner must lead by more than 10% of the decided count
   * (`|kn5 − kn3| · 10 > kn5 + kn3`, integer arithmetic: zero float
   * surface) — else the board is near-tied and the pick falls back to
   * the TRIGRAM rung flagged `met = 0` (the cheapest-tier fallback
   * rule: kn3's model build is ~5× cheaper, so an undecidable board
   * never pays the 5-gram). Pins the honest sf-dependent flip the
   * ladder measured: the 5-gram wins at sf0.01, the trigram at sf0.1
   * — higher order needs more data (spec-asserted).
   */
  def lmRungAutotune(spark: SparkSession, sfDir: String): DataFrame =
    lm5RungPick(lmLadderEval(spark, sfDir))

  /** Where [[lmBoardExport]] stages the measured ladder board — the
    * decision-board fixture discipline (`tier_report_export`'s twin on
    * the LM family): the held-out contest runs once per corpus
    * generation; every re-tune re-reads the one resident row. */
  val LmBoardExportPath: String = graft.FixturePaths.fixture("lm_board.parquet")

  private def ensureLmBoardExport(spark: SparkSession, sfDir: String): Unit =
    graft.FixtureExport.ensure(s"lmboard:$sfDir|f=$Lm5TrainFrac", LmBoardExportPath) {
      lmLadderEval(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(LmBoardExportPath)
    }

  /**
   * `lm_board_export`: stage the ladder's held-out scoreboard once per
   * (JVM, corpus) and read it back. Oracle = [[lmLadderEvalSql]]
   * VERBATIM — the staged row must hash-match the full two-rung
   * contest, so the fixture's content is value-checked.
   */
  def lmBoardExport(spark: SparkSession, sfDir: String): DataFrame = {
    ensureLmBoardExport(spark, sfDir)
    spark.read.parquet(LmBoardExportPath)
  }

  /**
   * `lm_rung_autotune_staged`: the rung pick at its real MARGINAL cost
   * — [[lm5RungPick]] over the RESIDENT staged board (one all-integer
   * row) instead of re-running both scoring rungs per invocation (the
   * r14 verdict's missing #2: the in-plan autotune re-measures the
   * ~5 s ladder inside the pick). The in-plan form stays as the
   * measure-and-pick cross-check.
   */
  def lmRungAutotuneStaged(spark: SparkSession, sfDir: String): DataFrame = {
    ensureLmBoardExport(spark, sfDir)
    lm5RungPick(spark.read.parquet(LmBoardExportPath))
  }

  /** The pick itself over a (n_held_out, kn5_wins, kn3_wins, ties)
    * board — exposed so the spec pins the policy on synthetic boards
    * (margin met both ways, near-tied fallback). */
  private[graft] def lm5RungPick(board: DataFrame): DataFrame = {
    val decided = col("kn5_wins") + col("kn3_wins")
    val margin = abs(col("kn5_wins") - col("kn3_wins")) * lit(10L) > decided
    board.select(
      col("n_held_out"), col("kn5_wins"), col("kn3_wins"), col("ties"),
      when(margin, when(col("kn5_wins") > col("kn3_wins"), lit("kn5"))
          .otherwise(lit("kn3")))
        .otherwise(lit("kn3")).as("chosen_rung"),
      when(margin, lit(1L)).otherwise(lit(0L)).as("met"))
  }

  /** The margin-pick SELECT over a `board` CTE already in scope —
    * shared verbatim by the in-plan and staged rung-autotune oracles
    * AND (as the `picked` CTE) by `lm_score_autotuned`'s, so the
    * policy cannot drift between the decision and its execution. */
  private def lmRungPickBody: String =
    s"""SELECT n_held_out, kn5_wins, kn3_wins, ties,
       |  CASE WHEN ABS(kn5_wins - kn3_wins) * 10 > (kn5_wins + kn3_wins)
       |       THEN CASE WHEN kn5_wins > kn3_wins THEN 'kn5' ELSE 'kn3' END
       |       ELSE 'kn3' END AS chosen_rung,
       |  CAST(CASE WHEN ABS(kn5_wins - kn3_wins) * 10 > (kn5_wins + kn3_wins)
       |       THEN 1 ELSE 0 END AS BIGINT) AS met
       |FROM board""".stripMargin

  private def lmRungPickSql(boardCte: String): String =
    s"""WITH $boardCte
       |$lmRungPickBody""".stripMargin

  /** Oracle: the ladder chain referenced once + the identical integer
    * margin pick (the `ann_tier_autotune` pattern). */
  def lmRungAutotuneSql: String =
    lmRungPickSql(s"board AS MATERIALIZED (\n${lmLadderEvalSql}\n)")

  /** Oracle for the staged pick: the STAGED board parquet + the
    * identical margin SQL — no ladder chain (that absence is the
    * point). */
  def lmRungAutotuneStagedSql: String =
    lmRungPickSql(
      s"board AS (SELECT * FROM read_parquet('$LmBoardExportPath/*.parquet'))")

  /**
   * `lm_score_autotuned`: the ladder's measure → decide → EXECUTE loop
   * closed — score the corpus with the rung the RESIDENT staged board
   * picked ([[lm5RungPick]] over [[LmBoardExportPath]], the
   * `lm_rung_autotune_staged` decision verbatim), kn5 served off the
   * staged model ([[lmScoreKn5Staged]]), kn3 as the in-plan trigram
   * chain. One uniform (doc_id, n_grams, lm_score, rung) surface so a
   * perplexity-filter consumer is rung-agnostic. The honest
   * sf-dependent flip the board pins means BOTH branches are exercised
   * by the 3-SF gate (kn5 at sf0.01, the kn3 fallback at sf0.1).
   *
   * Scale posture: the decision is one resident-board row head(); the
   * corpus work is exactly the chosen rung's scoring pass — the 5-gram
   * model is only ever built (once, staged) when the board says it
   * earns its cost.
   */
  def lmScoreAutotuned(spark: SparkSession, sfDir: String): DataFrame = {
    val rung = lmRungAutotuneStaged(spark, sfDir).head().getAs[String]("chosen_rung")
    val scores =
      if (rung == "kn5")
        lmScoreKn5Staged(spark, sfDir).select(col("doc_id"),
          col("n_5grams").as("n_grams"), col("lm_kn5_score").as("lm_score"))
      else
        lmScoreKnQuery(spark, sfDir).select(col("doc_id"),
          col("n_trigrams").as("n_grams"), col("lm_kn_score").as("lm_score"))
    scores.withColumn("rung", lit(rung))
  }

  /** Oracle: the staged board + the pick SELECT as the `picked` CTE
    * (shared verbatim with both autotune oracles), then both rung
    * chains nested once each with a cross-joined pick filter — the
    * engine-side branch re-expressed as data-dependent SQL, so
    * whichever rung the board picks, the values must match that
    * rung's full chain. */
  def lmScoreAutotunedSql: String =
    s"""WITH board AS (SELECT * FROM read_parquet('$LmBoardExportPath/*.parquet')),
       |picked AS MATERIALIZED (
       |$lmRungPickBody
       |),
       |kn AS (SELECT doc_id, n_trigrams, lm_kn_score FROM (
       |${lmScoreKnSql}
       |)),
       |kn5 AS (SELECT doc_id, n_5grams, lm_kn5_score FROM (
       |${lmScoreKn5Sql}
       |))
       |SELECT k.doc_id, k.n_trigrams AS n_grams, k.lm_kn_score AS lm_score,
       |       p.chosen_rung AS rung
       |FROM kn k CROSS JOIN picked p WHERE p.chosen_rung = 'kn3'
       |UNION ALL
       |SELECT k5.doc_id, k5.n_5grams AS n_grams, k5.lm_kn5_score AS lm_score,
       |       p.chosen_rung AS rung
       |FROM kn5 k5 CROSS JOIN picked p WHERE p.chosen_rung = 'kn5'""".stripMargin

  /** Oracle: both rung chains nested verbatim, the shared sha-256
    * band's complement, the same integer win/tie aggregate. */
  def lmLadderEvalSql: String =
    s"""WITH kn AS MATERIALIZED (
       |  SELECT doc_id, lm_kn_score FROM (
       |${lmScoreKnSql}
       |  )),
       |kn5 AS MATERIALIZED (
       |  SELECT doc_id, lm_kn5_score FROM (
       |${lmScoreKn5Sql}
       |  ) WHERE n_5grams > 0),
       |held AS (
       |  SELECT doc_id FROM documents
       |  WHERE ('0x' || substr(sha256('$Lm5Seed:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
       |      / 4294967296.0 >= $Lm5TrainFrac)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_held_out,
       |  CAST(COUNT(*) FILTER (WHERE kn5.lm_kn5_score > kn.lm_kn_score) AS BIGINT) AS kn5_wins,
       |  CAST(COUNT(*) FILTER (WHERE kn.lm_kn_score > kn5.lm_kn5_score) AS BIGINT) AS kn3_wins,
       |  CAST(COUNT(*) FILTER (WHERE kn.lm_kn_score = kn5.lm_kn5_score) AS BIGINT) AS ties
       |FROM held JOIN kn USING (doc_id) JOIN kn5 USING (doc_id)""".stripMargin

  def lmScoreKn5Query(spark: SparkSession, sfDir: String): DataFrame =
    lmScoreKn5(Tables.documents(spark, sfDir), "doc_id", "text", lm5TrainPredCol)

  /** Oracle for `lm_model_export`: the model CTEs replayed, the same
    * six ALL-INTEGER (part, n_rows, total) rows. */
  def lmModelExportSql: String =
    s"""WITH ${lm5ModelSqlCtes}
       |SELECT part, n_rows, total FROM (
       |  SELECT 't5' AS part, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |         CAST(SUM(c5) AS BIGINT) AS total FROM t5
       |  UNION ALL SELECT 't4', CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM t4
       |  UNION ALL SELECT 't3', CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM t3
       |  UNION ALL SELECT 't2', CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM t2
       |  UNION ALL SELECT 'uni', CAST(v AS BIGINT), CAST(v AS BIGINT) FROM consts
       |  UNION ALL SELECT 'consts', CAST(1 AS BIGINT), CAST(btot AS BIGINT) FROM consts)""".stripMargin

  /** The model-CTE block shared by [[lmScoreKn5Sql]] and
    * [[lmModelExportSql]]: tok/band/train extraction, the five
    * per-order type tables (t5 raw counts, t4/t3/t2 distinct, vocab
    * inside `consts`), the context/continuation aggregates, and the
    * one-row count-of-counts `consts`. */
  private def lm5ModelSqlCtes: String = {
    val d = "chr(1)"
    def g(parts: Seq[String]) = parts.mkString(s" || $d || ")
    def coc(src: String, c: String, p: String) =
      s"""(SELECT COUNT(*) FILTER (WHERE $c = 1) AS ${p}1,
         |  COUNT(*) FILTER (WHERE $c = 2) AS ${p}2,
         |  COUNT(*) FILTER (WHERE $c = 3) AS ${p}3,
         |  COUNT(*) FILTER (WHERE $c = 4) AS ${p}4 FROM $src)""".stripMargin
    def cls(src: String, key: String, c: String, p: String) =
      s"""SELECT $key, COUNT(*) FILTER (WHERE $c = 1) AS ${p}1,
         |  COUNT(*) FILTER (WHERE $c = 2) AS ${p}2,
         |  COUNT(*) FILTER (WHERE $c >= 3) AS ${p}3 FROM $src GROUP BY $key"""
        .stripMargin
    s"""tok AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents),
       |band AS (
       |  SELECT doc_id,
       |    ('0x' || substr(sha256('$Lm5Seed:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
       |      / 4294967296.0 AS u
       |  FROM documents),
       |trn AS MATERIALIZED (SELECT t.doc_id, ts FROM tok t JOIN band b
       |        ON t.doc_id = b.doc_id AND b.u < $Lm5TrainFrac),
       |p5x AS MATERIALIZED (
       |  SELECT
       |    unnest(list_transform(range(1, len(ts) - 3), i ->
       |      ${g(Seq("ts[i]", "ts[i+1]", "ts[i+2]", "ts[i+3]", "ts[i+4]"))})) AS g12345,
       |    unnest(list_transform(range(1, len(ts) - 3), i ->
       |      ${g(Seq("ts[i]", "ts[i+1]", "ts[i+2]", "ts[i+3]"))})) AS g1234,
       |    unnest(list_transform(range(1, len(ts) - 3), i ->
       |      ${g(Seq("ts[i+1]", "ts[i+2]", "ts[i+3]", "ts[i+4]"))})) AS g2345,
       |    unnest(list_transform(range(1, len(ts) - 3), i ->
       |      ${g(Seq("ts[i+1]", "ts[i+2]", "ts[i+3]"))})) AS g234
       |  FROM trn),
       |t5 AS MATERIALIZED (
       |  SELECT g12345, any_value(g1234) AS g1234, any_value(g2345) AS g2345,
       |         any_value(g234) AS g234, COUNT(*) AS c5
       |  FROM p5x GROUP BY g12345),
       |o5 AS (SELECT dn.g1234, dn.d5, k.k51, k.k52, k.k53 FROM
       |  (SELECT g1234, COUNT(*) AS d5 FROM p5x GROUP BY g1234) dn
       |  JOIN (${cls("t5", "g1234", "c5", "k5")}) k USING (g1234)),
       |c4 AS MATERIALIZED (
       |  SELECT g2345, any_value(g234) AS g234, COUNT(*) AS cc4
       |  FROM t5 GROUP BY g2345),
       |o4 AS (SELECT dn.g234, dn.d4, k.k41, k.k42, k.k43 FROM
       |  (SELECT g234, COUNT(*) AS d4 FROM t5 GROUP BY g234) dn
       |  JOIN (${cls("c4", "g234", "cc4", "k4")}) k USING (g234)),
       |t4 AS MATERIALIZED (
       |  SELECT DISTINCT * FROM (SELECT
       |    unnest(list_transform(range(1, len(ts) - 2), i ->
       |      ${g(Seq("ts[i]", "ts[i+1]", "ts[i+2]", "ts[i+3]"))})) AS t4,
       |    unnest(list_transform(range(1, len(ts) - 2), i ->
       |      ${g(Seq("ts[i+1]", "ts[i+2]", "ts[i+3]"))})) AS g345,
       |    unnest(list_transform(range(1, len(ts) - 2), i ->
       |      ${g(Seq("ts[i+1]", "ts[i+2]"))})) AS g34
       |  FROM trn)),
       |c3 AS MATERIALIZED (
       |  SELECT g345, any_value(g34) AS g34, COUNT(*) AS cc3
       |  FROM t4 GROUP BY g345),
       |o3 AS (SELECT dn.g34, dn.d3, k.k31, k.k32, k.k33 FROM
       |  (SELECT g34, COUNT(*) AS d3 FROM t4 GROUP BY g34) dn
       |  JOIN (${cls("c3", "g34", "cc3", "k3")}) k USING (g34)),
       |t3 AS MATERIALIZED (
       |  SELECT DISTINCT * FROM (SELECT
       |    unnest(list_transform(range(1, len(ts) - 1), i ->
       |      ${g(Seq("ts[i]", "ts[i+1]", "ts[i+2]"))})) AS t3,
       |    unnest(list_transform(range(1, len(ts) - 1), i ->
       |      ${g(Seq("ts[i+1]", "ts[i+2]"))})) AS g45,
       |    unnest(list_transform(range(1, len(ts) - 1), i -> ts[i+1])) AS g4
       |  FROM trn)),
       |c2 AS MATERIALIZED (
       |  SELECT g45, any_value(g4) AS g4, COUNT(*) AS cc2
       |  FROM t3 GROUP BY g45),
       |o2 AS (SELECT dn.g4, dn.d2, k.k21, k.k22, k.k23 FROM
       |  (SELECT g4, COUNT(*) AS d2 FROM t3 GROUP BY g4) dn
       |  JOIN (${cls("c2", "g4", "cc2", "k2")}) k USING (g4)),
       |t2 AS MATERIALIZED (
       |  SELECT DISTINCT * FROM (SELECT
       |    unnest(list_transform(range(1, len(ts)), i ->
       |      ${g(Seq("ts[i]", "ts[i+1]"))})) AS t2,
       |    unnest(list_transform(range(1, len(ts)), i -> ts[i+1])) AS g5
       |  FROM trn)),
       |c1 AS MATERIALIZED (SELECT g5, COUNT(*) AS cc1 FROM t2 GROUP BY g5),
       |consts AS (SELECT * FROM
       |  ${coc("t5", "c5", "a")} ca,
       |  ${coc("c4", "cc4", "b")} cb,
       |  ${coc("c3", "cc3", "e")} ce,
       |  ${coc("c2", "cc2", "f")} cf,
       |  ${coc("c1", "cc1", "m")} cm,
       |  (SELECT SUM(cc1) AS btot,
       |     COUNT(*) FILTER (WHERE cc1 = 1) AS k11,
       |     COUNT(*) FILTER (WHERE cc1 = 2) AS k12,
       |     COUNT(*) FILTER (WHERE cc1 >= 3) AS k13 FROM c1) cg,
       |  (SELECT COUNT(DISTINCT t) AS v FROM
       |     (SELECT unnest(ts) AS t FROM trn)) cv)""".stripMargin
  }

  /** DuckDB twin: string grams, the shared sha-256 train band, the
    * per-order type/position aggregates and one-row count-of-counts
    * mirrored, the identical clamp + fallback discount arithmetic and
    * five-level CASE chain. Multi-referenced CTEs MATERIALIZED. */
  def lmScoreKn5Sql: String = {
    val d = "chr(1)"
    def g(parts: Seq[String]) = parts.mkString(s" || $d || ")
    def discSql(n1: String, n2: String, n3: String, n4: String)
        : (String, String, String) = {
      val y = s"CAST($n1 AS DOUBLE) / (CAST($n1 AS DOUBLE) + 2.0 * CAST($n2 AS DOUBLE))"
      (s"CASE WHEN $n1 > 0 THEN LEAST(GREATEST(1.0 - 2.0 * $y * CAST($n2 AS DOUBLE) / CAST($n1 AS DOUBLE), 0.0), 1.0) ELSE 0.5 END",
       s"CASE WHEN $n1 > 0 AND $n2 > 0 THEN LEAST(GREATEST(2.0 - 3.0 * $y * CAST($n3 AS DOUBLE) / CAST($n2 AS DOUBLE), 0.0), 2.0) ELSE 1.0 END",
       s"CASE WHEN $n1 > 0 AND $n3 > 0 THEN LEAST(GREATEST(3.0 - 4.0 * $y * CAST($n4 AS DOUBLE) / CAST($n3 AS DOUBLE), 0.0), 3.0) ELSE 1.5 END")
    }
    val (d51, d52, d53) = discSql("a1", "a2", "a3", "a4")
    val (d41, d42, d43) = discSql("b1", "b2", "b3", "b4")
    val (d31, d32, d33) = discSql("e1", "e2", "e3", "e4")
    val (d21, d22, d23) = discSql("f1", "f2", "f3", "f4")
    val (d11, d12, d13) = discSql("m1", "m2", "m3", "m4")
    def num(c: String, dd: (String, String, String)) =
      s"""GREATEST(CAST(COALESCE($c, 0) AS DOUBLE) - CASE WHEN COALESCE($c, 0) = 1 THEN ${dd._1}
         |        WHEN COALESCE($c, 0) = 2 THEN ${dd._2} ELSE ${dd._3} END, 0.0)""".stripMargin
    def gm(dd: (String, String, String), k1: String, k2: String, k3: String) =
      s"(${dd._1} * CAST($k1 AS DOUBLE) + ${dd._2} * CAST($k2 AS DOUBLE) + ${dd._3} * CAST($k3 AS DOUBLE))"
    val p1 =
      s"""((${num("cc1", (d11, d12, d13))}
         | + ${gm((d11, d12, d13), "k11", "k12", "k13")} * (1.0 / (CAST(v AS DOUBLE) + 1.0)))
         | / CAST(btot AS DOUBLE))""".stripMargin
    def lvl(dn: String, c: String, dd: (String, String, String),
        k1: String, k2: String, k3: String, lower: String) =
      s"""CASE WHEN $dn IS NOT NULL THEN
         | (${num(c, dd)} + ${gm(dd, k1, k2, k3)} * ($lower)) / CAST($dn AS DOUBLE)
         | ELSE ($lower) END""".stripMargin
    val p2 = lvl("d2", "cc2", (d21, d22, d23), "k21", "k22", "k23", p1)
    val p3 = lvl("d3", "cc3", (d31, d32, d33), "k31", "k32", "k33", p2)
    val p4 = lvl("d4", "cc4", (d41, d42, d43), "k41", "k42", "k43", p3)
    val p5 = lvl("d5", "c5", (d51, d52, d53), "k51", "k52", "k53", p4)
    def coc(src: String, c: String, p: String) =
      s"""(SELECT COUNT(*) FILTER (WHERE $c = 1) AS ${p}1,
         |  COUNT(*) FILTER (WHERE $c = 2) AS ${p}2,
         |  COUNT(*) FILTER (WHERE $c = 3) AS ${p}3,
         |  COUNT(*) FILTER (WHERE $c = 4) AS ${p}4 FROM $src)""".stripMargin
    def cls(src: String, key: String, c: String, p: String) =
      s"""SELECT $key, COUNT(*) FILTER (WHERE $c = 1) AS ${p}1,
         |  COUNT(*) FILTER (WHERE $c = 2) AS ${p}2,
         |  COUNT(*) FILTER (WHERE $c >= 3) AS ${p}3 FROM $src GROUP BY $key"""
        .stripMargin
    s"""WITH ${lm5ModelSqlCtes},
       |grams AS (
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, len(ts) - 3), i ->
       |      ${g(Seq("ts[i]", "ts[i+1]", "ts[i+2]", "ts[i+3]", "ts[i+4]"))})) AS g12345,
       |    unnest(list_transform(range(1, len(ts) - 3), i ->
       |      ${g(Seq("ts[i]", "ts[i+1]", "ts[i+2]", "ts[i+3]"))})) AS g1234,
       |    unnest(list_transform(range(1, len(ts) - 3), i ->
       |      ${g(Seq("ts[i+1]", "ts[i+2]", "ts[i+3]", "ts[i+4]"))})) AS g2345,
       |    unnest(list_transform(range(1, len(ts) - 3), i ->
       |      ${g(Seq("ts[i+1]", "ts[i+2]", "ts[i+3]"))})) AS g234,
       |    unnest(list_transform(range(1, len(ts) - 3), i ->
       |      ${g(Seq("ts[i+2]", "ts[i+3]", "ts[i+4]"))})) AS g345,
       |    unnest(list_transform(range(1, len(ts) - 3), i ->
       |      ${g(Seq("ts[i+2]", "ts[i+3]"))})) AS g34,
       |    unnest(list_transform(range(1, len(ts) - 3), i ->
       |      ${g(Seq("ts[i+3]", "ts[i+4]"))})) AS g45,
       |    unnest(list_transform(range(1, len(ts) - 3), i -> ts[i+3])) AS g4,
       |    unnest(list_transform(range(1, len(ts) - 3), i -> ts[i+4])) AS g5
       |  FROM tok),
       |j AS (
       |  SELECT doc_id, t5.c5, o5.d5, o5.k51, o5.k52, o5.k53,
       |         c4.cc4, o4.d4, o4.k41, o4.k42, o4.k43,
       |         c3.cc3, o3.d3, o3.k31, o3.k32, o3.k33,
       |         c2.cc2, o2.d2, o2.k21, o2.k22, o2.k23,
       |         c1.cc1, consts.*
       |  FROM grams
       |  LEFT JOIN t5 ON grams.g12345 = t5.g12345
       |  LEFT JOIN o5 ON grams.g1234 = o5.g1234
       |  LEFT JOIN c4 ON grams.g2345 = c4.g2345
       |  LEFT JOIN o4 ON grams.g234 = o4.g234
       |  LEFT JOIN c3 ON grams.g345 = c3.g345
       |  LEFT JOIN o3 ON grams.g34 = o3.g34
       |  LEFT JOIN c2 ON grams.g45 = c2.g45
       |  LEFT JOIN o2 ON grams.g4 = o2.g4
       |  LEFT JOIN c1 ON grams.g5 = c1.g5
       |  , consts),
       |s AS (
       |  SELECT doc_id, COUNT(*) AS n_5grams,
       |    FLOOR(AVG(ln($p5)) * 10000) / 10000 AS lm_kn5_score
       |  FROM j GROUP BY doc_id)
       |SELECT d.doc_id, COALESCE(s.n_5grams, 0) AS n_5grams,
       |  COALESCE(s.lm_kn5_score, 0.0) AS lm_kn5_score
       |FROM documents d LEFT JOIN s ON s.doc_id = d.doc_id""".stripMargin
  }

  val lmScoreSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents),
      |freq AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
      |tot AS (SELECT SUM(c) AS n FROM freq)
      |SELECT doc_id, COUNT(*) AS n_tokens,
      |  FLOOR(AVG(ln(c / n)) * 10000) / 10000 AS lm_score
      |FROM tok JOIN freq USING (t), tot
      |GROUP BY doc_id""".stripMargin

  // ---- TF-IDF top terms (corpus keyword extraction) ----

  /**
   * Per-document top-k terms by smoothed TF-IDF
   * (`tf * (ln((N+1)/(df+1)) + 1)`, the sklearn smoothing so a term in
   * every doc still scores > 0) — the standard corpus-exploration /
   * topic-tagging signal next to the quality filters.
   *
   * Scale: (doc, term) term frequencies are ONE partial-agg shuffle
   * over the token stream; document frequencies a second partial agg
   * over that (already deduplicated) table; N rides in as a broadcast
   * 1-row literal. The ranking window partitions by doc_id and sees
   * only a doc's distinct terms — bounded by doc length, never by
   * corpus size. Scores are floor-truncated to 4dp BEFORE ranking and
   * ties break on the term string, so the cut is total and
   * engine-portable (a raw-double order could flip on a last-ulp ln
   * difference between engines; the floored order only at an exact
   * 1e-4 boundary — SURVEY §5).
   */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("t"))
    val tf = tok.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "t").crossJoin(broadcast(n))
      .withColumn("score",
        floor(col("tf") * (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1)
          * 10000) / 10000)
    val win = Window.partitionBy("doc_id").orderBy(col("score").desc, col("t").asc)
    scored.withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("t").as("term"), col("score"))
  }

  def tfidfQuery(spark: SparkSession, sfDir: String): DataFrame =
    tfidfTopTerms(Tables.documents(spark, sfDir), "doc_id", "text")

  val tfidfSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents),
      |tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY doc_id, t),
      |dfreq AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT doc_id, t,
      |    FLOOR(tf * (ln(CAST(n_docs + 1 AS DOUBLE) / (df + 1)) + 1) * 10000) / 10000 AS score
      |  FROM tf JOIN dfreq USING (t), n),
      |r AS (SELECT doc_id, t, score,
      |        ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, t) AS rank
      |      FROM scored)
      |SELECT doc_id, CAST(rank AS INTEGER) AS rank, t AS term, score
      |FROM r WHERE rank <= 3""".stripMargin

  // ---- repetition metrics (Gopher-style quality filters) ----

  /**
   * Per-document repetition: duplicate-token fraction and the share
   * of all bigrams taken by the single most frequent bigram — the
   * standard signals for filtering boilerplate/degenerate text.
   * Entirely map-side: codegen'd higher-order array functions, no
   * explode/shuffle (the O(bigrams^2) per-doc count is cheap against
   * a shuffle of every bigram). Ratios floor-truncated (SURVEY §5).
   */
  def textRepetition(spark: SparkSession, sfDir: String): DataFrame =
    repetitionSignals(Tables.documents(spark, sfDir), "doc_id", "text")

  /** Per-doc repetition signals over any (id, text) frame (map-only;
    * the [[textRepetition]] entry's core, shared with the Gopher-rule
    * repetition filter). */
  /** Bigrams by zipping the token array with its own tail (the
    * lm_score_bigram trick): zip_with evaluates each slice ONCE — the
    * transform-over-positions form it replaces re-evaluated the whole
    * split per lambda element, O(tokens²) string work per doc (guard:
    * slice len -1 on a 1-token doc would throw). */
  private[text] def bigramsOf(toks: Column): Column =
    when(size(toks) >= 2,
      zip_with(slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
        (x, y) => concat(x, lit(" "), y)))

  /** Top-gram fraction in ONE aggregate pass over the SORTED gram
    * array (longest equal run = top gram count; run count rides the
    * accumulator so size needs no second evaluation of the array):
    * O(n log n) against the O(n · distinct) per-gram filter it
    * replaces. */
  private[text] def topRunFrac(arr: Column): Column =
    aggregate(array_sort(arr),
      struct(lit(0).as("best"), lit(0).as("cur"), lit("").as("prev"), lit(0).as("cnt")),
      (acc, x) => {
        val cur = when(x === acc("prev"), acc("cur") + 1).otherwise(lit(1))
        struct(greatest(acc("best"), cur).as("best"), cur.as("cur"), x.as("prev"),
          (acc("cnt") + 1).as("cnt"))
      },
      acc => floor(acc("best").cast("double") / acc("cnt") * 10000) / 10000)

  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val bigrams = bigramsOf(toks)
    val topFrac = topRunFrac(col("b"))
    docs
      .select(col(idCol).as("doc_id"), size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_distinct"), bigrams.as("b"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        (floor((lit(1.0) - col("n_distinct").cast("double") / col("n_tokens")) * 10000) / 10000)
          .as("dup_token_frac"),
        topFrac.as("top_bigram_frac"))
  }

  val textRepetitionSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
      |b AS (
      |  SELECT doc_id, len(toks) AS n_tokens, len(list_distinct(toks)) AS n_distinct,
      |    list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS grams
      |  FROM t)
      |SELECT doc_id,
      |  CAST(n_tokens AS INTEGER) AS n_tokens,
      |  FLOOR((1.0 - CAST(n_distinct AS DOUBLE) / n_tokens) * 10000) / 10000 AS dup_token_frac,
      |  CASE WHEN n_tokens >= 2 THEN
      |    FLOOR(CAST(list_max(list_transform(list_distinct(grams),
      |            g -> len(list_filter(grams, x -> x = g)))) AS DOUBLE)
      |          / len(grams) * 10000) / 10000
      |  END AS top_bigram_frac
      |FROM b""".stripMargin

  // ---- Gopher repetition filter ----

  /** Gopher's repetition caps: drop when the duplicated-token fraction
    * exceeds 0.3, else when the top-bigram fraction exceeds 0.18
    * (Rae et al. 2021 repetition rules; fixed order, first failure =
    * reason — the quality_filter verdict discipline). */
  val RepDupTokenMax: Double = 0.3
  val RepTopBigramMax: Double = 0.18

  /** Keep/drop verdict from the [[repetitionSignals]] — map-only.
    * Sub-2-token docs have no bigram signal (NULL) and the rule
    * skips them, on both engines, by three-valued comparison. */
  /** First-failed repetition rule as ONE expression over a token
    * array, for fused single-pass funnels ([[graft.operators.Curate]]):
    * the same [[repetitionSignals]] sub-expressions (bigram top-run
    * fraction included) folded with the [[repetitionFilter]] rule
    * order, so the fused and staged paths cannot drift. */
  private[graft] def repetitionFailReason(toks: Column): Column = {
    val dupFrac =
      floor((lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks)) * 10000) / 10000
    val topFrac = topRunFrac(bigramsOf(toks))
    when(dupFrac > RepDupTokenMax, "dup_tokens")
      .when(topFrac > RepTopBigramMax, "top_bigram")
      .otherwise("ok")
  }

  def repetitionFilter(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    repetitionSignals(docs, idCol, textCol)
      .withColumn("fail_reason",
        when(col("dup_token_frac") > RepDupTokenMax, "dup_tokens")
          .when(col("top_bigram_frac") > RepTopBigramMax, "top_bigram")
          .otherwise("ok"))
      .select(col("doc_id"), col("dup_token_frac"), col("top_bigram_frac"),
        col("fail_reason"), (col("fail_reason") === "ok").cast("int").as("keep"))

  /** One word repeated 60 times: dup_token_frac ~0.98 → rule 1. */
  private val RepPlantDup = Seq.fill(60)("spamword").mkString(" ")

  /** 20 tokens, "xq yq" ×4 + 12 unique: dup_token_frac = 0.3 (AT the
    * cap — rule 1 passes) while top_bigram_frac = 4/19 ≈ 0.21 → rule 2
    * fires; the only reachable shape for rule 2, since k bigram copies
    * already duplicate 2k−2 tokens (possible only in short docs). */
  private val RepPlantBigram =
    "xq yq xq yq xq yq xq yq " + (1 to 12).map(i => s"uw$i").mkString(" ")

  /** Repetitive docs PLANTED in-query (the synthetic corpus has none):
    * doc_id ≡ 7 (mod 41) → the dup-token plant, ≡ 29 (mod 53) → the
    * top-bigram plant; plant order mirrors the oracle CASE. */
  def repetitionFilterQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val planted = Tables.documents(spark, sfDir).select(col("doc_id"),
      when(col("doc_id") % 41 === 7, lit(RepPlantDup))
        .when(col("doc_id") % 53 === 29, lit(RepPlantBigram))
        .otherwise(col("text")).as("text"))
    repetitionFilter(planted, "doc_id", "text")
  }

  val repetitionFilterSql: String =
    s"""WITH planted AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 41 = 7 THEN '$RepPlantDup'
       |         WHEN doc_id % 53 = 29 THEN '$RepPlantBigram'
       |         ELSE text END AS text
       |  FROM documents),
       |t AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM planted),
       |b AS (
       |  SELECT doc_id, len(toks) AS n_tokens, len(list_distinct(toks)) AS n_distinct,
       |    list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS grams
       |  FROM t),
       |sig AS (
       |  SELECT doc_id,
       |    FLOOR((1.0 - CAST(n_distinct AS DOUBLE) / n_tokens) * 10000) / 10000 AS dup_token_frac,
       |    CASE WHEN n_tokens >= 2 THEN
       |      FLOOR(CAST(list_max(list_transform(list_distinct(grams),
       |              g -> len(list_filter(grams, x -> x = g)))) AS DOUBLE)
       |            / len(grams) * 10000) / 10000
       |    END AS top_bigram_frac
       |  FROM b),
       |v AS (
       |  SELECT *,
       |    CASE WHEN dup_token_frac > $RepDupTokenMax THEN 'dup_tokens'
       |         WHEN top_bigram_frac > $RepTopBigramMax THEN 'top_bigram'
       |         ELSE 'ok' END AS fail_reason
       |  FROM sig)
       |SELECT doc_id, dup_token_frac, top_bigram_frac, fail_reason,
       |  CAST(fail_reason = 'ok' AS INTEGER) AS keep
       |FROM v""".stripMargin

  // ---- fingerprinting ----

  def docFingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    val fp = Fingerprint.doc_fingerprints(col("text"))
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      size(fp).as("n_fingerprints"),
      element_at(fp, 1).as("fp_first"),
      array_min(fp).as("fp_min"))
  }

  /**
   * DuckDB twin of the winnowing kernel (ASCII corpora: `ascii` per
   * char == the UTF-8 byte the Scala kernel hashes). The rolling
   * mod-2^64 hash is re-derived as a direct 8-byte polynomial fold in
   * HUGEINT with an explicit modulus, then shifted to signed BIGINT so
   * comparisons match JVM `Long` ordering. The winnow selection uses
   * the invariant that each window's pick IS its rightmost argmin
   * (`<=` update rule), so "collapse consecutive repeats" ==
   * sort-distinct of the per-window rightmost-argmin indices.
   */
  val docFingerprintSql: String = {
    // ((...(b0*257 + b1) % 2^64 ...)*257 + b7) % 2^64 over bytes i..i+7
    val hh = (1 until FingerprintKernels.K).foldLeft(
      "CAST(ascii(substr(text, i, 1)) AS HUGEINT)") { (acc, j) =>
      s"(($acc) * ${FingerprintKernels.Base} + ascii(substr(text, i+$j, 1))) % 18446744073709551616::HUGEINT"
    }
    val w = FingerprintKernels.W
    val k = FingerprintKernels.K
    s"""WITH h AS (
       |  SELECT doc_id,
       |    list_transform(range(1, len(text) - $k + 2), i ->
       |      CAST(CASE WHEN ($hh) >= 9223372036854775808::HUGEINT
       |                THEN ($hh) - 18446744073709551616::HUGEINT
       |                ELSE ($hh) END AS BIGINT)) AS hs
       |  FROM documents),
       |w AS (
       |  SELECT doc_id, hs,
       |    CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
       |      WHEN len(hs) <= $w
       |      THEN [len(hs) - list_position(list_reverse(hs), list_aggregate(hs, 'min')) + 1]
       |      ELSE list_transform(range(1, len(hs) - $w + 2), s ->
       |        s - 1 + ($w - list_position(list_reverse(hs[s:s+${w - 1}]),
       |                                    list_aggregate(hs[s:s+${w - 1}], 'min')) + 1))
       |    END AS sel
       |  FROM h),
       |f AS (SELECT doc_id, list_sort(list_distinct(sel)) AS sel2, hs FROM w)
       |SELECT doc_id, CAST(len(sel2) AS INTEGER) AS n_fingerprints,
       |  hs[sel2[1]] AS fp_first,
       |  list_aggregate(list_transform(sel2, i -> hs[i]), 'min') AS fp_min
       |FROM f""".stripMargin
  }
}
