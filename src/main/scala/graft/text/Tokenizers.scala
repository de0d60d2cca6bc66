package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Dispatcher for the TRAINER-FACING token counter — the one budget
 * the packing/fertility operators must agree on with the model being
 * trained. Precedence: imported SentencePiece-unigram vocab
 * (`bpe.unigramVocabPath`, the Llama/T5 family) > imported BPE merges
 * (`bpe.vocabPath`, the GPT family) > corpus-fit BPE. Entries whose
 * NAME pins a family (`token_count_bpe`, `token_count_unigram`) never
 * dispatch — only "the trainer's tokenizer" semantics do
 * (tokenizer_fertility, seq_pack_bpe).
 *
 * Both families share the oracle discipline: a bounded distinct-word
 * -> piece-count dictionary fixture the DuckDB twin replays, so the
 * handle carries the active fixture path and the matching
 * pretokenization SQL fragment alongside the codegen'd counter. With
 * no import configured the emitted SQL is byte-identical to the
 * pre-dispatch round-7 strings (the "default-path hashes unchanged"
 * contract).
 */
object Tokenizers {

  /** The active counter + what its oracle needs to replay it. */
  final case class Handle(
      count: Column => Column,
      dictPath: String,
      wordsSql: String)

  /** Resolve (and fixture-export) the active trainer-facing model. */
  def active(spark: SparkSession, sfDir: String,
      cfg: graft.config.GraftConfig = graft.config.GraftConfig.active): Handle =
    if (cfg.bpe.unigramVocabPath.nonEmpty) {
      val m = Unigram.ensureVocabExported(spark, sfDir, cfg)
      Handle(c => Unigram.unigram_count(c, m),
        Unigram.VocabExportPath, Unigram.wordsSqlFragment(spmStyle = true))
    } else {
      val m = Bpe.ensureVocabExported(spark, sfDir)
      Handle(c => Bpe.bpe_count(c, m),
        Bpe.VocabExportPath, Unigram.wordsSqlFragment(spmStyle = false))
    }

  /** Oracle-side resolution (no SparkSession — SQL builders call this
    * so `oracleSql` stays a pure string map). */
  def activeDictPath(
      cfg: graft.config.GraftConfig = graft.config.GraftConfig.active): String =
    if (cfg.bpe.unigramVocabPath.nonEmpty) Unigram.VocabExportPath
    else Bpe.VocabExportPath

  def activeWordsSql(
      cfg: graft.config.GraftConfig = graft.config.GraftConfig.active): String =
    Unigram.wordsSqlFragment(spmStyle = cfg.bpe.unigramVocabPath.nonEmpty)

  /** Word->count dictionary fixture for BOTH families over the
    * planted comparison corpus (the per-entry export discipline:
    * the shared raw-corpus fixtures cannot describe planted words). */
  val CompareDictPath = graft.FixturePaths.fixture("tokcmp_dict.parquet")

  /** Vocab-external words PLANTED into the comparison corpus (the
    * synthetic corpus has only ~31 distinct words, which every
    * family covers at one piece per word — no divergence to report).
    * Concatenations and repetitions of corpus words force real
    * subword segmentation where BPE's greedy merge order and
    * unigram's Viterbi objective genuinely disagree; models stay
    * fitted on the RAW corpus, the "trained on the base corpus,
    * applied to new crawl text" posture. */
  private[graft] def plantedCompareText: Column =
    when(col("doc_id") % 13 === 4,
      concat(col("text"), lit(" tablescanmergejoin"), (col("doc_id") % 7).cast("string")))
      .when(col("doc_id") % 13 === 9, concat(col("text"), lit(" scanscanscanscan")))
      .when(col("doc_id") % 13 === 11, concat(col("text"), lit(" windowindowindow")))
      .otherwise(col("text"))

  /**
   * `tokenizer_compare`: the per-family token-budget report — how many
   * tokens the SAME corpus costs under whitespace, BPE, and
   * SentencePiece-unigram counting, per language. This is the number
   * the unigram rung exists to produce: a packer or data-mix budget
   * parameterized by the wrong tokenizer family is 10-30% off
   * (SURVEY §2), and this report measures that gap directly instead
   * of asserting it. `fertility` = family tokens per whitespace word
   * (whitespace's own row is the 1.0 baseline, making the report
   * self-calibrating).
   *
   * Scale posture: ONE map-only pass computes all three per-doc
   * counts side by side (two codegen'd counter expressions + char
   * arithmetic — no token arrays materialized), into one partial agg
   * over the langs-sized cell table; the family unpivot explodes the
   * langs-sized aggregate, not the corpus. The oracle replays both
   * families from one bounded distinct-word -> (n_bpe, n_uni)
   * dictionary exported here.
   */
  def tokenizerCompare(spark: SparkSession, sfDir: String): DataFrame = {
    val bpeModel = Bpe.modelFor(spark, sfDir)
    val uniModel = Unigram.modelFor(spark, sfDir)
    val planted = Tables.documents(spark, sfDir)
      .select(col("lang"), col("doc_id"), plantedCompareText.as("text"))
    graft.FixtureExport.ensure(s"tokcmp:$sfDir", CompareDictPath) {
      planted.select(explode(regexp_extract_all(lower(col("text")),
          lit(TextAnalysis.BpeishPattern), lit(0))).as("word"))
        .distinct()
        .select(col("word"),
          Bpe.bpe_count(col("word"), bpeModel).as("n_bpe"),
          Unigram.unigram_count(col("word"), uniModel).as("n_uni"))
        .coalesce(1).write.mode("overwrite").parquet(CompareDictPath)
    }
    compareReport(planted, bpeModel, uniModel)
  }

  /** The three-family per-language aggregate over any (lang, text)
    * frame with FIXED models — the ramping portion of
    * [[tokenizerCompare]] (the trainer's tokenizer is a constant at
    * serving time), shared with the scale ramp. */
  def compareReport(docs: DataFrame, bpeModel: Bpe.BpeModel,
      uniModel: Unigram.UnigramModel): DataFrame = {
    val g = docs.select(col("lang"),
        (length(col("text")) - length(translate(col("text"), " ", "")) + 1)
          .cast("long").as("ws"),
        Bpe.bpe_count(col("text"), bpeModel).cast("long").as("bpe"),
        Unigram.unigram_count(col("text"), uniModel).cast("long").as("uni"))
      .groupBy("lang")
      .agg(count(lit(1)).as("docs"), sum("ws").as("ws_sum"),
        sum("bpe").as("bpe_sum"), sum("uni").as("uni_sum"))
    def fert(tok: Column): Column = floor(tok / col("ws_sum") * 10000) / 10000
    g.select(col("lang"), col("docs"), explode(array(
        struct(lit("whitespace").as("family"), col("ws_sum").as("tokens_sum"),
          fert(col("ws_sum")).as("fertility")),
        struct(lit("bpe").as("family"), col("bpe_sum").as("tokens_sum"),
          fert(col("bpe_sum")).as("fertility")),
        struct(lit("unigram").as("family"), col("uni_sum").as("tokens_sum"),
          fert(col("uni_sum")).as("fertility")))).as("r"))
      .select(col("lang"), col("docs"), col("r.family").as("family"),
        col("r.tokens_sum").as("tokens_sum"), col("r.fertility").as("fertility"))
  }

  /** DuckDB twin: replay the plant, join the exported two-family
    * dictionary on the shared pretokenization (corpus-fit unigram uses
    * BPE's pretokens, so one word table serves both families). Note
    * this entry pins both families to their corpus fits; the dispatch
    * semantics (`tokenizer_fertility`) are deliberately not in play —
    * the report compares families, it does not pick one. */
  def tokenizerCompareSql: String =
    s"""WITH v AS (SELECT * FROM read_parquet('$CompareDictPath/*.parquet')),
       |p AS (SELECT doc_id, lang,
       |        CASE WHEN doc_id % 13 = 4 THEN text || ' tablescanmergejoin' || (doc_id % 7)
       |             WHEN doc_id % 13 = 9 THEN text || ' scanscanscanscan'
       |             WHEN doc_id % 13 = 11 THEN text || ' windowindowindow'
       |             ELSE text END AS text
       |      FROM documents),
       |w AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '${TextAnalysis.BpeishPattern}')) AS word
       |      FROM p),
       |t AS (SELECT w.doc_id, SUM(v.n_bpe) AS bt, SUM(v.n_uni) AS ut
       |      FROM w JOIN v USING (word) GROUP BY w.doc_id),
       |d AS (SELECT doc_id, lang,
       |        CAST(len(text) - len(replace(text, ' ', '')) + 1 AS BIGINT) AS ws
       |      FROM p),
       |g AS (
       |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS docs,
       |    CAST(SUM(d.ws) AS BIGINT) AS ws_sum,
       |    CAST(SUM(COALESCE(t.bt, 0)) AS BIGINT) AS bpe_sum,
       |    CAST(SUM(COALESCE(t.ut, 0)) AS BIGINT) AS uni_sum
       |  FROM d LEFT JOIN t ON d.doc_id = t.doc_id
       |  GROUP BY lang)
       |SELECT lang, docs, 'whitespace' AS family, ws_sum AS tokens_sum,
       |  FLOOR(ws_sum / ws_sum * 10000) / 10000 AS fertility FROM g
       |UNION ALL
       |SELECT lang, docs, 'bpe' AS family, bpe_sum AS tokens_sum,
       |  FLOOR(bpe_sum / ws_sum * 10000) / 10000 AS fertility FROM g
       |UNION ALL
       |SELECT lang, docs, 'unigram' AS family, uni_sum AS tokens_sum,
       |  FLOOR(uni_sum / ws_sum * 10000) / 10000 AS fertility FROM g""".stripMargin
}
