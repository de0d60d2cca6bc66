package graft.text

import org.apache.spark.sql.{Column, SparkSession}

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
}
