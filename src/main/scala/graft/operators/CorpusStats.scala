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
