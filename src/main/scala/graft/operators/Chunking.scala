package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Document chunking: split each document into fixed-token-budget
 * chunks with overlap — the unit-of-work transform in front of both
 * training-sequence assembly and retrieval indexing (a RAG corpus
 * indexes chunks, not documents; context-window training consumes
 * bounded spans).
 *
 * Chunk schedule: starts at 0, S, 2S, ... (stride S < C gives an
 * overlap of C - S tokens between neighbors, so no span of fewer than
 * the overlap falls across a chunk boundary unseen). A document of n
 * tokens yields 1 chunk when n <= C, else ceil((n - C) / S) + 1 — the
 * last start is the smallest multiple of S whose chunk reaches the
 * end, so no trailing chunk is fully contained in its predecessor.
 *
 * Spark posture (100 TB): MAP-ONLY — one projection computes the
 * chunk count, a generator explodes chunk indices, and each chunk is
 * an array slice of the already-split token array. No shuffle, no
 * window, no UDF; output size is input size x (1 + overlap fraction).
 * Whole-stage codegen covers the entire plan (asserted in
 * PlanPostureSpec).
 */
object Chunking {

  /** Chunk token budget (`chunk.tokens` in GraftConfig; the demo
    * default is 64). The oracle SQL interpolates the same value, so a
    * reconfigured geometry stays hash-checked. */
  def ChunkTokens: Int = graft.config.GraftConfig.active.chunk.tokens

  /** Stride between chunk starts (overlap = ChunkTokens - ChunkStride;
    * `chunk.stride` in GraftConfig). */
  def ChunkStride: Int = graft.config.GraftConfig.active.chunk.stride

  /**
   * One row per (doc, chunk): chunk_id, start_tok (0-based token
   * offset), n_tok, and the chunk text. Tokenization = single-space
   * split, case-preserving (chunk text is payload, not a signature —
   * lowercasing here would corrupt the training data it feeds).
   */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      c: Int = ChunkTokens, s: Int = ChunkStride): DataFrame = {
    require(c > 0 && s > 0 && s <= c, s"need 0 < stride <= chunk ($s, $c)")
    val base = docs.select(col(idCol).as("doc_id"),
        split(col(textCol), " ").as("toks"))
      .withColumn("n", size(col("toks")))
    // exact integer ceil((n - c) / s): n is an int, doubles are exact
    val nChunks = when(col("n") <= c, lit(1))
      .otherwise(floor((col("n") - c + s - 1) / s).cast("int") + 1)
    base.select(col("doc_id"), col("toks"), col("n"),
        posexplode(sequence(lit(0), nChunks - 1)).as(Seq("chunk_id", "_i")))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * s).as("start_tok"),
        least(lit(c), col("n") - col("chunk_id") * s).as("n_tok"),
        concat_ws(" ", slice(col("toks"), col("chunk_id") * s + 1, lit(c)))
          .as("chunk_text"))
  }

  def docChunkQuery(spark: SparkSession, sfDir: String): DataFrame =
    chunk(Tables.documents(spark, sfDir), "doc_id", "text")

  /** DuckDB twin: same integer chunk-count formula, list-valued
    * range() explode, 1-based inclusive list slicing. */
  def docChunkSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |b AS (
       |  SELECT doc_id, toks, len(toks) AS n,
       |    CASE WHEN len(toks) <= $ChunkTokens THEN 1
       |         ELSE CAST(FLOOR((len(toks) - $ChunkTokens + ${ChunkStride - 1})
       |                         / ${ChunkStride}.0) AS INTEGER) + 1 END AS n_chunks
       |  FROM t),
       |e AS (SELECT doc_id, toks, n, unnest(range(0, n_chunks)) AS chunk_id FROM b)
       |SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
       |  CAST(chunk_id * $ChunkStride AS INTEGER) AS start_tok,
       |  CAST(LEAST($ChunkTokens, n - chunk_id * $ChunkStride) AS INTEGER) AS n_tok,
       |  array_to_string(toks[chunk_id * $ChunkStride + 1 :
       |    LEAST(chunk_id * $ChunkStride + $ChunkTokens, n)], ' ') AS chunk_text
       |FROM e""".stripMargin
}
