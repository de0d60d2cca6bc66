package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup.{shingles, tokens}

/**
 * Benchmark decontamination: flag training documents that share word
 * n-grams with an evaluation/benchmark set — the standard hygiene
 * pass a pretraining pipeline runs so eval questions don't leak into
 * the training corpus.
 *
 * Spark posture (100 TB): the benchmark side of the join is SMALL by
 * construction (eval suites are MBs, not TBs), so its distinct n-gram
 * set is BROADCAST — the training side stays map-local through
 * shingling and explode, and the only shuffle is the per-doc
 * partial-agg hit count. No training-side n-gram table is ever
 * materialized or shuffled. The n-gram kernel reuses the dedup
 * shingle machinery (codegen'd higher-order array functions, no UDF).
 */
object Decontaminate {

  /**
   * Per training doc: distinct n-gram count, how many of those occur
   * anywhere in `bench`, the contamination ratio (floor-truncated,
   * SURVEY §5), and the flag (any shared n-gram ⇒ contaminated —
   * the conservative industry rule).
   */
  def decontaminate(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val grams = array_distinct(shingles(tokens(col(textCol)), n))
    val benchGrams = bench.select(explode(grams).as("g")).distinct()
      .withColumn("hit", lit(1L))
    // n_ngrams = count(*) after the explode (grams are distinct, and the
    // shingle fallback guarantees >= 1 per doc) — carrying a size(gs)
    // column through the explode would collapse into the same projection
    // and evaluate the expensive shingle expression TWICE per doc
    train.select(col(idCol).as("doc_id"), explode(grams).as("g"))
      .join(broadcast(benchGrams), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_ngrams"), count(col("hit")).as("n_hits"))
      .select(col("doc_id"), col("n_ngrams"), col("n_hits"),
        (floor(col("n_hits").cast("double") / greatest(col("n_ngrams"), lit(1)) * 10000) / 10000)
          .as("contam_ratio"),
        (col("n_hits") > 0).cast("int").as("contaminated"))
  }

  // ---- SparkEntry wiring ----

  /** Benchmark set = doc_id ≡ 0 (mod 17). Natural n-gram overlap is rare
    * in the synthetic corpus, so contamination is additionally PLANTED:
    * every training doc with doc_id ≡ 5 (mod 23) gets the first 6 tokens
    * of benchmark doc (doc_id mod 3)·17 appended — those docs must carry
    * ≥ 2 shared 5-grams. The planting is part of the query (mirrored in
    * the oracle SQL), not of the data.
    *
    * DEMO-scale caveat: carving the bench set out of the corpus itself
    * (~6% of it) means the broadcast gram set here grows WITH the
    * corpus — broadcast-safe only at test scale factors. That is a
    * property of this self-contained demo wiring, not of
    * [[decontaminate]], whose contract is a real benchmark suite:
    * fixed eval files, MBs by construction, corpus-size-independent. A
    * deployment passes that as `bench`; it never derives bench from
    * the training corpus. */
  def decontaminateQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val bench = docs.filter(col("doc_id") % 17 === 0)
    val prefix6 = concat_ws(" ", slice(split(col("text"), " "), 1, 6))
    val planted = docs.filter(col("doc_id") % 17 =!= 0).as("t")
      .join(broadcast(bench.select((col("doc_id") / 17).cast("long").as("b3"),
        prefix6.as("p6"))), (col("doc_id") % 3) === col("b3"), "left")
      .select(col("doc_id"),
        when(col("doc_id") % 23 === 5 && col("p6").isNotNull,
          concat(col("text"), lit(" "), col("p6"))).otherwise(col("text")).as("text"))
    decontaminate(planted, bench, "doc_id", "text", n = 5)
  }

  val decontaminateSql: String =
    """WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 17 = 0),
      |planted AS (
      |  SELECT t.doc_id,
      |    CASE WHEN t.doc_id % 23 = 5 AND b.doc_id IS NOT NULL
      |         THEN t.text || ' ' ||
      |              array_to_string(string_split(b.text, ' ')[1:6], ' ')
      |         ELSE t.text END AS text
      |  FROM documents t LEFT JOIN bench b ON b.doc_id = (t.doc_id % 3) * 17
      |  WHERE t.doc_id % 17 <> 0),
      |gr AS (
      |  SELECT doc_id,
      |    list_distinct(CASE WHEN len(toks) >= 5 THEN
      |        list_transform(range(1, len(toks) - 3),
      |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4])
      |      ELSE [array_to_string(toks, ' ')] END) AS gs
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM planted)),
      |bg AS (
      |  SELECT DISTINCT unnest(
      |    list_distinct(CASE WHEN len(toks) >= 5 THEN
      |        list_transform(range(1, len(toks) - 3),
      |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4])
      |      ELSE [array_to_string(toks, ' ')] END)) AS g
      |  FROM (SELECT string_split(lower(text), ' ') AS toks FROM bench)),
      |ex AS (SELECT doc_id, len(gs) AS n_ngrams, unnest(gs) AS g FROM gr),
      |hits AS (
      |  SELECT e.doc_id, ANY_VALUE(e.n_ngrams) AS n_ngrams, COUNT(b.g) AS n_hits
      |  FROM ex e LEFT JOIN bg b USING (g) GROUP BY e.doc_id)
      |SELECT doc_id, CAST(n_ngrams AS INTEGER) AS n_ngrams,
      |  CAST(n_hits AS BIGINT) AS n_hits,
      |  FLOOR(CAST(n_hits AS DOUBLE) / GREATEST(n_ngrams, 1) * 10000) / 10000 AS contam_ratio,
      |  CAST(n_hits > 0 AS INTEGER) AS contaminated
      |FROM hits""".stripMargin
}
