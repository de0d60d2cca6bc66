package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup.{shingles, tokens}

/**
 * Split-leakage report: n-gram containment of the val/test splits in
 * the train split — the metric dedup/decontamination quality is judged
 * by (near-dup leakage across splits inflates eval scores; Lee et al.
 * 2022 report exactly this containment before/after dedup). Run it
 * after [[Corpus.corpusSplit]] to certify a release: a containment
 * near the natural n-gram base rate says the split is clean; a spike
 * says duplicated content straddles the split boundary.
 *
 * Plan (100 TB posture): one corpus-sized shuffle — the distinct
 * (split, gram) table, keyed on the gram so the train/eval semi-join
 * reuses the same partitioning (exchange reuse); everything after is
 * split-count-sized. The gram explode is map-side (the decontaminate
 * shingle kernel); at 100 TB the gram key shuffles as xxhash64(gram)
 * exactly as in the dedup family.
 */
object SplitOverlap {

  /** One row per non-train split: doc count, distinct n-gram count,
    * grams shared with train, and the containment ratio. */
  def splitOverlap(docs: DataFrame, idCol: String, textCol: String,
      seed: String, trainFrac: Double, valFrac: Double, n: Int = 5): DataFrame = {
    val split = Corpus.corpusSplit(docs.select(col(idCol).as("doc_id")),
      seed, trainFrac, valFrac).select("doc_id", "split")
    // CACHED: the distinct (split, gram) table feeds three consumers
    // (the train side of the semi-join and the two eval aggregates),
    // and the split filters push BELOW the distinct so the subtrees
    // differ and nothing is exchange-reusable — uncached, the
    // corpus-sized tokenize + shingle + explode + join + distinct
    // chain evaluated three times per run (guide §1.2). Released by
    // the session's per-entry clearCache.
    val grams = docs.select(col(idCol).as("doc_id"),
        explode(array_distinct(shingles(tokens(col(textCol)), n))).as("g"))
      .join(split, "doc_id")
      .select("split", "g").distinct()
      .cache()
    val trainG = grams.filter(col("split") === "train").select("g")
    val evalG = grams.filter(col("split") =!= "train")
    val totals = evalG.groupBy("split").agg(count(lit(1)).as("n_grams"))
    val shared = evalG.join(trainG, Seq("g"), "left_semi")
      .groupBy("split").agg(count(lit(1)).as("n_shared"))
    split.filter(col("split") =!= "train")
      .groupBy("split").agg(count(lit(1)).as("n_docs"))
      .join(totals, "split")
      .join(shared, Seq("split"), "left")
      .select(col("split"), col("n_docs"), col("n_grams"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (floor(coalesce(col("n_shared"), lit(0L)).cast("double") /
          greatest(col("n_grams"), lit(1)) * 10000) / 10000).as("containment"))
  }

  /** Over the [[Corpus.corpusSplit]] assignment of the documents table
    * (same seed/fractions as the `corpus_split` entry). */
  def splitOverlapQuery(spark: SparkSession, sfDir: String): DataFrame =
    splitOverlap(Tables.documents(spark, sfDir), "doc_id", "text",
      Corpus.SplitSeed, Corpus.TrainFrac, Corpus.ValFrac)

  /** w=5 shingle set with the whole-text fallback (the decontaminate
    * oracle kernel). */
  private val gram5Sql: String =
    """list_distinct(CASE WHEN len(toks) >= 5 THEN
      |    list_transform(range(1, len(toks) - 3),
      |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4])
      |  ELSE [array_to_string(toks, ' ')] END)""".stripMargin

  val splitOverlapSql: String =
    s"""WITH s AS (
       |  SELECT doc_id, text,
       |    CASE WHEN u < ${Corpus.TrainFrac} THEN 'train'
       |         WHEN u < ${Corpus.TrainFrac + Corpus.ValFrac} THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM (
       |    SELECT doc_id, text,
       |      ('0x' || substr(sha256('${Corpus.SplitSeed}:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
       |        / 4294967296.0 AS u
       |    FROM documents)),
       |tok AS (SELECT doc_id, split, string_split(lower(text), ' ') AS toks FROM s),
       |gr AS (SELECT DISTINCT split, unnest($gram5Sql) AS g FROM tok),
       |tr AS (SELECT g FROM gr WHERE split = 'train'),
       |ev AS (SELECT split, g FROM gr WHERE split <> 'train'),
       |tot AS (SELECT split, COUNT(*) AS n_grams FROM ev GROUP BY split),
       |sh AS (SELECT split, COUNT(*) AS n_shared FROM ev SEMI JOIN tr USING (g) GROUP BY split),
       |nd AS (SELECT split, COUNT(*) AS n_docs FROM s WHERE split <> 'train' GROUP BY split)
       |SELECT nd.split, CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST(n_grams AS BIGINT) AS n_grams,
       |  CAST(COALESCE(n_shared, 0) AS BIGINT) AS n_shared,
       |  FLOOR(CAST(COALESCE(n_shared, 0) AS DOUBLE) / GREATEST(n_grams, 1) * 10000) / 10000
       |    AS containment
       |FROM nd JOIN tot USING (split) LEFT JOIN sh USING (split)""".stripMargin
}
