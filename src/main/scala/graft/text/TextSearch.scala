package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.query.AnnQuery

/**
 * Keyword retrieval (Okapi BM25) and hybrid keyword+vector fusion
 * (reciprocal-rank fusion) over the documents/embeddings corpus —
 * the text half of a retrieval stack whose vector half is the ANN
 * family ([[AnnQuery]]): a corpus user queries both and fuses.
 *
 * Queries are the first `NumQueries` documents' leading `QueryLen`
 * distinct tokens (the deterministic query workload the ANN entries
 * also use: query ids ARE corpus ids, so the two rank lists fuse on
 * a shared key space).
 *
 * Scale posture: postings = one explode + partial-agg shuffle over
 * the corpus; document frequency is computed AFTER the candidate cut
 * (postings equi-joined to the broadcast query-term set), so no
 * vocab-sized table ever shuffles or broadcasts; corpus stats (N,
 * total token count) are one SETUP aggregate; scoring joins are
 * broadcast (query side is bounded); the top-k window partitions by
 * query. BM25 scores are FLOOR-truncated to 4 dp BEFORE ranking so
 * the cut is total and engine-portable (the `tfidf_topterms`
 * discipline).
 */
object TextSearch {

  val K1 = 1.2
  val B = 0.75
  /** RRF dampening constant (Cormack et al. 2009's k=60). */
  val RrfK = 60
  /** Leading distinct tokens per query document. */
  val QueryLen = 4

  def TopK: Int = AnnQuery.DefaultK
  def NumQueries: Int = AnnQuery.NumQueries

  private def withDl(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("dl"))

  /** (query_id, term): the bounded query workload. */
  private def queryTerms(wd: DataFrame, numQueries: Int): DataFrame =
    wd.filter(col("doc_id") < numQueries)
      .select(col("doc_id").as("query_id"),
        explode(array_distinct(slice(col("toks"), 1, QueryLen))).as("term"))

  /**
   * BM25 top-k per query. `idf = ln(1 + (N - df + .5)/(df + .5))`,
   * `tf_norm = tf / (tf + k1 (1 - b + b dl/avgdl))` — the standard
   * Okapi form (Robertson & Zaragoza 2009), with arithmetic written
   * in the same association order as the DuckDB twin so both engines
   * produce bit-identical doubles.
   */
  private[graft] def bm25(docs: DataFrame, numQueries: Int, topK: Int): DataFrame = {
    val wd = withDl(docs)
    // SETUP stats: one tiny aggregate; exact-integer division keeps
    // avgdl bit-identical across engines
    val statsRow = wd.agg(count(lit(1)), sum(col("dl"))).head()
    val nDocs = statsRow.getLong(0)
    val avgdl = statsRow.getLong(1).toDouble / nDocs
    val qt = queryTerms(wd, numQueries)
    // the query-term semi-join lands BELOW the tf aggregate: only
    // query-term occurrences reach the shuffle, so the agg is sized by
    // the candidate postings, not the corpus vocabulary (tf per
    // (term, doc) is identical either side of the cut)
    val cand = wd
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .join(broadcast(qt.select("term").distinct()), Seq("term"))
      .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf"))
    val dfT = cand.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) + (lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = col("tf").cast("double") /
      (col("tf") + lit(K1) * (lit(1.0) - lit(B) + lit(B) * col("dl") / lit(avgdl)))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"))
    cand.join(broadcast(qt), Seq("term"))
      .join(broadcast(dfT), Seq("term"))
      .groupBy("query_id", "doc_id").agg(sum(idf * tfNorm).as("raw"))
      .withColumn("score", floor(col("raw") * 10000) / 10000)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("query_id"), col("doc_id"), col("score"), col("rnk"))
  }

  def textSearchBm25(spark: SparkSession, sfDir: String): DataFrame =
    bm25(Tables.documents(spark, sfDir), NumQueries, TopK)

  /** Shared BM25 CTE chain (same association order as [[bm25Plan]]). */
  private def bm25Cte: String =
    s"""tok AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
       |wd AS (SELECT doc_id, toks, len(toks) AS dl FROM tok),
       |stats AS (SELECT COUNT(*) AS n, SUM(dl) AS sumdl FROM wd),
       |post AS (
       |  SELECT term, doc_id, dl, COUNT(*) AS tf FROM (
       |    SELECT doc_id, dl, unnest(toks) AS term FROM wd)
       |  GROUP BY term, doc_id, dl),
       |q AS (
       |  SELECT doc_id AS query_id, unnest(list_distinct(list_slice(toks, 1, $QueryLen))) AS term
       |  FROM wd WHERE doc_id < $NumQueries),
       |cand AS (SELECT p.* FROM post p JOIN (SELECT DISTINCT term FROM q) t USING (term)),
       |dft AS (SELECT term, COUNT(*) AS df FROM cand GROUP BY term),
       |scored AS (
       |  SELECT q.query_id, c.doc_id,
       |    FLOOR(SUM(
       |      ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
       |      CAST(c.tf AS DOUBLE) /
       |        (c.tf + $K1 * (1.0 - $B + $B * c.dl / (CAST(s.sumdl AS DOUBLE) / s.n)))
       |    ) * 10000) / 10000 AS score
       |  FROM cand c JOIN q ON q.term = c.term JOIN dft d ON d.term = c.term
       |  CROSS JOIN stats s
       |  GROUP BY q.query_id, c.doc_id),
       |bm25 AS (
       |  SELECT query_id, doc_id, score, rnk FROM (
       |    SELECT query_id, doc_id, score,
       |      CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY score DESC, doc_id) AS INTEGER) AS rnk
       |    FROM scored)
       |  WHERE rnk <= $TopK)""".stripMargin

  val textSearchBm25Sql: String =
    s"""WITH $bm25Cte
       |SELECT query_id, doc_id, score, rnk FROM bm25""".stripMargin

  /**
   * Hybrid retrieval: reciprocal-rank fusion (RRF, Cormack et al.
   * 2009) of the BM25 top-k and the exact vector top-k for the same
   * query ids — `score = Σ 1/(60 + rank)` over the lists the doc
   * appears in. Both inputs are bounded (numQueries × k), so the
   * fusion is a tiny full-outer join + window; each RRF term is one
   * correctly-rounded division, so the fused doubles are
   * bit-identical across engines with no truncation needed.
   */
  def hybridSearchRrf(spark: SparkSession, sfDir: String): DataFrame = {
    val bm = bm25(Tables.documents(spark, sfDir), NumQueries, TopK)
      .select(col("query_id"), col("doc_id"), col("rnk").as("bm25_rnk"))
    val ann = AnnQuery.annBruteTopK(spark, sfDir)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("rnk").as("ann_rnk"))
    val w = Window.partitionBy("query_id").orderBy(col("rrf").desc, col("doc_id"))
    bm.join(ann, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(RrfK) + col("ann_rnk")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(RrfK) + col("bm25_rnk")), lit(0.0)))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
      // rank 0 = "not in that list" (sentinel, not NULL: the driver's
      // hash gate compares float columns NaN-strictly)
      .select(col("query_id"), col("doc_id"), round(col("rrf"), 6).as("rrf"),
        coalesce(col("bm25_rnk"), lit(0)).as("bm25_rnk"),
        coalesce(col("ann_rnk"), lit(0)).as("ann_rnk"), col("rnk"))
  }

  val hybridSearchRrfSql: String =
    s"""WITH $bm25Cte,
       |ann AS (
       |  SELECT query_id, vec_id AS doc_id, rnk FROM (
       |    SELECT q.vec_id AS query_id, e.vec_id, d.dist,
       |      CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY d.dist, e.vec_id) AS INTEGER) AS rnk
       |    FROM embeddings q CROSS JOIN embeddings e,
       |      LATERAL (SELECT list_distance(CAST(q.embedding AS DOUBLE[]),
       |                                    CAST(e.embedding AS DOUBLE[])) AS dist) d
       |    WHERE q.vec_id < $NumQueries)
       |  WHERE rnk <= ${AnnQuery.DefaultK}),
       |fused AS (
       |  SELECT COALESCE(b.query_id, a.query_id) AS query_id,
       |    COALESCE(b.doc_id, a.doc_id) AS doc_id,
       |    COALESCE(1.0 / ($RrfK + a.rnk), 0.0) +
       |      COALESCE(1.0 / ($RrfK + b.rnk), 0.0) AS rrf,
       |    COALESCE(b.rnk, 0) AS bm25_rnk, COALESCE(a.rnk, 0) AS ann_rnk
       |  FROM bm25 b FULL OUTER JOIN ann a
       |    ON a.query_id = b.query_id AND a.doc_id = b.doc_id)
       |SELECT query_id, doc_id, ROUND(rrf, 6) AS rrf, bm25_rnk, ann_rnk, rnk FROM (
       |  SELECT query_id, doc_id, rrf, bm25_rnk, ann_rnk,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY rrf DESC, doc_id) AS INTEGER) AS rnk
       |  FROM fused)
       |WHERE rnk <= $TopK""".stripMargin
}
