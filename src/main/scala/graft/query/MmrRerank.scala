package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions.vec_cosine

/**
 * Maximal-marginal-relevance diversified top-k (Carbonell & Goldstein
 * 1998) — the serving-side complement of the ANN stack: plain top-k
 * returns near-duplicate neighbors together (exactly what a deduped
 * corpus still contains at query time); MMR greedily trades relevance
 * against novelty so the k results COVER the neighborhood instead of
 * repeating it. The reference serves plain top-k only
 * (fspann `query/service/QueryServiceImpl.java:262`); this is a
 * beyond-reference serving operator.
 *
 * Two-phase shape, the [[AnnQuery]] discipline:
 *
 *  1. CANDIDATES (corpus-sized, fully distributed): broadcast the
 *     query vectors, score cosine relevance in whole-stage codegen
 *     (native [[graft.functions.CosineSimilarity]] expression), cut to
 *     the top-`candidates` shortlist per query with one
 *     query-partitioned window. At 100 TB this phase is interchangeable
 *     with any ANN retrieval (LSH / IVF-PQ) — MMR only needs SOME
 *     bounded shortlist; brute cosine is the exact-oracle form.
 *  2. RE-RANK (bounded: numQueries x candidates rows): per query,
 *     greedy selection `argmax λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)`
 *     for k steps. The greedy recurrence is inherently sequential per
 *     query, so it runs as `flatMapGroups` over the shortlist — each
 *     group is `candidates` rows, the per-group work O(candidates·k)
 *     dot products, distributed across queries. No corpus data ever
 *     reaches this phase.
 *
 * Cross-engine determinism (SURVEY §5): every similarity is floored to
 * 4 dp before it enters the greedy arithmetic, scores are re-floored
 * after the λ-combination, ties break on vec_id, and the pairwise
 * cosine here replicates [[graft.functions.VectorKernels.cosine]]'s
 * accumulation order (float→double, sequential) so DuckDB's
 * `list_cosine_similarity` over `DOUBLE[]` casts reproduces the exact
 * doubles. With no selection yet, the novelty term is defined 0.0
 * (first pick = pure relevance), mirrored by the oracle's COALESCE.
 */
object MmrRerank {

  private def cfg = graft.config.GraftConfig.active
  def Candidates: Int = cfg.mmr.candidates
  def K: Int = cfg.mmr.k
  def Lambda: Double = cfg.mmr.lambda

  /** One diversified pick: rank within the MMR selection, the floored
    * relevance, and the floored MMR score at selection time. */
  case class MmrPick(query_id: Long, vec_id: Long, mmr_rank: Int,
      rel4: Double, score4: Double)

  /** Exact replica of [[graft.functions.VectorKernels.cosine]] over
    * plain arrays (the bounded re-rank phase runs outside codegen, so
    * it calls this directly — same float→double sequential
    * accumulation, same zero-denominator guard). */
  private def cos(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; nx += x * x; ny += y * y
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  private def f4(x: Double): Double = math.floor(x * 10000) / 10000

  /**
   * Diversified top-`k` per query over `data` (vec_id, embedding):
   * exact-cosine shortlist, then [[rerank]]. Output: (query_id,
   * vec_id, mmr_rank, rel4, score4).
   */
  def mmrTopK(spark: SparkSession, data: DataFrame, queries: DataFrame,
      candidates: Int = Candidates, k: Int = K,
      lambda: Double = Lambda): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("rel4").desc, col("vec_id"))
    val cand = data
      .join(broadcast(queries.select(
        col("vec_id").as("query_id"), col("embedding").as("qv"))))
      .withColumn("rel4", floor(vec_cosine(col("embedding"), col("qv")) * 10000) / 10000)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= candidates)
      .select(col("query_id"), col("vec_id"), col("rel4"), col("embedding"))
    rerank(spark, cand, k, lambda)
  }

  /**
   * The bounded greedy phase alone, over ANY retrieval's shortlist
   * `(query_id, vec_id, rel4, embedding)` — at scale this is what
   * composes MMR behind an LSH / IVF / PQ first stage: the ANN engine
   * bounds the candidates, MMR diversifies them. `rel4` must already
   * be 4dp-floored by the producer.
   */
  def rerank(spark: SparkSession, shortlist: DataFrame, k: Int = K,
      lambda: Double = Lambda): DataFrame = {
    import spark.implicits._
    val lam = lambda
    val mu = 1.0 - lambda
    shortlist
      .select(col("query_id"), col("vec_id"), col("rel4"), col("embedding"))
      .groupByKey(_.getLong(0))
      .flatMapGroups { (qid, it) =>
        // deterministic greedy input order: relevance desc, id asc
        // (matches the shortlist window's own ordering)
        val cs = it.map(r => (r.getLong(1), r.getDouble(2),
            r.getSeq[Float](3).toArray)).toArray
          .sortBy(t => (-t._2, t._1))
        val nC = cs.length
        val taken = new Array[Boolean](nC)
        // max floored similarity to the selected set; -inf = "none
        // yet" so genuinely-negative maxima survive (the oracle's MAX
        // over present pairs), with the empty-set novelty term 0.0
        val maxSim = Array.fill(nC)(Double.NegativeInfinity)
        var selCount = 0
        val out = Vector.newBuilder[MmrPick]
        while (selCount < math.min(k, nC)) {
          var best = -1
          var bestScore = 0.0
          var i = 0
          while (i < nC) {
            if (!taken(i)) {
              val m = if (selCount == 0) 0.0 else maxSim(i)
              val score = f4(lam * cs(i)._2 - mu * m)
              if (best < 0 || score > bestScore ||
                  (score == bestScore && cs(i)._1 < cs(best)._1)) {
                best = i; bestScore = score
              }
            }
            i += 1
          }
          taken(best) = true
          selCount += 1
          out += MmrPick(qid, cs(best)._1, selCount, cs(best)._2, bestScore)
          var j = 0
          while (j < nC) {
            if (!taken(j)) {
              val s = f4(cos(cs(j)._3, cs(best)._3))
              if (s > maxSim(j)) maxSim(j) = s
            }
            j += 1
          }
        }
        out.result().iterator
      }.toDF()
  }

  /**
   * The composed SERVING form: LSH bounds the candidates (resident
   * index, the [[AnnQuery.lshTopK]] probe/refine chain), MMR
   * diversifies them — what "swap the brute scan for an ANN first
   * stage" concretely means at 100 TB. Per query the greedy sees only
   * its own `candidates` rows, so results are independent of how
   * queries are batched (the property streaming serving relies on).
   */
  def diverseTopKLsh(spark: SparkSession, data: DataFrame, queries: DataFrame,
      model: graft.lsh.LshModel, built: graft.index.LshIndex.Built,
      candidates: Int = Candidates, k: Int = K,
      lambda: Double = Lambda): DataFrame = {
    val shortlist = AnnQuery
      .lshTopK(spark, data, queries, candidates, model, built)
      .select("query_id", "vec_id")
      .join(data.select(col("vec_id"), col("embedding")), "vec_id")
      .join(broadcast(queries.select(
        col("vec_id").as("query_id"), col("embedding").as("qv"))), "query_id")
      .withColumn("rel4", floor(vec_cosine(col("embedding"), col("qv")) * 10000) / 10000)
      .select(col("query_id"), col("vec_id"), col("rel4"), col("embedding"))
    rerank(spark, shortlist, k, lambda)
  }

  // ---- SparkEntry wiring over the embeddings table ----

  def mmrTopKQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    mmrTopK(spark, e, e.filter(col("vec_id") < AnnQuery.NumQueries))
  }

  /** DuckDB replay of the greedy: per step, score every unselected
    * shortlist member against the selection via the precomputed floored
    * pair-similarity table and append the winner — identical floored
    * arithmetic, identical (score desc, vec_id) tie-break. The λ and
    * 1−λ constants are emitted from the SAME doubles the Scala side
    * multiplies with (full `toString` precision), so the combination
    * arithmetic is bit-identical. */
  def mmrTopKSql: String = {
    val nq = AnnQuery.NumQueries
    val lam = s"CAST('${Lambda}' AS DOUBLE)"
    val mu = s"CAST('${1.0 - Lambda}' AS DOUBLE)"
    s"""WITH RECURSIVE
       |qs AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
       |       FROM embeddings WHERE vec_id < $nq),
       |cand AS (
       |  SELECT query_id, vec_id, rel4, v FROM (
       |    SELECT q.query_id, e.vec_id,
       |      FLOOR(list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) * 10000) / 10000 AS rel4,
       |      CAST(e.embedding AS DOUBLE[]) AS v,
       |      ROW_NUMBER() OVER (PARTITION BY q.query_id
       |        ORDER BY FLOOR(list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) * 10000) / 10000 DESC,
       |                 e.vec_id) AS rn
       |    FROM qs q CROSS JOIN embeddings e)
       |  WHERE rn <= $Candidates),
       |pair AS (
       |  SELECT a.query_id, a.vec_id AS a, b.vec_id AS b,
       |    FLOOR(list_cosine_similarity(a.v, b.v) * 10000) / 10000 AS sim4
       |  FROM cand a JOIN cand b
       |    ON a.query_id = b.query_id AND a.vec_id <> b.vec_id),
       |r AS (
       |  SELECT query_id, CAST([] AS BIGINT[]) AS sel,
       |         CAST([] AS DOUBLE[]) AS rels, CAST([] AS DOUBLE[]) AS scores,
       |         0 AS n
       |  FROM (SELECT DISTINCT query_id FROM cand)
       |  UNION ALL
       |  SELECT query_id, list_append(sel, vec_id), list_append(rels, rel4),
       |         list_append(scores, score4), n + 1
       |  FROM (
       |    SELECT query_id, sel, rels, scores, n, vec_id, rel4, score4,
       |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score4 DESC, vec_id) AS rn
       |    FROM (
       |      SELECT r.query_id, r.sel, r.rels, r.scores, r.n, c.vec_id, c.rel4,
       |        FLOOR(($lam * c.rel4 - $mu * COALESCE(
       |          MAX(CASE WHEN list_contains(r.sel, p.b) THEN p.sim4 END), 0.0)) * 10000) / 10000 AS score4
       |      FROM r
       |      JOIN cand c ON c.query_id = r.query_id AND NOT list_contains(r.sel, c.vec_id)
       |      LEFT JOIN pair p ON p.query_id = c.query_id AND p.a = c.vec_id
       |      GROUP BY r.query_id, r.sel, r.rels, r.scores, r.n, c.vec_id, c.rel4))
       |  WHERE rn = 1 AND n < $K)
       |SELECT query_id, sel[i] AS vec_id, CAST(i AS INTEGER) AS mmr_rank,
       |       rels[i] + 0.0 AS rel4, scores[i] + 0.0 AS score4
       |FROM (SELECT query_id, sel, rels, scores FROM (
       |        SELECT query_id, sel, rels, scores,
       |          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY n DESC) AS rnf
       |        FROM r) WHERE rnf = 1),
       |     LATERAL (SELECT unnest(range(1, len(sel) + 1)) AS i) u""".stripMargin
  }
}
