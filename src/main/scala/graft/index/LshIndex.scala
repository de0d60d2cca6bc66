package graft.index

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.lsh.{Lsh, LshModel}

/**
 * Greedy sorted-key partitioning of LSH codes (re-expression of
 * fspann `index/paper/GreedyPartitioner.java:36-96`): per (table,
 * division), vectors sorted by 63-bit code key are cut into blocks of
 * `blockSize`; each block keeps (minKey, maxKey, representative code
 * of the middle member, member count).
 *
 * Spark posture: the build is one shuffle (window over (t, d) ordered
 * by key) producing two DataFrames —
 *  - `membership` (id, t, d, block): the big side, hash-partitioned
 *    by (t, d, block) so query-time candidate joins prune to probed
 *    blocks;
 *  - `summaries` (t, d, block, min_key, max_key, n, rep_code): 1/64th
 *    of the rows with ids dropped — the only state that is ever
 *    collected/broadcast (KBs-MBs at 100 TB).
 *
 * Scale note: exact global block numbering per (t, d) serializes each
 * (t, d) through one window reducer (24 reducers by default). At
 * 100 TB the same plan holds by range-partitioning `key` within
 * (t, d) and offsetting local row numbers by per-range counts (a
 * driver-side prefix sum over a tiny count table); block boundaries
 * shift by at most one range — semantics (sorted runs of ~blockSize)
 * are preserved.
 */
object LshIndex {

  /** (id, t, d, key, code) — one row per vector per (table, division). */
  def codes(df: DataFrame, idCol: String, vecCol: String, model: LshModel): DataFrame =
    df.select(col(idCol).cast("long").as("id"), Lsh.lshCodes(col(vecCol), model).as("tdc"))
      .select(col("id"), explode(col("tdc")).as("c"))
      .select(col("id"), col("c.t").as("t"), col("c.d").as("d"),
        col("c.key").as("key"), col("c.code").as("code"))

  final case class Built(membership: DataFrame, summaries: DataFrame)

  def build(codesDf: DataFrame, blockSize: Int): Built = {
    val w = Window.partitionBy("t", "d").orderBy("key", "id")
    val numbered = codesDf
      .withColumn("rn", (row_number().over(w) - 1).cast("long"))
      .withColumn("block", (col("rn") / blockSize).cast("int"))
      .withColumn("local", col("rn") % blockSize)
    val wb = Window.partitionBy("t", "d", "block")
    val withRep = numbered
      .withColumn("bn", count(lit(1)).over(wb))
      // reference picks the middle member as representative (GreedyPartitioner.java:66-71)
      .withColumn("rep", when(col("local") === expr("(bn - 1) div 2"), col("code")))
    val summaries = withRep.groupBy("t", "d", "block")
      .agg(
        min("key").as("min_key"),
        max("key").as("max_key"),
        count(lit(1)).as("n"),
        first("rep", ignoreNulls = true).as("rep_code"))
    Built(numbered.select("id", "t", "d", "block", "key"), summaries)
  }

  /**
   * Driver-side probe map: per (t, d), block summaries sorted by
   * block id (== key order). Small by construction (rows / blockSize,
   * ids dropped) — this is the broadcast state of the query path.
   */
  final case class TdSummary(
      minKey: Array[Long], maxKey: Array[Long], rep: Array[Array[Long]]) {
    def size: Int = minKey.length
  }

  def collectSummaries(summaries: DataFrame): Map[(Int, Int), TdSummary] =
    summaries.select("t", "d", "block", "min_key", "max_key", "rep_code")
      .orderBy("t", "d", "block")
      .collect()
      .groupBy(r => (r.getInt(0), r.getInt(1)))
      .map { case (td, rows: Array[Row]) =>
        val sorted = rows.sortBy(_.getInt(2))
        td -> TdSummary(
          sorted.map(_.getLong(3)),
          sorted.map(_.getLong(4)),
          sorted.map(_.getSeq[Long](5).toArray))
      }

  /** Nearest block by key: inside a [min,max] range, else closest boundary (GreedyPartitioner.findNearestPartition). */
  def findNearestBlock(s: TdSummary, qKey: Long): Int = {
    var lo = 0
    var hi = s.size - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (qKey < s.minKey(mid)) hi = mid - 1
      else if (qKey > s.maxKey(mid)) lo = mid + 1
      else return mid
    }
    if (lo <= 0) 0
    else if (lo >= s.size) s.size - 1
    else {
      val dl = s.minKey(lo) - qKey // qKey < minKey(lo), > maxKey(lo-1)
      val dr = qKey - s.maxKey(lo - 1)
      if (dr <= dl) lo - 1 else lo
    }
  }
}
