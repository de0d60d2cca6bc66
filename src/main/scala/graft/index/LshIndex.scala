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
 * Two numbering strategies produce identical results:
 *  - [[build]] (default): deterministic key-range buckets + a
 *    driver-side prefix sum over the tiny (t x d x bucket) count
 *    table. Parallelism = number of populated buckets, independent of
 *    the (t, d) fan-out, and correctness is independent of caching or
 *    recomputation — the 100 TB path.
 *  - [[buildWindowed]]: plain row_number window per (t, d) — simple,
 *    but serializes each (t, d) through one reducer; kept as the
 *    cross-check oracle for the scalable path.
 */
object LshIndex {

  /**
   * Spread a small-split source across the cluster before an
   * expensive map stage (LSH coding, dedup signatures): a corpus that
   * arrives as fewer parquet splits than cores would serialize the
   * whole map stage on those few tasks. Real corpora have orders of
   * magnitude more splits than cores, so the branch is a no-op there —
   * this never adds a shuffle at scale, it only unblocks parallelism
   * when the source is a handful of files.
   */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }

  /** (id, t, d, key, code) — one row per vector per (table, division). */
  def codes(df: DataFrame, idCol: String, vecCol: String, model: LshModel): DataFrame =
    df.select(col(idCol).cast("long").as("id"), Lsh.lshCodes(col(vecCol), model).as("tdc"))
      .select(col("id"), explode(col("tdc")).as("c"))
      .select(col("id"), col("c.t").as("t"), col("c.d").as("d"),
        col("c.key").as("key"), col("c.code").as("code"))

  final case class Built(membership: DataFrame, summaries: DataFrame) {
    /** Total block count, computed once per built index (used to size
      * the key-range buckets of the distributed center lookup; a Long
      * memo, so it survives cache eviction without re-counting). */
    lazy val summaryCount: Long = summaries.count()

    /** Driver-side probe map for the broadcast probe path, collected
      * once per built index (the reference keeps its partition list
      * resident in the server for the system's lifetime — re-collecting
      * it per query batch would re-pay a job every call). Deterministic
      * re-derivable state, so surviving cache eviction is safe. */
    lazy val collected: Map[(Int, Int), TdSummary] = collectSummaries(summaries)

    /** The probe map's broadcast handle, created once per built index —
      * repeated probe calls must not re-serialize and re-ship the map. */
    @transient lazy val collectedBc: org.apache.spark.broadcast.Broadcast[Map[(Int, Int), TdSummary]] =
      summaries.sparkSession.sparkContext.broadcast(collected)
  }

  final case class CodeRow(id: Long, t: Int, d: Int, key: Long, code: Array[Long], bkt: Int)

  /** Key-range buckets per (t, d): the top 8 bits of the 63-bit key. */
  private val BucketBits = 8
  private def bucketCol: org.apache.spark.sql.Column =
    shiftrightunsigned(col("key"), 63 - BucketBits).cast("int")

  /**
   * Scalable exact global numbering: rows are grouped by a
   * DETERMINISTIC key-range bucket (top key bits — a pure function of
   * the row, so counts and numbering agree across arbitrary
   * recomputation, cache eviction, or task retry), hash-partitioned by
   * (t, d, bucket), sorted within partitions, and offset by a
   * driver-side prefix sum over the tiny (t x d x 256) count table.
   * Bucket order is key order by construction, so numbering equals the
   * global (t, d, key, id) sort order.
   */
  def build(codesDf: DataFrame, blockSize: Int): Built = {
    val spark = codesDf.sparkSession
    import spark.implicits._
    val nRanges = spark.sparkContext.defaultParallelism
    val withBkt = codesDf.select(col("id"), col("t"), col("d"), col("key"), col("code"),
      bucketCol.as("bkt"))
    // tiny count table -> per-(t, d, bucket) starting offsets
    val counts = withBkt.groupBy("t", "d", "bkt").count()
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getLong(3)))
    val offsets: Map[(Int, Int, Int), Long] =
      counts.groupBy { case ((t, d, _), _) => (t, d) }.flatMap { case (_, rows) =>
        var acc = 0L
        rows.sortBy { case ((_, _, bkt), _) => bkt }.map { case (k, n) =>
          val o = (k, acc)
          acc += n
          o
        }
      }
    val offsetsB = spark.sparkContext.broadcast(offsets)
    val numbered = withBkt.as[CodeRow]
      .repartition(nRanges, col("t"), col("d"), col("bkt"))
      .sortWithinPartitions("t", "d", "key", "id")
      .mapPartitions { it =>
        val local = scala.collection.mutable.Map.empty[(Int, Int, Int), Long]
        it.map { r =>
          val k = (r.t, r.d, r.bkt)
          val i = local.getOrElse(k, 0L)
          local(k) = i + 1
          (r.id, r.t, r.d, r.key, r.code, offsetsB.value(k) + i)
        }
      }.toDF("id", "t", "d", "key", "code", "rn")
      .withColumn("block", (col("rn") / blockSize).cast("int"))
      .withColumn("local", col("rn") % blockSize)
    finish(numbered)
  }

  /** Window-based numbering (one reducer per (t, d)); oracle for [[build]]. */
  def buildWindowed(codesDf: DataFrame, blockSize: Int): Built = {
    val w = Window.partitionBy("t", "d").orderBy("key", "id")
    val numbered = codesDf
      .withColumn("rn", (row_number().over(w) - 1).cast("long"))
      .withColumn("block", (col("rn") / blockSize).cast("int"))
      .withColumn("local", col("rn") % blockSize)
    finish(numbered)
  }

  private def finish(numbered: DataFrame): Built = {
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
    // no distributed orderBy: the driver groups and sorts the (small)
    // collected rows anyway, so a cluster-wide sort shuffle buys nothing
    summaries.select("t", "d", "block", "min_key", "max_key", "rep_code")
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
