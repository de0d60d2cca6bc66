package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.dedup.Dedup

/**
 * Streaming NEAR-duplicate gate — the missing rung between
 * [[StreamingDedup]] (exact content hash: any edit sails through) and
 * the nightly batch [[Dedup.minhashPairs]]: a lightly-edited copy of
 * an earlier document is flagged AT INTAKE, in the micro-batch it
 * arrives in.
 *
 * Shape: each arriving document is expanded map-side into its 16
 * MinHash band keys (the same fused codegen signature expression as
 * the batch path) plus its distinct shingle set as 8-byte xxhash64
 * keys (the [[Dedup.substringStats]] hashed-key discipline — Jaccard
 * over hashed shingles equals Jaccard over shingle strings modulo a
 * 64-bit collision). `flatMapGroupsWithState` keyed on
 * (band, band_hash) then holds each bucket's claimants in the state
 * store; an arrival is exact-Jaccard-verified against its bucket's
 * claimants and emits the verified pair — the batch operator's
 * band-candidate + exact-verify semantics, made incremental.
 *
 * Equivalence to batch: over any micro-batch split of a corpus, the
 * union of emitted pairs (distinct — a pair sharing several bands
 * surfaces once per shared band, all in the later doc's batch) equals
 * `minhashPairs(corpus)` as long as no bucket overflows `maxBucket`.
 * On overflow the batch plan retro-drops the WHOLE bucket, which a
 * causal stream cannot replay (pairs already emitted are gone); the
 * gate instead freezes the bucket — claimants are discarded, nothing
 * further is emitted from it — and near-dups colliding there still
 * surface via their other 15 bands. That asymmetry is inherent to
 * append-mode streaming and documented here rather than papered over.
 *
 * 100 TB posture: state per bucket is its claimants' hashed shingle
 * sets — bounded by `maxBucket` × doc length, keyed state sharded
 * across executors by Spark's state store like any
 * mapGroupsWithState; the hot-bucket freeze is exactly what stops a
 * boilerplate bucket from accumulating unbounded state. A production
 * deployment ages claimants out with event-time TTL (dup windows in
 * crawl pipelines are weeks, not forever) — the same bound Spark's
 * own watermarked dropDuplicates uses.
 */
object StreamingNearDup {

  val NumPerms = 64
  val RowsPerBand = 4
  val ShingleWidth = 3
  val Threshold = 0.5
  val MaxBucket = 1000

  final case class BandedDoc(band: Int, band_hash: Long, doc_id: Long, sh: Seq[Long])
  final case class Claimant(doc_id: Long, sh: Seq[Long])
  final case class BucketState(claimants: List[Claimant], frozen: Boolean)
  final case class NearPair(a: Long, b: Long, jaccard: Double)

  /** Map-side prep: one row per (band, doc) with the doc's hashed
    * shingle set — the fused signature expression runs once per doc
    * and the band keys are slices of it, exactly the batch layout. */
  def bandedShingles(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = Dedup.tokens(col(textCol))
    val sigs = docs.select(col(idCol).as("doc_id"),
      graft.dedup.SignatureExprs.minhash_shingle_sig(toks, ShingleWidth, NumPerms).as("sig"),
      transform(array_distinct(Dedup.shingles(toks, ShingleWidth)),
        s => xxhash64(s)).as("sh"))
    val bandHashes = (0 until NumPerms / RowsPerBand).map { b =>
      xxhash64(slice(col("sig"), b * RowsPerBand + 1, RowsPerBand))
    }
    sigs.select(col("doc_id"), col("sh"),
      posexplode(array(bandHashes: _*)).as(Seq("band", "band_hash")))
      .select(col("band"), col("band_hash"), col("doc_id"), col("sh"))
  }

  private def jaccard(a: Seq[Long], b: Seq[Long]): Double = {
    val sa = a.toSet; val sb = b.toSet
    val inter = sa.count(sb.contains)
    val union = sa.size + sb.size - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** Verify one bucket's arrivals against its stored claimants (and
    * each other, in doc_id order), then fold the arrivals into state —
    * or freeze the bucket past [[MaxBucket]]. */
  def verifyBucket(
      key: (Int, Long),
      rows: Iterator[BandedDoc],
      state: GroupState[BucketState]): Iterator[NearPair] = {
    val st = state.getOption.getOrElse(BucketState(Nil, frozen = false))
    if (st.frozen) return Iterator.empty
    val arrivals = rows.toArray.sortBy(_.doc_id)
    val out = Vector.newBuilder[NearPair]
    var claimants = st.claimants
    var n = claimants.size
    var frozen = false
    arrivals.foreach { d =>
      if (!frozen) {
        claimants.foreach { c =>
          if (c.doc_id != d.doc_id) {
            val j = jaccard(c.sh, d.sh)
            if (j >= Threshold)
              out += NearPair(math.min(c.doc_id, d.doc_id),
                math.max(c.doc_id, d.doc_id), math.floor(j * 10000) / 10000)
          }
        }
        claimants = Claimant(d.doc_id, d.sh) :: claimants
        n += 1
        if (n > MaxBucket) frozen = true
      }
    }
    state.update(if (frozen) BucketState(Nil, frozen = true)
      else BucketState(claimants, frozen = false))
    if (frozen) Iterator.empty else out.result().iterator
  }

  /** docs stream with (doc_id, text) → verified near-dup pairs
    * (a < b, 4dp-floored Jaccard; distinct() at the sink — a pair
    * surfaces once per shared band). */
  def neardupStream(spark: SparkSession, docs: Dataset[org.apache.spark.sql.Row],
      idCol: String = "doc_id", textCol: String = "text"): Dataset[NearPair] = {
    import spark.implicits._
    bandedShingles(docs.toDF(), idCol, textCol)
      .as[BandedDoc]
      .groupByKey(d => (d.band, d.band_hash))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(verifyBucket)
  }
}
