package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.dedup.SemDedup
import graft.streaming.StreamingSemanticNearDup

/**
 * The streaming SEMANTIC intake gate vs its batch twin
 * ([[SemDedup.dedupSemanticDelta]]) — the merge-consistency proof's
 * semantic leg (r11 VERDICT #2): a crawl stream seeded with the
 * resident base state must emit, across ANY micro-batch split, exactly
 * the pair report the nightly batch delta pass computes, doubles
 * included; and the admit decision derived from the streamed pairs
 * must reproduce the `dedup_semantic_delta_apply` survivors
 * doc-for-doc.
 */
class StreamingSemanticSpec extends SparkSpecBase {

  private def tmp(name: String): String = {
    val d = s"/root/repo/target/tmp/streamsem/$name"
    graft.util.Io.deleteRecursively(d)
    Files.createDirectories(Paths.get(d))
    d
  }

  // the batch delta entry's exact split + frozen models
  private lazy val parts = SemDedup.deltaParts(spark, sf)
  private lazy val base = parts._1.cache()
  private lazy val delta = parts._2.cache()
  private lazy val cents = parts._3

  private lazy val batchPairs: Set[(Long, Long, Double, String)] =
    SemDedup.dedupSemanticDelta(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSet

  private def streamPairs(nBatches: Int): Set[(Long, Long, Double, String)] = {
    val in = tmp(s"in$nBatches"); val ckpt = tmp(s"ck$nBatches"); val out = tmp(s"out$nBatches")
    // deterministic split: vec_id mod nBatches, one file per micro-batch
    (0 until nBatches).foreach { b =>
      delta.filter(pmod(col("vec_id"), lit(nBatches)) === b)
        .coalesce(1).write.mode("overwrite").parquet(f"$in/b=$b%03d")
    }
    val stream = spark.readStream.schema(delta.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/b=*")
    val q = StreamingSemanticNearDup.semanticStream(spark, stream.toDF(), base, cents)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSet
  }

  test("single-batch stream reproduces the batch semantic delta pair report exactly") {
    assert(batchPairs.nonEmpty, "the planted carve must yield semantic delta pairs")
    assert(batchPairs.exists(_._4 == "delta_base")
      && batchPairs.exists(_._4 == "delta_delta"),
      "both legs must occur under the carve or the equality is vacuous")
    assert(streamPairs(1) == batchPairs,
      "streamed verdicts (cos doubles and legs included) must equal the batch delta")
  }

  test("streamed pairs equal batch pairs regardless of micro-batch split") {
    assert(streamPairs(3) == batchPairs)
    assert(streamPairs(5) == batchPairs)
  }

  test("seeded base + streamed delta reproduces the apply survivors doc-for-doc") {
    // the admit decision over the STREAMED pair report, replaying the
    // batch drop policy (delta_base keeps the base copy, delta_delta
    // keeps the lower id)
    val streamed = streamPairs(3)
    val deltaIds = delta.select("vec_id").collect().map(_.getLong(0)).toSet
    val drops = streamed.map {
      case (a, b, _, "delta_delta") => b
      case (a, b, _, _) => if (deltaIds.contains(a)) a else b
    }
    val survivors = deltaIds -- drops
    val want = SemDedup.dedupSemanticDeltaApply(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(survivors == want,
      "the gate's admit decision must equal dedup_semantic_delta_apply")
  }

  test("maxCell freeze: an overflowing cell stops emitting; other cells are untouched") {
    import spark.implicits._
    // synthetic: two far-apart cells; cell A receives maxCell-crossing
    // arrivals of near-identical vectors, cell B receives one dup pair
    val dim = 4
    def v(head: Float, jit: Float) =
      Seq(head, jit, 0.0f, 0.0f)
    val cents2 = Array(Array(1.0f, 0.0f, 0.0f, 0.0f), Array(-1.0f, 0.0f, 0.0f, 0.0f))
    val baseRows = Seq(
      (0L, v(1.0f, 0.0f)),          // resident in cell A
      (100L, v(-1.0f, 0.0f)))       // resident in cell B
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    // arrivals: 4 near-copies into A (crossing maxCell=4 on the last),
    // 1 near-copy into B
    val arriveRows = Seq(
      (1L, v(1.0f, 1e-5f)), (2L, v(1.0f, 2e-5f)), (3L, v(1.0f, 3e-5f)),
      (4L, v(1.0f, 4e-5f)),
      (101L, v(-1.0f, 1e-5f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val in = tmp("frz-in"); val ckpt = tmp("frz-ck"); val out = tmp("frz-out")
    // one arrival per micro-batch, vec_id order
    Seq(1L, 2L, 3L, 4L, 101L).zipWithIndex.foreach { case (id, i) =>
      arriveRows.filter(col("vec_id") === id).coalesce(1)
        .write.mode("overwrite").parquet(f"$in/b=$i%03d")
    }
    val stream = spark.readStream.schema(arriveRows.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/b=*")
    val q = StreamingSemanticNearDup.semanticStream(spark, stream.toDF(),
      baseRows, cents2, maxCell = 4)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // arrivals 1..3 pair against the growing cell-A state (sizes 2,3,4
    // after fold — at most maxCell), arrival 4 tips the cell past
    // maxCell: its batch's output is suppressed and the cell freezes.
    // Earlier emissions STAND (the causal asymmetry the scaladoc
    // documents: batch would retro-drop the whole cell).
    val cellA = got.filter(_._2 <= 4L)
    assert(cellA == Set((0L, 1L), (0L, 2L), (1L, 2L), (0L, 3L), (1L, 3L), (2L, 3L)),
      s"cell A must stop at the freeze point: $cellA")
    // cell B is independent: its pair emits normally
    assert(got.contains((100L, 101L)), s"cell B pair missing: $got")
  }

  // ---- TTL parity with the minhash gate (StreamingNearDupSpec) ----

  private val ttlDim = 4
  private def fv(xs: Float*): Seq[Float] = xs.toSeq.padTo(ttlDim, 0.0f)
  private def embDf(rows: Seq[(Long, Seq[Float], Long)], t0: Long) = {
    import spark.implicits._
    rows.map { case (id, v, plusSec) =>
      (id, v, new java.sql.Timestamp(t0 + plusSec * 1000)) }
      .toDF("vec_id", "embedding", "ts")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"),
        col("ts"))
  }

  test("event-time TTL: in-window copies pair, aged claimants (residents included) stop matching, state is GC'd") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    val ttlSec = 3600
    // three far-apart cells: A holds the resident original, B takes
    // watermark-advancing filler, C takes one early one-off arrival
    // whose state must be GC'd by timeout
    val cents3 = Array(Array(1.0f, 0.0f, 0.0f, 0.0f),
      Array(-1.0f, 0.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f, 0.0f))
    val base = embDf(Seq((0L, fv(1.0f), 0L)), t0).drop("ts")
    def mkBatches(in: String): Unit = {
      // b0: in-window near-copy of the resident (t+100) + the cell-C one-off (t+50)
      embDf(Seq((1L, fv(1.0f, 1e-5f), 100L), (5L, fv(0.0f, 1.0f), 50L)), t0)
        .coalesce(1).write.mode("overwrite").parquet(s"$in/b=000")
      // b1: cell-B filler 2h later — advances the watermark past cell
      // A's and C's deadlines (arrival + ttl)
      embDf(Seq((200L, fv(-1.0f, 0.0f, 0.5f), 7200L)), t0)
        .coalesce(1).write.mode("overwrite").parquet(s"$in/b=001")
      // b2: late near-copy at 2h+100s — resident (t0) and copy (t+100)
      // are both outside its window: NO pair may surface
      embDf(Seq((2L, fv(1.0f, 2e-5f), 7300L)), t0)
        .coalesce(1).write.mode("overwrite").parquet(s"$in/b=002")
    }
    def run(name: String, ttl: Int): (Set[(Long, Long)], Long) = {
      val in = tmp(s"$name-in"); val ckpt = tmp(s"$name-ck"); val out = tmp(s"$name-out")
      mkBatches(in)
      val schema = embDf(Seq((0L, fv(1.0f), 0L)), t0).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$in/b=*")
      val q = StreamingSemanticNearDup.semanticStream(spark, stream.toDF(),
          base, cents3, tsCol = Some("ts"), ttlSec = ttl, baseTsMs = t0)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(180000), "stream did not finish")
      val rowsTotal = q.recentProgress.reverse
        .find(_.stateOperators.nonEmpty).map(_.stateOperators.head.numRowsTotal)
        .getOrElse(-1L)
      (spark.read.parquet(out).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet, rowsTotal)
    }
    val (ttlPairs, ttlState) = run("ttl", ttlSec)
    assert(ttlPairs.contains((0L, 1L)), s"in-window pair must surface: $ttlPairs")
    assert(!ttlPairs.exists(p => p._1 == 2L || p._2 == 2L),
      s"aged claimants (the t0 resident included) must not match the late copy: $ttlPairs")
    // batch-equivalence INSIDE the window: the retain-forever twin
    // pairs the late copy against both aged claimants
    val (keepPairs, keepState) = run("keep", 0)
    assert(keepPairs == Set((0L, 1L), (0L, 2L), (1L, 2L)),
      s"retain-forever twin must pair all copies: $keepPairs")
    // and the TTL run's final state is strictly smaller: cell C was
    // timed out and removed, the retain-forever twin keeps every cell
    assert(ttlState >= 0 && keepState > ttlState,
      s"TTL state $ttlState must be below retain-forever state $keepState")
  }

  test("a frozen cell thaws by timeout and resumes emitting") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    val ttlSec = 3600
    val cents2 = Array(Array(1.0f, 0.0f, 0.0f, 0.0f), Array(-1.0f, 0.0f, 0.0f, 0.0f))
    val base = embDf(Seq((0L, fv(1.0f), 0L)), t0).drop("ts")
    val in = tmp("thaw-in"); val ckpt = tmp("thaw-ck"); val out = tmp("thaw-out")
    // b0: one near-copy pairs with the resident (cell A at 2 claimants)
    embDf(Seq((1L, fv(1.0f, 1e-5f), 100L)), t0)
      .coalesce(1).write.mode("overwrite").parquet(s"$in/b=000")
    // b1: two more near-copies tip cell A past maxCell=3 → the tipping
    // batch's output is suppressed and the cell FREEZES
    embDf(Seq((2L, fv(1.0f, 2e-5f), 150L), (3L, fv(1.0f, 3e-5f), 160L)), t0)
      .coalesce(1).write.mode("overwrite").parquet(s"$in/b=001")
    // b2: an arrival into the frozen cell is swallowed (extends the
    // cell's GC deadline to t+200+ttl)
    embDf(Seq((4L, fv(1.0f, 4e-5f), 200L)), t0)
      .coalesce(1).write.mode("overwrite").parquet(s"$in/b=002")
    // b3: cell-B filler 2h later advances the watermark past that
    // deadline; b4: more filler triggers the timed-out invocation that
    // REMOVES the frozen cell (the thaw)
    embDf(Seq((200L, fv(-1.0f, 0.0f, 0.5f), 7200L)), t0)
      .coalesce(1).write.mode("overwrite").parquet(s"$in/b=003")
    embDf(Seq((201L, fv(-1.0f, 0.2f, 0.5f), 7300L)), t0)
      .coalesce(1).write.mode("overwrite").parquet(s"$in/b=004")
    // b5: two fresh near-copies in the thawed cell pair again
    embDf(Seq((10L, fv(1.0f, 5e-5f), 7400L), (11L, fv(1.0f, 6e-5f), 7400L)), t0)
      .coalesce(1).write.mode("overwrite").parquet(s"$in/b=005")
    val schema = embDf(Seq((0L, fv(1.0f), 0L)), t0).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/b=*")
    val q = StreamingSemanticNearDup.semanticStream(spark, stream.toDF(),
        base, cents2, maxCell = 3, tsCol = Some("ts"), ttlSec = ttlSec, baseTsMs = t0)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000), "stream did not finish")
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((0L, 1L)), s"pre-freeze pair must stand: $got")
    assert(!got.exists(p => Set(2L, 3L, 4L).contains(p._1) || Set(2L, 3L, 4L).contains(p._2)),
      s"frozen-cell arrivals must stay suppressed: $got")
    assert(got.contains((10L, 11L)),
      s"the thawed cell must resume emitting: $got")
  }

  test("out-of-order rows within one trigger keep their own TTL windows (non-destructive trim)") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    val ttlSec = 7200
    val cents1 = Array(fv(1.0f).toArray)
    // resident original at t0
    val base = embDf(Seq((0L, fv(1.0f), 0L)), t0).drop("ts")
    val in = tmp("ooo-in"); val ckpt = tmp("ooo-ck"); val out = tmp("ooo-out")
    // ONE trigger carrying two near-copies OUT OF EVENT-TIME ORDER:
    // vec_id 10 is NEWER (t+8000 s — the resident is outside ITS
    // window) but folds FIRST (arrivals fold in vec_id order for
    // batch equality); vec_id 20 is OLDER (t+7000 s — the resident is
    // inside ITS window). A destructive per-arrival trim would let 10
    // permanently drop the resident before 20 runs (the r13 ADVICE
    // hazard); the TTL view is a per-arrival filter now, with ONE
    // state compaction against the batch's max event time.
    embDf(Seq((10L, fv(1.0f, 1e-5f), 8000L), (20L, fv(1.0f, 2e-5f), 7000L)), t0)
      .coalesce(1).write.mode("overwrite").parquet(s"$in/b=000")
    val schema = embDf(Seq((0L, fv(1.0f), 0L)), t0).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/b=*")
    val q = StreamingSemanticNearDup.semanticStream(spark, stream.toDF(),
        base, cents1, tsCol = Some("ts"), ttlSec = ttlSec, baseTsMs = t0)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000), "stream did not finish")
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((0L, 20L)),
      s"the older sibling's in-window resident pair must survive the newer sibling's aging: $got")
    assert(!got.contains((0L, 10L)),
      s"the resident is outside the newer arrival's own window: $got")
    assert(got.contains((10L, 20L)),
      s"the siblings are inside each other's windows: $got")
  }
}
