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
}
