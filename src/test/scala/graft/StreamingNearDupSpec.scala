package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.dedup.Dedup
import graft.streaming.StreamingNearDup

class StreamingNearDupSpec extends SparkSpecBase {

  private def tmp(name: String): String = {
    val d = s"/root/repo/target/tmp/streamneardup/$name"
    graft.util.Io.deleteRecursively(d)
    Files.createDirectories(Paths.get(d))
    d
  }

  // the batch operator's planted corpus: 25 near-dup copies (every
  // 60th token mutated) on top of the documents table
  private lazy val corpus: DataFrame =
    Dedup.withPlantedNearDups(Tables.documents(spark, sf), 25, mutate = true)

  private lazy val batchPairs: Set[(Long, Long, Double)] =
    Dedup.minhashPairs(corpus, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def streamPairs(nBatches: Int): Set[(Long, Long, Double)] = {
    val in = tmp(s"in$nBatches"); val ckpt = tmp(s"ckpt$nBatches"); val out = tmp(s"out$nBatches")
    // deterministic split: doc_id mod nBatches, one file per batch,
    // ordered so planted copies land in LATER batches than originals
    (0 until nBatches).foreach { b =>
      corpus.filter(pmod(col("doc_id"), lit(nBatches)) === b)
        .coalesce(1).write.mode("overwrite").parquet(f"$in/b=$b%03d")
    }
    val stream = spark.readStream.schema(corpus.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/b=*")
    val q = StreamingNearDup.neardupStream(spark, stream.toDF())
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    spark.read.parquet(out).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("single-batch stream reproduces the batch minhash pairs exactly") {
    assert(batchPairs.nonEmpty, "planted corpus must yield near-dup pairs")
    assert(streamPairs(1) == batchPairs)
  }

  test("streamed pairs equal batch pairs regardless of micro-batch split") {
    assert(streamPairs(3) == batchPairs)
    assert(streamPairs(7) == batchPairs)
  }

  test("a lightly-edited duplicate is flagged in the batch it arrives in, not at end of stream") {
    val in = tmp("arrv"); val ckpt = tmp("arrv-ckpt"); val out = tmp("arrv-out")
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    // batch 0: originals; batch 1: one mutated copy of doc 3 + fresh docs
    docs.filter(col("doc_id") < 100).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/b=000")
    docs.filter(col("doc_id") === 3)
      .select(lit(900003L).as("doc_id"), Dedup.mutatedText(col("text")).as("text"))
      .unionByName(docs.filter(col("doc_id").between(100, 120)))
      .coalesce(1).write.mode("overwrite").parquet(s"$in/b=001")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/b=*")
    val q = StreamingNearDup.neardupStream(spark, stream.toDF())
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val pairs = spark.read.parquet(out).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((3L, 900003L)),
      s"edited copy must pair with its original; got $pairs")
    // exact-dedup (StreamingDedup's hash) would NOT have caught it:
    val hashes = docs.filter(col("doc_id") === 3)
      .select(sha2(col("text"), 256)).head().getString(0)
    val mutated = docs.filter(col("doc_id") === 3)
      .select(sha2(Dedup.mutatedText(col("text")), 256)).head().getString(0)
    assert(hashes != mutated)
  }

  test("event-time TTL: in-window copies pair, aged claimants stop matching, state is GC'd") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    def ts(plusSec: Long) = new java.sql.Timestamp(t0 + plusSec * 1000)
    val ttlSec = 3600
    def mkBatches(in: String): Unit = {
      // b0: original doc 3 at t=0
      docs.filter(col("doc_id") === 3).withColumn("ts", lit(ts(0)))
        .coalesce(1).write.mode("overwrite").parquet(s"$in/b=000")
      // b1: edited copy 100s later — inside the window, must pair
      docs.filter(col("doc_id") === 3)
        .select(lit(900003L).as("doc_id"), Dedup.mutatedText(col("text")).as("text"))
        .withColumn("ts", lit(ts(100)))
        .coalesce(1).write.mode("overwrite").parquet(s"$in/b=001")
      // b2: unrelated filler 2h later — advances the watermark past
      // every doc-3 bucket's timeout (t + ttl), so those buckets GC
      docs.filter(col("doc_id").between(200, 220)).withColumn("ts", lit(ts(7200)))
        .coalesce(1).write.mode("overwrite").parquet(s"$in/b=002")
      // b3: another edited copy at 2h+100s — both earlier claimants are
      // outside its window (7300 - 100 > 3600): NO pair may surface
      docs.filter(col("doc_id") === 3)
        .select(lit(900004L).as("doc_id"), Dedup.mutatedText(col("text")).as("text"))
        .withColumn("ts", lit(ts(7300)))
        .coalesce(1).write.mode("overwrite").parquet(s"$in/b=003")
    }
    def run(name: String, ttl: Int): (Set[(Long, Long)], Long) = {
      val in = tmp(s"$name-in"); val ckpt = tmp(s"$name-ckpt"); val out = tmp(s"$name-out")
      mkBatches(in)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType)))
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$in/b=*")
      val q = StreamingNearDup.neardupStream(spark, stream.toDF(),
          tsCol = Some("ts"), ttlSec = ttl)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(180000)
      val rowsTotal = q.recentProgress.reverse
        .find(_.stateOperators.nonEmpty).map(_.stateOperators.head.numRowsTotal)
        .getOrElse(-1L)
      (spark.read.parquet(out).distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet, rowsTotal)
    }
    val (ttlPairs, ttlState) = run("ttl", ttlSec)
    assert(ttlPairs.contains((3L, 900003L)), s"in-window pair must surface: $ttlPairs")
    assert(!ttlPairs.exists(p => p._1 == 900004L || p._2 == 900004L),
      s"aged claimants must not match the late copy: $ttlPairs")
    // batch-equivalence INSIDE the window: retain-forever pairs the
    // late copy too (the only behavioral difference is the aging)
    val (keepPairs, keepState) = run("keep", 0)
    assert(keepPairs.contains((3L, 900003L)) && keepPairs.contains((3L, 900004L)),
      s"retain-forever twin must pair both copies: $keepPairs")
    // and the TTL run's final state is strictly smaller: the doc-3
    // buckets were timed out and removed, the retain-forever twin
    // keeps every bucket it ever saw
    assert(ttlState >= 0 && keepState > ttlState,
      s"TTL state $ttlState must be below retain-forever state $keepState")
  }

  test("out-of-order rows within one trigger keep their own TTL windows (non-destructive trim)") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    def ts(plusSec: Long) = new java.sql.Timestamp(t0 + plusSec * 1000)
    val ttlSec = 7200
    val in = tmp("ooo-in"); val ckpt = tmp("ooo-ckpt"); val out = tmp("ooo-out")
    // b0: the original claimant at t=0
    docs.filter(col("doc_id") === 3).withColumn("ts", lit(ts(0)))
      .coalesce(1).write.mode("overwrite").parquet(s"$in/b=000")
    // b1: ONE trigger with two edited copies OUT OF EVENT-TIME ORDER —
    // 900010 is newer (t+8000 s: the original is outside ITS window)
    // but folds first (doc_id order); 900020 is older (t+7000 s: the
    // original is inside ITS window and must still pair). The
    // destructive trim would have 900010 drop the original first.
    docs.filter(col("doc_id") === 3)
      .select(lit(900010L).as("doc_id"), Dedup.mutatedText(col("text")).as("text"),
        lit(ts(8000)).as("ts"))
      .unionByName(docs.filter(col("doc_id") === 3)
        .select(lit(900020L).as("doc_id"), Dedup.mutatedText(col("text")).as("text"),
          lit(ts(7000)).as("ts")))
      .coalesce(1).write.mode("overwrite").parquet(s"$in/b=001")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/b=*")
    val q = StreamingNearDup.neardupStream(spark, stream.toDF(),
        tsCol = Some("ts"), ttlSec = ttlSec)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000), "stream did not finish")
    val got = spark.read.parquet(out).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((3L, 900020L)),
      s"the older sibling's in-window pair must survive the newer sibling's aging: $got")
    assert(!got.contains((3L, 900010L)),
      s"the original is outside the newer copy's own window: $got")
    assert(got.contains((900010L, 900020L)),
      s"the siblings are inside each other's windows: $got")
  }
}
