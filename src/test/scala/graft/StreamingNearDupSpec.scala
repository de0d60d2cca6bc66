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
}
