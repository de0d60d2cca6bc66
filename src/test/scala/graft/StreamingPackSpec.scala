package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Corpus
import graft.streaming.StreamingPack

class StreamingPackSpec extends SparkSpecBase {

  private def tmp(name: String): String = {
    val d = s"/root/repo/target/tmp/streampack/$name"
    val p = Paths.get(d)
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder()).forEach(f => Files.delete(f))
    }
    Files.createDirectories(p)
    d
  }

  test("streamed pack slots equal the batch seq_pack across micro-batches") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
    val in = tmp("in")
    val ckpt = tmp("ckpt")
    val out = tmp("out")
    // doc_id-ordered batches: the packing order a continuous ingest
    // naturally delivers (per stratum, batch 0's ids precede batch 1's)
    docs.filter(col("doc_id") < 250).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/batch=0")
    docs.filter(col("doc_id") >= 250).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/batch=1")
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$in/batch=*")
    val q = StreamingPack.packStream(spark, stream.toDF(), "lang", budget = 2048)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(out)
      .select(col("doc_id"), col("stratum"), col("n_tokens"),
        col("pack_id"), col("pack_offset"))
    val batch = Corpus.seqPack(docs, "lang", budget = 2048)
      .select(col("doc_id"), col("lang").as("stratum"),
        col("n_tokens").cast("long"), col("pack_id"), col("pack_offset"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed pack assignment must equal the batch packer")
    // the running total genuinely crosses the batch boundary: batch-1
    // docs land in packs continuing from batch-0 state, not at pack 0
    val minLatePack = streamed.filter(col("doc_id") >= 250)
      .groupBy("stratum").agg(min("pack_id").as("p"))
      .agg(max("p")).head().getLong(0)
    assert(minLatePack > 0, "cross-batch state must continue the running total")
  }
}
