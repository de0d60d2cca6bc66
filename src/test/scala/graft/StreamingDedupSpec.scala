package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingDedup

class StreamingDedupSpec extends SparkSpecBase {

  private def tmp(name: String): String = {
    val d = s"/root/repo/target/tmp/streamdedup/$name"
    val p = Paths.get(d)
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder()).forEach(f => Files.delete(f))
    }
    Files.createDirectories(p)
    d
  }

  test("cross-batch duplicate suppression keeps exactly the first occurrence") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val in = tmp("in")
    val ckpt = tmp("ckpt")
    val out = tmp("out")
    // batch 0: originals; batch 1: 30 exact copies under new ids + 10 fresh docs
    docs.filter(col("doc_id") < 490).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/batch=0")
    docs.filter(col("doc_id") < 30)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") >= 490))
      .coalesce(1).write.mode("overwrite").parquet(s"$in/batch=1")
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$in/batch=*")
    val q = StreamingDedup.dedupStream(spark, stream.toDF())
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val kept = spark.read.parquet(out)
    // all 500 distinct contents kept exactly once; copies suppressed
    assert(kept.count() == 500)
    assert(kept.select("content_hash").distinct().count() == 500)
    assert(kept.filter(col("doc_id") >= 1000000).count() == 0,
      "cross-batch copies must be suppressed in favor of first occurrences")
  }
}
