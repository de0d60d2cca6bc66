package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.CorpusStats
import graft.streaming.StreamingCms

/** The streamed Count-Min sketch equals the batch sketch bit-for-bit. */
class StreamingCmsSpec extends SparkSpecBase {

  private def tmp(name: String): String = {
    val d = s"/root/repo/target/tmp/streamcms/$name"
    val p = Paths.get(d)
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder()).forEach(f => Files.delete(f))
    }
    Files.createDirectories(p)
    d
  }

  test("final streamed sketch equals the batch cmsSketch across micro-batch splits") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val in = tmp("in"); val ckpt = tmp("ckpt"); val out = tmp("out")
    docs.filter(col("doc_id") % 3 === 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/batch=0")
    docs.filter(col("doc_id") % 3 === 1).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/batch=1")
    docs.filter(col("doc_id") % 3 === 2).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/batch=2")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/batch=*")
    val q = StreamingCms.cmsStream(stream.toDF(), out, ckpt, Trigger.AvailableNow())
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(out)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val batch = CorpusStats.cmsSketch(docs, "doc_id", "text", CorpusStats.TopGramWidth)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(streamed == batch,
      s"streamed sketch diverges from batch: ${streamed.size} vs ${batch.size} cells")
    // state is constant-size: never more than depth x width cells
    assert(streamed.size <= CorpusStats.CmsDepth * CorpusStats.CmsWidth)
  }
}
