package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.UrlIntake
import graft.text.UrlFilter

class UrlIntakeSpec extends SparkSpecBase {

  private def tmp(name: String): String = {
    val d = s"/root/repo/target/tmp/urlintake/$name"
    val p = Paths.get(d)
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder()).forEach(f => Files.delete(f))
    }
    Files.createDirectories(p)
    d
  }

  test("streamed URL verdicts equal the batch url_filter across micro-batches") {
    val urls = UrlFilter.withPlantedUrls(Tables.documents(spark, sf))
    val in = tmp("in")
    val ckpt = tmp("ckpt")
    val out = tmp("out")
    // micro-batches split in doc_id order (the crawl arrives in crawl
    // order): the batch owner (min doc_id) is then always the first
    // arrival, so streamed == batch row-for-row
    urls.filter(col("doc_id") < 250).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/batch=0")
    urls.filter(col("doc_id") >= 250).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/batch=1")
    val stream = spark.readStream
      .schema(urls.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$in/batch=*")
    val q = UrlIntake.urlStream(spark, stream.toDF())
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(out)
      .select("doc_id", "url", "url_norm", "fail_reason", "keep")
    val batch = UrlFilter.urlFilter(urls)
      .select("doc_id", "url", "url_norm", "fail_reason", "keep")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed verdicts must equal the batch operator")
    // the recrawl state genuinely fires across the batch boundary:
    // some url_norm first seen in batch 0 recurs in batch 1 as dup_url
    val crossDups = streamed.filter(col("doc_id") >= 250 &&
      col("fail_reason") === "dup_url")
      .join(streamed.filter(col("doc_id") < 250).select("url_norm").distinct(),
        "url_norm")
    assert(crossDups.count() > 0, "expected cross-batch recrawl suppression")
  }
}
