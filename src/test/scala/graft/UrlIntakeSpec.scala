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

  test("event-time TTL: URL ownership expires — an aged recrawl is a legitimate refetch") {
    import org.apache.spark.sql.types._
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    def ts(plusSec: Long) = new java.sql.Timestamp(t0 + plusSec * 1000)
    val ttlSec = 3600
    val urlA = "https://plainsite.com/page-1"
    val in = tmp("ttl-in"); val ckpt = tmp("ttl-ckpt"); val out = tmp("ttl-out")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("url", StringType),
      StructField("ts", TimestampType)))
    import spark.implicits._
    def write(b: Int, rows: Seq[(Long, String, java.sql.Timestamp)]): Unit =
      rows.toDF("doc_id", "url", "ts").coalesce(1)
        .write.mode("overwrite").parquet(f"$in/b=$b%03d")
    write(0, Seq((1L, urlA, ts(0))))                              // first sighting: ok
    write(1, Seq((2L, urlA, ts(100))))                            // in-window recrawl: dup
    write(2, Seq((3L, "https://othersite.org/x", ts(7200))))      // filler advances watermark
    write(3, Seq((4L, urlA, ts(7300))))                           // aged: fresh owner again
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/b=*")
    val q = UrlIntake.urlStream(spark, stream.toDF(),
        tsCol = Some("ts"), ttlSec = ttlSec)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val verdicts = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(verdicts(1L) == "ok", verdicts.toString)
    assert(verdicts(2L) == "dup_url", "in-window recrawl must stay suppressed")
    assert(verdicts(3L) == "ok")
    assert(verdicts(4L) == "ok",
      s"a recrawl older than the TTL is a legitimate refetch: $verdicts")
  }
}
