package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.CorpusStats
import graft.streaming.StreamingStats

/** The streaming composition report converges to the batch report. */
class StreamingStatsSpec extends SparkSpecBase {

  private def tmp(name: String): String = {
    val d = s"/root/repo/target/tmp/streamstats/$name"
    val p = Paths.get(d)
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder()).forEach(f => Files.delete(f))
    }
    Files.createDirectories(p)
    d
  }

  test("final streamed report equals the batch corpus_stats") {
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "lang", "text")
    val in = tmp("in"); val ckpt = tmp("ckpt"); val out = tmp("out")
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/batch=0")
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/batch=1")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/batch=*")
    val q = StreamingStats.statsStream(stream.toDF(), out, ckpt, Trigger.AvailableNow())
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(out)
    val batch = CorpusStats.corpusStats(docs)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0
      && batch.exceptAll(streamed).count() == 0)
  }

  test("streamed exact quantiles equal a batch pass over all arrivals, bit for bit") {
    import graft.operators.{Dsir, Quantiles}
    import graft.streaming.StreamingQuantiles
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
    // resident map-only scorer (the intake composition): DSIR weights
    val model = Dsir.fit(docs, "doc_id", "text", col("lang") === Dsir.DsirTargetLang)
    val in = tmp("q_in"); val ckpt = tmp("q_ckpt"); val out = tmp("q_out")
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/batch=0")
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/batch=1")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/batch=*")
    val q = StreamingQuantiles.quantileStream(
      Dsir.scoreWith(stream.toDF(), "doc_id", "text", model), "dsir_w",
      Quantiles.DefaultPs, out, ckpt, Trigger.AvailableNow())
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(out)
    val batch = Quantiles.exactQuantiles(
      Dsir.scoreWith(docs, "doc_id", "text", model), "dsir_w")
    assert(streamed.count() == Quantiles.DefaultPs.size.toLong)
    assert(streamed.exceptAll(batch).count() == 0
      && batch.exceptAll(streamed).count() == 0)
  }
}
