package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.{CorpusDiff, CorpusStats}
import graft.streaming.StreamingDrift
import graft.text.TextAnalysis

class StreamingDriftSpec extends SparkSpecBase {

  private def tmp(name: String): String = {
    val d = s"/root/repo/target/tmp/streamdrift/$name"
    graft.util.Io.deleteRecursively(d)
    Files.createDirectories(Paths.get(d))
    d
  }

  test("streamed drift equals the batch quality_drift after all arrivals") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val delta = docs.filter(col("doc_id") % 7 =!= 0 &&
      (col("doc_id") % 13 === 0 || col("doc_id") % 5 === 0))
    val baseHist = CorpusStats.signalHist(
      TextAnalysis.qualitySignalsOn(CorpusDiff.carveOld(docs)), "nb", "sb")
      .cache()
    val in = tmp("in"); val out = tmp("out"); val ckpt = tmp("ckpt")
    // three micro-batches, deterministic split
    (0 until 3).foreach { b =>
      delta.filter(pmod(col("doc_id"), lit(3)) === b)
        .coalesce(1).write.mode("overwrite").parquet(f"$in/b=$b%03d")
    }
    val stream = spark.readStream.schema(delta.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/b=*")
    val q = StreamingDrift.driftStream(stream.toDF(), baseHist, out, ckpt)
    q.awaitTermination(180000)
    val streamed = spark.read.parquet(out).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5))).toMap
    val batch = CorpusStats.qualityDrift(
        TextAnalysis.qualitySignalsOn(CorpusDiff.carveOld(docs)),
        TextAnalysis.qualitySignalsOn(delta)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5))).toMap
    assert(streamed == batch,
      "after the last arrival the streamed drift must equal the batch report")
  }

  test("drift state is the bounded histogram: one batch prefix is a valid report") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val delta = docs.filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 5 === 0)
    val baseHist = CorpusStats.signalHist(
      TextAnalysis.qualitySignalsOn(CorpusDiff.carveOld(docs)), "nb", "sb")
    val in = tmp("pin"); val out = tmp("pout"); val ckpt = tmp("pckpt")
    delta.coalesce(1).write.mode("overwrite").parquet(s"$in/b=000")
    val stream = spark.readStream.schema(delta.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/b=*")
    val q = StreamingDrift.driftStream(stream.toDF(), baseHist, out, ckpt)
    q.awaitTermination(120000)
    val rep = spark.read.parquet(out)
    // one row per signal; counts match the prefix; L1 within its bound
    assert(rep.count() == CorpusStats.DriftSignals.size)
    val nd = rep.select("n_delta").distinct().collect().map(_.getLong(0))
    assert(nd.toSeq == Seq(delta.count()))
    assert(rep.filter(col("l1_bp") < 0 || col("l1_bp") > 20000).isEmpty)
  }
}
