package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Embeddings
import graft.streaming.StreamingEmbedDrift

class StreamingEmbedDriftSpec extends SparkSpecBase {

  private def tmp(name: String): String = {
    val d = s"/root/repo/target/tmp/streamembeddrift/$name"
    graft.util.Io.deleteRecursively(d)
    Files.createDirectories(Paths.get(d))
    d
  }

  private lazy val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
  private lazy val base = emb.filter(col("vec_id") % 5 =!= 0)
  // the entry's planted regression: dim 1 collapses, dim 2 flips
  private def regressed(df: DataFrame): DataFrame =
    df.select(col("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === 1, lit(0.0f)).when(i === 2, -x).otherwise(x))
        .as("embedding"))
  private lazy val delta = regressed(emb.filter(col("vec_id") % 5 === 0))
  private lazy val baseDiag = Embeddings.embedDiagnostics(base).cache()

  private def collectDrift(df: DataFrame): Map[Int, Seq[Any]] =
    df.collect().map(r => r.getInt(0) -> r.toSeq.tail).toMap

  test("streamed embed drift equals the batch embed_drift after all arrivals; prefixes valid") {
    val in = tmp("in"); val out = tmp("out"); val ckpt = tmp("ckpt")
    val hist = tmp("hist")
    (0 until 3).foreach { b =>
      delta.filter(pmod(col("vec_id"), lit(3)) === b)
        .coalesce(1).write.mode("overwrite").parquet(f"$in/b=$b%03d")
    }
    val stream = spark.readStream.schema(delta.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/b=*")
    val q = StreamingEmbedDrift.driftStream(stream.toDF(), baseDiag, out, ckpt,
      history = Some(hist))
    q.awaitTermination(180000)
    // final report == the batch twin exactly (shared aggregation + join)
    val streamed = collectDrift(spark.read.parquet(out))
    val batch = collectDrift(Embeddings.embedDrift(base, delta))
    assert(streamed == batch,
      "after the last arrival the streamed drift must equal the batch report")
    // EVERY prefix is the batch report of that prefix (complete-mode
    // state is the dim-keyed aggregate — order-insensitive and exact)
    for (b <- 0 until 3) {
      val prefix = delta.filter(pmod(col("vec_id"), lit(3)) <= b)
      val snap = collectDrift(spark.read.parquet(f"$hist/batch=$b%03d"))
      assert(snap == collectDrift(Embeddings.embedDrift(base, prefix)),
        s"prefix $b must be a valid batch report of exactly those arrivals")
    }
  }

  test("an encoder regression landing mid-stream fires the alarm in that trigger") {
    val in = tmp("min"); val out = tmp("mout"); val ckpt = tmp("mckpt")
    val hist = tmp("mhist")
    val healthy = emb.filter(col("vec_id") % 5 === 0)
    // batch 0: healthy vectors from the same encoder; batch 1: a
    // broken encoder takes over (un-normalized outputs, +0.5 on every
    // dim — the rollout-forgot-the-normalizer failure). The monitor's
    // state is the CUMULATIVE prefix, so the regression must survive
    // ~50% dilution: shift 0.5 -> cumulative ~0.25 >> the 0.1 alarm.
    healthy.filter(col("vec_id") % 2 === 0)
      .coalesce(1).write.mode("overwrite").parquet(s"$in/b=000")
    healthy.filter(col("vec_id") % 2 =!= 0)
      .select(col("vec_id"),
        transform(col("embedding"), x => x + lit(0.5f)).as("embedding"))
      .coalesce(1).write.mode("overwrite").parquet(s"$in/b=001")
    val stream = spark.readStream.schema(healthy.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/b=*")
    val q = StreamingEmbedDrift.driftStream(stream.toDF(), baseDiag, out, ckpt,
      history = Some(hist))
    q.awaitTermination(180000)
    // trigger 0 (healthy prefix): nothing drifted
    val before = spark.read.parquet(s"$hist/batch=000")
    assert(before.filter(col("drifted") === 1).isEmpty,
      "healthy arrivals must not trip the alarm")
    // trigger 1 (regression arrived): every dim shifts ~0.25 — the
    // alarm fires across the board IN THE TRIGGER the rollout lands
    val after = spark.read.parquet(s"$hist/batch=001")
    assert(after.filter(col("drifted") === 1).count() == after.count(),
      "the regression must fire the alarm in the trigger it lands")
  }
}
