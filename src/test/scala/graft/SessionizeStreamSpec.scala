package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.SessionizeStream

class SessionizeStreamSpec extends SparkSpecBase {

  private def tmp(name: String): String = {
    val d = s"/root/repo/target/tmp/sessionize/$name"
    val p = Paths.get(d)
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder()).forEach(f => Files.delete(f))
    }
    Files.createDirectories(p)
    d
  }

  test("event-time-timeout closure emits more sessions, all matching the batch twin") {
    val events = Tables.events(spark, sf)
    val in = tmp("timeout-in")
    val ckpt = tmp("timeout-ckpt")
    val out = tmp("timeout-out")
    events.orderBy("ts").coalesce(1).write.mode("overwrite").parquet(in)
    val stream = spark.readStream
      .schema(spark.read.parquet(in).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(in)
    val q = SessionizeStream.sessionizeWithTimeout(spark, stream.toDF())
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(out)
    assert(streamed.count() > 0)
    val batch = graft.operators.Analytics.qSessionize(spark, sf)
      .select(col("user_id").as("u_b"), col("session_seq").as("seq_b"),
        col("n_events").as("n_b"), unix_micros(col("session_start")).as("start_b"))
    val joined = streamed.join(batch,
      col("user_id") === col("u_b") && col("session_seq") === col("seq_b") &&
        col("start_micros") === col("start_b") && col("n_events") === col("n_b"))
    assert(joined.count() == streamed.count(),
      "every timeout-closed session must match a batch session exactly")
  }

  test("stateful streaming sessions closed by gaps match the batch sessionize twin") {
    val events = Tables.events(spark, sf)
    val in = tmp("in")
    val ckpt = tmp("ckpt")
    val out = tmp("out")
    // arrive in event-time order split across files -> multiple micro-batches
    events.orderBy("ts").coalesce(1).write.mode("overwrite").parquet(in)
    val stream = spark.readStream
      .schema(spark.read.parquet(in).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(in)
    val q = SessionizeStream.sessionize(spark, stream.toDF())
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(out)
    assert(streamed.count() > 0, "no sessions closed by gaps")
    // batch twin: same gap rule via window lag/cumsum
    val batch = graft.operators.Analytics.qSessionize(spark, sf)
      .select(col("user_id").as("u_b"), col("session_seq").as("seq_b"),
        col("n_events").as("n_b"),
        unix_micros(col("session_start")).as("start_b"),
        unix_micros(col("session_end")).as("end_b"),
        col("session_value").as("v_b"))
    val joined = streamed.join(batch,
      col("user_id") === col("u_b") && col("session_seq") === col("seq_b") &&
        col("start_micros") === col("start_b"))
    assert(joined.count() == streamed.count(), "every closed session must exist in the batch result")
    val bad = joined.filter(col("n_events") =!= col("n_b") ||
      col("end_micros") =!= col("end_b") ||
      abs(col("session_value") - col("v_b")) > 0.011).count()
    assert(bad == 0)
  }
}
