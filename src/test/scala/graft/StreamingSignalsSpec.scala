package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.CorpusDiff
import graft.streaming.StreamingSignals
import graft.text.TextAnalysis

class StreamingSignalsSpec extends SparkSpecBase {

  private def tmp(name: String): String = {
    val d = s"/root/repo/target/tmp/streamsignals/$name"
    graft.util.Io.deleteRecursively(d)
    Files.createDirectories(Paths.get(d))
    d
  }

  private def runStream(in: String, schema: org.apache.spark.sql.types.StructType,
      tsCol: Option[String] = None, ttlSec: Int = 0): DataFrame = {
    val ckpt = tmp(s"${Paths.get(in).getFileName}-ckpt")
    val out = tmp(s"${Paths.get(in).getFileName}-out")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/b=*")
    val q = StreamingSignals.signalsStream(spark, stream.toDF(), tsCol, ttlSec)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    spark.read.parquet(out)
  }

  test("snapshot replay: emissions == old adds + the batch delta, signals bit-equal") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val oldSnap = CorpusDiff.carveOld(docs)
    val newSnap = CorpusDiff.carveNew(docs)
    val in = tmp("snap")
    oldSnap.coalesce(1).write.mode("overwrite").parquet(s"$in/b=000")
    newSnap.coalesce(1).write.mode("overwrite").parquet(s"$in/b=001")
    val got = runStream(in, oldSnap.schema).collect()
      .map(r => (r.getLong(0), r.getString(1), r.toSeq.drop(2))).toSet
    val diff = CorpusDiff.corpusDiff(oldSnap, newSnap)
    def tagged(snap: DataFrame, ids: DataFrame, status: String) =
      TextAnalysis.qualitySignalsOn(snap.join(ids, Seq("doc_id"), "left_semi"))
        .collect().map(r => (r.getLong(0), status, r.toSeq.drop(1)))
    // phase 1 emits every old doc as added (with OLD text signals);
    // phase 2 emits exactly the batch delta: added docs and changed
    // docs (with NEW text signals); unchanged docs emit nothing more
    val expected = (
      tagged(oldSnap, oldSnap.select("doc_id"), "added") ++
      tagged(newSnap, diff.filter(col("status") === "added").select("doc_id"), "added") ++
      tagged(newSnap, diff.filter(col("status") === "changed").select("doc_id"), "changed")
    ).toSet
    assert(got == expected)
  }

  test("identical re-arrivals emit nothing, across any micro-batch split") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 50)
    val in = tmp("dup")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$in/b=000")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$in/b=001")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$in/b=002")
    val got = runStream(in, docs.schema)
    assert(got.count() == docs.count())
    assert(got.select("status").distinct().collect().map(_.getString(0)).toSeq == Seq("added"))
  }

  test("event-time TTL: in-window re-arrival suppressed, aged re-arrival is a refetch") {
    import spark.implicits._
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val in = tmp("ttl")
    def write(b: Int, ts: Long): Unit =
      Seq((7L, "a stable document", at(ts))).toDF("doc_id", "text", "ts")
        .coalesce(1).write.mode("overwrite").parquet(f"$in/b=$b%03d")
    write(0, 0); write(1, 30); write(2, 200) // TTL 100s: 30 in, 200 out
    val got = runStream(in,
      Seq((7L, "x", at(0))).toDF("doc_id", "text", "ts").schema,
      tsCol = Some("ts"), ttlSec = 100).collect()
    assert(got.length == 2, "first sighting + the aged refetch, nothing else")
    assert(got.forall(_.getString(1) == "added"), "an aged refetch is a fresh add")
  }

  test("a wholly-late micro-batch cannot move lastSeen backward (no spurious TTL refetch)") {
    import graft.streaming.StreamingSignals._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def arr(tsMs: Long) =
      DocArrival(7L, "a stable document", "fp-a", new java.sql.Timestamp(tsMs))
    def stateOf(d: DocDigest) = TestGroupState.create[DocDigest](
      org.apache.spark.api.java.Optional.of(d),
      GroupStateTimeout.EventTimeTimeout(), 0L,
      org.apache.spark.api.java.Optional.of(0L), false)
    val ttl = 500L
    // digest last sighted at t=1000; a wholly-late batch (t=200) arrives
    val s = stateOf(DocDigest("fp-a", 1000L))
    assert(gateTtl(ttl)(7L, Iterator(arr(200L)), s).isEmpty,
      "late duplicate must stay suppressed")
    assert(s.get.lastSeenMs == 1000L,
      "lastSeen must not move backward on a late batch")
    // next in-order arrival at t=1400 (400ms after the true lastSeen):
    // inside the TTL window -> still suppressed. Under the pre-fix
    // behavior lastSeen would read 200 and 1400-200 > ttl would
    // fabricate an 'added' re-emit.
    val s2 = stateOf(s.get)
    assert(gateTtl(ttl)(7L, Iterator(arr(1400L)), s2).isEmpty,
      "in-window re-arrival after a late batch must stay suppressed")
    assert(s2.get.lastSeenMs == 1400L)
  }
}
