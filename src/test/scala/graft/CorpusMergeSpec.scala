package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.operators.CorpusMerge

class CorpusMergeSpec extends SparkSpecBase {

  private lazy val verdicts =
    CorpusMerge.corpusMergeQuery(spark, sf).cache()

  private def byVerdict: Map[String, Long] =
    verdicts.groupBy("verdict").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("every document in either snapshot gets exactly one verdict") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val corpus = Dedup.withPlantedNearDups(docs, 25, mutate = true)
    // diff domain: old ∪ new = everything except originals hit by BOTH
    // carves (%13 removes from old, %7 removes from new)
    val expected = corpus.filter(
      !(col("doc_id") < Dedup.PlantOffset &&
        col("doc_id") % 13 === 0 && col("doc_id") % 7 === 0)).count()
    assert(verdicts.count() == expected)
    assert(verdicts.groupBy("doc_id").count().filter(col("count") > 1).isEmpty)
  }

  test("verdict ladder: carried==unchanged, drops only on delta docs") {
    val m = verdicts.groupBy("status", "verdict").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // carried iff unchanged; removed iff removed
    assert(m.keys.filter(_._2 == "carried").forall(_._1 == "unchanged"))
    assert(m.keys.filter(_._2 == "removed").forall(_._1 == "removed"))
    // dup verdicts only on added/changed docs
    assert(m.keys.filter(k => k._2.startsWith("dup_"))
      .forall(k => k._1 == "added" || k._1 == "changed"))
    // all six arms genuinely occur on the demo carve
    val v = byVerdict
    for (arm <- Seq("carried", "removed", "admitted_added",
        "admitted_changed", "dup_of_base", "dup_in_delta"))
      assert(v.getOrElse(arm, 0L) > 0, s"verdict arm $arm never occurs")
  }

  test("planted copies: resident original claims the copy, removed original frees it") {
    val copies = verdicts.filter(col("doc_id") >= Dedup.PlantOffset)
      .select(col("doc_id"), col("verdict")).collect()
      .map(r => (r.getLong(0) - Dedup.PlantOffset) -> r.getString(1)).toMap
    // original 13 is itself new (added): its copy loses inside the
    // crawl (lowest id wins), NOT against the base
    assert(copies(13L) == "dup_in_delta")
    // originals 5/10/15/20 are changed → delta: their copies lose in-delta
    for (i <- Seq(5L, 10L, 15L, 20L)) assert(copies(i) == "dup_in_delta")
    // originals 7/14/21 were REMOVED: the recrawl re-introduces that
    // content — copies must be admitted, not dropped against a ghost
    for (i <- Seq(7L, 14L, 21L)) assert(copies(i) == "admitted_added")
    // a copy whose original stayed resident drops as dup_of_base
    for (i <- Seq(1L, 2L, 3L, 4L, 6L)) assert(copies(i) == "dup_of_base")
  }

  test("base is never re-read: verdicts for base docs need no text join") {
    // carried + removed verdicts derive from the digest diff alone —
    // assert the counts match a digest-only recomputation
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val corpus = Dedup.withPlantedNearDups(docs, 25, mutate = true)
    val nUnchanged = corpus.filter(col("doc_id") < Dedup.PlantOffset &&
      col("doc_id") % 13 =!= 0 && col("doc_id") % 7 =!= 0 &&
      col("doc_id") % 5 =!= 0).count()
    val nRemoved = corpus.filter(col("doc_id") < Dedup.PlantOffset &&
      col("doc_id") % 7 === 0 && col("doc_id") % 13 =!= 0).count()
    val v = byVerdict
    assert(v.getOrElse("carried", 0L) == nUnchanged)
    assert(v.getOrElse("removed", 0L) == nRemoved)
  }

  test("the streaming intake gate agrees with the batch merge on every drop") {
    // the same merge, run the way a CONTINUOUS pipeline would: the
    // resident base streams in first (seeding the near-dup gate's
    // state), the crawl delta arrives in a later micro-batch; the
    // streamed pair report + the merge's drop ladder must reproduce
    // the batch verdicts doc-for-doc. Pair emission is split-invariant
    // (StreamingNearDupSpec), so this pins the LADDER's consistency
    // across the batch/streaming boundary.
    import java.nio.file.{Files, Paths}
    val dir = "/root/repo/target/tmp/mergegate"
    graft.util.Io.deleteRecursively(dir)
    Files.createDirectories(Paths.get(dir))
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val corpus = Dedup.withPlantedNearDups(docs, 25, mutate = true)
    val newSnap = CorpusMerge.carveNew(corpus)
    val status = verdicts.select("doc_id", "status")
    val deltaIds = status.filter(col("status").isin("added", "changed"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // batch 0: the resident base (unchanged docs); batch 1: the delta
    newSnap.join(status.filter(col("status") === "unchanged"), Seq("doc_id"), "left_semi")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/in/b=000")
    newSnap.join(status.filter(col("status").isin("added", "changed")), Seq("doc_id"), "left_semi")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/in/b=001")
    val stream = spark.readStream.schema(newSnap.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/b=*")
    val q = graft.streaming.StreamingNearDup.neardupStream(spark, stream.toDF())
      .writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val streamed = spark.read.parquet(s"$dir/out").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
      .filter(p => deltaIds(p._1) || deltaIds(p._2))
    // the merge's drop ladder over the STREAMED pairs
    val dropsBase = streamed.filter(p => deltaIds(p._1) ^ deltaIds(p._2))
      .map(p => if (deltaIds(p._1)) p._1 else p._2)
    val dropsDelta = streamed.filter(p => deltaIds(p._1) && deltaIds(p._2)).map(_._2)
    val streamVerdicts = (dropsBase.map(_ -> "dup_of_base") ++
      (dropsDelta -- dropsBase).map(_ -> "dup_in_delta")).toMap
    val batchVerdicts = verdicts.filter(col("verdict").startsWith("dup_"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(streamVerdicts == batchVerdicts,
      "intake-gate drops must equal the batch merge verdicts")
  }

  test("post-merge signals table equals the full recompute over kept docs") {
    val inc = CorpusMerge.corpusMergeSignalsQuery(spark, sf)
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val corpus = Dedup.withPlantedNearDups(docs, 25, mutate = true)
    val kept = verdicts.filter(col("verdict") === "carried" ||
      col("verdict").startsWith("admitted")).select("doc_id")
    val full = graft.text.TextAnalysis.qualitySignalsOn(
      CorpusMerge.carveNew(corpus).join(kept, Seq("doc_id"), "left_semi"))
    val cols = full.columns.map(col)
    assert(inc.select(cols: _*).exceptAll(full).isEmpty &&
      full.exceptAll(inc.select(cols: _*)).isEmpty,
      "carry ∪ delta-score must equal the full recompute on the merged corpus")
    // dropped and removed docs must have NO signal row
    assert(inc.join(verdicts.filter(col("verdict").isin(
      "removed", "dup_of_base", "dup_in_delta")), Seq("doc_id"), "left_semi").isEmpty)
  }

  test("self-contained ramp form agrees with the fixture-backed entry") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val onForm = CorpusMerge.corpusMergeOn(docs)
    assert(onForm.exceptAll(verdicts).isEmpty &&
      verdicts.exceptAll(onForm).isEmpty,
      "in-plan resident signing must not change any verdict")
  }
  test("degenerate merge: an empty delta yields only carried/removed verdicts") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "text").limit(50)
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 64, 3)
    // a diff where nothing was added or changed
    val diff = docs.select(col("doc_id"),
      when(col("doc_id") % 9 === 0, "removed").otherwise("unchanged").as("status"))
    val v = CorpusMerge.mergeVerdictsFromDiff(docs, sigs, diff)
      .groupBy("verdict").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v.keySet.subsetOf(Set("carried", "removed")))
    assert(v.values.sum == 50)
  }
}
