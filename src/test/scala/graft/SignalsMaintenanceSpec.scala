package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusDiff, SignalsMaintenance}
import graft.text.TextAnalysis

class SignalsMaintenanceSpec extends SparkSpecBase {

  test("quality_signals_delta == full recompute over the new snapshot") {
    val inc = SignalsMaintenance.qualitySignalsDelta(spark, sf)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val full = TextAnalysis.qualitySignalsOn(CorpusDiff.carveNew(docs))
    val cols = full.columns.map(col)
    assert(inc.select(cols: _*).exceptAll(full).isEmpty &&
      full.exceptAll(inc.select(cols: _*)).isEmpty,
      "incremental merge must equal the full recompute row-for-row")
  }

  test("only the delta pays the text pass: branch accounting") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val oldSnap = CorpusDiff.carveOld(docs)
    val newSnap = CorpusDiff.carveNew(docs)
    val diff = CorpusDiff.corpusDiff(oldSnap, newSnap)
      .groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = TextAnalysis.qualitySignalsOn(oldSnap)
    val inc = SignalsMaintenance.signalsDelta(base, oldSnap, newSnap)
    // result covers exactly the new snapshot
    assert(inc.count() == newSnap.count())
    // the scored branch is exactly added+changed; the carried branch
    // is exactly unchanged (removed appears nowhere)
    val deltaIds = diff.getOrElse("added", 0L) + diff.getOrElse("changed", 0L)
    val scored = TextAnalysis.qualitySignalsOn(
      newSnap.join(CorpusDiff.corpusDiff(oldSnap, newSnap)
        .filter(col("status").isin("added", "changed")).select("doc_id"),
        Seq("doc_id"), "left_semi"))
    assert(scored.count() == deltaIds)
    assert(inc.count() - scored.count() == diff.getOrElse("unchanged", 0L))
    // the carve genuinely exercises a delta AND a carried majority
    assert(deltaIds > 0 && diff.getOrElse("unchanged", 0L) > deltaIds)
  }

  test("carried rows are bit-identical to the base table rows") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma"), (2L, "the quick brown fox"),
      (3L, "delta epsilon"), (4L, "zeta eta theta")).toDF("doc_id", "text")
    val oldSnap = docs.filter(col("doc_id") =!= 4L)
    val newSnap = docs.filter(col("doc_id") =!= 3L) // 3 removed, 4 added
      .withColumn("text",
        when(col("doc_id") === 2L, lit("an edited document")).otherwise(col("text")))
    val base = TextAnalysis.qualitySignalsOn(oldSnap)
    val inc = SignalsMaintenance.signalsDelta(base, oldSnap, newSnap).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(inc.keySet == Set(1L, 2L, 4L), "removed doc 3 must drop out")
    val baseRow1 = base.filter(col("doc_id") === 1L).collect().head
    assert(inc(1L) == baseRow1, "unchanged doc rides the base row untouched")
    val fresh = TextAnalysis.qualitySignalsOn(newSnap).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(inc(2L) == fresh(2L) && inc(4L) == fresh(4L),
      "changed/added docs are scored from new text")
  }
}
