package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusDiff

class CorpusDiffSpec extends SparkSpecBase {

  test("corpus_diff entry: statuses replay the snapshot carve exactly") {
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val got = CorpusDiff.corpusDiffQuery(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    ids.foreach { id =>
      val inOld = id % 13 != 0
      val inNew = id % 7 != 0
      val expect =
        if (!inOld && !inNew) None
        else if (!inOld) Some("added")
        else if (!inNew) Some("removed")
        else if (id % 5 == 0) Some("changed")
        else Some("unchanged")
      assert(got.get(id) == expect, s"doc $id: got ${got.get(id)}, expect $expect")
    }
    assert(got.keySet == ids.filter(id => id % 13 != 0 || id % 7 != 0),
      "diff covers exactly the union of the snapshots")
    // the carve must exercise all four statuses at this corpus
    assert(got.values.toSet == Set("added", "removed", "changed", "unchanged"))
  }

  test("corpusDiff generic: empty old -> all added; identical snapshots -> all unchanged") {
    import spark.implicits._
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val empty = docs.filter(lit(false))
    assert(CorpusDiff.corpusDiff(empty, docs).collect()
      .forall(_.getString(1) == "added"))
    assert(CorpusDiff.corpusDiff(docs, empty).collect()
      .forall(_.getString(1) == "removed"))
    assert(CorpusDiff.corpusDiff(docs, docs).collect()
      .forall(_.getString(1) == "unchanged"))
    // a one-char edit flips exactly that doc to changed
    val edited = docs.withColumn("text",
      when(col("doc_id") === 2L, lit("B")).otherwise(col("text")))
    val st = CorpusDiff.corpusDiff(docs, edited).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st == Map(1L -> "unchanged", 2L -> "changed", 3L -> "unchanged"))
  }
}
