package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.query.{IvfSearch, PqSearch}
import graft.query.PqSearch.PqIndex
import graft.streaming.PqLifecycle

class PqLifecycleSpec extends SparkSpecBase {

  private def tmp(name: String): String = {
    val d = s"/root/repo/target/tmp/pqlife/$name"
    graft.util.Io.deleteRecursively(d)
    Files.createDirectories(Paths.get(d))
    d
  }

  private lazy val all = Tables.embeddings(spark, sf)
    .select("vec_id", "embedding").cache()
  private lazy val n = all.count()
  // models fit on the INITIAL corpus and frozen for the lifecycle
  private lazy val base = all.filter(col("vec_id") < n - 50)
  private lazy val cents = IvfSearch.fitCentroids(base, 8, Some("pqlife-cents"))
  private lazy val cb = PqSearch.fitCodebook(base, "pqlife-cb")

  private def freshLifecycle(name: String, compactEvery: Long): PqLifecycle = {
    val (cells, codes) = PqSearch.encode(spark, base, cents, cb)
    val idx = PqIndex(cells.cache(), codes.cache(), base, cents, cb)
    new PqLifecycle(spark, base, idx, tmp(name), compactEvery)
  }

  test("staged vectors are searchable via ADC immediately, before any compaction") {
    val life = freshLifecycle("stage", compactEvery = 1000000L)
    val arrivals = all.filter(col("vec_id") >= n - 50)
    life.ingest(arrivals, batchId = 0L)
    assert(life.compactions == 0 && life.stagedVectors == 50)
    // a staged vector self-matches at rank 1 through the ADC shortlist
    val q = arrivals.orderBy(col("vec_id").desc).limit(3)
    val got = life.serve(q, k = 5)
    val self = got.filter(col("rnk") === 1).select("query_id", "vec_id").collect()
    assert(self.length == 3 && self.forall(r => r.getLong(0) == r.getLong(1)),
      s"staged arrivals must self-match at rank 1: ${self.mkString(", ")}")
  }

  test("compaction is bit-identical to a fresh frozen-model encode, and serving is unchanged") {
    val life = freshLifecycle("compact", compactEvery = 1000000L)
    val arrivals = all.filter(col("vec_id") >= n - 50)
    life.ingest(arrivals, batchId = 0L)
    // main-resident and staged queries in one frame (a self-union of
    // `all` trips a Spark UnionBase constraint-rewrite quirk)
    val queries = all.filter(col("vec_id") < 5 || col("vec_id") >= n - 2)
    val before = life.serve(queries, k = 10).collect().toSet
    life.compactNow()
    assert(life.compactions == 1 && life.stagedVectors == 0)
    val after = life.serve(queries, k = 10).collect().toSet
    assert(before == after, "compaction must not change any serving result")
    // bit-for-bit: compacted cells/codes == one fresh encode of the union
    val (fCells, fCodes) = PqSearch.encode(spark, all, cents, cb)
    val idx = life.current
    assert(idx.cells.exceptAll(fCells).count() == 0
      && fCells.exceptAll(idx.cells).count() == 0)
    val codesFlat = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("vec_id"), posexplode(col("codes")))
    assert(codesFlat(idx.codes).exceptAll(codesFlat(fCodes)).count() == 0
      && codesFlat(fCodes).exceptAll(codesFlat(idx.codes)).count() == 0)
  }

  test("auto-compact fires at the threshold; replayed batches are ignored after compaction") {
    val life = freshLifecycle("auto", compactEvery = 30L)
    val arrivals = all.filter(col("vec_id") >= n - 50)
    life.ingest(arrivals.limit(20), batchId = 0L) // 20 staged < 30
    assert(life.compactions == 0)
    life.ingest(arrivals, batchId = 1L) // crosses the threshold
    assert(life.compactions == 1 && life.stagedVectors == 0)
    // foreachBatch redelivery of an already-compacted batch: no-op
    life.ingest(arrivals, batchId = 1L)
    assert(life.stagedVectors == 0 && life.compactions == 1)
  }

  test("delete: tombstoned ids never served; delete + staged insert combined equals compacted") {
    val life = freshLifecycle("delete", compactEvery = 1000000L)
    val arrivals = all.filter(col("vec_id") >= n - 50)
    life.ingest(arrivals, batchId = 0L)
    import spark.implicits._
    val deadIds = Seq(0L, 3L, n - 49) // two resident rows + one staged row
    life.delete(deadIds.toDF("id"))
    val queries = all.filter(col("vec_id") < 5 || col("vec_id") >= n - 2)
    // tombstones effective immediately, before any compaction
    val before = life.serve(queries, k = 10).cache()
    assert(before.filter(col("vec_id").isin(deadIds: _*)).count() == 0,
      "deleted ids served before compaction")
    assert(before.groupBy("query_id").count().collect().forall(_.getLong(1) == 10),
      "tombstones must not eat the shortlist budget")
    val beforeSet = before.collect().toSet
    before.unpersist()
    // the compaction consumes tombstones physically; serving unchanged
    life.compactNow()
    assert(life.compactions == 1 && life.deletedIds.isEmpty)
    val after = life.serve(queries, k = 10).collect().toSet
    assert(beforeSet == after,
      "delete + staged insert combined must equal the compacted index")
    // bit-for-bit: compacted state == fresh encode of (all minus dead)
    val surviving = all.filter(!col("vec_id").isin(deadIds: _*))
    val (fCells, _) = PqSearch.encode(spark, surviving, cents, cb)
    val idx = life.current
    assert(idx.cells.exceptAll(fCells).count() == 0
      && fCells.exceptAll(idx.cells).count() == 0)
  }

  test("applyDiff: the corpus_merge removed/changed feed lands on the serving tier") {
    // OLD snapshot (the lifecycle's resident corpus): the Carves story
    // over vectors — missing the `added` ids, STALE vectors (negated)
    // for the `changed` ids; NEW snapshot: true vectors, minus `removed`
    val ids = all.select("vec_id", "embedding")
    val oldSnap = ids.filter(graft.Carves.inOld(col("vec_id")))
      .select(col("vec_id"),
        when(col("vec_id") % graft.Carves.ChangedMod === 0,
          transform(col("embedding"), x => -x)).otherwise(col("embedding"))
          .as("embedding"))
    val newSnap = ids.filter(graft.Carves.inNew(col("vec_id")))
    // the digest diff over the same carve (text stands in for the
    // vector payload — CorpusDiff is payload-agnostic)
    val asDocs = (df: org.apache.spark.sql.DataFrame) => df.select(
      col("vec_id").as("doc_id"), col("embedding").cast("string").as("text"))
    val diff = graft.operators.CorpusDiff.corpusDiff(asDocs(oldSnap), asDocs(newSnap))
    // resident index over the OLD snapshot, frozen models
    val (oCells, oCodes) = PqSearch.encode(spark, oldSnap, cents, cb)
    val life = new PqLifecycle(spark, oldSnap,
      PqIndex(oCells.cache(), oCodes.cache(), oldSnap, cents, cb),
      tmp("applydiff"), 1000000L)
    life.applyDiff(diff, newSnap)
    // serving now equals a fresh frozen-model index over the NEW snapshot
    val queries = newSnap.filter(col("vec_id") < 30)
    val got = life.serve(queries, k = 10).collect().toSet
    val (fCells, fCodes) = PqSearch.encode(spark, newSnap, cents, cb)
    val want = PqSearch.topKForQueries(spark,
      queries.select(col("vec_id").as("query_id"), col("embedding").as("qv")),
      fCells, fCodes, newSnap, cents, cb, 10).collect().toSet
    assert(got == want,
      "after applyDiff, serving must equal a fresh index over the new snapshot")
    // removed ids are really gone; changed ids serve their NEW vectors
    val removed = diff.filter(col("status") === "removed")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.forall(r => !removed.contains(r.getLong(1))))
  }

  test("streaming sink: arrivals land through foreachBatch and serve afterwards") {
    val life = freshLifecycle("sink", compactEvery = 1000000L)
    val in = tmp("sink-in"); val ckpt = tmp("sink-ckpt")
    val arrivals = all.filter(col("vec_id") >= n - 50)
    arrivals.filter(col("vec_id") % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/b=0")
    arrivals.filter(col("vec_id") % 2 =!= 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/b=1")
    val stream = spark.readStream.schema(arrivals.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/b=*")
    life.sink(stream.toDF(), ckpt).awaitTermination(120000)
    assert(life.stagedVectors == 50)
    val q = arrivals.orderBy("vec_id").limit(2)
    val self = life.serve(q, k = 3).filter(col("rnk") === 1)
      .select("query_id", "vec_id").collect()
    assert(self.length == 2 && self.forall(r => r.getLong(0) == r.getLong(1)))
  }
}
