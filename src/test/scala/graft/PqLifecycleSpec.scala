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
