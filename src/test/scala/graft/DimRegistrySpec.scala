package graft

import org.apache.spark.sql.functions._

import graft.lsh.LshParams
import graft.query.{AnnQuery, DimRegistry}

/** Per-dimension model/index registry: mixed-dim corpora served with
  * per-dim routing (reference tokenFactories.get(dim)). */
class DimRegistrySpec extends SparkSpecBase {

  private lazy val corpus = DimRegistry.twoDimCorpus(spark, sf).cache()
  private lazy val registry = DimRegistry.build(corpus, "vec_id", "embedding", LshParams())

  test("registry fits and builds one index per distinct dimension") {
    assert(registry.keySet == Set(32, 64), registry.keySet.toString)
    // each per-dim index holds exactly its dim's vectors
    val n = corpus.count()
    val perDim = registry.map { case (d, e) =>
      d -> e.built.membership.select("id").distinct().count()
    }
    assert(perDim(64) + perDim(32) == n, perDim.toString)
    // ids route by parity (even = full dim, odd = truncated)
    assert(registry(64).built.membership.filter(col("id") % 2 =!= 0).count() == 0)
    assert(registry(32).built.membership.filter(col("id") % 2 === 0).count() == 0)
  }

  test("each query's top-k matches its own-dim brute force; results never cross dims") {
    val queries = corpus.filter(col("vec_id") < 10)
    val got = DimRegistry.topK(spark, corpus, queries, 10, registry).cache()
    // no result crosses dimensions: parity of result id == parity of query id
    assert(got.filter(col("query_id") % 2 =!= col("vec_id") % 2).count() == 0)
    // self-match at rank 1 in both dims
    got.filter(col("rnk") === 1).collect()
      .foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
    // recall vs the own-dim exact oracle, per dim
    for (d <- Seq(32, 64)) {
      val qd = queries.filter(size(col("embedding")) === d)
      val gt = AnnQuery.bruteTopK(corpus.filter(size(col("embedding")) === d), qd, 10)
      val hits = got.join(gt.select("query_id", "vec_id"), Seq("query_id", "vec_id")).count()
      val recall = hits.toDouble / gt.count()
      assert(recall >= 0.8, s"dim $d recall@10 = $recall")
    }
    got.unpersist()
  }

  test("a query dimension with no registered index fails loudly") {
    import spark.implicits._
    val alien = Seq((999999L, Array.fill(16)(0.5f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](
      DimRegistry.topK(spark, corpus, alien, 5, registry))
    assert(e.getMessage.contains("16"), e.getMessage)
    // an empty query batch yields an empty, correctly-shaped result
    val empty = DimRegistry.topK(spark, corpus, corpus.filter(col("vec_id") < 0), 5, registry)
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("query_id", "vec_id", "dist", "rnk"))
  }

  test("streamed mixed-dim serving equals batch routing across micro-batch boundaries") {
    import java.nio.file.{Files, Paths}
    def tmp(name: String): String = {
      val d = s"/root/repo/target/tmp/multidim-serve/$name"
      val p = Paths.get(d)
      if (Files.exists(p)) {
        Files.walk(p).sorted(java.util.Comparator.reverseOrder()).forEach(f => Files.delete(f))
      }
      Files.createDirectories(p)
      d
    }
    val queries = corpus.filter(col("vec_id") < 8)
    val in = tmp("in"); val out = tmp("out"); val ckpt = tmp("ckpt")
    // split so each micro-batch carries BOTH dims (routing per batch)
    queries.filter(col("vec_id") < 4).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/batch=0")
    queries.filter(col("vec_id") >= 4).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/batch=1")
    val stream = spark.readStream.schema(queries.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/batch=*")
    val q = graft.streaming.AnnServe.serveMultidim(
      stream.toDF(), corpus, 10, registry, out, ckpt)
    q.awaitTermination(120000)
    val served = spark.read.parquet(out).drop("batch_id")
    val batch = graft.query.DimRegistry.topK(spark, corpus, queries, 10, registry)
    assert(served.exceptAll(batch).count() == 0
      && batch.exceptAll(served).count() == 0)
  }

  test("dim store: pruned slices read only their dim's files; serving parity with plain filters") {
    val stored = DimRegistry.build(corpus, "vec_id", "embedding", LshParams(),
      storeKey = Some("spec_twodim"))
    assert(stored.keySet == Set(32, 64))
    for (d <- Seq(32, 64)) {
      // partition pruning: the slice's scan carries a vdim partition
      // filter — only that dim's files are read (inputFiles would list
      // the whole relation; the executed plan shows the pruned scan)
      val p = stored(d).slice.queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      assert(p.contains("PartitionFilters:") &&
        p.split("PartitionFilters:")(1).takeWhile(_ != '\n').contains(s"= $d)"),
        s"dim $d slice must partition-prune on vdim:\n$p")
    }
    // the store roundtrip changes nothing: routed serving is identical
    val queries = corpus.filter(col("vec_id") < 10)
    val viaStore = DimRegistry.topK(spark, corpus, queries, 10, stored)
    val viaFilter = DimRegistry.topK(spark, corpus, queries, 10, registry)
    assert(viaStore.exceptAll(viaFilter).count() == 0
      && viaFilter.exceptAll(viaStore).count() == 0)
  }

  test("single-dim entries are untouched: registry over a pure corpus == plain lshTopK") {
    val emb = Tables.embeddings(spark, sf)
    val reg1 = DimRegistry.build(emb, "vec_id", "embedding", LshParams())
    assert(reg1.keySet.size == 1)
    val queries = emb.filter(col("vec_id") < 5)
    val viaRegistry = DimRegistry.topK(spark, emb, queries, 10, reg1)
    val (model, built) = AnnQuery.setupIndex(spark, sf)
    val plain = AnnQuery.lshTopK(spark, emb, queries, 10, model, built)
    assert(viaRegistry.exceptAll(plain).count() == 0
      && plain.exceptAll(viaRegistry).count() == 0)
  }
}
