package graft

import org.apache.spark.sql.functions._

import graft.query.MrlSearch

/** The progressive prefix-dimension tier (`ann_mrl_topk`). */
class MrlSpec extends SparkSpecBase {

  private lazy val data = Tables.embeddings(spark, sf)
    .select("vec_id", "embedding", "label").cache()
  private lazy val n = data.count()
  private lazy val dim = data.select(size(col("embedding"))).head().getInt(0)

  test("keep >= N degenerates to exact brute force (refine is exact)") {
    val small = data.filter(col("vec_id") < 300)
    val queries = small.filter(col("vec_id") < 5)
    val got = MrlSearch.mrlTopKOn(small, queries, dim / 4, keep = 1000)
      .collect().toSet
    // brute force over the same frames: exact L2, same tie-break
    val want = MrlSearch.mrlTopKOn(small, queries, dim, keep = 1000)
      .collect().toSet
    assert(got == want,
      "with the whole corpus shortlisted, the prefix metric must not matter")
  }

  test("ann_mrl_topk: self-match at rank 1, full k per query, recall vs brute") {
    val res = MrlSearch.annMrlTopK(spark, sf).cache()
    val perQ = res.groupBy("query_id").count().collect()
    assert(perQ.length == MrlSearch.NumQueries
      && perQ.forall(_.getLong(1) == MrlSearch.K), "k rows per query")
    // a query's own vector has prefix distance 0 — it always survives
    // the shortlist and refines to rank 1
    val self = res.filter(col("rnk") === 1).collect()
    assert(self.forall(r => r.getLong(0) == r.getLong(1)), "self-match at rank 1")
    // recall floor: the synthetic embeddings are the WORST case for a
    // prefix tier — near-iid dimensions, nothing front-loaded (a real
    // MRL-trained or PCA-rotated encoder concentrates information in
    // the leading coordinates; embed_project's PCA rotation is the
    // in-library way to buy that curve). Measured ~0.52 at sf0.01;
    // the floor asserts the shortlist still does real work (random
    // AdcKeep-of-N would land near AdcKeep/N ≈ 0.01)
    val gt = graft.query.AnnQuery.annBruteTopK(spark, sf)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = res.select("query_id", "vec_id").collect()
      .count(r => gt.contains((r.getLong(0), r.getLong(1))))
    val recall = hits.toDouble / gt.size
    assert(recall >= 0.4, s"prefix-tier recall@10 too low: $recall")
  }

  test("prefix length is a real knob: longer prefixes cannot lose recall on average") {
    val small = data.filter(col("vec_id") < 500)
    val queries = small.filter(col("vec_id") < 10)
    val exact = MrlSearch.mrlTopKOn(small, queries, dim, keep = 1000)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(pd: Int): Double = {
      val got = MrlSearch.mrlTopKOn(small, queries, pd, keep = 50)
        .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      got.count(exact.contains).toDouble / exact.size
    }
    val r16 = recallAt(dim / 4)
    val rFull = recallAt(dim)
    assert(rFull >= r16, s"full-dim shortlist recall $rFull below prefix $r16")
    assert(rFull == 1.0, "full-dim shortlist at keep=50 must recover the exact top-10")
  }

  private lazy val gt = graft.query.AnnQuery.annBruteTopK(spark, sf)
    .select("query_id", "vec_id").collect()
    .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
    val hits = df.select("query_id", "vec_id").collect()
      .count(r => gt.contains((r.getLong(0), r.getLong(1))))
    hits.toDouble / gt.size
  }

  test("ann_ivfmrl_topk: self-match, full k, celled recall clears the celled-family bar") {
    val res = MrlSearch.annIvfmrlTopK(spark, sf).cache()
    val perQ = res.groupBy("query_id").count().collect()
    assert(perQ.length == MrlSearch.NumQueries
      && perQ.forall(_.getLong(1) == MrlSearch.K), "k rows per query")
    assert(res.filter(col("rnk") === 1).collect()
      .forall(r => r.getLong(0) == r.getLong(1)), "self-match at rank 1")
    val recall = recallOf(res)
    res.unpersist()
    // the bar every celled tier meets (ann_ivfsq/ivfpq/ivfbq specs);
    // measured ~0.77 here — the rotation front is what lifts the
    // prefix tier over it on these near-flat-spectrum embeddings
    assert(recall >= 0.6, s"celled rotated-prefix recall@10 too low: $recall")
  }

  test("the rotation front earns its keep: rotated exhaustive recall strictly above raw") {
    // same corpus, same shortlist budget, same exhaustive scan — the
    // ONLY difference is raw leading coordinates vs the top-pd
    // principal axes, so the comparison isolates the rotation front
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < MrlSearch.NumQueries)
    val pd = dim / MrlSearch.PrefixShare
    val comps = graft.operators.Embeddings.fittedMrlRotation(spark, sf, pd)
    val fetch = emb.select(col("vec_id"), col("embedding"))
    val rotPrep = MrlSearch.rotatedPrefix(queries, comps)
      .select(col("vec_id").as("query_id"), col("pvec").as("qp"))
      .join(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qraw")), Seq("query_id"))
    val rotated = MrlSearch.prefixTopKOn(
      MrlSearch.rotatedPrefix(emb, comps), rotPrep, fetch, MrlSearch.AdcKeep)
    val raw = MrlSearch.mrlTopKOn(emb, queries, pd, MrlSearch.AdcKeep)
    val (rRot, rRaw) = (recallOf(rotated), recallOf(raw))
    assert(rRot > rRaw,
      s"rotated-prefix recall ($rRot) must strictly beat raw-prefix ($rRaw)")
  }

  test("encoder swap: the sample-bounded rotation refit restores the tier, stale rotation serves degraded") {
    // The scenario the MRL tier exists for: the corpus is RE-EMBEDDED
    // by a new encoder and every fitted tier's models go stale. The
    // planted swap is a deterministic re-embedding that concentrates
    // variance in every 8th coordinate (10x) and attenuates the rest
    // (0.1x) after a circular shift — the stale rotation (fit on the
    // near-flat ORIGINAL corpus) knows nothing about the new variance
    // structure, while a refit captures it. The refit's only
    // corpus-touching work is the PcaSampleN-bounded sample inside
    // Embeddings.mrlRotationOf (driver-side eigendecomposition) — in
    // contrast to SQ8's full-corpus per-dim min/max pass
    // (SqSearch.fitParams) and PQ's multi-pass codebook k-means, which
    // is the tier's whole maintenance pitch. The lifecycle mechanics
    // of the swap (reRotate = one forced map-only re-encode) are
    // proven in QuantLifecycleSpec; this test proves the RECALL story.
    val emb = Tables.embeddings(spark, sf)
    val pd = dim / MrlSearch.PrefixShare
    val jdx = sequence(lit(0), lit(dim - 1))
    val swapped = emb.select(col("vec_id"),
      transform(jdx, j =>
        (element_at(col("embedding"), (j + lit(7)) % dim + 1)
          * when(j % 8 === 0, lit(10.0)).otherwise(lit(0.1))).cast("float"))
        .as("embedding")).cache()
    val queries = swapped.filter(col("vec_id") < MrlSearch.NumQueries)
    // exact ground truth ON THE NEW EMBEDDINGS (full-dim shortlist
    // degenerates to exact brute force)
    val gtSw = MrlSearch.mrlTopKOn(swapped, queries, dim, keep = 1000)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallWith(comps: Array[(Array[Double], Double)]): Double = {
      val prep = MrlSearch.rotatedPrefix(queries, comps)
        .select(col("vec_id").as("query_id"), col("pvec").as("qp"))
        .join(queries.select(col("vec_id").as("query_id"),
          col("embedding").as("qraw")), Seq("query_id"))
      val got = MrlSearch.prefixTopKOn(MrlSearch.rotatedPrefix(swapped, comps),
        prep, swapped.select(col("vec_id"), col("embedding")), MrlSearch.AdcKeep)
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      got.count(gtSw.contains).toDouble / gtSw.size
    }
    val stale = recallWith(graft.operators.Embeddings.mrlRotationOf(emb, pd))
    val refit = recallWith(graft.operators.Embeddings.mrlRotationOf(swapped, pd))
    swapped.unpersist()
    assert(refit >= 0.6, s"refit rotation must restore the tier: recall $refit")
    assert(refit > stale,
      s"refit recall ($refit) must beat the stale rotation's ($stale)")
  }

  test("streaming serving: refit index + tombstone publish between micro-batches, zero downtime") {
    // The live form of the encoder-swap story: batch 0 serves under
    // the original rotation; a maintenance hook (the deterministic
    // afterBatch swap point) publishes the REFIT index (sample-bounded
    // rotation refit + one map-only re-projection over the re-embedded
    // corpus) plus a tombstone; batch 1 serves the refit index without
    // the deleted row — each batch equal to its batch-plan twin, so
    // zero downtime costs zero correctness.
    import graft.query.IvfSearch
    import graft.streaming.AnnServe
    def tmp(name: String): String = {
      val d = s"/root/repo/target/tmp/servemrl/$name"
      graft.util.Io.deleteRecursively(d)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
      d
    }
    val emb = data.select("vec_id", "embedding")
    val pd = dim / MrlSearch.PrefixShare
    // the planted encoder swap from the recall test: the corpus is
    // re-embedded with a new variance structure
    val jdx = sequence(lit(0), lit(dim - 1))
    val swapped = emb.select(col("vec_id"),
      transform(jdx, j =>
        (element_at(col("embedding"), (j + lit(7)) % dim + 1)
          * when(j % 8 === 0, lit(10.0)).otherwise(lit(0.1))).cast("float"))
        .as("embedding")).cache()
    val idx0 = MrlSearch.buildIndexOn(spark, emb,
      IvfSearch.fitCentroids(emb, 8),
      graft.operators.Embeddings.mrlRotationOf(emb, pd))
    val idx1 = MrlSearch.buildIndexOn(spark, swapped,
      IvfSearch.fitCentroids(swapped, 8),
      graft.operators.Embeddings.mrlRotationOf(swapped, pd))
    val qA = emb.filter(col("vec_id") < 5)
    val qB = swapped.filter(col("vec_id").between(5, 9))
    val deadId = 7L // in qB's shortlist reach: every query self-matches
    val tombs = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(deadId)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))))
    val in = tmp("in"); val out = tmp("out"); val ckpt = tmp("ckpt")
    qA.coalesce(1).write.mode("overwrite").parquet(s"$in/b=000")
    qB.coalesce(1).write.mode("overwrite").parquet(s"$in/b=001")
    val ref = new AnnServe.MrlIndexRef(idx0)
    val live = new AnnServe.TombstoneRef()
    val stream = spark.readStream.schema(qA.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/b=*")
    val q = AnnServe.serveMrl(stream.toDF(), ref, out, ckpt,
      afterBatch = id => if (id == 0) { ref.idx = idx1; live.deleted = Some(tombs) },
      tombstones = live)
    assert(q.awaitTermination(180000), "stream did not finish")
    def served(batch: Int) = spark.read.parquet(out)
      .filter(col("batch_id") === batch).drop("batch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    def batchPlan(qs: org.apache.spark.sql.DataFrame, i: MrlSearch.MrlIndex,
        del: Option[org.apache.spark.sql.DataFrame]) =
      MrlSearch.ivfmrlTopKForQueries(spark, qs, i.cells, i.pvecs, i.fetch,
        i.cents, i.comps, del).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    // batch 0 under the ORIGINAL index, no tombstones; batch 1 under
    // the refit index with the tombstone live — each the batch plan
    assert(served(0) == batchPlan(qA, idx0, None))
    assert(served(1) == batchPlan(qB, idx1, Some(tombs)))
    // the tombstone is real: the id self-matched in batch 0's world
    // and is never served in batch 1's
    assert(!served(1).exists(_._2 == deadId), "tombstoned id served")
    assert(served(1).groupBy(_._1).forall(_._2.size == MrlSearch.K),
      "tombstone must not eat the served k")
    swapped.unpersist()
  }

  test("ann_ivfmrl_topk: no corpus broadcast, no cartesian (plan-asserted)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val phys = MrlSearch.annIvfmrlTopK(spark, sf).queryExecution.executedPlan
      val bad = phys.collect {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b.child
      }.filter(_.toString().contains("FileScan"))
      assert(bad.isEmpty,
        s"corpus-backed relation under a BroadcastExchange:\n${bad.mkString}")
      assert(!phys.toString.contains("CartesianProduct"), "cartesian in celled MRL")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
