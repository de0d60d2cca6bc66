package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.query.{BqSearch, IvfSearch, MrlSearch, SqSearch}
import graft.streaming.{BqLifecycle, MrlLifecycle, SqLifecycle}

/**
 * The tier-generic lifecycle over the SQ8 and BQ adapters — the
 * maintenance symmetry across all three quantized tiers. PQ's own
 * instantiation keeps its full battery in PqLifecycleSpec (the
 * machinery is shared, so replay/auto-compact/sink behavior is proven
 * once there); here each new tier proves the tier-SPECIFIC contract:
 * staged arrivals servable immediately, tombstones effective before
 * compaction without eating shortlist budget, and compaction
 * bit-identical to a fresh frozen-model encode of the survivors.
 */
class QuantLifecycleSpec extends SparkSpecBase {

  private def tmp(name: String): String = {
    val d = s"/root/repo/target/tmp/quantlife/$name"
    graft.util.Io.deleteRecursively(d)
    Files.createDirectories(Paths.get(d))
    d
  }

  private lazy val all = Tables.embeddings(spark, sf)
    .select("vec_id", "embedding").cache()
  private lazy val n = all.count()
  // models fit on the INITIAL corpus and frozen for the lifecycle
  private lazy val base = all.filter(col("vec_id") < n - 50)
  private lazy val arrivals = all.filter(col("vec_id") >= n - 50)
  private lazy val cents = IvfSearch.fitCentroids(base, 8, Some("quantlife-cents"))
  private lazy val sqParams = SqSearch.fitParams(base)
  private lazy val bqThr = BqSearch.fitThresholds(base)

  private def freshSq(name: String): SqLifecycle =
    new SqLifecycle(spark, base,
      SqSearch.buildIndexOn(spark, base, cents, sqParams._1, sqParams._2),
      tmp(name), 1000000L)

  private def freshBq(name: String): BqLifecycle =
    new BqLifecycle(spark, base,
      BqSearch.buildIndex(base, bqThr), tmp(name), 1000000L)

  test("sq: staged arrivals self-match immediately; delete + staged equals compacted, bit-for-bit") {
    val life = freshSq("sq")
    life.ingest(arrivals, batchId = 0L)
    assert(life.compactions == 0 && life.stagedVectors == 50)
    val q3 = arrivals.orderBy(col("vec_id").desc).limit(3)
    val served5 = life.serve(q3, k = 5).cache()
    // serve must HONOR its k on this tier, not silently fall back to
    // the config K (the r10 ADVICE k-threading fix)
    assert(served5.groupBy("query_id").count().collect()
      .forall(_.getLong(1) == 5), "serve(k=5) must return exactly 5 rows per query")
    val self = served5.filter(col("rnk") === 1)
      .select("query_id", "vec_id").collect()
    served5.unpersist()
    assert(self.length == 3 && self.forall(r => r.getLong(0) == r.getLong(1)),
      "staged arrivals must self-match at rank 1 through the ADC shortlist")

    import spark.implicits._
    val deadIds = Seq(0L, 3L, n - 49) // two resident rows + one staged row
    life.delete(deadIds.toDF("id"))
    val queries = all.filter(col("vec_id") < 5 || col("vec_id") >= n - 2)
    val before = life.serve(queries, k = 10).cache()
    assert(before.filter(col("vec_id").isin(deadIds: _*)).count() == 0,
      "deleted ids served before compaction")
    assert(before.groupBy("query_id").count().collect().forall(_.getLong(1) == 10),
      "tombstones must not eat the shortlist budget")
    val beforeSet = before.collect().toSet
    before.unpersist()
    life.compactNow()
    assert(life.compactions == 1 && life.deletedIds.isEmpty && life.stagedVectors == 0)
    assert(life.serve(queries, k = 10).collect().toSet == beforeSet,
      "delete + staged insert combined must equal the compacted index")
    // bit-for-bit: compacted cells/dvecs == fresh encode of (all minus dead)
    val fresh = SqSearch.buildIndexOn(spark,
      all.filter(!col("vec_id").isin(deadIds: _*)), cents, sqParams._1, sqParams._2)
    val idx = life.current
    assert(idx.cells.exceptAll(fresh.cells).count() == 0
      && fresh.cells.exceptAll(idx.cells).count() == 0)
    val flat = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("vec_id"), posexplode(col("dvec")))
    assert(flat(idx.dvecs).exceptAll(flat(fresh.dvecs)).count() == 0
      && flat(fresh.dvecs).exceptAll(flat(idx.dvecs)).count() == 0)
  }

  test("sq: applyDiff lands the corpus_merge removed/changed feed on the SQ8 tier") {
    val ids = all.select("vec_id", "embedding")
    val oldSnap = ids.filter(graft.Carves.inOld(col("vec_id")))
      .select(col("vec_id"),
        when(col("vec_id") % graft.Carves.ChangedMod === 0,
          transform(col("embedding"), x => -x)).otherwise(col("embedding"))
          .as("embedding"))
    val newSnap = ids.filter(graft.Carves.inNew(col("vec_id")))
    val asDocs = (df: org.apache.spark.sql.DataFrame) => df.select(
      col("vec_id").as("doc_id"), col("embedding").cast("string").as("text"))
    val diff = graft.operators.CorpusDiff.corpusDiff(asDocs(oldSnap), asDocs(newSnap))
    val life = new SqLifecycle(spark, oldSnap,
      SqSearch.buildIndexOn(spark, oldSnap, cents, sqParams._1, sqParams._2),
      tmp("sq-applydiff"), 1000000L)
    life.applyDiff(diff, newSnap)
    val queries = newSnap.filter(col("vec_id") < 30)
    val got = life.serve(queries, k = 10).collect().toSet
    val fresh = SqSearch.buildIndexOn(spark, newSnap, cents, sqParams._1, sqParams._2)
    val want = SqSearch.ivfsqTopKForQueries(spark, queries,
      fresh.cells, fresh.dvecs, fresh.fetch, cents, None).collect().toSet
    assert(got == want,
      "after applyDiff, serving must equal a fresh index over the new snapshot")
    val removed = diff.filter(col("status") === "removed")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.forall(r => !removed.contains(r.getLong(1))))
  }

  test("bq: staged arrivals self-match immediately; delete + staged equals compacted, bit-for-bit") {
    val life = freshBq("bq")
    life.ingest(arrivals, batchId = 0L)
    assert(life.compactions == 0 && life.stagedVectors == 50)
    val q3 = arrivals.orderBy(col("vec_id").desc).limit(3)
    val served5 = life.serve(q3, k = 5).cache()
    assert(served5.groupBy("query_id").count().collect()
      .forall(_.getLong(1) == 5), "serve(k=5) must return exactly 5 rows per query")
    val self = served5.filter(col("rnk") === 1)
      .select("query_id", "vec_id").collect()
    served5.unpersist()
    assert(self.length == 3 && self.forall(r => r.getLong(0) == r.getLong(1)),
      "staged arrivals must self-match at rank 1 through the Hamming shortlist")

    import spark.implicits._
    val deadIds = Seq(1L, 4L, n - 50)
    life.delete(deadIds.toDF("id"))
    val queries = all.filter(col("vec_id") < 5 || col("vec_id") >= n - 2)
    val before = life.serve(queries, k = 10).cache()
    assert(before.filter(col("vec_id").isin(deadIds: _*)).count() == 0,
      "deleted ids served before compaction")
    assert(before.groupBy("query_id").count().collect().forall(_.getLong(1) == 10),
      "tombstones must not eat the shortlist budget")
    val beforeSet = before.collect().toSet
    before.unpersist()
    life.compactNow()
    assert(life.compactions == 1 && life.deletedIds.isEmpty && life.stagedVectors == 0)
    assert(life.serve(queries, k = 10).collect().toSet == beforeSet,
      "delete + staged insert combined must equal the compacted index")
    // bit-for-bit: compacted packed words == fresh encode of the survivors
    val survivors = all.filter(!col("vec_id").isin(deadIds: _*))
    val freshCodes = survivors.select(col("vec_id"),
      BqSearch.bqWords(col("embedding"), bqThr).as("words"))
    val flat = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("vec_id"), posexplode(col("words")))
    val got = life.current.codes
    assert(flat(got).exceptAll(flat(freshCodes)).count() == 0
      && flat(freshCodes).exceptAll(flat(got)).count() == 0)
  }

  private lazy val dim = all.select(size(col("embedding"))).head().getInt(0)
  private lazy val mrlComps =
    graft.operators.Embeddings.mrlRotationOf(base, dim / MrlSearch.PrefixShare)

  private def freshMrl(name: String): MrlLifecycle =
    new MrlLifecycle(spark, base,
      MrlSearch.buildIndexOn(spark, base, cents, mrlComps), tmp(name), 1000000L)

  test("mrl: staged arrivals self-match immediately; delete + staged equals compacted, bit-for-bit") {
    val life = freshMrl("mrl")
    life.ingest(arrivals, batchId = 0L)
    assert(life.compactions == 0 && life.stagedVectors == 50)
    val q3 = arrivals.orderBy(col("vec_id").desc).limit(3)
    val served5 = life.serve(q3, k = 5).cache()
    assert(served5.groupBy("query_id").count().collect()
      .forall(_.getLong(1) == 5), "serve(k=5) must return exactly 5 rows per query")
    val self = served5.filter(col("rnk") === 1)
      .select("query_id", "vec_id").collect()
    served5.unpersist()
    assert(self.length == 3 && self.forall(r => r.getLong(0) == r.getLong(1)),
      "staged arrivals must self-match at rank 1 through the prefix shortlist")

    import spark.implicits._
    val deadIds = Seq(0L, 3L, n - 49)
    life.delete(deadIds.toDF("id"))
    val queries = all.filter(col("vec_id") < 5 || col("vec_id") >= n - 2)
    val before = life.serve(queries, k = 10).cache()
    assert(before.filter(col("vec_id").isin(deadIds: _*)).count() == 0,
      "deleted ids served before compaction")
    assert(before.groupBy("query_id").count().collect().forall(_.getLong(1) == 10),
      "tombstones must not eat the shortlist budget")
    val beforeSet = before.collect().toSet
    before.unpersist()
    life.compactNow()
    assert(life.compactions == 1 && life.deletedIds.isEmpty && life.stagedVectors == 0)
    assert(life.serve(queries, k = 10).collect().toSet == beforeSet,
      "delete + staged insert combined must equal the compacted index")
    // bit-for-bit: compacted cells/pvecs == fresh encode of (all minus dead)
    val fresh = MrlSearch.buildIndexOn(spark,
      all.filter(!col("vec_id").isin(deadIds: _*)), cents, mrlComps)
    val idx = life.current
    assert(idx.cells.exceptAll(fresh.cells).count() == 0
      && fresh.cells.exceptAll(idx.cells).count() == 0)
    val flat = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("vec_id"), posexplode(col("pvec")))
    assert(flat(idx.pvecs).exceptAll(flat(fresh.pvecs)).count() == 0
      && flat(fresh.pvecs).exceptAll(flat(idx.pvecs)).count() == 0)
  }

  test("mrl: reRotate re-encodes the resident state under the new rotation in one pass") {
    val life = freshMrl("mrl-rerot")
    life.ingest(arrivals, batchId = 0L)
    import spark.implicits._
    val deadIds = Seq(2L, n - 48)
    life.delete(deadIds.toDF("id"))
    // the refit an encoder swap forces: a DIFFERENT sample-bounded
    // rotation (here: fit on the arrivals' distribution)
    val comps2 = graft.operators.Embeddings.mrlRotationOf(
      all.filter(col("vec_id") >= 100), dim / MrlSearch.PrefixShare)
    life.reRotate(comps2)
    // the swap is a forced compaction: staged folded, tombstones consumed
    assert(life.compactions == 1 && life.deletedIds.isEmpty && life.stagedVectors == 0)
    val queries = all.filter(col("vec_id") < 5 || col("vec_id") >= n - 2)
    val fresh = MrlSearch.buildIndexOn(spark,
      all.filter(!col("vec_id").isin(deadIds: _*)), cents, comps2)
    val want = MrlSearch.ivfmrlTopKForQueries(spark, queries,
      fresh.cells, fresh.pvecs, fresh.fetch, cents, comps2).collect().toSet
    assert(life.serve(queries, k = 10).collect().toSet == want,
      "after reRotate, serving must equal a fresh index under the new rotation")
    // and the new rotation is REALLY in effect: the pvec tables match
    // the new components, not the old ones
    val flat = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("vec_id"), posexplode(col("pvec")))
    assert(flat(life.current.pvecs).exceptAll(flat(fresh.pvecs)).count() == 0
      && flat(fresh.pvecs).exceptAll(flat(life.current.pvecs)).count() == 0)
  }

  test("compaction lineage stays FLAT: plan size constant across repeated compactions") {
    // the r10 shape kept mainData a lazy union/anti-join chain over
    // the previous mainData — after N compactions the N+1st encode
    // re-evaluated an N-deep plan (O(N^2) cumulative over a stream's
    // lifetime). The materialize-and-re-read fix makes the serving
    // plan's node count CONSTANT in the compaction count.
    val life = freshSq("sq-lineage")
    val queries = base.filter(col("vec_id") < 3)
    import spark.implicits._
    def planNodes(): Int = {
      val lp = life.serve(queries, k = 5).queryExecution.optimizedPlan
      var n = 0
      lp.foreach(_ => n += 1)
      n
    }
    val sizes = (0 until 5).map { round =>
      life.ingest(arrivals.filter(col("vec_id") === n - 50 + round), round.toLong)
      life.delete(Seq(n - 50 + round - 1).toDF("id")) // tombstone the previous round's insert
      life.compactNow()
      planNodes()
    }
    assert(life.compactions == 5)
    assert(sizes.distinct.size == 1,
      s"serving plan must not grow with compaction count: $sizes")
    // and the state is still CORRECT: only the last-round insert lives
    val served = life.serve(
      arrivals.filter(col("vec_id") === n - 50 + 4), k = 5)
    assert(served.filter(col("rnk") === 1).head().getLong(1) == n - 50 + 4)
    val deadServed = life.serve(queries, k = 1000).cache()
    for (dead <- 0 until 4)
      assert(deadServed.filter(col("vec_id") === n - 50 + dead).count() == 0,
        s"tombstoned round-$dead insert still served")
    deadServed.unpersist()
  }

  test("applyDiff staging never collides with a streaming batch id (diff= namespace)") {
    // r10 staged applyDiff vectors at batch=(maxSeen+1); a later
    // foreachBatch delivery with that SAME id overwrote them. Now the
    // diff rides its own namespace, so both survive.
    val life = freshSq("sq-diffns")
    import spark.implicits._
    val diffVec = arrivals.filter(col("vec_id") === n - 1)
    val diff = Seq((n - 1, "added")).toDF("doc_id", "status")
    life.applyDiff(diff, diffVec)
    // a stream now delivers batchId = 0 — the id the r10 applyDiff
    // staging would have used (maxSeen was -1)
    life.ingest(arrivals.filter(col("vec_id") === n - 2), batchId = 0L)
    assert(life.stagedVectors == 2,
      "the diff-staged vector and the batch-0 vector must BOTH be staged")
    val got = life.serve(all.filter(col("vec_id") >= n - 2), k = 5)
      .filter(col("rnk") === 1).select("query_id", "vec_id").collect()
    assert(got.length == 2 && got.forall(r => r.getLong(0) == r.getLong(1)),
      "both the applyDiff vector and the streamed vector must serve")
  }
}
