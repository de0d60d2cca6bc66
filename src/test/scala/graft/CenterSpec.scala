package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.index.LshIndex
import graft.lsh.{Lsh, LshParams}
import graft.query.AnnQuery

/**
 * The bucket-pruned center lookup (AnnQuery.centerBlocks) must pick
 * exactly the block a full ranking over EVERY summary row of the
 * (t, d) would pick: min key distance, ties to the lower block id.
 */
class CenterSpec extends SparkSpecBase {

  private def fullRankingOracle(qCodes: org.apache.spark.sql.DataFrame,
      summ: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("qid", "t", "d").orderBy(col("key_dist"), col("block"))
    qCodes.join(summ, Seq("t", "d"))
      .withColumn("key_dist",
        when(col("key") < col("min_key"), col("min_key") - col("key"))
          .when(col("key") > col("max_key"), col("key") - col("max_key"))
          .otherwise(lit(0L)))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("qid"), col("t"), col("d"), col("block").as("center"))
  }

  test("bucketed center equals full-ranking oracle on real embeddings") {
    val emb = Tables.embeddings(spark, sf)
    val model = Lsh.fit(emb, "embedding", LshParams())
    val built = LshIndex.build(LshIndex.codes(emb, "vec_id", "embedding", model), 64)
    val queries = emb.filter(col("vec_id") < 20)
    val qCodes = LshIndex.codes(queries, "vec_id", "embedding", model)
      .select(col("id").as("qid"), col("t"), col("d"), col("key"), col("code").as("qcode"))
    val summ = built.summaries.select("t", "d", "block", "min_key", "max_key", "rep_code")

    val got = AnnQuery.centerBlocks(qCodes, summ, model.params)
      .select("qid", "t", "d", "center")
    val want = fullRankingOracle(qCodes, summ)
    assert(got.count() == 20L * 24, "one center per (query, t, d)")
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
  }

  test("bucketed center handles gaps, tied boundary keys, and out-of-range queries") {
    import spark.implicits._
    // hand-built summaries for one (t, d): tied boundary key (100),
    // a wide gap (110..5000), and blocks crammed at the top of a
    // sparse keyspace
    val summ = Seq(
      (0, 0, 0, 10L, 100L),
      (0, 0, 1, 100L, 110L), // min_key == previous max_key (tie)
      (0, 0, 2, 5000L, 6000L), // wide gap before
      (0, 0, 3, 6000L, Long.MaxValue - 2) // and a near-max block
    ).toDF("t", "d", "block", "min_key", "max_key")
      .withColumn("rep_code", array(lit(0L)))
    // queries: below all, inside block 0, ON the tied key, in the gap
    // nearer left, gap midpoint (tie -> left), gap nearer right,
    // inside block 2, on the 2/3 shared boundary, above all
    val keys = Seq(0L, 50L, 100L, 200L, 2555L, 4000L, 5500L, 6000L, Long.MaxValue)
    val qCodes = keys.zipWithIndex
      .map { case (k, i) => (i.toLong, 0, 0, k) }
      .toDF("qid", "t", "d", "key")
      .withColumn("qcode", array(lit(0L)))

    val got = AnnQuery.centerBlocks(qCodes, summ, LshParams())
      .select("qid", "center").as[(Long, Int)].collect().toMap
    val want = fullRankingOracle(qCodes, summ)
      .select("qid", "center").as[(Long, Int)].collect().toMap
    assert(got == want, s"got $got, want $want")
    // and the oracle itself matches hand-computed nearest blocks
    assert(want == Map(0L -> 0, 1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1, 5L -> 2,
      6L -> 2, 7L -> 2, 8L -> 3))
  }

  test("equal-key block runs: center is always at MINIMUM key distance") {
    import spark.implicits._
    // three blocks all holding the single key 5 (a >=129-duplicate-vector
    // pathology), then a far block; queries land in the gap after the run
    val summ = Seq(
      (0, 0, 0, 5L, 5L), (0, 0, 1, 5L, 5L), (0, 0, 2, 5L, 5L),
      (0, 0, 3, 100L, 110L)
    ).toDF("t", "d", "block", "min_key", "max_key")
      .withColumn("rep_code", array(lit(0L)))
    val qCodes = Seq((0L, 0, 0, 5L), (1L, 0, 0, 6L), (2L, 0, 0, 60L), (3L, 0, 0, 99L))
      .toDF("qid", "t", "d", "key")
      .withColumn("qcode", array(lit(0L)))
    val got = AnnQuery.centerBlocks(qCodes, summ, LshParams())
      .select("qid", "center").as[(Long, Int)].collect().toMap
    assert(got.size == 4, "exactly one center per query")
    // distance-optimality: the chosen block's key_dist equals the global
    // minimum over all blocks (tie CHOICE within an equal-key run may
    // differ from a (key_dist, block) rank — documented divergence)
    val ranges = Map(0 -> (5L, 5L), 1 -> (5L, 5L), 2 -> (5L, 5L), 3 -> (100L, 110L))
    def dist(k: Long, b: Int): Long = {
      val (lo, hi) = ranges(b)
      if (k < lo) lo - k else if (k > hi) k - hi else 0L
    }
    for ((qid, key) <- Seq(0L -> 5L, 1L -> 6L, 2L -> 60L, 3L -> 99L)) {
      val best = ranges.keys.map(dist(key, _)).min
      assert(dist(key, got(qid)) == best,
        s"qid $qid key $key center ${got(qid)} not distance-optimal")
    }
    // on-key query must land in the run, far-side query on block 3
    assert(Set(0, 1, 2).contains(got(0L)))
    assert(got(3L) == 3)
  }

  test("fuzz: random block layouts — one distance-optimal center per query") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // random sorted layouts with duplicate boundary keys and gaps
    val layouts = (0 until 4).map { trial =>
      var key = 0L
      val blocks = (0 until 12).map { b =>
        val lo = key + (if (rnd.nextBoolean()) 0L else rnd.nextInt(1000).toLong)
        val hi = lo + rnd.nextInt(50)
        key = hi // next block may reuse the boundary (tie) or jump
        (trial, 0, b, lo, hi)
      }
      blocks
    }
    val summ = layouts.flatten.toDF("t", "d", "block", "min_key", "max_key")
      .withColumn("rep_code", array(lit(0L)))
    val keys = (0 until 4).flatMap { trial =>
      (0 until 25).map(i => (trial.toLong * 100 + i, trial, 0,
        math.abs(rnd.nextLong()) % 3000))
    }
    val qCodes = keys.toDF("qid", "t", "d", "key").withColumn("qcode", array(lit(0L)))

    val got = AnnQuery.centerBlocks(qCodes, summ, LshParams())
      .select("qid", "t", "center").as[(Long, Int, Int)].collect()
    assert(got.length == keys.length, "exactly one center per (query, t, d)")
    val ranges = layouts.flatten.map { case (t, _, b, lo, hi) => (t, b) -> (lo, hi) }.toMap
    val byQid = got.map(r => r._1 -> (r._2, r._3)).toMap
    keys.foreach { case (qid, trial, _, k) =>
      val (t, center) = byQid(qid)
      def dist(b: Int): Long = {
        val (lo, hi) = ranges((t, b))
        if (k < lo) lo - k else if (k > hi) k - hi else 0L
      }
      val best = (0 until 12).map(dist).min
      assert(dist(center) == best,
        s"trial $trial key $k: center $center dist ${dist(center)} != best $best")
    }
  }

  test("GT roundtrip with non-dense query ids via the id sidecar") {
    import graft.query.GtFile
    val emb = Tables.embeddings(spark, sf)
    // sampled, non-contiguous ids — the positional format needs the sidecar
    val queries = emb.filter(org.apache.spark.sql.functions.col("vec_id").isin(3L, 17L, 42L))
    val gtComputed = AnnQuery.bruteTopK(emb, queries, 5)
    val dir = "/root/repo/target/tmp/gt-sparse"
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
    }
    val rowIds = GtFile.writeGt(gtComputed, s"$dir/gt.ivecs")
    assert(rowIds == Seq(3L, 17L, 42L))
    val loaded = GtFile.loadGt(spark, dir, Some(rowIds))
    assert(loaded.exceptAll(gtComputed.select("query_id", "vec_id", "rnk")).count() == 0)
    assert(gtComputed.select("query_id", "vec_id", "rnk").exceptAll(loaded).count() == 0)
  }

  test("written-then-loaded GT file reproduces self-computed recall exactly") {
    import graft.query.GtFile
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10)
    val gtComputed = AnnQuery.bruteTopK(emb, queries, 20)

    val dir = "/root/repo/target/tmp/gt-spec"
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
    }
    GtFile.writeGt(gtComputed, s"$dir/gt.ivecs")
    val gtLoaded = GtFile.loadGt(spark, dir)

    // the loaded file IS the computed GT, row for row
    assert(gtLoaded.exceptAll(gtComputed.select("query_id", "vec_id", "rnk")).count() == 0)
    assert(gtComputed.select("query_id", "vec_id", "rnk").exceptAll(gtLoaded).count() == 0)
    assert(GtFile.validateGt(gtLoaded, emb.count()) == 0)

    // recall computed against the file equals recall against the DataFrame
    val model = Lsh.fit(emb, "embedding", LshParams())
    val built = LshIndex.build(LshIndex.codes(emb, "vec_id", "embedding", model), 64)
    val ann = AnnQuery.lshTopK(spark, emb, queries, 20, model, built)
    val ks = Seq(1, 5, 10, 20)
    val a = AnnQuery.recallEval(ann, gtLoaded, ks).collect()
    val b = AnnQuery.recallEval(ann, gtComputed, ks).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("GT validation catches range, duplicate, and rank violations") {
    import spark.implicits._
    import graft.query.GtFile
    val good = Seq((0L, 1L, 1), (0L, 2L, 2), (1L, 3L, 1), (1L, 4L, 2))
      .toDF("query_id", "vec_id", "rnk")
    assert(GtFile.validateGt(good, 100) == 0)
    assert(GtFile.validateGt(good, 3) > 0) // ids beyond corpus
    val dup = Seq((0L, 1L, 1), (0L, 1L, 2)).toDF("query_id", "vec_id", "rnk")
    assert(GtFile.validateGt(dup, 100) > 0)
    val gap = Seq((0L, 1L, 2), (0L, 2L, 3)).toDF("query_id", "vec_id", "rnk")
    assert(GtFile.validateGt(gap, 100) > 0)
  }

  test("distance-level GT validation: clean GT passes, offset GT fails, empty GT fails") {
    import graft.query.GtFile
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10)
    val gt = AnnQuery.bruteTopK(emb, queries, 5)
    val clean = GtFile.validateGtTop1(gt, gt)
    assert(clean.valid && clean.mismatches == 0 && clean.sampleSize == 10, clean.toString)
    // the classic failure the reference guards: GT ids carry an offset
    // (computed for a different dataset layout) — every top-1 misses
    val shifted = gt.withColumn("vec_id",
      org.apache.spark.sql.functions.col("vec_id") + 1)
    val off = GtFile.validateGtTop1(shifted, gt)
    assert(!off.valid && off.mismatchRate == 1.0, off.toString)
    // a small corruption under the tolerance still passes
    val oneBad = gt.withColumn("vec_id",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("query_id") === 0 &&
          org.apache.spark.sql.functions.col("rnk") === 1,
        org.apache.spark.sql.functions.lit(999999L))
        .otherwise(org.apache.spark.sql.functions.col("vec_id")))
    val tol = GtFile.validateGtTop1(oneBad, gt, tolerance = 0.2)
    assert(tol.valid && tol.mismatches == 1, tol.toString)
    // empty GT fails outright (reference :100-103)
    val empty = GtFile.validateGtTop1(gt.limit(0), gt)
    assert(!empty.valid && empty.sampleSize == 0, empty.toString)
  }
}
