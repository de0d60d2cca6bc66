package graft

import org.apache.spark.sql.functions._

import graft.operators.Corpus

/** Corpus-assembly invariants: stratified sampling and sequence packing. */
class CorpusSpec extends SparkSpecBase {

  private lazy val docs = Tables.documents(spark, sf)

  test("stratified sample: exactly min(quota, stratum size) per stratum, deterministic") {
    val s = Corpus.sampleStratified(docs, "lang", 50).cache()
    val got = s.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (lang, n) =>
      assert(got(lang) == math.min(50L, n), s"$lang: ${got(lang)} != min(50, $n)")
    }
    // reruns draw the identical sample (hash order, no RNG)
    val again = Corpus.sampleStratified(docs, "lang", 50)
    assert(s.exceptAll(again).count() == 0)
    assert(again.exceptAll(s).count() == 0)
    s.unpersist()
  }

  test("stratified sample is unbiased across the id range (hash order, not id order)") {
    val s = Corpus.sampleStratified(docs, "lang", 50)
    val n = docs.count()
    // a head-of-table bias (e.g. ordering by doc_id) would put every
    // draw below the midpoint; hash order spreads them
    val above = s.filter(col("doc_id") >= n / 2).count()
    val total = s.count()
    assert(above > total / 4 && above < 3 * total / 4,
      s"$above/$total draws above the id midpoint")
  }

  // ---- scalable paths == windowed twins (exact row equality) ----

  private def assertSameRows(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("scalable seq_pack equals the per-stratum window twin") {
    assertSameRows(
      Corpus.seqPack(docs, "lang", 2048),
      Corpus.seqPackWindowed(docs, "lang", 2048))
  }

  test("bounded sample/mix equal their unbounded window twins") {
    assertSameRows(
      Corpus.sampleStratified(docs, "lang", 50),
      Corpus.sampleStratifiedWindowed(docs, "lang", 50))
    assertSameRows(
      Corpus.dataMixQuery(spark, sf),
      Corpus.dataMixWindowed(Tables.documents(spark, sf), "lang",
        Corpus.MixWeights, Corpus.MixBudget))
  }

  test("data_mix_plan: conservation, pigeonhole repetition, feasibility on the rounded epochs") {
    val rows = Corpus.dataMixPlanQuery(spark, sf).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getInt(7))
    }
    assert(rows.nonEmpty)
    val tot = rows.map(_._2).sum
    rows.foreach { case (lang, avail, share, needed, fresh, rep, ep, feas) =>
      assert(avail > 0, s"$lang has no tokens")
      assert(share >= 0.0 && share <= 1.0)
      assert(needed == math.floor(share * (tot * Corpus.PlanBudgetMult)).toLong,
        s"$lang needed_tokens formula")
      assert(fresh + rep == needed, s"$lang fresh+repeated != needed")
      assert(fresh <= avail, s"$lang fresh beyond available")
      assert(ep == math.floor(needed.toDouble / avail * 10000) / 10000,
        s"$lang epochs rounding")
      assert(feas == (if (ep <= Corpus.MaxGoodEpochs) 1 else 0), s"$lang flag")
    }
    // weights sum to 1 over a 2x budget while available sums to 1x:
    // SOME stratum must repeat (pigeonhole) — the regime the planner
    // exists to expose
    assert(rows.exists(_._5 > 0), "no stratum repeats under a 2x budget")
    assert(rows.map(_._4).sum <= Corpus.PlanBudgetMult * tot,
      "floor'd needs cannot exceed the budget")
  }

  test("corpus_shuffle: bucketed rank equals the global-window twin; bucket-count-invariant; shards full") {
    val got = Corpus.corpusShuffle(docs, Corpus.ShuffleSeed, Corpus.ShuffleShardSize, 32)
    assertSameRows(got,
      Corpus.corpusShuffleWindowed(docs, Corpus.ShuffleSeed, Corpus.ShuffleShardSize))
    // rank is independent of the parallelism knob (prefix sums are exact)
    assertSameRows(got,
      Corpus.corpusShuffle(docs, Corpus.ShuffleSeed, Corpus.ShuffleShardSize, 5))
    // ranks are a permutation of 1..N; every shard but the last is full
    val n = docs.count()
    assert(got.select("shuffle_rank").distinct().count() == n)
    assert(got.agg(min("shuffle_rank"), max("shuffle_rank")).head() ==
      org.apache.spark.sql.Row(1L, n))
    val sizes = got.groupBy("shard_id").count()
    assert(sizes.filter(col("count") =!= Corpus.ShuffleShardSize).count() <= 1)
    // a different seed yields a different order (the knob is real)
    val other = Corpus.corpusShuffle(docs, "other-seed", Corpus.ShuffleShardSize, 32)
    assert(got.join(other, Seq("doc_id", "shuffle_rank")).count() < n)
  }

  test("skewed stratum: u-prefix bound shrinks the window input >= 10x") {
    import spark.implicits._
    // one 20k-doc stratum vs one 200-doc stratum; quota 50
    val skewed = ((0 until 20000).map(i => (i.toLong, "big")) ++
      (20000 until 20200).map(i => (i.toLong, "small")))
      .toDF("doc_id", "lang")
      .select(col("doc_id"), col("lang"),
        Corpus.hashUniform(col("doc_id")).as("u"))
    val kept = Corpus.admitPrefix(skewed, "lang", lit(1L), _ => lit(50L))
    val n = kept.count()
    assert(n < 20200 / 10, s"admit-prefix kept $n of 20200 rows")
    // and the bound is sufficient: ranking the kept prefix == ranking all
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("u"), col("doc_id"))
    val bounded = kept.withColumn("r", row_number().over(w)).filter(col("r") <= 50)
    val full = skewed.withColumn("r", row_number().over(w)).filter(col("r") <= 50)
    assertSameRows(bounded, full)
  }

  test("seq_pack doc_id-range buckets spread each stratum over >1 task") {
    import spark.implicits._
    val many = (0 until 5000).map(i => (i.toLong, if (i % 2 == 0) "a" else "b", "x y z"))
      .toDF("doc_id", "lang", "text")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val perStratum = Corpus.withRangeBucket(many, "lang", 16)
      .groupBy("lang").agg(countDistinct("bkt").as("nb")).collect()
    perStratum.foreach { r =>
      assert(r.getLong(1) > 1, s"stratum ${r.getString(0)} landed in one bucket")
    }
  }

  test("quantile buckets balance clustered ids; packing is bucket-boundary-invariant") {
    import spark.implicits._
    // ids cluster in two slivers of a huge span: equal-width collapses
    // to the edge buckets, quantile bounds spread the mass
    val ids = (0L until 400L) ++ (4000000000L until 4000000400L)
    val docs = ids.map(i => (i, "a", "some text " + i)).toDF("doc_id", "lang", "text")
    val sized = docs.select(col("doc_id"), col("lang"), lit(2L).as("n_tokens"))
    val n = 8
    def counts(df: org.apache.spark.sql.DataFrame): Map[Int, Long] =
      df.groupBy("bkt").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val width = counts(Corpus.withRangeBucketWidth(sized, "lang", n))
    val quant = counts(Corpus.withRangeBucketQuantile(sized, "lang", n))
    assert(width.size <= 2, s"clustered ids should collapse equal-width buckets: $width")
    assert(quant.size >= n - 1, s"quantile bounds should populate ~all buckets: $quant")
    assert(quant.values.max <= 2L * quant.values.min,
      s"quantile buckets should be balanced: $quant")
    // monotonicity in doc_id (the numbering invariant): bucket of a
    // smaller id never exceeds the bucket of a larger one
    val ordered = Corpus.withRangeBucketQuantile(sized, "lang", n)
      .orderBy("doc_id").select("bkt").collect().map(_.getInt(0))
    assert(ordered.sameElements(ordered.sorted), "quantile buckets must be monotone in doc_id")
    // and the packing output is identical under either bucketing
    val viaQuantile = Corpus.seqPackWith(docs, "lang", 64, Corpus.nTokens _,
        Corpus.withRangeBucketQuantile).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    val viaWindow = Corpus.seqPackWindowed(docs, "lang", 64).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(viaQuantile == viaWindow, "packing must not depend on bucket boundaries")
  }

  test("corpus.bucketBoundaries config: parse + validation") {
    val c = graft.config.GraftConfig.parse(
      """{"corpus": {"bucketBoundaries": "quantile"}}""")
    assert(c.corpus.bucketBoundaries == "quantile")
    assert(graft.config.GraftConfig.parse("{}").corpus.bucketBoundaries == "width")
    intercept[IllegalArgumentException] {
      graft.config.GraftConfig.parse("""{"corpus": {"bucketBoundaries": "zipf"}}""")
    }
  }

  test("randomized trials: scalable paths == windowed twins on adversarial corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812)
    for (trial <- 1 to 3) {
      // adversarial shapes: skewed strata, a 1-doc stratum, duplicate-ish
      // texts (u ties impossible — u is keyed on doc_id — but token ties
      // abound), sparse ids with gaps
      val nStrata = rnd.nextInt(4) + 2
      val rows = (0 until nStrata).flatMap { s =>
        val size = if (s == 0) 1 else rnd.nextInt(400) + 1
        (0 until size).map { i =>
          val id = s * 100000L + i * (rnd.nextInt(7) + 1) + i
          (id, s"s$s", Seq.fill(rnd.nextInt(30) + 1)("w").mkString(" "))
        }
      }
      val docs = rows.toDF("doc_id", "lang", "text")
      val quota = rnd.nextInt(60) + 1
      val budget = rnd.nextInt(4000) + 1
      val weights = (0 until nStrata).map(s => s"s$s" -> rnd.nextDouble()).toMap
      assertSameRows(
        Corpus.sampleStratified(docs, "lang", quota),
        Corpus.sampleStratifiedWindowed(docs, "lang", quota))
      assertSameRows(
        Corpus.seqPack(docs, "lang", budget),
        Corpus.seqPackWindowed(docs, "lang", budget))
      assertSameRows(
        Corpus.dataMix(docs, "lang", weights, budget),
        Corpus.dataMixWindowed(docs, "lang", weights, budget))
      // a stratum absent from the weights map gets budget 0 -> no rows
      val partial = weights - "s0"
      assertSameRows(
        Corpus.dataMix(docs, "lang", partial, budget),
        Corpus.dataMixWindowed(docs, "lang", partial, budget))
    }
    // null stratum: its own partition in a window; the bucketed/bounded
    // paths must treat it identically (null-safe joins throughout)
    val withNulls = (0 until 300).map { i =>
      (i.toLong, if (i % 3 == 0) null else s"s${i % 2}", "a b c d e")
    }.toDF("doc_id", "lang", "text")
    assertSameRows(
      Corpus.sampleStratified(withNulls, "lang", 40),
      Corpus.sampleStratifiedWindowed(withNulls, "lang", 40))
    assertSameRows(
      Corpus.seqPack(withNulls, "lang", 64),
      Corpus.seqPackWindowed(withNulls, "lang", 64))
  }

  test("seq packing: offsets in range, streams contiguous, budget respected") {
    val budget = 2048
    val p = Corpus.seqPack(docs, "lang", budget).cache()
    assert(p.count() == docs.count())
    // every offset inside the pack budget
    assert(p.filter(col("pack_offset") < 0 || col("pack_offset") >= budget).count() == 0)
    // the token stream is contiguous: per stratum, cum tokens == sum
    val check = p.groupBy("lang").agg(
      sum("n_tokens").as("toks"),
      max(col("pack_id") * budget + col("pack_offset") + col("n_tokens")).as("stream_end"))
    // the last doc's end == the stratum's total token count
    assert(check.filter(col("toks") =!= col("stream_end")).count() == 0)
    // pack ids dense from 0 per stratum
    val packs = p.groupBy("lang").agg(
      min("pack_id").as("lo"), countDistinct("pack_id").as("n_packs"), max("pack_id").as("hi"))
    assert(packs.filter(col("lo") =!= 0).count() == 0)
    assert(packs.filter(col("hi") =!= col("n_packs") - 1).count() == 0)
    p.unpersist()
  }

  test("curriculum_order: bucketed == windowed twin; buckets contiguous head->middle->tail") {
    import spark.implicits._
    // synthetic scored corpus: 3 buckets, uneven sizes
    val scored = (0L until 300L).map { i =>
      val b = if (i < 150) "head" else if (i < 250) "middle" else "tail"
      (i, 0.0, b)
    }.toDF("doc_id", "lm_score", "bucket")
    val got = Corpus.curriculumOrder(scored, Corpus.CurriculumSeed, 32)
    val want = Corpus.curriculumOrderWindowed(scored, Corpus.CurriculumSeed)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "bucketed order must equal the global-window twin")
    // bucket-count invariance (the shuffle entry's invariant)
    val got5 = Corpus.curriculumOrder(scored, Corpus.CurriculumSeed, 5)
    assert(got5.exceptAll(want).isEmpty)
    val rows = got.collect().map(r => (r.getString(1), r.getLong(3))).sortBy(_._2)
    // positions are a dense 1..N permutation
    assert(rows.map(_._2).toSeq == (1L to 300L))
    // curriculum contract: every head position < every middle < every tail
    val maxOf = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val minOf = rows.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    assert(maxOf("head") < minOf("middle") && maxOf("middle") < minOf("tail"))
    // in-bucket order is the seeded shuffle, not doc_id order
    val headIds = rows.filter(_._1 == "head").map(_._2)
    val headDocs = got.filter(col("bucket") === "head")
      .orderBy("train_pos").select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(headDocs != headDocs.sorted, "in-bucket order must be shuffled")
    assert(headIds.length == 150)
  }

  test("curriculum_order corpus entry: covers the corpus, reconciles with perplexity_bucket") {
    val entry = Corpus.curriculumOrderQuery(spark, sf).cache()
    val n = Tables.documents(spark, sf).count()
    assert(entry.count() == n)
    assert(entry.agg(min("train_pos"), max("train_pos")).collect().head.toSeq ==
      Seq(1L, n))
    // bucket labels agree with the perplexity_bucket entry doc-for-doc
    val pb = graft.operators.Quantiles.perplexityBucketQuery(spark, sf)
      .select(col("doc_id"), col("bucket").as("pb_bucket"))
    assert(entry.join(pb, "doc_id")
      .filter(col("bucket") =!= col("pb_bucket")).count() == 0)
    entry.unpersist()
    ()
  }
}
