package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Corpus

/**
 * Scale-ramp evidence for the bucketed corpus plans: times the
 * scalable paths against their windowed twins (and the minhash
 * signature+band join) at sf0.01, sf0.1, and replicated corpora ~10x /
 * ~40x sf0.1, writing one JSON artifact (SCALE_rNN.json).
 *
 * Replication is HONEST about duplication: replica k>0 suffixes every
 * word with `_rk`, so cross-replica shingle sets are disjoint (Jaccard
 * 0) and the dedup join does not degenerate into an all-replica
 * near-dup clique a real corpus would not have. doc_ids shift by
 * 10M per replica; the id clustering this creates per replica is the
 * exact layout the doc_id-range buckets must absorb.
 *
 * Methodology follows Bench: one warm-up run of every op at the
 * smallest scale (JIT + codegen outside timings), then min over reps
 * per measurement on a contended sandbox.
 */
object ScaleRamp {

  private def replicate(docs: DataFrame, copies: Int): DataFrame =
    (1 until copies).foldLeft(docs) { (acc, k) =>
      acc.unionByName(docs.select(
        (col("doc_id") + k.toLong * 10000000L).as("doc_id"),
        col("lang"),
        array_join(transform(split(col("text"), " "),
          w => concat(w, lit(s"_r$k"))), " ").as("text")))
    }

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("SCALE_r07.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt.max(1)

    def docsOf(sfDir: String) = Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text")

    // replicated corpora are materialized once as parquet so every
    // timed op reads a real columnar source, not an in-plan union
    def replicated(copies: Int, tag: String): String = {
      val dir = s"/root/repo/tmp/scale/$tag"
      if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
        replicate(docsOf("/root/testdata/sf0.1"), copies)
          .repartition(32).write.mode("overwrite").parquet(dir)
      }
      dir
    }

    val scales: Seq[(String, () => DataFrame)] = Seq(
      "sf0.01" -> (() => docsOf("/root/testdata/sf0.01")),
      "sf0.1" -> (() => docsOf("/root/testdata/sf0.1")),
      "sf1x" -> (() => spark.read.parquet(replicated(10, "sf1x"))),
      "sf4x" -> (() => spark.read.parquet(replicated(40, "sf4x"))))

    // full-output noop materialization (Bench.materialize rationale:
    // a bare count() lets Spark 4's distinct-key join elimination
    // collapse the left-join report entries to a bare scan)
    def mat(df: DataFrame): Long = {
      df.write.mode("overwrite").format("noop").save(); 1L
    }

    def ops(docs: DataFrame): Seq[(String, () => Long)] = Seq(
      "sample_bucketed" -> (() => mat(Corpus.sampleStratified(docs, "lang", 50))),
      "sample_windowed" -> (() => mat(Corpus.sampleStratifiedWindowed(docs, "lang", 50))),
      "seqpack_bucketed" -> (() => mat(Corpus.seqPack(docs, "lang", 2048))),
      "seqpack_windowed" -> (() => mat(Corpus.seqPackWindowed(docs, "lang", 2048))),
      "datamix_bucketed" -> (() =>
        mat(Corpus.dataMix(docs, "lang", Corpus.MixWeights, Corpus.MixBudget))),
      "datamix_windowed" -> (() =>
        mat(Corpus.dataMixWindowed(docs, "lang", Corpus.MixWeights, Corpus.MixBudget))),
      "dedup_minhash" -> (() =>
        mat(graft.dedup.Dedup.minhashPairs(docs, "doc_id", "text"))),
      // round-6 additions whose work grows with the corpus: unigram-LM
      // scoring (vocab partial agg + token equi-join), line-level and
      // span-level dedup (two-level partial aggs), BM25 top-k (postings
      // partial agg + bounded query join), and one classifier GD epoch
      // (exploded 512-row partial agg — the per-epoch unit of training)
      "lm_score" -> (() =>
        mat(graft.text.TextAnalysis.lmScore(docs, "doc_id", "text"))),
      "dedup_lines" -> (() =>
        mat(graft.dedup.Dedup.dedupLines(docs, "doc_id", "text"))),
      "dedup_substring" -> (() =>
        mat(graft.dedup.Dedup.substringStats(docs, "doc_id", "text"))),
      "bm25_topk" -> (() =>
        mat(graft.text.TextSearch.bm25(docs, numQueries = 20, topK = 10))),
      "qc_fit_epoch" -> (() => {
        graft.text.QualityClassifier.fit(
          graft.text.QualityClassifier.plantedDocs(docs), "text",
          graft.text.QualityClassifier.plantedLabel, epochs = 1)
        1L
      }),
      // round-7 additions: interpolated trigram LM (three n-gram vocab
      // partial aggs + equi-joins), span-level dedup REWRITE (window
      // stats + bounded dropped-span explode + anti-join), URL hygiene
      // (map-only verdicts + one per-URL owner agg), chunking (map-only
      // generator explode), and fuzzy decontamination against a FIXED
      // bench side (the real deployment shape: bench stays eval-suite
      // sized while the training side ramps)
      "lm_score_trigram" -> (() =>
        mat(graft.text.TextAnalysis.lmScoreTrigram(docs, "doc_id", "text"))),
      "dedup_substring_apply" -> (() =>
        mat(graft.dedup.Dedup.substringApply(docs, "doc_id", "text"))),
      "url_filter" -> (() =>
        mat(graft.text.UrlFilter.urlFilter(graft.text.UrlFilter.withPlantedUrls(
          docs.withColumn("source", col("lang")))))),
      "doc_chunk" -> (() =>
        mat(graft.operators.Chunking.chunk(docs, "doc_id", "text"))),
      "decontam_minhash" -> (() =>
        mat(graft.operators.Decontaminate.decontaminateMinhash(
          docs, docs.filter(col("doc_id") % 17 === 0 && col("doc_id") < 340),
          "doc_id", "text"))),
      // split-leakage report: the distinct (split, gram) shuffle is its
      // scale story — the one corpus-sized exchange, reused by the
      // train/eval semi-join
      "split_overlap" -> (() =>
        mat(graft.operators.SplitOverlap.splitOverlap(docs, "doc_id", "text",
          Corpus.SplitSeed, Corpus.TrainFrac, Corpus.ValFrac))),
      // this-session additions: the 5-gram backoff LM (five n-gram
      // vocab partial aggs + five merge joins over the gram stream —
      // the heaviest text op by design), CCNet tertile bucketing
      // (lm_score + two quantile thresholds), and DSIR selection
      // (fixed-256-bucket model broadcast + per-doc partial agg)
      "lm_score_5gram" -> (() =>
        mat(graft.text.TextAnalysis.lmScore5gram(docs, "doc_id", "text",
          Corpus.hashUniform(concat(lit(graft.text.TextAnalysis.Lm5Seed + ":"),
            col("doc_id").cast("string"))) < graft.text.TextAnalysis.Lm5TrainFrac))),
      "perplexity_bucket" -> (() =>
        mat(graft.operators.Quantiles.perplexityBucket(
          graft.text.TextAnalysis.lmScore(docs, "doc_id", "text"),
          "doc_id", "lm_score"))),
      "dsir_select" -> (() =>
        mat(graft.operators.Dsir.dsirSelect(docs, "doc_id", "text",
          col("lang") === graft.operators.Dsir.DsirTargetLang))),
      // the six-stage funnel (the top-cost entry): bench side stays
      // eval-suite-shaped (FIXED slice of sf0.1, not ramping with the
      // corpus — the deployment contract), train side ramps
      "corpus_curate" -> (() =>
        mat(graft.operators.Curate.curate(
          docs.select("doc_id", "text"),
          Tables.documents(spark, "/root/testdata/sf0.1")
            .filter(col("doc_id") % 17 === 0).select("doc_id", "text")))),
      // Bloom decontamination: bitset fit ONCE on the fixed bench side
      // (outside the timer would hide nothing — it is corpus-size-
      // independent by construction); the timed part is the map-only
      // verdict scan, the flattest ramp in the file by design
      "decontam_bloom" -> (() => {
        val bench = Tables.documents(spark, "/root/testdata/sf0.1")
          .filter(col("doc_id") % 17 === 0).select("doc_id", "text")
        val (words, m) = graft.operators.BloomDecontaminate.fit(bench, "text", 5)
        mat(graft.operators.BloomDecontaminate.decontaminateBloom(
          docs, "doc_id", "text", 5, words, m))
      }),
      // corpus-level heavy hitters: one gram-keyed partial agg whose
      // shuffle bytes scale with DISTINCT grams + a TakeOrdered cut
      "ngram_topk" -> (() =>
        mat(graft.operators.CorpusStats.ngramTopk(docs, "doc_id", "text", 3, 50))),
      // round-8 additions: the CM sketch's shuffle keys are FIXED at
      // depth x width cells — this row vs ngram_topk above is the
      // bounded-sketch vs distinct-gram scale argument in numbers
      "cms_sketch" -> (() =>
        mat(graft.operators.CorpusStats.cmsSketch(docs, "doc_id", "text", 3))),
      // host rollup: two bounded-key partial aggs (urls, then hosts);
      // the plant is a projection next to text — no join
      "host_stats" -> (() =>
        mat(graft.text.UrlFilter.hostStats(
          docs.withColumn("source", col("lang"))
            .select(col("doc_id"),
              graft.text.UrlFilter.plantedUrlCol.as("url"), col("text"))))),
      // round-9 additions. Delta dedup: ~9% of the corpus is the "new
      // crawl" merging into a RESIDENT base signature table (written
      // once per scale, read back parquet — the production shape; the
      // first rep pays the write, min-of-reps times the merge). The
      // scale argument: this row ramps BELOW the full dedup_minhash
      // row above because only the delta is signed and the pair
      // join's probe side is delta-sized, never corpus-sized
      "dedup_minhash_delta" -> (() => {
        val pred = col("doc_id") % 11 === 0
        val dir = s"/root/repo/tmp/scale/delta_base_sigs_${docs.count()}"
        if (!new java.io.File(s"$dir/_SUCCESS").exists())
          graft.dedup.Dedup.minhashSignatures(
            docs.filter(!pred), "doc_id", "text", 64, 3)
            .write.mode("overwrite").parquet(dir)
        mat(graft.dedup.Dedup.minhashPairsDelta(
          spark.read.parquet(dir), docs.filter(pred), docs, "doc_id", "text"))
      }),
      // the staged funnel (two stage writes + staged reads) vs the
      // in-plan corpus_curate row above — the materialize-once ramp
      "curate_materialized" -> (() =>
        mat(graft.operators.Curate.curateMaterialized(
          docs.select("doc_id", "text"),
          Tables.documents(spark, "/root/testdata/sf0.1")
            .filter(col("doc_id") % 17 === 0).select("doc_id", "text"),
          "/root/repo/tmp/scale/curate_stage"))),
      // trained lang-ID: the one-pass NB fit (classes x buckets output
      // regardless of corpus) + the map-only integer scoring pass
      "lang_id_trained" -> (() => {
        val planted = graft.text.LangIdTrained.plantedDocs(docs)
        val m = graft.text.LangIdTrained.fit(planted)
        mat(graft.text.LangIdTrained.score(planted, m))
      }),
      // three-family token budgets under FIXED models: one map pass
      // with two codegen'd counters + a langs-sized agg
      "tokenizer_compare" -> (() =>
        mat(graft.text.Tokenizers.compareReport(docs,
          graft.text.Bpe.modelFor(spark, "/root/testdata/sf0.01"),
          graft.text.Unigram.modelFor(spark, "/root/testdata/sf0.01")))),
      // snapshot diff: digests ride the full-outer join, never text —
      // should ramp at the cost of two scans + one doc_id exchange
      "corpus_diff" -> (() =>
        mat(graft.operators.CorpusDiff.corpusDiffOn(
          docs.select(col("doc_id"), col("text"))))),
      // the threshold grid: one signals pass + explode to 3 verdict
      // rows + a 3-row agg — must ramp with the signals pass alone
      "quality_ablation" -> (() =>
        mat(graft.text.TextAnalysis.qualityAblationOn(
          docs.select(col("doc_id"), col("text"))))),
      // incremental signals maintenance: resident base signals staged
      // once per scale (the dedup_minhash_delta convention); the timed
      // plan is the digest diff + carried base reads + the DELTA-only
      // signal pass — ramps below quality_ablation's full signals pass
      // because only added/changed docs (~25% under the carve) pay the
      // regex-heavy signal extraction; the md5 scan both snapshots
      // still pay is the part a stored ingest-time digest removes
      "signals_delta" -> (() => {
        val d = docs.select(col("doc_id"), col("text"))
        val old = graft.operators.CorpusDiff.carveOld(d)
        val dir = s"/root/repo/tmp/scale/qsig_base_${docs.count()}"
        if (!new java.io.File(s"$dir/_SUCCESS").exists())
          graft.text.TextAnalysis.qualitySignalsOn(old)
            .write.mode("overwrite").parquet(dir)
        mat(graft.operators.SignalsMaintenance.signalsDelta(
          spark.read.parquet(dir), old,
          graft.operators.CorpusDiff.carveNew(d)))
      }),
      // the card: one signal pass + a sources×langs agg — must ramp
      // with the signals pass (quality_ablation's twin shape)
      "dataset_card" -> (() =>
        mat(graft.operators.CorpusStats.datasetCard(
          docs.withColumn("source", col("lang"))))),
      // curriculum positions: lm_score pass + the two-level bucketed
      // prefix-sum order — ramps with the score pass, never a global
      // sort (synthetic buckets keep the row independent of the LM)
      "curriculum_order" -> (() =>
        mat(graft.operators.Corpus.curriculumOrder(
          docs.select(col("doc_id"), lit(0.0).as("lm_score"),
            when(col("doc_id") % 3 === 0, "head")
              .when(col("doc_id") % 3 === 1, "middle")
              .otherwise("tail").as("bucket")),
          graft.operators.Corpus.CurriculumSeed, 32))),
      // the one-call merge: digest diff + delta band probe + verdict
      // joins — must ramp with dedup_minhash_delta (the gate dominates)
      "corpus_merge" -> (() =>
        mat(graft.operators.CorpusMerge.corpusMergeOn(
          docs.select(col("doc_id"), col("text"))))),
      // packing report: one sizing pass + shard-bounded greedy folds —
      // must ramp with the seq_pack rows (the folds are window-shaped)
      "pack_efficiency" -> (() =>
        mat(graft.operators.Packing.packEfficiency(docs, "lang"))),
      // greedy pack assignment: the O(shard^2) fold under PRODUCTION
      // sizing — buckets scale with the corpus so shards stay ~256
      // docs and the total fold work stays linear (the scaladoc's
      // sizing rule, proven here rather than asserted)
      "seq_pack_greedy" -> (() =>
        mat(graft.operators.Packing.seqPackGreedy(docs, "lang",
          graft.operators.Packing.PackBudget,
          math.max(32, (docs.count() / 256).toInt)))),
      // r10: the FFD assignment — same shard-fold shape as greedy with
      // the bounded open-bin state; shard count scales with the corpus
      // for the same linearity argument
      "seq_pack_ffd" -> (() =>
        mat(graft.operators.Packing.seqPackFfd(docs, "lang",
          graft.operators.Packing.PackBudget,
          math.max(32, (docs.count() / 256).toInt)))),
      // drift report: two signal passes + tiny histogram aggs — must
      // ramp with quality_ablation (same signals-pass shape, twice)
      "quality_drift" -> (() => {
        val d = docs.select(col("doc_id"), col("text"))
        mat(graft.operators.CorpusStats.qualityDrift(
          graft.text.TextAnalysis.qualitySignalsOn(
            graft.operators.CorpusDiff.carveOld(d)),
          graft.text.TextAnalysis.qualitySignalsOn(
            d.filter(col("doc_id") % 7 =!= 0 &&
              (col("doc_id") % 13 === 0 || col("doc_id") % 5 === 0)))))
      }))

    // SPARK_GRAFT_ONLY=a,b,c restricts the ramp (iteration aid; the
    // Bench convention)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    def opsOf(docs: DataFrame): Seq[(String, () => Long)] =
      ops(docs).filter { case (op, _) => only.forall(_.contains(op)) }

    // warm-up at the smallest scale: JIT + codegen compile once
    opsOf(docsOf("/root/testdata/sf0.01")).foreach { case (_, f) => f() }

    // the quantity that actually degrades at 100 TB is not sandbox
    // wall-time (a 40k-row stratum window is still trivial; the
    // bucketed plans pay a fixed few-hundred-ms of extra jobs) but the
    // ROWS ANY SINGLE WINDOW PARTITION MUST PROCESS — the windowed
    // twins put a whole stratum through one reducer (N/strata, grows
    // linearly), the bucketed plans a provably bounded sliver
    def windowLoads(docs: DataFrame): Seq[(String, Long, Long)] = {
      val strata = docs.groupBy("lang").count()
      val maxStratum = strata.agg(max("count")).head().getLong(0)
      val base = docs.select(col("doc_id"), col("lang"),
        Corpus.hashUniform(col("doc_id")).as("u"))
      val sampleAdmitted = Corpus.admitPrefix(base, "lang", lit(1L), _ => lit(50L))
        .groupBy("lang").count().agg(max("count")).head().getLong(0)
      val sizedU = docs.select(col("doc_id"), col("lang"),
        Corpus.nTokens(col("text")).as("n_tokens"),
        Corpus.hashUniform(col("doc_id")).as("u"))
      val budgets = Corpus.MixWeights.map { case (s, w) =>
        s -> math.floor(w * Corpus.MixBudget).toLong }
      val budgetCol = budgets.foldLeft(lit(0L)) { case (acc, (s, b)) =>
        when(col("_sk") === s, lit(b)).otherwise(acc) }
      val mixAdmitted = Corpus.admitPrefix(sizedU, "lang", col("n_tokens"), _ => budgetCol)
        .groupBy("lang").count().agg(max("count")).head().getLong(0)
      val packBuckets = Corpus.withRangeBucketWidth(
          docs.select(col("doc_id"), col("lang")),
          "lang", spark.sparkContext.defaultParallelism)
        .groupBy("lang", "bkt").count().agg(max("count")).head().getLong(0)
      Seq(
        ("sample", sampleAdmitted, maxStratum),
        ("datamix", mixAdmitted, maxStratum),
        ("seqpack", packBuckets, maxStratum))
    }

    val rows = scales.map { case (tag, mk) =>
      val docs = mk()
      val n = docs.count()
      val times = opsOf(docs).map { case (op, f) =>
        val secs = (1 to reps).map { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          f()
          (System.nanoTime() - t0) / 1e9
        }.min
        System.err.println(f"[scale] $tag $op ${secs}%.2f s")
        op -> secs
      }
      val loads = windowLoads(docs)
      loads.foreach { case (op, b, w) =>
        System.err.println(s"[scale] $tag $op window-input rows: bucketed=$b windowed=$w") }
      (tag, n, times, loads)
    }

    val json = rows.map { case (tag, n, times, loads) =>
      val ts = times.map { case (op, s) => f""""$op":$s%.3f""" }.mkString(",")
      val ls = loads.map { case (op, b, w) =>
        s""""${op}_window_rows":{"bucketed":$b,"windowed":$w}""" }.mkString(",")
      s""""$tag":{"docs":$n,$ts,$ls}"""
    }.mkString(
      s"""{"note":"sf1x/sf4x are sf0.1 documents replicated 10x/40x with per-replica word suffixes (cross-replica Jaccard 0) and +10M doc_id strides; min of $reps reps; *_window_rows = max rows any ONE window partition processes (the quantity that serializes at scale)","scales":{""",
      ",", "}}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json)
    println(json)
    spark.stop()
  }
}
