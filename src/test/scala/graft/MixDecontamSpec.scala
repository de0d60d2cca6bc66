package graft

import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Decontaminate}

/** Ground truth for temperature mixing and semantic decontamination. */
class MixDecontamSpec extends SparkSpecBase {

  test("temperature budgets follow floor(sqrt) shares and upweight small strata") {
    val docs = Tables.documents(spark, sf)
    val out = Corpus.dataMixTemperature(docs, "lang", 8000L)
    // recompute the exact integer budgets independently
    val counts = docs.groupBy("lang")
      .agg(sum(length(col("text")) - length(translate(col("text"), " ", "")) + 1).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val isq = counts.map { case (s, c) => s -> math.floor(math.sqrt(c.toDouble)).toLong }
    val tot = isq.values.sum
    val budgets = isq.map { case (s, q) => s -> 8000L * q / tot }
    // per-stratum drawn token mass: >= budget only via the boundary doc
    val drawn = out.groupBy("lang").agg(sum("n_tokens").as("t"), max("n_tokens").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    drawn.foreach { case (lang, (t, mx)) =>
      val b = budgets(lang)
      assert(t < b + mx, s"$lang drew $t over budget $b beyond one boundary doc")
      assert(t >= math.min(b, counts(lang)), s"$lang under-filled: $t of $b")
    }
    // temperature flattens: the largest stratum's budget share is
    // strictly below its natural token share
    val big = counts.maxBy(_._2)._1
    val natural = counts(big).toDouble / counts.values.sum
    val tempered = budgets(big).toDouble / budgets.values.sum
    assert(tempered < natural, s"$big: tempered $tempered !< natural $natural")
  }

  test("temperature mix equals explicit-weights mix given the same budgets") {
    val docs = Tables.documents(spark, sf)
    val counts = docs.groupBy("lang")
      .agg(sum(length(col("text")) - length(translate(col("text"), " ", "")) + 1).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val isq = counts.map { case (s, c) => s -> math.floor(math.sqrt(c.toDouble)).toLong }
    val tot = isq.values.sum
    val budgets = isq.map { case (s, q) => s -> 8000L * q / tot }
    val a = Corpus.dataMixTemperature(docs, "lang", 8000L).collect().toSet
    val b = Corpus.dataMixWithBudgets(docs, "lang", budgets).collect().toSet
    assert(a == b)
  }

  test("corpus_split: disjoint cover, stable under growth, near-target proportions") {
    val docs = Tables.documents(spark, sf)
    val out = Corpus.corpusSplit(docs, "s", 0.8, 0.1).cache()
    val n = docs.count()
    assert(out.count() == n)
    val byBand = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byBand.values.sum == n)
    // proportions within a loose binomial band at this corpus size
    assert(byBand("train").toDouble / n > 0.65 && byBand("train").toDouble / n < 0.95)
    assert(byBand.getOrElse("test", 0L) + byBand.getOrElse("val", 0L) > 0)
    // growth stability: the split of the first half is the same rows'
    // split in the full corpus (a doc never migrates)
    val half = Corpus.corpusSplit(docs.filter(col("doc_id") % 2 === 0), "s", 0.8, 0.1)
    val joined = half.select(col("doc_id"), col("split").as("h"))
      .join(out.select(col("doc_id"), col("split").as("f")), "doc_id")
    assert(joined.filter(col("h") =!= col("f")).count() == 0)
    out.unpersist()
  }

  test("seq_pack_bpe: packs by subword counts; offsets consistent within packs") {
    val out = Corpus.seqPackBpeQuery(spark, sf).cache()
    val model = graft.text.Bpe.fitFor(spark, sf)
    // n_tokens column IS the BPE count of the doc
    val recount = Tables.documents(spark, sf)
      .select(col("doc_id"), graft.text.Bpe.bpe_count(col("text"), model)
        .cast("long").as("want"))
    val joined = out.join(recount, "doc_id")
    assert(joined.filter(col("n_tokens") =!= col("want")).count() == 0)
    // pack math: offset < budget, and pack_id = floor(cum_before/budget)
    assert(out.filter(col("pack_offset") >= 2048 || col("pack_offset") < 0).count() == 0)
    // the synthetic corpus's tiny vocabulary is FULLY merged by the
    // fitted model (every word ends as one subword), so on it the two
    // counters legitimately coincide; unseen words split to chars and
    // expose the subword budget
    import spark.implicits._
    val weird = Seq((1L, "en", "zxqvwy kjhgfd")).toDF("doc_id", "lang", "text")
    val packed = Corpus.seqPack(weird, "lang", 2048,
      c => graft.text.Bpe.bpe_count(c, model).cast("long")).head()
    assert(packed.getAs[Long]("n_tokens") == 12L) // 6 + 6 unmerged chars
    assert(Corpus.seqPack(weird, "lang", 2048).head().getAs[Long]("n_tokens") == 2L)
    out.unpersist()
  }

  test("semantic decontamination flags every planted leak and no random vector") {
    val out = Decontaminate.decontaminateSemanticQuery(spark, sf).cache()
    val planted = out.filter(col("vec_id") >= graft.dedup.Dedup.PlantOffset)
    // every planted jittered bench copy is a leak: cosine ~1, same home cell
    assert(planted.count() > 0)
    assert(planted.filter(col("contaminated") === 0).count() == 0,
      "planted leak not flagged")
    // contaminated non-planted vectors must genuinely sit at >= tau
    val flaggedNatural = out.filter(col("vec_id") < graft.dedup.Dedup.PlantOffset
      && col("contaminated") === 1)
    assert(flaggedNatural.filter(col("max_cos") < Decontaminate.SemTau).count() == 0)
    // and vectors with no candidate report the -1 sentinel, uncontaminated
    assert(out.filter(col("n_cands") === 0 && col("max_cos") =!= -1.0).count() == 0)
    out.unpersist()
  }

  test("split_overlap: disjoint corpora contain 0; shared-text corpora contain 1") {
    import spark.implicits._
    import graft.operators.SplitOverlap
    // wider val/test bands so both splits are guaranteed non-empty at n=400
    val n = 400L
    val disjoint = (0L until n).map(i => (i, s"a$i b$i c$i d$i e$i f$i g$i"))
      .toDF("doc_id", "text")
    val out0 = SplitOverlap.splitOverlap(disjoint, "doc_id", "text",
      Corpus.SplitSeed, 0.6, 0.2).collect()
    assert(out0.map(_.getString(0)).toSet == Set("val", "test"))
    assert(out0.forall(_.getDouble(4) == 0.0),
      s"disjoint per-doc vocabularies must share no 5-grams: ${out0.mkString}")
    // identical text everywhere: every eval gram sits in train
    val shared = (0L until n).map(i => (i, "x y z w v u t")).toDF("doc_id", "text")
    val out1 = SplitOverlap.splitOverlap(shared, "doc_id", "text",
      Corpus.SplitSeed, 0.6, 0.2).collect()
    assert(out1.forall(r => r.getDouble(4) == 1.0 && r.getLong(3) == r.getLong(2)))
    // the entry's n_docs agrees with the corpus_split assignment
    val entry = SparkEntry.queries("split_overlap")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val splitCounts = Corpus.corpusSplitQuery(spark, sf)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(entry == splitCounts.view.filterKeys(_ != "train").toMap)
  }

  test("minhash decontamination flags every planted mutated bench copy") {
    val out = Decontaminate.decontaminateMinhashQuery(spark, sf).cache()
    val off = graft.dedup.Dedup.PlantOffset
    // one row per training doc: the non-bench corpus plus the planted copies
    val docs = Tables.documents(spark, sf)
    val nTrain = docs.filter(col("doc_id") % 17 =!= 0).count() +
      docs.filter(col("doc_id") % 17 === 0 &&
        col("doc_id") < Decontaminate.FuzzyPlantBound).count()
    assert(out.count() == nTrain)
    // every planted mutated copy keeps Jaccard far above tau vs its source
    val planted = out.filter(col("doc_id") >= off)
    assert(planted.count() > 0)
    assert(planted.filter(col("contaminated") === 0).count() == 0,
      "planted fuzzy leak not flagged")
    // the flag is exactly the threshold rule, and no-candidate docs
    // report the -1 sentinel
    assert(out.filter((col("max_jaccard") >= Decontaminate.FuzzyTau) =!=
      (col("contaminated") === 1)).count() == 0)
    assert(out.filter(col("n_cands") === 0 && col("max_jaccard") =!= -1.0).count() == 0)
    out.unpersist()
  }
}
