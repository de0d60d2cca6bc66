package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingIntake

/** Continuous corpus intake == the batch hygiene chain, byte for byte. */
class StreamingIntakeSpec extends SparkSpecBase {

  private def tmp(name: String): String = {
    val d = s"/root/repo/target/tmp/streamintake/$name"
    val p = Paths.get(d)
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder()).forEach(f => Files.delete(f))
    }
    Files.createDirectories(p)
    d
  }

  test("streamed intake verdicts equal the batch chain regardless of batch boundaries") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val bench = docs.filter(col("doc_id") % 17 === 0)
    val train = docs.filter(col("doc_id") % 17 =!= 0)
    val in = tmp("in")
    val ckpt = tmp("ckpt")
    val out = tmp("out")
    // arrival order split mid-corpus: verdicts must not depend on it
    train.filter(col("doc_id") < 250).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/batch=0")
    train.filter(col("doc_id") >= 250).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/batch=1")
    val stream = spark.readStream
      .schema(train.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$in/batch=*")
    val q = StreamingIntake.intakeStream(stream.toDF(), bench, n = 5, out, ckpt,
      Trigger.AvailableNow())
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(out).drop("batch_id")
    val batch = StreamingIntake.intakeBatch(train, bench, n = 5)
    assert(streamed.count() == train.count())
    assert(streamed.exceptAll(batch).count() == 0
      && batch.exceptAll(streamed).count() == 0)
    // the chain's stages are all visible in the verdict: some docs carry
    // quality failures and the planted bench overlap flags contamination
    assert(spark.read.parquet(out).filter(col("keep") === 0).count() > 0)

    // restart against the same checkpoint: the committed batches do not
    // re-run, the sink stays byte-identical (exactly-once surface)
    val stream2 = spark.readStream
      .schema(train.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$in/batch=*")
    val q2 = StreamingIntake.intakeStream(stream2.toDF(), bench, n = 5, out, ckpt,
      Trigger.AvailableNow())
    q2.awaitTermination(120000)
    val after = spark.read.parquet(out).drop("batch_id")
    assert(after.count() == train.count())
    assert(after.exceptAll(batch).count() == 0 && batch.exceptAll(after).count() == 0)
  }

  test("classifier-augmented intake equals its batch twin and carries qc_pred") {
    import graft.text.QualityClassifier
    val model = QualityClassifier.fitFor(spark, sf)
    val docs = QualityClassifier.plantedDocs(
      Tables.documents(spark, sf)).select("doc_id", "text")
    val bench = docs.filter(col("doc_id") % 17 === 0)
    val train = docs.filter(col("doc_id") % 17 =!= 0)
    val in = tmp("qc_in"); val ckpt = tmp("qc_ckpt"); val out = tmp("qc_out")
    train.filter(col("doc_id") < 250).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/batch=0")
    train.filter(col("doc_id") >= 250).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/batch=1")
    val stream = spark.readStream.schema(train.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/batch=*")
    val q = StreamingIntake.intakeStream(stream.toDF(), bench, n = 5, out, ckpt,
      Trigger.AvailableNow(), Some(model))
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(out).drop("batch_id")
    val batch = StreamingIntake.intakeBatch(train, bench, n = 5, Some(model))
    assert(streamed.exceptAll(batch).count() == 0
      && batch.exceptAll(streamed).count() == 0)
    // the trained verdict separates the planted spam docs at intake
    val preds = streamed.select(col("doc_id"), col("qc_pred")).collect()
    assert(preds.nonEmpty)
    val wrong = preds.count(r =>
      r.getAs[Int]("qc_pred") != (if (r.getAs[Long]("doc_id") % 3 != 0) 1 else 0))
    assert(wrong.toDouble / preds.length <= 0.05, s"$wrong/${preds.length} misclassified")
  }

  test("DSIR-augmented intake: resident model scores each batch map-only, matching the batch selector") {
    import graft.operators.Dsir
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
    val model = Dsir.fit(docs, "doc_id", "text", col("lang") === Dsir.DsirTargetLang)
    val bench = docs.filter(col("doc_id") % 17 === 0).select("doc_id", "text")
    val train = docs.filter(col("doc_id") % 17 =!= 0).select("doc_id", "text")
    val in = tmp("ds_in"); val ckpt = tmp("ds_ckpt"); val out = tmp("ds_out")
    train.filter(col("doc_id") < 250).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/batch=0")
    train.filter(col("doc_id") >= 250).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/batch=1")
    val stream = spark.readStream.schema(train.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/batch=*")
    val q = StreamingIntake.intakeStream(stream.toDF(), bench, n = 5, out, ckpt,
      Trigger.AvailableNow(), dsir = Some(model))
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(out).drop("batch_id")
    // streamed == batch twin exactly (both score via the literal model)
    val batch = StreamingIntake.intakeBatch(train, bench, n = 5, dsir = Some(model))
    assert(streamed.exceptAll(batch).count() == 0
      && batch.exceptAll(streamed).count() == 0)
    // the resident-model weights agree with the batch dsir_select
    // in-plan weights to within one 4-dp floor step (the fold sums in
    // document order, the batch partial agg in partition order), on
    // the UNSCRUBBED text the batch entry reads
    val served = Dsir.scoreWith(docs, "doc_id", "text", model)
    val sel = Dsir.dsirSelect(docs, "doc_id", "text",
      col("lang") === Dsir.DsirTargetLang)
    val diff = served.join(sel, "doc_id")
      .select(max(abs(col("dsir_w") - col("log_w")))).head().getDouble(0)
    assert(diff <= 1e-4 + 1e-12, s"max weight divergence $diff")
  }

  test("resident top-V LM: full-vocab model matches lm_score; tail cut floors OOV as hapax") {
    import graft.text.TextAnalysis
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    // V far above the corpus vocabulary: scores must match the in-plan
    // lm_score to within one 4-dp floor step
    val full = TextAnalysis.fitLmTopV(docs, "text", v = 1 << 20)
    val served = TextAnalysis.lmScoreWith(docs, "doc_id", "text", full)
    val batch = TextAnalysis.lmScore(docs, "doc_id", "text")
    val diff = served.join(batch, "doc_id")
      .select(max(abs(col("lm_topv") - col("lm_score")))).head().getDouble(0)
    assert(diff <= 1e-4 + 1e-12, s"max divergence $diff")
    // a tiny vocabulary floors everything rare: scores can only drop
    val cut = TextAnalysis.fitLmTopV(docs, "text", v = 16)
    val dropped = TextAnalysis.lmScoreWith(docs, "doc_id", "text", cut)
      .withColumnRenamed("lm_topv", "lm_cut")
      .join(served, "doc_id")
      .filter(col("lm_cut") > col("lm_topv") + 1e-9).count()
    assert(dropped == 0, s"$dropped docs scored HIGHER under the cut vocab")
    // and the intake chain carries the lm_topv column end to end
    val bench = docs.filter(col("doc_id") % 17 === 0)
    val train = docs.filter(col("doc_id") % 17 =!= 0)
    val out = StreamingIntake.intakeBatch(train, bench, n = 5, lm = Some(cut))
    assert(out.columns.contains("lm_topv"))
    assert(out.count() == train.count())
  }

  test("resident-Bloom intake: map-only contamination verdict matches its batch twin across batch splits") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val bench = docs.filter(col("doc_id") % 17 === 0)
    val train = docs.filter(col("doc_id") % 17 =!= 0)
    // the bitset is fit ONCE on the scrubbed/normalized bench text —
    // the same text form the intake chain judges — and stays resident
    val benchClean = graft.text.TextFilters.piiScrub(
        bench.select(col("doc_id"), graft.text.Normalize.normalize(col("text")).as("text")),
        "doc_id", "text")
      .select(col("doc_id"), col("text_clean").as("text"))
    val (words, m) = graft.operators.BloomDecontaminate.fit(benchClean, "text", 5)
    val in = tmp("bloom-in"); val ckpt = tmp("bloom-ckpt"); val out = tmp("bloom-out")
    train.filter(col("doc_id") < 250).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/batch=0")
    train.filter(col("doc_id") >= 250).coalesce(1)
      .write.mode("overwrite").parquet(s"$in/batch=1")
    val stream = spark.readStream
      .schema(train.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$in/batch=*")
    val q = StreamingIntake.intakeStream(stream.toDF(), bench, n = 5, out, ckpt,
      Trigger.AvailableNow(), bloom = Some((words, m)))
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(out).drop("batch_id")
    val batch = StreamingIntake.intakeBatch(train, bench, n = 5,
      bloom = Some((words, m)))
    assert(streamed.count() == train.count())
    assert(streamed.exceptAll(batch).count() == 0
      && batch.exceptAll(streamed).count() == 0)
    // Bloom never under-flags the exact-join chain — judged against the
    // SAME cleaned bench text form the bitset was fit on, so the
    // property is structural, not an artifact of the synthetic corpus
    // being normalization-invariant
    val exact = StreamingIntake.intakeBatch(train, benchClean, n = 5)
      .select(col("doc_id"), col("contaminated").as("exact_flag"))
    val under = batch.select("doc_id", "contaminated").join(exact, "doc_id")
      .filter(col("exact_flag") === 1 && col("contaminated") === 0).count()
    assert(under == 0)
  }
}
