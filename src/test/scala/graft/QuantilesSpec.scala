package graft

import org.apache.spark.sql.functions._

import graft.operators.Quantiles

/** Exact-quantile operator vs a brute-force sorted reference. */
class QuantilesSpec extends SparkSpecBase {
  import spark.implicits._

  test("bucket quantiles equal the sorted-reference rank selection") {
    // 4dp-quantized scores incl. negatives, duplicates, and a skewed tail
    val raw = (1 to 997).map(i => math.floor((math.sin(i * 0.7) * 3 - 2) * 10000) / 10000) ++
      Seq(-9.9999, 0.0, 0.0)
    val df = raw.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val got = Quantiles.exactQuantiles(df, "s")
      .collect().map(r => r.getAs[Double]("p") ->
        (r.getAs[Long]("rnk"), r.getAs[Double]("threshold"), r.getAs[Long]("n_at_or_below"))).toMap
    val sorted = raw.sorted
    val n = raw.size
    Quantiles.DefaultPs.foreach { p =>
      val rnk = math.floor(p * (n - 1)).toLong + 1
      val want = sorted(rnk.toInt - 1)
      val (gRnk, gThr, gAtOrBelow) = got(p)
      assert(gRnk == rnk)
      assert(math.abs(gThr - want) < 1e-9, s"p=$p got $gThr want $want")
      assert(gAtOrBelow == sorted.count(_ <= want))
    }
  }

  test("negative-score bucketing rounds, never truncates toward zero") {
    val df = Seq((1L, -3.3), (2L, -3.2999), (3L, 3.3)).toDF("id", "s")
    val out = Quantiles.exactQuantiles(df, "s", Seq(0.0, 1.0))
      .collect().map(r => r.getAs[Double]("p") -> r.getAs[Double]("threshold")).toMap
    assert(out(0.0) == -3.3)
    assert(out(1.0) == 3.3)
  }

  test("quality_threshold runs over the corpus and brackets the lm_score range") {
    val out = Quantiles.qualityThresholdQuery(spark, sf).collect()
    assert(out.length == Quantiles.DefaultPs.size)
    val th = out.map(r => r.getAs[Double]("p") -> r.getAs[Double]("threshold")).toMap
    // monotone in p
    val ordered = Quantiles.DefaultPs.map(th)
    assert(ordered == ordered.sorted)
  }

  test("perplexityBucket: exact tertile cuts, ties fall to the lower bucket") {
    import spark.implicits._
    // 100 distinct 4-dp scores 0.0001..0.0100: t_lo = rank floor(.33*99)+1
    // = 33 -> 0.0033, t_hi = rank floor(.67*99)+1 = 67 -> 0.0067
    val df = (1 to 100).map(i => (i.toLong, i / 10000.0)).toDF("doc_id", "s")
    val out = Quantiles.perplexityBucket(df, "doc_id", "s").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert((1 to 33).forall(i => out(i.toLong) == "tail"), out.toString)
    assert((34 to 67).forall(i => out(i.toLong) == "middle"), out.toString)
    assert((68 to 100).forall(i => out(i.toLong) == "head"), out.toString)
    // a mass of ties AT the threshold stays below the cut (strict >)
    val tied = ((1 to 50).map(i => (i.toLong, 0.5)) ++
      (51 to 100).map(i => (i.toLong, 0.9))).toDF("doc_id", "s")
    val out2 = Quantiles.perplexityBucket(tied, "doc_id", "s").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    // t_lo = 0.5 (rank 33), t_hi = 0.9 (rank 67 lands in the upper
    // block): the 0.5 ties sit AT t_lo -> tail, the 0.9 ties AT t_hi
    // -> middle; nothing clears the strict > to reach head
    assert((1 to 50).forall(i => out2(i.toLong) == "tail"), out2.toString)
    assert((51 to 100).forall(i => out2(i.toLong) == "middle"), out2.toString)
  }

  test("thresholdApply keeps exactly the at-or-above-cutoff rows") {
    import spark.implicits._
    // 20 distinct 4-dp scores 0.0001..0.0020: p=0.1 -> rnk floor(.1*19)+1
    // = 2 -> threshold 0.0002; rows 2..20 keep (19), row 1 drops
    val df = (1 to 20).map(i => (i.toLong, i / 10000.0)).toDF("doc_id", "s")
    val out = Quantiles.thresholdApply(df, "doc_id", "s", 0.1).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(out(1L) == 0 && (2 to 20).forall(i => out(i.toLong) == 1))
    // the corpus entry: one verdict per doc, keep fraction ~= 0.9, the
    // kept set is exactly {score >= min kept score > max dropped score}
    val entry = SparkEntry.queries("quality_threshold_apply")(spark, sf).cache()
    assert(entry.count() == Tables.documents(spark, sf).count())
    val kept = entry.filter(col("keep") === 1)
    assert(kept.count() >= (entry.count() * 0.85).toLong)
    val minKept = kept.agg(min("lm_score")).head().getDouble(0)
    val maxDropped = entry.filter(col("keep") === 0)
      .agg(max("lm_score")).head().getDouble(0)
    assert(maxDropped < minKept)
    entry.unpersist()
  }
}
