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
}
