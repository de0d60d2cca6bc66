package graft

import org.apache.spark.sql.functions._
import graft.operators.{BloomDecontaminate => B, Decontaminate}

/** Bloom-bitset decontamination: membership soundness (no false
  * negatives ever), agreement with the exact-join pass on flags,
  * planted-leak recall, and the zero-shuffle plan posture. */
class BloomDecontaminateSpec extends SparkSpecBase {
  import spark.implicits._

  test("build/containsExpr has no false negatives and bounded false positives") {
    val members = (0 until 500).map(i => s"member-gram-$i")
    val strangers = (0 until 2000).map(i => s"stranger-gram-$i")
    val mdf = members.toDF("g")
    val hs = mdf.select(B.gramH1(col("g")), B.gramH2(col("g")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val m = B.sizeBits(hs.length.toLong)
    val words = B.build(hs, m)
    val inSet = mdf.select(B.containsExpr(col("g"), words, m).as("c"))
      .collect().map(_.getBoolean(0))
    assert(inSet.forall(identity), "Bloom filters never have false negatives")
    val fp = strangers.toDF("g")
      .select(B.containsExpr(col("g"), words, m).as("c"))
      .collect().count(_.getBoolean(0))
    // 16 bits/element, k=11 => fp ~ 5e-4; 2000 probes should see ~1.
    assert(fp <= 20, s"false-positive count $fp out of 2000 is far above the sized rate")
  }

  test("sizeBits is a power of two covering BitsPerElement per element") {
    assert(B.sizeBits(0) == 1024)
    val m = B.sizeBits(5000)
    assert(Integer.bitCount(m) == 1 && m >= 5000L * B.BitsPerElement)
  }

  test("planted leaks are flagged; flags agree with the exact-join pass") {
    val bloom = B.decontaminateBloomQuery(spark, sf).cache()
    val exact = Decontaminate.decontaminateQuery(spark, sf)
      .select(col("doc_id"), col("contaminated").as("exact_flag"))
    val planted = bloom.filter(col("doc_id") % 23 === 5 && col("doc_id") % 17 =!= 0)
      .filter(col("doc_id") % 3 === 0 || col("doc_id") % 3 === 1 || col("doc_id") % 3 === 2)
    assert(bloom.count() == exact.count())
    // every doc the exact pass flags must be Bloom-flagged (no false negatives);
    // Bloom may over-flag, never under-flag.
    val under = bloom.join(exact, "doc_id")
      .filter(col("exact_flag") === 1 && col("contaminated") === 0).count()
    assert(under == 0, "Bloom under-flagged an exact-pass contamination")
    val flagged = bloom.filter(col("contaminated") === 1).count()
    val exactFlagged = exact.filter(col("exact_flag") === 1).count()
    assert(exactFlagged > 0 && flagged >= exactFlagged)
    // planted docs carry >= 2 shared 5-grams -> n_hits >= 2
    val plantedRows = planted.filter(col("n_hits") < 2).count()
    assert(plantedRows == 0, "a planted doc saw fewer than 2 Bloom hits")
    bloom.unpersist()
  }

  test("verdict plan is map-only: no Exchange anywhere") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven")).toDF("doc_id", "text")
    val (words, m) = B.fit(docs.limit(1), "text", 5)
    val plan = B.decontaminateBloom(docs, "doc_id", "text", 5, words, m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected a shuffle-free verdict plan:\n$plan")
  }
}
