package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

/** DSIR importance selection: the weight model must pull target-like
  * documents above raw-like ones, and the cut must be the exact
  * quantile verdict. */
class DsirSpec extends SparkSpecBase {
  import spark.implicits._

  test("target-like docs outscore raw-like docs and fill the keep set") {
    // target docs speak pure "tq"-vocabulary, raw docs pure "rq";
    // mixed docs sit between — the bag-ratio model must order
    // pure-target > mixed > pure-raw deterministically
    val docs = (
      (1 to 10).map(i => (i.toLong, "tgt", "tq1 tq2 tq3 tq4")) ++
      (11 to 40).map(i => (i.toLong, "raw", "rq1 rq2 rq3 rq4")) ++
      (41 to 50).map(i => (i.toLong, "raw", "tq1 tq2 rq1 rq2"))
    ).toDF("doc_id", "grp", "text")
    val out = Dsir.dsirSelect(docs, "doc_id", "text", col("grp") === "tgt")
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getInt(3))).toMap
    val wTgt = out(1L)._1; val wRaw = out(11L)._1; val wMix = out(41L)._1
    assert(wTgt > wMix && wMix > wRaw, out.toString)
    // identical texts score identically
    assert((1 to 10).forall(i => out(i.toLong)._1 == wTgt))
    assert((41 to 50).forall(i => out(i.toLong)._1 == wMix))
    // p = 0.75 over 50 docs -> rank 37; with 30 raw docs below, the
    // keep set is exactly the 10 target + 10 mixed docs
    assert((1 to 10).forall(i => out(i.toLong)._2 == 1), out.toString)
    assert((41 to 50).forall(i => out(i.toLong)._2 == 1), out.toString)
    assert((11 to 40).forall(i => out(i.toLong)._2 == 0), out.toString)
  }

  test("gumbel resampling: keep set is the exact perturbed-key quantile, reproducible") {
    val docs = (
      (1 to 10).map(i => (i.toLong, "tgt", "tq1 tq2 tq3 tq4")) ++
      (11 to 40).map(i => (i.toLong, "raw", "rq1 rq2 rq3 rq4")) ++
      (41 to 50).map(i => (i.toLong, "raw", "tq1 tq2 rq1 rq2"))
    ).toDF("doc_id", "grp", "text")
    val rows = Dsir.dsirSample(docs, "doc_id", "text", col("grp") === "tgt")
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getInt(3)))
    // replay the verdict rule from the emitted keys: rank 37 of 50
    // (p = 0.75) is the threshold, keep iff key >= it
    val thr = rows.map(_._2).sorted.apply(36)
    rows.foreach { case (id, key, keep) =>
      assert(keep == (if (key >= thr) 1 else 0), s"doc $id")
    }
    assert(rows.count(_._3 == 1) >= 14, "at least n - rnk + 1 kept")
    // seeded noise: the draw is exactly reproducible
    val again = Dsir.dsirSample(docs, "doc_id", "text", col("grp") === "tgt")
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getInt(3)))
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("importance weights are the hand-computed smoothed bag ratio") {
    // one target doc "a", one raw doc "b": buckets b(a) != b(b) almost
    // surely in 256 buckets for these two literals (fixed hash — check
    // the premise inside the test rather than assume)
    val docs = Seq((1L, true, "a"), (2L, false, "b")).toDF("doc_id", "t", "text")
    val out = Dsir.dsirSelect(docs, "doc_id", "text", col("t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    def u(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8"))
      val hex = d.take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val ba = math.floor(u("a") / 4294967296.0 * 256).toLong
    val bb = math.floor(u("b") / 4294967296.0 * 256).toLong
    assert(ba != bb, s"hash premise: $ba == $bb")
    def trunc(x: Double) = math.floor(x * 10000) / 10000
    // raw: cr(ba)=1, cr(bb)=1, Nr=2; target: ct(ba)=1, Nt=1
    val wA = trunc(math.log((1 + 1) / (1 + 256.0)) - math.log((1 + 1) / (2 + 256.0)))
    val wB = trunc(math.log((0 + 1) / (1 + 256.0)) - math.log((1 + 1) / (2 + 256.0)))
    assert(out(1L) == wA, s"got ${out(1L)} want $wA")
    assert(out(2L) == wB, s"got ${out(2L)} want $wB")
  }
}
