package graft

import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/**
 * The modified-Kneser–Ney 5-gram rung (`lm_score_kn5`) — three claims:
 *  - it is a PROPER distribution at EVERY one of its five backoff
 *    levels: for contexts constructed to bottom out at each level, the
 *    probabilities over the event space (train vocab + one OOV bucket)
 *    sum to 1, scored through the real kernel by enumeration docs;
 *  - it keeps the KN continuation-count advantage over raw-count
 *    stupid backoff (the Kneser–Ney "san francisco" plant);
 *  - its order-5 reach buys real ordering power the trigram KN rung
 *    cannot have: on a long-range plant where the last TRIGRAM counts
 *    tie exactly, `lm_score_kn` ties and `lm_score_kn5` orders every
 *    pair strictly.
 */
class LmKn5Spec extends SparkSpecBase {

  private lazy val sqlImplicits = spark.implicits
  import sqlImplicits._

  private val trainDocs = Seq(
    (0L, "a b c d e a b d c e b c a"),
    (1L, "b c d a e e d c b a"),
    (2L, "c a b c d d e a b c"))
  private val vocab = Seq("a", "b", "c", "d", "e")

  /** Score enumeration docs `c1 c2 c3 c4 x` (one 5-gram each) through
    * the real kernel and return x -> P(x | c1 c2 c3 c4). */
  private def kn5Dist(ctx: (String, String, String, String)): Map[String, Double] = {
    val enum5 = (vocab :+ "oovzz").zipWithIndex.map { case (x, i) =>
      (100L + i, s"${ctx._1} ${ctx._2} ${ctx._3} ${ctx._4} $x")
    }
    val df = (trainDocs ++ enum5).toDF("doc_id", "text")
    val got = TextAnalysis.lmScoreKn5(df, "doc_id", "text", col("doc_id") < 10L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    (vocab :+ "oovzz").zipWithIndex.map { case (x, i) =>
      val (n, s) = got(100L + i)
      assert(n == 1L, s"enumeration doc must score exactly one 5-gram: $x")
      x -> math.exp(s)
    }.toMap
  }

  test("MKN-5 sums to 1 over vocab+OOV at every one of its five backoff levels") {
    // each context bottoms out one level deeper than the last:
    //  (a,b,c,d): seen 4-gram prefix — the top level fires
    //  (q,b,c,d): unseen prefix, seen middle trigram — P4
    //  (q,q,c,d): unseen middle trigram, seen (c,d) — P3
    //  (q,q,q,d): unseen (q,d), seen unigram context d — P2
    //  (q,q,q,q): nothing seen — pure continuation unigram + OOV
    for (ctx <- Seq(("a", "b", "c", "d"), ("q", "b", "c", "d"),
        ("q", "q", "c", "d"), ("q", "q", "q", "d"), ("q", "q", "q", "q"))) {
      val dist = kn5Dist(ctx)
      val sum = dist.values.sum
      // each probability carries <= 1e-4 relative error from the 4-dp
      // floor on ln p, so the sum of 6 terms stays within 5e-3 of 1
      assert(math.abs(sum - 1.0) < 0.005,
        s"MKN-5 must normalize at context $ctx: sum = $sum ($dist)")
      assert(dist.values.forall(p => p > 0.0 && p < 1.0),
        s"every outcome has mass, none has all of it: $dist")
    }
  }

  test("sentinels, exact position counts, nonpositive scores, determinism") {
    val rnd = new scala.util.Random(13)
    val docs = (0 until 100).map { i =>
      val len = 1 + rnd.nextInt(12)
      (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val run1 = TextAnalysis.lmScoreKn5(df, "doc_id", "text", col("doc_id") % 3 =!= 0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val lens = docs.map { case (id, t) => id -> t.split(" ").length }.toMap
    docs.foreach { case (id, _) =>
      val (n, s) = run1(id)
      assert(n == math.max(lens(id) - 4, 0), s"doc $id")
      assert(s <= 0.0, s"doc $id score $s")
      if (n == 0) assert(s == 0.0, s"sentinel doc $id")
    }
    val run2 = TextAnalysis.lmScoreKn5(df, "doc_id", "text", col("doc_id") % 3 =!= 0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(run1 == run2, "nondeterministic scores")
  }

  test("held-out ordering: MKN-5 keeps the continuation-count win over stupid backoff") {
    // the Kneser-Ney plant (LmKnSpec's): "francisco" frequent but
    // licensed by one context, "the" equally frequent after many
    val train = (1 to 20).map { i =>
      (i.toLong, s"a$i san francisco b$i the c$i")
    }
    val pairs = (1 to 20).flatMap { j =>
      Seq((1000L + j, s"b$j c$j c$j a$j the"),
          (2000L + j, s"b$j c$j c$j a$j francisco"))
    }
    val df = (train ++ pairs).toDF("doc_id", "text")
    def scoresOf(f: => org.apache.spark.sql.DataFrame): Map[Long, Double] =
      f.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val kn5 = scoresOf(TextAnalysis.lmScoreKn5(df, "doc_id", "text", col("doc_id") < 100L))
    val sbo = scoresOf(TextAnalysis.lmScore5gram(df, "doc_id", "text", col("doc_id") < 100L))
    def accuracy(m: Map[Long, Double]): Double = (1 to 20).map { j =>
      val (pl, im) = (m(1000L + j), m(2000L + j))
      if (pl > im) 1.0 else if (pl == im) 0.5 else 0.0
    }.sum / 20.0
    val (kn5Acc, sboAcc) = (accuracy(kn5), accuracy(sbo))
    assert(kn5Acc > sboAcc,
      s"MKN-5 ordering accuracy $kn5Acc must strictly beat stupid backoff $sboAcc")
    assert(kn5Acc >= 0.95, s"MKN-5 must order every continuation pair: $kn5Acc")
    assert(sboAcc <= 0.55,
      s"raw-count backoff should tie on equal unigram counts: $sboAcc")
  }

  test("lm_ladder_eval: partition invariant, non-trivial both ways, deterministic") {
    val r1 = TextAnalysis.lmLadderEval(spark, sf).head()
    val (n, w5, w3, t) = (r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3))
    assert(n > 0 && w5 + w3 + t == n,
      s"every held-out doc lands in exactly one bucket: $n = $w5 + $w3 + $t")
    assert(w5 > 0, "the 5-gram rung must win somewhere or the ladder adds nothing")
    val r2 = TextAnalysis.lmLadderEval(spark, sf).head()
    assert(r1 == r2, "the scoreboard must be deterministic")
  }

  test("held-out ordering: order-5 reach beats the trigram KN where the last trigram ties") {
    // long-range disambiguation the trigram window cannot see: the
    // continuation after "x y" is determined two tokens further back
    // ("a a ... z" vs "b b ... w"); the final TRIGRAM counts are equal
    // (c(x y z) = c(x y w)) and the first two trigrams of each held-out
    // pair are identical, so the trigram KN's mean surprisal ties
    // EXACTLY, while the 5-gram top level sees c5("a a x y z") > 0 vs
    // c5("a a x y w") = 0 and orders every pair strictly.
    val train = (1 to 12).flatMap { i =>
      Seq((i.toLong, "a a x y z"), (100L + i, "b b x y w"))
    }
    val pairs = (1 to 12).flatMap { j =>
      Seq((1000L + j, "a a x y z"), (2000L + j, "a a x y w"))
    }
    val df = (train ++ pairs).toDF("doc_id", "text")
    def scoresOf(f: => org.apache.spark.sql.DataFrame): Map[Long, Double] =
      f.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val kn5 = scoresOf(TextAnalysis.lmScoreKn5(df, "doc_id", "text", col("doc_id") < 500L))
    val kn3 = scoresOf(TextAnalysis.lmScoreKn(df, "doc_id", "text", col("doc_id") < 500L))
    (1 to 12).foreach { j =>
      assert(kn3(1000L + j) == kn3(2000L + j),
        s"premise: the trigram KN must tie exactly on pair $j " +
          s"(${kn3(1000L + j)} vs ${kn3(2000L + j)})")
      assert(kn5(1000L + j) > kn5(2000L + j),
        s"MKN-5 must order pair $j strictly " +
          s"(${kn5(1000L + j)} vs ${kn5(2000L + j)})")
    }
  }

  test("staged MKN-5 scoring equals the in-plan chain bit-for-bit") {
    val inPlan = TextAnalysis.lmScoreKn5Query(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val staged = TextAnalysis.lmScoreKn5Staged(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(staged == inPlan,
      "resident-model scores must equal the in-plan chain bit-for-bit")
  }

  test("lm_rung_autotune: the pick is the integer margin policy over the board") {
    import spark.implicits._
    def pick(b: (Long, Long, Long, Long)): (String, Long) = {
      val r = TextAnalysis.lm5RungPick(
        Seq(b).toDF("n_held_out", "kn5_wins", "kn3_wins", "ties")).head()
      (r.getString(4), r.getLong(5))
    }
    assert(pick((100L, 90L, 5L, 5L)) == ("kn5", 1L), "kn5 landslide")
    assert(pick((100L, 5L, 90L, 5L)) == ("kn3", 1L), "kn3 landslide")
    assert(pick((100L, 52L, 48L, 0L)) == ("kn3", 0L),
      "near-tied board falls back to the cheap rung, flagged unmet")
    assert(pick((100L, 55L, 45L, 0L)) == ("kn3", 0L),
      "margin boundary is strict: lead*10 == decided is NOT met")
    assert(pick((101L, 56L, 45L, 0L)) == ("kn5", 1L), "just over the margin")
    // the entry row IS the policy applied to the measured board
    val b = TextAnalysis.lmLadderEval(spark, sf).head()
    val e = TextAnalysis.lmRungAutotune(spark, sf).head()
    assert((e.getString(4), e.getLong(5)) ==
      pick((b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))),
      "the entry must be the pick over its own ladder board")
  }

  test("lm_rung_autotune_staged: the staged pick equals the in-plan pick row-for-row") {
    val inPlan = TextAnalysis.lmRungAutotune(spark, sf).collect().toSeq
    val staged = TextAnalysis.lmRungAutotuneStaged(spark, sf).collect().toSeq
    assert(staged == inPlan,
      "the staged board pick must equal the measure-and-pick form exactly")
    // and the staged board itself carries the measured contest
    val board = TextAnalysis.lmBoardExport(spark, sf).collect().toSeq
    val live = TextAnalysis.lmLadderEval(spark, sf).collect().toSeq
    assert(board == live, "the staged board must hold the measured ladder row")
  }

  test("lm_score_autotuned: the scores ARE the picked rung's own scoring surface") {
    val rung = TextAnalysis.lmRungAutotuneStaged(spark, sf).head().getString(4)
    val auto = TextAnalysis.lmScoreAutotuned(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    // tag faithfulness: one rung, the board's own pick
    assert(auto.nonEmpty && auto.forall(_._4 == rung),
      s"every scored row must carry the board's pick ($rung)")
    // value identity with the picked rung's first-class surface
    val expected = (if (rung == "kn5") TextAnalysis.lmScoreKn5Staged(spark, sf)
      else TextAnalysis.lmScoreKnQuery(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(auto.map(t => (t._1, t._2, t._3)).toSet == expected,
      s"the autotuned scores must equal the $rung rung's own output")
  }

  test("lm_model_delta: the merged model scores the corpus bit-for-bit like a full rebuild") {
    // the strongest form of merged == refit: not just the stat rows
    // (the oracle's check) but the SCORES a model assembled from the
    // merged type tables assigns — discounts, denominators, and
    // count-of-counts all re-derive from the merged tables, so any
    // merge defect would move a score
    val full = TextAnalysis.lmScoreKn5Query(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val merged = TextAnalysis.lm5ScoreFromMergedTypes(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(merged == full,
      "delta-merged model scores must equal the full-rebuild scores bit-for-bit")
  }
}
