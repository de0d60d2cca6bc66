package graft

import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/**
 * The interpolated Kneser–Ney rung (`lm_score_kn`) vs the stupid-
 * backoff rung below it. Two claims, each proven where it lives:
 *  - KN is a PROPER distribution: for contexts at every backoff level
 *    (seen bigram, unseen bigram with seen middle, unseen middle), the
 *    probabilities over the event space (train vocab + one OOV bucket)
 *    sum to 1 — scored through the REAL kernel by enumeration
 *    documents, not a re-implementation. Stupid backoff measurably
 *    does not (its scores are α-scaled ratios, not probabilities).
 *  - On held-out documents vs their token-sorted twins, KN's surprisal
 *    ordering is at least as accurate as stupid backoff's — the
 *    ladder's "beats" bar: better-calibrated without giving up
 *    ranking power.
 */
class LmKnSpec extends SparkSpecBase {

  private lazy val sqlImplicits = spark.implicits
  import sqlImplicits._

  private val trainDocs = Seq(
    (0L, "a b c d e a b d c e b c a"),
    (1L, "b c d a e e d c b a"),
    (2L, "c a b c d d e a b c"))
  private val vocab = Seq("a", "b", "c", "d", "e")

  /** Score enumeration docs `w1 w2 x` (one trigram each) through the
    * real kernel and return x -> P(x | w1 w2). */
  private def knDist(ctx: (String, String)): Map[String, Double] = {
    val enum = (vocab :+ "oovzz").zipWithIndex.map { case (x, i) =>
      (100L + i, s"${ctx._1} ${ctx._2} $x")
    }
    val df = (trainDocs ++ enum).toDF("doc_id", "text")
    val got = TextAnalysis.lmScoreKn(df, "doc_id", "text", col("doc_id") < 10L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    (vocab :+ "oovzz").zipWithIndex.map { case (x, i) =>
      val (n, s) = got(100L + i)
      assert(n == 1L, s"enumeration doc must score exactly one trigram: $x")
      x -> math.exp(s)
    }.toMap
  }

  test("KN sums to 1 over vocab+OOV at every backoff level; stupid backoff does not") {
    // seen context (a,b): the top level fires (c(ab·) > 0)
    // unseen context with seen middle (q,b): interpolates from Pc(·|b)
    // unseen middle (q,q): pure continuation-unigram + OOV mass
    for (ctx <- Seq(("a", "b"), ("q", "b"), ("q", "q"))) {
      val dist = knDist(ctx)
      val sum = dist.values.sum
      // each probability carries <= 1e-4 relative error from the 4-dp
      // floor on ln p, so the sum of 6 terms stays within 5e-3 of 1
      assert(math.abs(sum - 1.0) < 0.005,
        s"KN must normalize at context $ctx: sum = $sum ($dist)")
      assert(dist.values.forall(p => p > 0.0 && p < 1.0),
        s"every outcome has mass, none has all of it: $dist")
    }
    // stupid backoff over the same train side, 5-token enumeration
    // contexts (its highest order): the "distribution" does not sum
    // to 1 — that is the structural difference the KN rung closes
    val enum5 = (vocab :+ "oovzz").zipWithIndex.map { case (x, i) =>
      (100L + i, s"a b c d $x")
    }
    val df5 = (trainDocs ++ enum5).toDF("doc_id", "text")
    val sbo = TextAnalysis.lmScore5gram(df5, "doc_id", "text", col("doc_id") < 10L)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val sboSum = (vocab :+ "oovzz").zipWithIndex
      .map { case (_, i) => math.exp(sbo(100L + i)) }.sum
    assert(math.abs(sboSum - 1.0) > 0.05,
      s"stupid backoff is not a distribution; measured sum $sboSum")
  }

  test("sentinels, exact position counts, nonpositive scores, determinism") {
    val rnd = new scala.util.Random(11)
    val docs = (0 until 100).map { i =>
      val len = 1 + rnd.nextInt(10)
      (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val run1 = TextAnalysis.lmScoreKn(df, "doc_id", "text", col("doc_id") % 3 =!= 0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val lens = docs.map { case (id, t) => id -> t.split(" ").length }.toMap
    docs.foreach { case (id, _) =>
      val (n, s) = run1(id)
      assert(n == math.max(lens(id) - 2, 0), s"doc $id")
      // a proper conditional probability is < 1 at every position
      assert(s <= 0.0, s"doc $id score $s")
      if (n == 0) assert(s == 0.0, s"sentinel doc $id")
    }
    val run2 = TextAnalysis.lmScoreKn(df, "doc_id", "text", col("doc_id") % 3 =!= 0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(run1 == run2, "nondeterministic scores")
  }

  test("held-out surprisal ordering: KN beats stupid backoff on continuation-effect pairs") {
    // THE published KN motivation (Kneser & Ney 1995), planted: a word
    // frequent but licensed by ONE context ("francisco" always after
    // "san") vs a word equally frequent after MANY contexts ("the").
    // In a NOVEL context, a good model prefers "the"; raw-count
    // backoff cannot tell them apart (c1 equal — stupid backoff ties),
    // while KN's continuation counts (N1+(·the)=20 vs
    // N1+(·francisco)=1) order every pair strictly.
    val train = (1 to 20).map { i =>
      (i.toLong, s"a$i san francisco b$i the c$i")
    }
    // held-out pairs in an unseen context (c_j, a_j): the plausible
    // continuation "the" vs the implausible "francisco"; 5-token docs
    // so the stupid-backoff rung scores exactly one position too
    val pairs = (1 to 20).flatMap { j =>
      Seq((1000L + j, s"b$j c$j c$j a$j the"),
          (2000L + j, s"b$j c$j c$j a$j francisco"))
    }
    val df = (train ++ pairs).toDF("doc_id", "text")
    def scoresOf(f: => org.apache.spark.sql.DataFrame): Map[Long, Double] =
      f.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val kn = scoresOf(TextAnalysis.lmScoreKn(df, "doc_id", "text", col("doc_id") < 100L))
    val sbo = scoresOf(TextAnalysis.lmScore5gram(df, "doc_id", "text", col("doc_id") < 100L))
    // tie-aware pairwise accuracy: 1 for the right strict order, 0.5
    // for a tie (a model that cannot distinguish earns chance credit)
    def accuracy(m: Map[Long, Double]): Double = (1 to 20).map { j =>
      val (pl, im) = (m(1000L + j), m(2000L + j))
      if (pl > im) 1.0 else if (pl == im) 0.5 else 0.0
    }.sum / 20.0
    val (knAcc, sboAcc) = (accuracy(kn), accuracy(sbo))
    assert(knAcc > sboAcc,
      s"KN ordering accuracy $knAcc must strictly beat stupid backoff $sboAcc")
    assert(knAcc >= 0.95, s"KN must order every continuation pair: $knAcc")
    assert(sboAcc <= 0.55,
      s"raw-count backoff should tie on equal unigram counts: $sboAcc")
  }
}
