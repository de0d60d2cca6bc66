package graft

import org.apache.spark.sql.functions._

import graft.operators.Corpus
import graft.text.{Bpe, BpeKernels, TextAnalysis}

class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  /** Independent greedy-lowest-rank counter: immutable Vector rebuilds
    * per merge step (vs the kernel's in-place ArrayList), same
    * min-rank/merge-everywhere semantics. */
  private def slowCount(text: String, merges: Array[(String, String)]): Int = {
    val ranks = merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    val m = java.util.regex.Pattern.compile(TextAnalysis.BpeishPattern)
      .matcher(text.toLowerCase(java.util.Locale.ROOT))
    var total = 0
    while (m.find()) {
      var parts = m.group().map(String.valueOf(_)).toVector
      var go = true
      while (go && parts.length > 1) {
        val cands = parts.zip(parts.tail).filter(ranks.contains)
        if (cands.isEmpty) go = false
        else {
          val (l, r) = cands.minBy(ranks)
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < parts.length) {
            if (i < parts.length - 1 && parts(i) == l && parts(i + 1) == r) {
              out += l + r; i += 2
            } else { out += parts(i); i += 1 }
          }
          parts = out.result()
        }
      }
      total += parts.length
    }
    total
  }

  test("fit learns the classic Sennrich merges in order, with lexicographic tie-break") {
    // low x5, lower x2, newest x6, widest x3: (e,s)=9 -> (es,t)=9 ->
    // (l,o)=7 ties (o,w)=7 -> lexicographic picks (l,o) -> (lo,w)=7
    val docs = (
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    ).zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val model = Bpe.fit(docs, "text", nMerges = 4)
    assert(model.merges.toSeq == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    val rt = model.runtime
    assert(BpeKernels.countTokens(
      org.apache.spark.unsafe.types.UTF8String.fromString("lowest"), rt) == 2) // low + est
    assert(BpeKernels.countTokens(
      org.apache.spark.unsafe.types.UTF8String.fromString("newest"), rt) == 4) // n e w est
    assert(BpeKernels.countTokens(
      org.apache.spark.unsafe.types.UTF8String.fromString("low low!"), rt) == 3) // low low !
    assert(BpeKernels.countTokens(
      org.apache.spark.unsafe.types.UTF8String.fromString(""), rt) == 0)
    assert(BpeKernels.countTokens(
      org.apache.spark.unsafe.types.UTF8String.fromString("a  ,7 é"), rt) == 4) // a , 7 e-acute
  }

  test("expression parity with an independent reimplementation on real docs") {
    val model = Bpe.fitFor(spark, sf)
    // the synthetic corpus draws from a bounded word list, so the merge
    // loop may exhaust every pair before the budget — both are valid
    assert(model.merges.length > 50 && model.merges.length <= Bpe.DefaultMerges)
    val rows = Tables.documents(spark, sf).filter(col("doc_id") < 100)
      .select(col("doc_id"), col("text"), Bpe.bpe_count(col("text"), model).as("n"))
      .collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      val expect = slowCount(r.getString(1), model.merges)
      assert(r.getInt(2) == expect, s"doc ${r.getLong(0)}: ${r.getInt(2)} != $expect")
      assert(r.getInt(2) > 0)
    }
  }

  test("subword counts compress: bpe tokens strictly under chars, at or above regex pretokens") {
    val model = Bpe.fitFor(spark, sf)
    val agg = Tables.documents(spark, sf).select(
        sum(length(lower(col("text")))).as("chars"),
        sum(graft.text.RegexpCount.re_count(lower(col("text")), TextAnalysis.BpeishPattern))
          .as("pretokens"),
        sum(Bpe.bpe_count(col("text"), model)).as("bpe"))
      .head()
    assert(agg.getLong(2) < agg.getLong(0), "bpe must compress below char count")
    assert(agg.getLong(2) >= agg.getLong(1), "a pretoken can never split below 1 token")
  }

  test("external vocab import: HF merges file drives the counters; default path unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("bpe_vocab")
    val path = dir.resolve("merges.txt")
    java.nio.file.Files.write(path,
      "#version: 0.2\nt h\nth e\ni n\na n\nan d\n".getBytes("UTF-8"))
    val model = Bpe.loadMerges(path.toString)
    // header skipped, pairs in rank order
    assert(model.merges.toSeq == Seq(("t", "h"), ("th", "e"), ("i", "n"),
      ("a", "n"), ("an", "d")))
    // hand-computed greedy application of the PINNED vocab:
    // the->1, thin->th|in=2, and->1, then->the|n=2
    val got = Seq("the thin and then").toDF("text")
      .select(Bpe.bpe_count(col("text"), model)).head().getInt(0)
    assert(got == 6, s"pinned-vocab count: $got")
    // config wiring: vocabPath set -> the imported model serves every
    // counter; unset -> the corpus fit (default hashes unchanged)
    val cfg = graft.config.GraftConfig.parse(
      s"""{"bpe": {"vocabPath": "${path.toString}"}}""")
    assert(cfg.bpe.vocabPath == path.toString)
    val viaCfg = Bpe.modelFor(spark, sf, cfg)
    assert(viaCfg.merges.toSeq == model.merges.toSeq)
    val dflt = Bpe.modelFor(spark, sf)
    assert(dflt.merges.toSeq == Bpe.fitFor(spark, sf).merges.toSeq)
  }

  test("tokenizer_fertility: per-lang cells equal brute per-doc recomputation") {
    val out = Bpe.tokenizerFertility(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toMap
    // brute twin: per-doc counts via the already-spec'd entry plans
    val perDoc = Tables.documents(spark, sf)
      .join(Bpe.tokenCountBpe(spark, sf), "doc_id")
      .select(col("lang"), length(col("text")).cast("long").as("nc"),
        (length(col("text")) - length(translate(col("text"), " ", "")) + 1)
          .cast("long").as("ws"),
        col("bpe_tokens").cast("long").as("bt"))
      .collect().groupBy(_.getString(0))
    assert(out.keySet == perDoc.keySet)
    def trunc(x: Double) = math.floor(x * 10000) / 10000
    perDoc.foreach { case (lang, rows) =>
      val (docs, nc, ws, bt) = (rows.length.toLong, rows.map(_.getLong(1)).sum,
        rows.map(_.getLong(2)).sum, rows.map(_.getLong(3)).sum)
      assert(out(lang) == ((docs, nc, ws, bt,
        trunc(bt.toDouble / ws), trunc(nc.toDouble / bt))), s"$lang: ${out(lang)}")
    }
    // fertility must be a genuine subword signal: >= 1 everywhere
    // (a word is at least one subword)
    assert(out.values.forall(_._5 >= 1.0), out.toString)
  }

  test("seq_pack with the bpe counter matches its windowed twin and repacks vs whitespace") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"))
    // a deliberately small merge budget: the bounded synthetic vocab
    // fully merges under the default budget, collapsing bpe counts to
    // word counts — 16 merges leaves most words genuinely subword-split
    val model = Bpe.fit(docs, "text", nMerges = 16)
    val counter: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      t => Bpe.bpe_count(t, model).cast("long")
    val fast = Corpus.seqPack(docs, "lang", 4096, counter).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    val slow = Corpus.seqPackWindowed(docs, "lang", 4096, counter).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(fast == slow, "bucketed bpe packing != windowed twin")
    val ws = Corpus.seqPack(docs, "lang", 4096).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(fast != ws, "bpe counter should change pack boundaries")
  }
}
