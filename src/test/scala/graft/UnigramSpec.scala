package graft

import org.apache.spark.sql.functions._

import graft.text.{Bpe, Tokenizers, Unigram, UnigramKernels, UnigramRuntime}
import graft.text.Unigram.UnigramModel

class UnigramSpec extends SparkSpecBase {
  import spark.implicits._

  private def rt(spm: Boolean, pieces: (String, Double)*): UnigramRuntime =
    UnigramModel(pieces.toArray, spmStyle = spm).runtime

  test("Viterbi count: hand-computed best segmentations") {
    val r = rt(spm = false,
      "a" -> -2.0, "b" -> -2.5, "c" -> -3.0, "ab" -> -1.0, "abc" -> -2.2)
    // "abc": abc=-2.2 beats ab+c=-4.0 and a+b+c=-7.5 -> 1 piece
    assert(UnigramKernels.countWord("abc", r) == 1)
    // "abab": ab+ab=-2.0 is the best 2-piece split
    assert(UnigramKernels.countWord("abab", r) == 2)
    // "abcb": abc+b=-4.7 beats ab+c+b=-6.5 -> 2
    assert(UnigramKernels.countWord("abcb", r) == 2)
    assert(UnigramKernels.countWord("", r) == 0)
    assert(UnigramKernels.countWord("a", r) == 1)
  }

  test("Viterbi count: unknown characters fall back to one penalized piece each") {
    val r = rt(spm = false, "a" -> -2.0, "b" -> -2.5)
    // 'x' has no piece: a + <unk> + b = 3 pieces
    assert(UnigramKernels.countWord("axb", r) == 3)
    // all-unknown word: one piece per char
    assert(UnigramKernels.countWord("xyz", r) == 3)
    // unk penalty never makes a phantom multi-char piece
    assert(UnigramKernels.countWord("xx", r) == 2)
  }

  test("segmentWord returns the argmax path the counter counts") {
    val r = rt(spm = false,
      "a" -> -2.0, "b" -> -2.5, "c" -> -3.0, "ab" -> -1.0, "abc" -> -2.2)
    assert(UnigramKernels.segmentWord("abc", r) == List("abc"))
    assert(UnigramKernels.segmentWord("abab", r) == List("ab", "ab"))
    assert(UnigramKernels.segmentWord("abcb", r) == List("abc", "b"))
    // unknown chars are dropped from the piece list but consume a slot
    assert(UnigramKernels.segmentWord("axb", r) == List("a", "b"))
    for (w <- Seq("abc", "abab", "abcb", "aabbcc", "cabba"))
      assert(UnigramKernels.segmentWord(w, r).length <=
        UnigramKernels.countWord(w, r))
  }

  test("fit learns multi-char pieces on a repetitive corpus, deterministically") {
    val docs = Seq.tabulate(40)(i => (i.toLong, "chunkchunkchunk other words " * 3))
      .toDF("doc_id", "text")
    val m1 = Unigram.fit(docs, "text", vocabSize = 64)
    val m2 = Unigram.fit(docs, "text", vocabSize = 64)
    assert(m1.pieces.toSeq == m2.pieces.toSeq, "fit must be deterministic")
    assert(m1.pieces.exists(_._1.length > 1), "EM should keep multi-char pieces")
    val r = m1.runtime
    // the learned vocab must compress the dominant word well below chars
    val n = UnigramKernels.countWord("chunkchunkchunk", r)
    assert(n < 15, s"expected multi-char segmentation, got $n pieces")
    // and every piece count is at least the information floor of 1
    assert(UnigramKernels.countWord("chunk", r) >= 1)
  }

  test("spm_export_vocab import: tab-separated pieces, control tokens skipped") {
    val dir = java.nio.file.Files.createTempDirectory("unigram-spec")
    val path = dir.resolve("test.vocab")
    java.nio.file.Files.write(path,
      ("<unk>\t0\n<s>\t0\n</s>\t0\n" +
        "▁hello\t-1.5\n▁world\t-2.0\n▁\t-3.0\n" +
        "h\t-6.0\ne\t-6.0\nl\t-6.0\no\t-6.0\nw\t-6.0\nr\t-6.0\nd\t-6.0\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val m = Unigram.loadVocab(path.toString)
    assert(m.spmStyle)
    assert(!m.pieces.exists(_._1.startsWith("<")), "control pieces must be dropped")
    val r = m.runtime
    // whole words hit their ▁pieces: "hello world" -> [▁hello][▁world]
    import org.apache.spark.unsafe.types.UTF8String
    assert(UnigramKernels.countTokens(UTF8String.fromString("hello world"), r) == 2)
    // "worldhello": ▁ has no glue piece, so ▁world(?) cannot apply
    // mid-word; Viterbi goes ▁ + chars or char fallback — count must
    // exceed the 2-piece happy path
    assert(UnigramKernels.countTokens(UTF8String.fromString("helloworld"), r) > 1)
    // vocab-external word: the ▁ piece + one penalized piece per
    // unknown char, never a crash
    assert(UnigramKernels.countTokens(UTF8String.fromString("zzz"), r) == 4)
  }

  test("token_count_unigram: bounded by pretokens below and characters above") {
    val got = Unigram.tokenCountUnigram(spark, sf)
    val joined = got.join(Tables.documents(spark, sf), "doc_id")
      .select(col("unigram_tokens"),
        // lit() pattern: expr()'s SQL literal would unescape \s
        size(regexp_extract_all(lower(col("text")),
          lit(graft.text.TextAnalysis.BpeishPattern), lit(0))).as("pretokens"),
        length(col("text")).as("chars"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (u, p, c) = (r.getInt(0), r.getInt(1), r.getInt(2))
      assert(u >= p, s"unigram count $u below pretoken count $p")
      assert(u <= c, s"unigram count $u above char count $c")
    }
  }

  test("tokenizer dispatch: unigram import wins for trainer-facing counters; default untouched") {
    val dir = java.nio.file.Files.createTempDirectory("unigram-dispatch")
    val path = dir.resolve("tiny.vocab")
    java.nio.file.Files.write(path,
      "▁the\t-1.0\nt\t-5.0\nh\t-5.0\ne\t-5.0\n".getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
    val cfgU = graft.config.GraftConfig(
      bpe = graft.config.BpeConfig(unigramVocabPath = path.toString))
    val h = Tokenizers.active(spark, sf, cfgU)
    assert(h.dictPath == Unigram.VocabExportPath)
    assert(h.wordsSql.contains(Unigram.NonWsPattern),
      "SPM style splits raw text on the explicit whitespace class")
    // default config: BPE fixture path and the round-7 fragment, byte-identical
    val hDef = Tokenizers.active(spark, sf, graft.config.GraftConfig())
    assert(hDef.dictPath == Bpe.VocabExportPath)
    assert(hDef.wordsSql ==
      s"""w AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '${graft.text.TextAnalysis.BpeishPattern}')) AS word
         |      FROM documents)""".stripMargin)
    // the fertility SQL under default config replays the BPE fixture
    assert(Bpe.tokenizerFertilitySql.contains(Bpe.VocabExportPath))
    assert(graft.operators.Corpus.seqPackBpeSql.contains(Bpe.VocabExportPath))
  }

  test("spm pretokenization: explicit class splits on \\x0B (Java = RE2 by construction)") {
    // Java's \s includes U+000B; RE2's does not -- a bare \S+ gives the
    // two engines different word lists on a vertical-tab document. The
    // explicit class spells out the whitespace set (including \x0B), so
    // both engines split "a<VT>b" into the SAME two pretokens and the
    // dictionary-fixture join cannot miss words.
    assert(!Unigram.NonWsPattern.contains("\\S") && !Unigram.NonWsPattern.contains("\\s"))
    assert(Unigram.NonWsPattern.contains("\\x0B"))
    val r = UnigramModel(Array("a" -> -1.0), spmStyle = true).runtime
    val m = r.pattern.matcher("a\u000Bb")
    val toks = Iterator.continually(m).takeWhile(_.find()).map(_.group()).toList
    assert(toks == List("a", "b"), s"expected \\x0B to split, got $toks")
    // ordinary whitespace still splits
    val m2 = r.pattern.matcher("a b\tc\nd")
    val toks2 = Iterator.continually(m2).takeWhile(_.find()).map(_.group()).toList
    assert(toks2 == List("a", "b", "c", "d"))
  }

  test("spm import: <0xNN> byte-fallback pieces score vocab-external chars per byte") {
    val dir = java.nio.file.Files.createTempDirectory("unigram-bytes")
    val path = dir.resolve("bytes.vocab")
    // control tokens + one word piece + byte pieces covering ▁ (E2 96
    // 81), é (C3 A9), and z (7A) — the spm_export_vocab byte_fallback rows
    java.nio.file.Files.write(path,
      ("<unk>\t0\n<s>\t0\n</s>\t0\n<pad>\t0\n" +
        "▁hi\t-1.0\n" +
        "<0xE2>\t-8.0\n<0x96>\t-8.0\n<0x81>\t-8.0\n" +
        "<0xC3>\t-9.0\n<0xA9>\t-9.0\n<0x7A>\t-7.0\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val m = Unigram.loadVocab(path.toString)
    assert(m.bytePieces.length == 6, "byte pieces must be imported, not dropped")
    assert(!m.pieces.exists(_._1.startsWith("<0x")), "byte pieces stay out of the DP table")
    val r = m.runtime
    import org.apache.spark.unsafe.types.UTF8String
    // vocab-internal word: one piece
    assert(UnigramKernels.countTokens(UTF8String.fromString("hi"), r) == 1)
    // vocab-external "z": ▁ falls back to its 3 UTF-8 bytes + 1 byte for z
    assert(UnigramKernels.countTokens(UTF8String.fromString("z"), r) == 4)
    // multi-byte é counts 2 byte pieces (not 1 flat unk piece): ▁(3) + é(2)
    assert(UnigramKernels.countTokens(UTF8String.fromString("é"), r) == 5)
    // a model WITHOUT byte pieces keeps the flat per-char penalty: ▁+é = 2
    val flat = UnigramModel(Array("▁hi" -> -1.0), spmStyle = true).runtime
    assert(UnigramKernels.countTokens(UTF8String.fromString("é"), flat) == 2)
  }

  test("byte fallback steps by code point: non-BMP chars encode their real UTF-8 bytes") {
    import org.apache.spark.unsafe.types.UTF8String
    // full byte table so EVERY byte has a score (a real byte_fallback
    // export carries all 256 <0xNN> rows)
    val allBytes = (0 until 256).map(b => f"<0x$b%02X>\t-8.0").mkString("\n")
    val dir = java.nio.file.Files.createTempDirectory("unigram-nonbmp")
    val path = dir.resolve("bytes.vocab")
    java.nio.file.Files.write(path,
      ("<unk>\t0\n<s>\t0\n</s>\t0\n<pad>\t0\n▁hi\t-1.0\n" + allBytes + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val r = Unigram.loadVocab(path.toString).runtime
    // U+1D11E MUSICAL SYMBOL G CLEF: a surrogate pair in UTF-16, 4
    // bytes in UTF-8. SentencePiece byte_fallback emits 4 byte pieces
    // for it — a UTF-16-code-unit step would instead produce 2 lone
    // surrogates, each encoding to the 1-byte replacement '?' (2
    // pieces, and the WRONG bytes). Word = ▁(3) + clef(4) = 7.
    val clef = new String(Character.toChars(0x1D11E))
    assert(UnigramKernels.countTokens(UTF8String.fromString(clef), r) == 7,
      "supplementary-plane char must fall back as one code point of 4 UTF-8 bytes")
    // coverage kernel agrees piece-for-piece (total == count, all fallback)
    val p = UnigramKernels.coverageTokens(UTF8String.fromString(clef), r)
    assert(((p >>> 32), p & 0xffffffffL) == ((7L, 7L)))
    // flat-unk model: the pair is ONE unk piece (one code point), not two
    val flat = UnigramModel(Array("▁hi" -> -1.0), spmStyle = true).runtime
    assert(UnigramKernels.countTokens(UTF8String.fromString(clef), flat) == 2,
      "flat fallback: ▁ + clef = 2 unk pieces (code-point steps)")
  }

  test("coverage kernel: totals agree with countWord; fallback counts flat vs per-byte") {
    import org.apache.spark.unsafe.types.UTF8String
    val dir = java.nio.file.Files.createTempDirectory("unigram-cov")
    val path = dir.resolve("bytes.vocab")
    java.nio.file.Files.write(path,
      ("<unk>\t0\n<s>\t0\n</s>\t0\n<pad>\t0\n" +
        "▁hi\t-1.0\n" +
        "<0xE2>\t-8.0\n<0x96>\t-8.0\n<0x81>\t-8.0\n" +
        "<0xC3>\t-9.0\n<0xA9>\t-9.0\n<0x7A>\t-7.0\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val r = Unigram.loadVocab(path.toString).runtime
    def cov(s: String): (Long, Long) = {
      val p = UnigramKernels.coverageTokens(UTF8String.fromString(s), r)
      (p >>> 32, p & 0xffffffffL)
    }
    // the total ALWAYS equals the countTokens path (same DP, same ties)
    for (s <- Seq("hi", "z", "é", "hi z é"))
      assert(cov(s)._1 == UnigramKernels.countTokens(UTF8String.fromString(s), r),
        s"total must match countTokens for '$s'")
    assert(cov("hi") == ((1L, 0L)), "vocab word: one piece, zero fallback")
    // ▁z = 3 bytes of ▁ + 1 byte of z, all fallback under byte pieces
    assert(cov("z") == ((4L, 4L)))
    // flat model: ▁é = 2 unk pieces, both fallback
    val flat = Unigram.UnigramModel(Array("▁hi" -> -1.0), spmStyle = true).runtime
    val pf = UnigramKernels.coverageTokens(UTF8String.fromString("é"), flat)
    assert(((pf >>> 32), pf & 0xffffffffL) == ((2L, 2L)))
  }

  test("tokenizer_coverage entry: xx probe row has nonzero fallback, real langs report truly") {
    val rows = Unigram.tokenizerCoverage(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    val (docs, pieces, fb, share) = rows("xx")
    assert(docs == Unigram.OovProbes.length.toLong)
    assert(fb > 0 && share > 0.0, "the probe row must witness fallback")
    assert(pieces > fb, "probe docs also contain covered ascii words")
    // every real language's share is strictly below the probe's (the
    // synthetic corpus is ascii; fallback there is rare or zero)
    rows.filterNot(_._1 == "xx").foreach { case (lang, (_, p, f, s)) =>
      assert(s < share, s"$lang share $s must sit below the probe's $share")
      assert(f <= p)
    }
    // totals agree with the token_count_unigram entry per construction
    val tot = Unigram.tokenCountUnigram(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("unigram_tokens")).collect().head.getLong(0)
    val realPieces = rows.filterNot(_._1 == "xx").values.map(_._2).sum
    assert(realPieces == tot, "per-lang piece totals must reconcile with per-doc counts")
  }

  test("tokenizer_compare: families genuinely diverge; whitespace row is the 1.0 baseline") {
    val rows = Tokenizers.tokenizerCompare(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(2)) ->
        ((r.getLong(3), r.getDouble(4)))).toMap
    val langs = rows.keys.map(_._1).toSet
    assert(langs.size >= 2, s"need a multilingual corpus, got $langs")
    langs.foreach { l =>
      val (wsTok, wsFert) = rows((l, "whitespace"))
      val (bpeTok, _) = rows((l, "bpe"))
      val (uniTok, _) = rows((l, "unigram"))
      assert(wsFert == 1.0, s"$l: whitespace fertility must be the 1.0 baseline")
      // subword counts can never undershoot pretokens (a word is >= 1 piece;
      // on a tiny corpus a family may exactly cover one language at 1.0)
      assert(bpeTok >= wsTok, s"$l: bpe $bpeTok below whitespace $wsTok")
      assert(uniTok >= wsTok, s"$l: unigram $uniTok below whitespace $wsTok")
    }
    // the report exists because the families disagree SOMEWHERE on the
    // corpus: subword budgets above whitespace, and BPE != unigram
    // (different segmentation objectives)
    assert(langs.exists(l => rows((l, "bpe"))._1 != rows((l, "whitespace"))._1),
      "bpe never diverges from whitespace — report is vacuous")
    assert(langs.exists(l => rows((l, "unigram"))._1 != rows((l, "whitespace"))._1),
      "unigram never diverges from whitespace — report is vacuous")
    assert(langs.exists(l => rows((l, "unigram"))._1 != rows((l, "bpe"))._1),
      "bpe and unigram agree exactly everywhere — report is vacuous")
  }

  test("config parse: bpe.unigramVocabPath round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("unigram-cfg")
    val p = dir.resolve("g.json")
    java.nio.file.Files.write(p,
      """{"bpe": {"unigramVocabPath": "/some/spm.vocab"}}""".getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
    val cfg = graft.config.GraftConfig.load(p.toString)
    assert(cfg.bpe.unigramVocabPath == "/some/spm.vocab")
    assert(cfg.bpe.vocabPath == "")
  }
}
