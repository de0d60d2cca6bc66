package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.SignatureKernels
import graft.functions.{BinaryPackKernels, VectorKernels}
import graft.lsh.{GFunction, Lsh, LshParams}
import graft.text.FingerprintKernels

/**
 * Property-style checks of the native kernels over seeded random
 * inputs (pure JVM, no Spark session).
 */
class KernelPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260812)
  private def floats(n: Int): Array[Float] = Array.fill(n)(rnd.nextFloat() * 200 - 100)
  private def ad(a: Array[Float]) = new GenericArrayData(a.map(x => x: Any))
  private def utf8(ss: Seq[String]) =
    new GenericArrayData(ss.map(s => UTF8String.fromString(s): Any).toArray)

  test("pack/unpack floats roundtrips bit-exactly") {
    (1 to 200).foreach { _ =>
      val a = floats(rnd.nextInt(64) + 1)
      val back = BinaryPackKernels.unpack(BinaryPackKernels.pack(ad(a)))
      assert(back.numElements() == a.length)
      a.indices.foreach(i => assert(
        java.lang.Float.floatToIntBits(back.getFloat(i)) == java.lang.Float.floatToIntBits(a(i))))
    }
  }

  test("vector kernels: metric axioms on random vectors") {
    (1 to 200).foreach { _ =>
      val a = floats(16)
      val b = floats(16)
      assert(VectorKernels.l2(ad(a), ad(b)) == VectorKernels.l2(ad(b), ad(a)))
      assert(VectorKernels.l2(ad(a), ad(b)) >= 0)
      assert(VectorKernels.l2(ad(a), ad(a)) == 0.0)
      val cos = VectorKernels.cosine(ad(a), ad(b))
      assert(cos >= -1.0000001 && cos <= 1.0000001)
      assert(math.abs(VectorKernels.dot(ad(a), ad(a)) - a.map(x => x.toDouble * x).sum) < 1e-6)
    }
  }

  test("hamming: identity, symmetry, triangle inequality on packed codes") {
    (1 to 500).foreach { _ =>
      val a = Array.fill(2)(rnd.nextLong())
      val b = Array.fill(2)(rnd.nextLong())
      val c = Array.fill(2)(rnd.nextLong())
      assert(Lsh.hamming(a, a) == 0)
      assert(Lsh.hamming(a, b) == Lsh.hamming(b, a))
      assert(Lsh.hamming(a, c) <= Lsh.hamming(a, b) + Lsh.hamming(b, c))
    }
  }

  test("lsh code kernel: deterministic; hamming grows with perturbation") {
    val params = LshParams(tables = 1, divisions = 1)
    val alpha = Array.tabulate(params.m)(j => Array.tabulate(32)(i =>
      math.sin(j * 131 + i * 17)))
      .map { a => val n = math.sqrt(a.map(x => x * x).sum); a.map(_ / n) }
    val gf = GFunction(alpha, Array.fill(params.m)(0.1), Array.fill(params.m)(0.5), params.lambda)
    def code(v: Array[Float]) = gf.codeWords(v, params.codeWords)
    (1 to 100).foreach { _ =>
      val base = floats(32).map(_ / 100f)
      val c0 = code(base)
      assert(code(base).sameElements(c0))
      val near = base.clone(); near(rnd.nextInt(32)) += 0.005f
      val far = base.map(x => -x)
      assert(Lsh.hamming(c0, code(near)) <= Lsh.hamming(c0, code(far)))
    }
  }

  test("minhash: supersets only lower mins; deterministic; permutation-family independence") {
    (1 to 100).foreach { _ =>
      val shingles = (1 to rnd.nextInt(30) + 4).map(_ => "s" + rnd.nextInt(10000)).distinct
      val all = utf8(shingles)
      val half = utf8(shingles.take(math.max(1, shingles.size / 2)))
      val sigAll = SignatureKernels.minhash(all, 16)
      val sigHalf = SignatureKernels.minhash(half, 16)
      (0 until 16).foreach(i => assert(sigAll.getLong(i) <= sigHalf.getLong(i)))
      val sigAll2 = SignatureKernels.minhash(all, 16)
      (0 until 16).foreach(i => assert(sigAll.getLong(i) == sigAll2.getLong(i)))
    }
    // distinct permutation slots behave independently (not all equal)
    val sig = SignatureKernels.minhash(utf8(Seq("a", "b", "c", "d", "e")), 16)
    assert((0 until 16).map(sig.getLong).distinct.size > 1)
  }

  test("fused shingle kernels == string-materializing path on random token streams") {
    // the fused kernels hash exactly the bytes of concat_ws(" ", window),
    // so they must reproduce the unfused signatures bit-for-bit
    def shingleStrings(toks: Seq[String], w: Int): Seq[String] =
      if (toks.size >= w) toks.sliding(w).map(_.mkString(" ")).toSeq
      else Seq(toks.mkString(" "))
    (1 to 100).foreach { _ =>
      val w = rnd.nextInt(4) + 2
      // small vocab => duplicate shingles occur, exercising the
      // distinct-free minhash claim and simhash's hash-set dedup
      val toks = (1 to rnd.nextInt(60) + 1).map(_ => "t" + rnd.nextInt(12))
      val fusedMh = SignatureKernels.minhashShingles(utf8(toks), w, 16)
      val strMh = SignatureKernels.minhash(utf8(shingleStrings(toks, w).distinct), 16)
      (0 until 16).foreach(i => assert(fusedMh.getLong(i) == strMh.getLong(i)))
      assert(SignatureKernels.simhashShingles(utf8(toks), w) ==
        SignatureKernels.simhash(utf8(shingleStrings(toks, w).distinct)))
    }
  }

  test("simhash: identical sets equal; disjoint sets differ; jaccard-monotone tendency") {
    val s1 = (1 to 30).map(i => s"tok$i")
    assert(SignatureKernels.simhash(utf8(s1)) == SignatureKernels.simhash(utf8(s1)))
    assert(SignatureKernels.simhash(utf8(s1)) !=
      SignatureKernels.simhash(utf8((100 to 130).map(i => s"zzz$i"))))
    // small edits -> closer than disjoint sets, on average
    val base = SignatureKernels.simhash(utf8(s1))
    val edited = SignatureKernels.simhash(utf8(s1.updated(0, "changed")))
    val disjoint = SignatureKernels.simhash(utf8((100 to 130).map(i => s"zzz$i")))
    assert(java.lang.Long.bitCount(base ^ edited) < java.lang.Long.bitCount(base ^ disjoint))
  }

  test("winnow: shift-tolerant overlap and guaranteed coverage density") {
    (1 to 50).foreach { _ =>
      val s = (1 to 40).map(_ => ('a' + rnd.nextInt(26)).toChar.toString * (rnd.nextInt(3) + 1))
        .mkString(" ")
      val f1 = FingerprintKernels.winnow(UTF8String.fromString(s)).toLongArray().toSet
      val f2 = FingerprintKernels.winnow(UTF8String.fromString("XPREFIX " + s)).toLongArray().toSet
      assert(f1.nonEmpty)
      assert(f1.intersect(f2).size.toDouble / f1.size >= 0.5)
    }
  }

  test("nfc kernel: agrees with java.text.Normalizer and is idempotent") {
    val combiners = Seq("\u0301", "\u0300", "\u0308", "\u030A", "\u0327")
    (1 to 200).foreach { _ =>
      val sb = new StringBuilder
      (0 until rnd.nextInt(30) + 1).foreach { _ =>
        sb.append(('a' + rnd.nextInt(26)).toChar)
        if (rnd.nextInt(4) == 0) sb.append(combiners(rnd.nextInt(combiners.length)))
      }
      val s = sb.toString
      val got = graft.text.NormalizeKernels.nfc(UTF8String.fromString(s)).toString
      val want = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      assert(got == want)
      // idempotence: NFC of NFC is NFC
      assert(graft.text.NormalizeKernels.nfc(UTF8String.fromString(got)).toString == got)
    }
    // the ASCII fast path returns the SAME object (no allocation)
    val ascii = UTF8String.fromString("plain ascii text")
    assert(graft.text.NormalizeKernels.nfc(ascii) eq ascii)
  }

  test("WET write/parse roundtrips random payloads byte-exactly") {
    // payload alphabet deliberately includes CR/LF, the header colon,
    // 'W' runs, and multi-byte code points — everything the
    // Content-Length-driven parser must NOT treat as structure
    // (BMP chars only: indexing a string char-wise would split an
    // astral emoji into lone surrogates, which cannot survive UTF-8)
    val alphabet = "abcWARC/1.0:\r\n \té中"
    def payload(): String =
      Array.fill(rnd.nextInt(200))(alphabet(rnd.nextInt(alphabet.length))).mkString
    (1 to 50).foreach { trial =>
      val recs = (0 until rnd.nextInt(6) + 1)
        .map(i => (s"http://t/$trial/$i", payload()))
      val f = java.nio.file.Files.createTempFile("wetprop", ".wet")
      try {
        graft.sources.WetFiles.writeWet(f.toString, recs.iterator)
        val bytes = java.nio.file.Files.readAllBytes(f)
        val back = graft.sources.WetFiles.parseRecords(bytes).toSeq
        assert(back == recs, s"trial $trial mismatch")
      } finally java.nio.file.Files.delete(f)
    }
  }
}
