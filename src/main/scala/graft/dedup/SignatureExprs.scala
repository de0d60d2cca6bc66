package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/**
 * Map-only signature kernels for near-dup detection.
 *
 * A first cut computed MinHash/SimHash as 64 parallel aggregates over
 * exploded shingles — semantically fine, but it shuffles every
 * (doc, shingle) pair and generates enormous aggregate codegen. These
 * expressions compute the whole signature per row in one pass instead:
 * no explode, no shuffle, tiny generated code. At 100 TB the entire
 * signature stage is map-side; the only shuffle left in dedup is the
 * band-bucket self-join.
 *
 * Element hashing uses Spark's own XXH64 over the UTF-8 bytes;
 * per-permutation values derive from an odd-multiplier affine map
 * (a_i * h + b_i mod 2^64 — a bijection, so min is preserved per
 * permutation family).
 */
object SignatureKernels {
  private final val Seed = 42L

  private def hash(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), Seed)

  /** numPerms MinHash values of a shingle array. */
  def minhash(shingles: ArrayData, numPerms: Int): ArrayData = {
    val mins = Array.fill(numPerms)(Long.MaxValue)
    val as = PermTables.a(numPerms)
    val bs = PermTables.b(numPerms)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val h = hash(shingles.getUTF8String(i))
      var p = 0
      while (p < numPerms) {
        val v = as(p) * h + bs(p)
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(x => x: Any))
  }

  // Reusable per-thread buffer for assembling shingle bytes without
  // allocating a UTF8String per shingle. The bytes written are exactly
  // those of concat_ws(" ", slice(toks, i, w)), so hashes (and thus
  // signatures) are identical to the string-materializing path.
  private val shingleBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](1 << 10)
  }

  /** XXH64 of tokens[from..from+w) joined by a single space. */
  private def shingleHash(toks: ArrayData, from: Int, w: Int): Long = {
    var len = math.max(0, w - 1) // separators
    var i = 0
    while (i < w) { len += toks.getUTF8String(from + i).numBytes(); i += 1 }
    var buf = shingleBuf.get()
    if (buf.length < len) {
      buf = new Array[Byte](java.lang.Integer.highestOneBit(len) << 1)
      shingleBuf.set(buf)
    }
    var off = 0
    i = 0
    while (i < w) {
      if (i > 0) { buf(off) = ' '; off += 1 }
      val t = toks.getUTF8String(from + i)
      t.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + off)
      off += t.numBytes()
      i += 1
    }
    XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, Seed)
  }

  /**
   * numPerms MinHash values over the w-shingles of a token array,
   * fused: shingle bytes are hashed in place (one reused buffer) —
   * no shingle strings, no array_distinct (duplicate shingles cannot
   * change a min), no explode. Falls back to the whole token array
   * joined as one shingle when it is shorter than w, matching
   * [[graft.dedup.Dedup.shingles]].
   */
  def minhashShingles(toks: ArrayData, w: Int, numPerms: Int): ArrayData = {
    val mins = Array.fill(numPerms)(Long.MaxValue)
    val as = PermTables.a(numPerms)
    val bs = PermTables.b(numPerms)
    val n = toks.numElements()
    val width = if (n >= w) w else n
    val last = if (n >= w) n - w else 0
    var s = 0
    while (s <= last) {
      val h = shingleHash(toks, s, width)
      var p = 0
      while (p < numPerms) {
        val v = as(p) * h + bs(p)
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      s += 1
    }
    new GenericArrayData(mins.map(x => x: Any))
  }

  /**
   * 64-bit SimHash over the DISTINCT w-shingles of a token array,
   * fused like [[minhashShingles]]. Distinctness (the feature-SET
   * semantics of the string path's array_distinct) is enforced on the
   * 64-bit shingle hashes with an open-addressed long set — a hash
   * collision merging two distinct shingles is 2^-64-rare and only
   * perturbs one counter.
   */
  def simhashShingles(toks: ArrayData, w: Int): Long = {
    val n = toks.numElements()
    val width = if (n >= w) w else n
    val last = if (n >= w) n - w else 0
    var cap = java.lang.Integer.highestOneBit(math.max(4, n - width + 1) * 4 - 1) << 1
    val seen = new Array[Long](cap) // 0 = empty (hash 0 remaps below)
    val counts = new Array[Int](64)
    var s = 0
    while (s <= last) {
      var h = shingleHash(toks, s, width)
      if (h == 0L) h = 0x9e3779b97f4a7c15L
      var idx = (h ^ (h >>> 32)).toInt & (cap - 1)
      while (seen(idx) != 0L && seen(idx) != h) idx = (idx + 1) & (cap - 1)
      if (seen(idx) == 0L) {
        seen(idx) = h
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) != 0L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      s += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) sig |= 1L << j; j += 1 }
    sig
  }

  /** 64-bit SimHash of a token array (sign of per-bit counters). */
  def simhash(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val h = hash(tokens.getUTF8String(i))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) != 0L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) sig |= 1L << j; j += 1 }
    sig
  }
}

/** Deterministic affine-permutation tables, built once per JVM. */
object PermTables {
  private val cache = new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def tables(n: Int): (Array[Long], Array[Long]) =
    cache.computeIfAbsent(n, { k =>
      val rnd = new java.util.SplittableRandom(0x5eed5eedL)
      (Array.fill(k)(rnd.nextLong() | 1L), Array.fill(k)(rnd.nextLong()))
    })
  def a(n: Int): Array[Long] = tables(n)._1
  def b(n: Int): Array[Long] = tables(n)._2
}

case class MinHashSig(child: Expression, numPerms: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    SignatureKernels.minhash(v.asInstanceOf[ArrayData], numPerms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.dedup.SignatureKernels.minhash($c, $numPerms);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class MinHashShingleSig(child: Expression, w: Int, numPerms: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    SignatureKernels.minhashShingles(v.asInstanceOf[ArrayData], w, numPerms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.dedup.SignatureKernels.minhashShingles($c, $w, $numPerms);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimHashShingleSig(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    SignatureKernels.simhashShingles(v.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.dedup.SignatureKernels.simhashShingles($c, $w);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    SignatureKernels.simhash(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.dedup.SignatureKernels.simhash($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignatureExprs {
  /** ARRAY<STRING> shingles -> ARRAY<BIGINT> MinHash signature. */
  def minhash_sig(shingles: Column, numPerms: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), numPerms))

  /** ARRAY<STRING> tokens -> ARRAY<BIGINT> MinHash signature over
    * w-shingles, fused (no shingle-string materialization). */
  def minhash_shingle_sig(tokens: Column, w: Int, numPerms: Int): Column =
    ColumnBridge.column(MinHashShingleSig(ColumnBridge.expression(tokens), w, numPerms))

  /** ARRAY<STRING> tokens -> BIGINT SimHash over distinct w-shingles, fused. */
  def simhash_shingles(tokens: Column, w: Int): Column =
    ColumnBridge.column(SimHashShingleSig(ColumnBridge.expression(tokens), w))

  /** ARRAY<STRING> tokens -> BIGINT SimHash. */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
}
