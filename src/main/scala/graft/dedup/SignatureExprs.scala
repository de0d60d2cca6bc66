package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
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

  /** ARRAY<STRING> tokens -> BIGINT SimHash. */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
}
