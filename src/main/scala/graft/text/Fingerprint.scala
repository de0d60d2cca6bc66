package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Winnowing document fingerprints (rolling polynomial hash), the
 * classic content-fingerprinting scheme: hash every k-byte gram with a
 * rolling polynomial hash, then per window of w grams keep the
 * rightmost minimum; consecutive duplicates collapse. The selected
 * hashes identify shared content runs robustly under shifts.
 *
 * Codegen'd expression over the UTF-8 bytes — O(n) per document with
 * zero allocation beyond the output array; no UDF boxing.
 */
object FingerprintKernels {
  final val K = 8        // gram length in bytes
  final val W = 16       // winnow window in grams
  final val Base = 257L  // polynomial base (mod 2^64)

  def winnow(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n < K) return new GenericArrayData(Array.empty[Any])
    val nGrams = n - K + 1
    val hashes = new Array[Long](nGrams)
    // rolling polynomial hash mod 2^64: h_i = sum b[i+j] * Base^(K-1-j)
    var pow = 1L
    var j = 1
    while (j < K) { pow *= Base; j += 1 } // Base^(K-1)
    var h = 0L
    j = 0
    while (j < K) { h = h * Base + (bytes(j) & 0xff); j += 1 }
    hashes(0) = h
    var i = 1
    while (i < nGrams) {
      h = (h - (bytes(i - 1) & 0xff) * pow) * Base + (bytes(i + K - 1) & 0xff)
      hashes(i) = h
      i += 1
    }
    // winnow: rightmost min per window, collapse consecutive repeats
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var lastIdx = -1
    val first = math.min(W, nGrams)
    var minIdx = 0
    i = 1
    while (i < first) { if (hashes(i) <= hashes(minIdx)) minIdx = i; i += 1 }
    out += hashes(minIdx)
    lastIdx = minIdx
    var start = 1
    while (start + W <= nGrams) {
      val end = start + W - 1
      if (lastIdx < start) {
        minIdx = start
        i = start + 1
        while (i <= end) { if (hashes(i) <= hashes(minIdx)) minIdx = i; i += 1 }
        out += hashes(minIdx)
        lastIdx = minIdx
      } else if (hashes(end) <= hashes(lastIdx)) {
        out += hashes(end)
        lastIdx = end
      }
      start += 1
    }
    new GenericArrayData(out.toArray)
  }
}

case class WinnowFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    FingerprintKernels.winnow(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.text.FingerprintKernels.winnow($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Fingerprint {
  /** STRING -> ARRAY<BIGINT> winnowing fingerprints (k=8 bytes, window=16). */
  def doc_fingerprints(text: Column): Column =
    ColumnBridge.column(WinnowFingerprint(ColumnBridge.expression(text.cast(StringType))))
}
