package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/**
 * Codegen'd ARRAY<FLOAT> <-> BINARY packing (little-endian float32),
 * the serialization the reference applies before AES-GCM encryption
 * (fspann `crypto/AesGcmCryptoService` encrypts float[] payloads;
 * loaders read little-endian .fvecs). Pairing these with Spark's
 * built-in `aes_encrypt`/`aes_decrypt` keeps the whole
 * encrypt->decrypt->refine path inside whole-stage codegen.
 */
object BinaryPackKernels {
  def pack(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val buf = ByteBuffer.allocate(n * 4).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) { buf.putFloat(a.getFloat(i)); i += 1 }
    buf.array()
  }

  def unpack(b: Array[Byte]): ArrayData = {
    val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val n = b.length / 4
    val out = new Array[Any](n)
    var i = 0
    while (i < n) { out(i) = buf.getFloat(i * 4); i += 1 }
    new GenericArrayData(out)
  }
}

case class PackFloats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    BinaryPackKernels.pack(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BinaryPackKernels.pack($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class UnpackFloats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    BinaryPackKernels.unpack(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BinaryPackKernels.unpack($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BinaryPack {
  /** ARRAY<FLOAT> -> BINARY (little-endian float32). */
  def pack_floats(a: Column): Column =
    ColumnBridge.column(PackFloats(ColumnBridge.expression(a.cast(ArrayType(FloatType)))))

  /** BINARY -> ARRAY<FLOAT> (little-endian float32). */
  def unpack_floats(b: Column): Column =
    ColumnBridge.column(UnpackFloats(ColumnBridge.expression(b)))
}
