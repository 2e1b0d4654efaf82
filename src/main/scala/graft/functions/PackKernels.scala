package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, FloatType}

/** Little-endian packed-f32 decode — the `InsertPacked` wire fast path
  * (SURVEY §2.1 S2; rs/index_server/src/index_server.rs:572,
  * muopdb.proto:199-213 pack vectors as LE bytes). `unpack_f32_le` turns a
  * binary column of 4-byte LE floats into `array<float>` inside codegen. */
case class UnpackF32Le(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unpack_f32_le"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    new GenericArrayData(PackKernels.unpackF32Le(bytes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.PackKernels.unpackF32Le($b));""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Unsigned-byte decode: a binary column (one code per byte — PQ/SQ8
  * code arrays) as `array<int>` 0..255, inside codegen. Makes quantizer
  * code tables replayable by the SQL oracle without a UDF. */
case class UnpackU8(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unpack_u8"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    new GenericArrayData(PackKernels.unpackU8(bytes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.PackKernels.unpackU8($b));""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Little-endian f32 encode — the builder half of the InsertPacked wire
  * (`array<float>` -> binary). Exists so the packed request layout can be
  * constructed distributedly and round-tripped on the hash gate (q94);
  * exact inverse of [[UnpackF32Le]]. */
case class PackF32Le(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pack_f32_le"

  override def nullSafeEval(input: Any): Any =
    PackKernels.packF32Le(input.asInstanceOf[ArrayData].toFloatArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PackKernels.packF32Le($a.toFloatArray());")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** The inverse (encode) plus the shared scalar kernels. */
object PackKernels {
  final def unpackU8(bytes: Array[Byte]): Array[Int] = {
    val out = new Array[Int](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = bytes(i) & 0xff; i += 1 }
    out
  }

  final def unpackF32Le(bytes: Array[Byte]): Array[Float] = {
    val n = bytes.length / 4
    val out = new Array[Float](n)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) { out(i) = bb.getFloat(i * 4); i += 1 }
    out
  }

  final def packF32Le(values: Array[Float]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(values.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < values.length) { bb.putFloat(values(i)); i += 1 }
    bb.array()
  }
}
