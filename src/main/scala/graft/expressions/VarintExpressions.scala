package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** LEB128 varint codec for sorted-posting deltas — the byte encoding
  * inverted indexes actually ship (Lucene's vInt): small deltas (the
  * common case after delta-gapping sorted doc ids) take one byte,
  * larger ones grow 7 payload bits per byte. Non-negative inputs
  * only (deltas of sorted ids are ≥ 0 by construction); negative
  * values throw rather than silently mis-encode.
  *
  * Both directions are native codegen'd kernels (the HashedShingles
  * pattern — `doGenCode` emits one static call), so encode sits in
  * the write path's whole-stage codegen and decode in the read
  * path's. The byte LENGTH is exactly Σ (1 + ⌊bits(v)/7⌋ − (v==0)),
  * an integer-exact formula a SQL oracle reproduces with a CASE
  * ladder — so the gate hash-checks real encoded sizes, and the
  * roundtrip contract (decode ∘ encode = id) rides the invariant
  * harness.
  */
object VarintCodec {

  /** LEB128-encode each value (little-endian 7-bit groups, high bit
    * = continuation). Throws on negative input.
    */
  def encode(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    var total = 0
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      require(v >= 0, s"varint_encode requires non-negative values, got $v")
      total += byteLen(v)
      i += 1
    }
    val out = new Array[Byte](total)
    var o = 0
    i = 0
    while (i < n) {
      var v = arr.getLong(i)
      while ((v & ~0x7fL) != 0L) {
        out(o) = ((v & 0x7f) | 0x80).toByte
        o += 1
        v >>>= 7
      }
      out(o) = v.toByte
      o += 1
      i += 1
    }
    out
  }

  /** Bytes needed for one value: 1 + floor(bits/7) with bits(0) = 1. */
  def byteLen(v: Long): Int = {
    val bits = 64 - java.lang.Long.numberOfLeadingZeros(v | 1L)
    (bits + 6) / 7
  }

  def decode(bytes: Array[Byte]): GenericArrayData = {
    val out = Array.newBuilder[Long]
    var v = 0L
    var shift = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      // a 64-bit value spans at most 10 varint bytes (shift ≤ 63 on
      // the last); beyond that the blob is not varint data, and since
      // JVM shifts are mod 64 an unbounded shift would WRAP and decode
      // well-formed-looking garbage instead of erroring
      require(shift < 64, "malformed varint: value spans more than 10 bytes")
      v |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) {
        out += v
        v = 0L
        shift = 0
      } else shift += 7
      i += 1
    }
    require(shift == 0, "truncated varint stream")
    new GenericArrayData(out.result())
  }
}

case class VarintEncode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"varint_encode requires array<bigint>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    VarintCodec.encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.VarintCodec.encode($c);")

  override protected def withNewChildInternal(newChild: Expression): VarintEncode =
    copy(child = newChild)

  override def prettyName: String = "varint_encode"
}

case class VarintDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"varint_decode requires binary, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    VarintCodec.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.VarintCodec.decode($c);")

  override protected def withNewChildInternal(newChild: Expression): VarintDecode =
    copy(child = newChild)

  override def prettyName: String = "varint_decode"
}
