package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** LEB128 varint packing for long arrays — the posting-list
  * compression trick every production inverted index uses (Lucene's
  * format is this plus block tricks): doc_id lists are sorted, so
  * store first value + gaps, and gaps are small, so most take 1-2
  * bytes instead of 8. `delta = true` is the sorted-ids mode
  * (non-decreasing input REQUIRED — violations throw rather than
  * corrupt, the zValueChecked discipline); `delta = false` packs
  * values as-is (the tf companion array, positive but unsorted).
  * Negative values and null elements throw in both modes: postings
  * never contain them, and silent wraparound would corrupt the
  * decode.
  *
  * Both directions are single fused loops behind `defineCodeGen` —
  * no interpreted HOF in the pack/unpack path. Decode(encode(x)) ≡ x
  * is pinned by VarintSpec and, end to end through the serving path,
  * by gate q154 reusing q139's oracle.
  */
object VarintUtil {

  def encode(v: ArrayData, delta: Boolean): Array[Byte] = {
    val n = v.numElements()
    val out = new java.io.ByteArrayOutputStream(n * 2)
    var prev = 0L
    var i = 0
    while (i < n) {
      if (v.isNullAt(i))
        throw new IllegalArgumentException("varint: null element at " + i)
      val x = v.getLong(i)
      if (x < 0)
        throw new IllegalArgumentException("varint: negative value " + x)
      var d = if (delta) x - prev else x
      if (d < 0)
        throw new IllegalArgumentException(
          s"varint delta mode requires non-decreasing input, got $prev then $x")
      prev = x
      while ((d & ~0x7fL) != 0L) {
        out.write(((d & 0x7f) | 0x80).toInt)
        d >>>= 7
      }
      out.write(d.toInt)
      i += 1
    }
    out.toByteArray
  }

  def decode(b: Array[Byte], delta: Boolean): ArrayData = {
    // first pass: count values (byte with MSB clear terminates one)
    var count = 0
    var i = 0
    while (i < b.length) {
      if ((b(i) & 0x80) == 0) count += 1
      i += 1
    }
    if (i > 0 && (b(i - 1) & 0x80) != 0)
      throw new IllegalArgumentException("varint: truncated trailing value")
    val out = new Array[Any](count)
    var prev = 0L
    var k = 0
    i = 0
    while (i < b.length) {
      var x = 0L
      var shift = 0
      var more = true
      while (more) {
        if (shift > 63)
          throw new IllegalArgumentException("varint: value overflows a long")
        val bb = b(i)
        // at shift 63 only bit 0 of this byte fits; higher payload
        // bits would be silently shifted out — reject, like the other
        // malformed-input cases
        if (shift == 63 && (bb & 0x7e) != 0)
          throw new IllegalArgumentException("varint: value overflows a long")
        x |= (bb & 0x7fL) << shift
        shift += 7
        more = (bb & 0x80) != 0
        i += 1
      }
      val v = if (delta) prev + x else x
      prev = v
      out(k) = v
      k += 1
    }
    new GenericArrayData(out)
  }
}

case class VarintEncode(child: Expression, delta: Boolean)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"varint_encode requires array<bigint> input, got ${t.catalogString}")
  }

  override def dataType: DataType = BinaryType

  override def nullSafeEval(v: Any): Any =
    VarintUtil.encode(v.asInstanceOf[ArrayData], delta)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.functions.VarintUtil.encode($v, $delta)")

  override protected def withNewChildInternal(c: Expression): VarintEncode =
    copy(child = c)
}

case class VarintDecode(child: Expression, delta: Boolean)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"varint_decode requires binary input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    VarintUtil.decode(v.asInstanceOf[Array[Byte]], delta)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.functions.VarintUtil.decode($v, $delta)")

  override protected def withNewChildInternal(c: Expression): VarintDecode =
    copy(child = c)
}

object Varint {
  def encodeDeltas(c: Column): Column =
    GraftBridge.column(VarintEncode(GraftBridge.expression(c), delta = true))
  def encodePlain(c: Column): Column =
    GraftBridge.column(VarintEncode(GraftBridge.expression(c), delta = false))
  def decodeDeltas(c: Column): Column =
    GraftBridge.column(VarintDecode(GraftBridge.expression(c), delta = true))
  def decodePlain(c: Column): Column =
    GraftBridge.column(VarintDecode(GraftBridge.expression(c), delta = false))
}
