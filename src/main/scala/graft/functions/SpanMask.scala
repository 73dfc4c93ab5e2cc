package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Tokens NOT covered by any n-token window starting at one of
  * `starts` (1-based, SORTED ascending) — the span-erase kernel of
  * [[graft.ext.SpanDedup]] as ONE codegen'd two-pointer sweep.
  *
  * The composable form — `filter(toks, (t, i) -> !exists(starts,
  * s -> s <= i+1 AND i+1 < s+n))` — pays interpreted lambda dispatch
  * per (position × start): O(len·|starts|), which is O(len²) on a
  * fully-duplicated document, the exact shape corpus-inflation stress
  * produces. Both arrays are already sorted/positional, so one merged
  * sweep does it in O(len + |starts|): advance the start pointer past
  * windows that end before the current position; the position is
  * covered iff the now-current start has begun.
  */
case class SpanMask(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {

  require(n >= 1, s"window length must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"span_mask requires (array<string>, array<int>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  /** Null token elements pass through the mask unchanged, so the
    * output element nullability follows the INPUT's — declaring
    * containsNull=false unconditionally would hand downstream codegen
    * (concat_ws, element access) an array violating its own type when
    * the SQL-registered span_mask is called on a nullable-element
    * array.
    */
  override def dataType: DataType = left.dataType match {
    case ArrayType(StringType, containsNull) =>
      ArrayType(StringType, containsNull)
    case _ => ArrayType(StringType, containsNull = false)
  }

  override def nullSafeEval(toks: Any, starts: Any): Any =
    SpanMaskUtil.mask(toks.asInstanceOf[ArrayData],
      starts.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, s) =>
      s"graft.functions.SpanMaskUtil.mask($t, $s, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanMask =
    copy(left = newLeft, right = newRight)
}

object SpanMaskUtil {
  /** Two-pointer sweep; `starts` 1-based sorted, windows length n.
    * Null tokens pass through (nullability declared by the output
    * type); null START elements are skipped — a null has no window to
    * erase, and getInt on a null slot would read garbage.
    */
  def mask(toks: ArrayData, starts: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    val m = starts.numElements()
    val out = new java.util.ArrayList[AnyRef](len)
    var j = 0
    var p = 1
    while (p <= len) {
      // drop windows that end before p (starts sorted → monotone j),
      // and null start slots outright
      while (j < m && (starts.isNullAt(j) || starts.getInt(j) + n - 1 < p)) j += 1
      if (!(j < m && starts.getInt(j) <= p))
        out.add(toks.getUTF8String(p - 1))
      p += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }
}

object SpanMask {
  def apply(tokens: Column, starts: Column, n: Int): Column =
    GraftBridge.column(SpanMask(
      GraftBridge.expression(tokens), GraftBridge.expression(starts), n))
}
