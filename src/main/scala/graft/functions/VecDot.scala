package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native ordered dot product over float-vector columns.
  *
  * Equivalent to aggregate(zip_with(a, b, (x,y) -> x*y), 0d, acc+x) but
  * those higher-order functions evaluate interpreted; this is one fused
  * loop that stays in whole-stage codegen. The accumulation is a strict
  * left fold in element order — the SAME IEEE result as the composable
  * form and as a sequential oracle implementation, which is what keeps
  * cosine scores bit-comparable across engines.
  *
  * Mismatched vector lengths and NULL ELEMENTS yield NULL (not a
  * truncated or zero-padded product): malformed embedding rows must
  * surface as missing scores, and the composable HOF form — which the
  * VecDotRewrite rule replaces with this expression — also nulls out
  * when any element is null (null product poisons the fold). Silently
  * skewed cosines are worse than either.
  */
object VecDotUtil {
  /** Boxed: null iff lengths differ or either side has a null slot. */
  def dotOrNull(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** array<double> twin — same left fold, same null contract. Needed
    * by the residual-quantization path ([[graft.ext.VectorQuant]]),
    * whose stage-2 state lives in doubles so that
    * c + (x − c) reconstructs x EXACTLY (a float difference is always
    * representable in double, and the double add of c to it rounds to
    * the true sum x).
    */
  def dotOrNullD(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elem(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }
  // both sides float, or both sides double — mixed widths must be
  // cast explicitly by the caller (an implicit widen would hide a
  // schema bug in an embedding pipeline)
  private def isDouble: Boolean = elem(left.dataType).contains(DoubleType)

  override def checkInputDataTypes(): TypeCheckResult =
    (elem(left.dataType), elem(right.dataType)) match {
      case (Some(l), Some(r)) if l == r => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires two array<float> or two array<double> inputs, " +
          s"got ${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }

  override def dataType: DataType = DoubleType

  // null on length mismatch / null elements even for non-null inputs
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    if (isDouble)
      VecDotUtil.dotOrNullD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      VecDotUtil.dotOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dot")
      val fn = if (isDouble) "dotOrNullD" else "dotOrNull"
      s"""
         |java.lang.Double $tmp = graft.functions.VecDotUtil.$fn($a, $b);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

object VecDot {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(VecDot(GraftBridge.expression(a), GraftBridge.expression(b)))
}
