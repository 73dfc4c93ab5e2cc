package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Grid-cell assignment against a fixed sorted cutpoint array: the
  * number of cutpoints ≤ value (equivalently, the upper-bound index —
  * a binary search), as one codegen'd O(log grid) expression.
  *
  * The composable formulation — `size(filter(broadcast-array, c -> c
  * <= v))` — evaluates the higher-order lambda INTERPRETED per row
  * (HigherOrderFunction has no codegen); at 600k rows that measured
  * ~7 s where this expression is scan-cost. Cutpoints are grid-1
  * values (bounded driver state, ≤4095 by [[graft.ops.Layout
  * .sketchCutpoints]]'s grid bound — the nlist-centroids precedent),
  * compiled into the plan as a reference object.
  */
case class CutpointCell(child: Expression, cuts: Array[Double])
  extends UnaryExpression {

  require(cuts.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
    "cutpoints must be sorted strictly ascending")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cutpoint_cell requires a double input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    CutpointCellUtil.cell(input.asInstanceOf[Double], cuts)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cuts", cuts, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.CutpointCellUtil.cell($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): CutpointCell =
    copy(child = c)
}

object CutpointCellUtil {
  /** upper-bound binary search: count of cuts ≤ v. */
  def cell(v: Double, cuts: Array[Double]): Long = {
    var lo = 0
    var hi = cuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cuts(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }
}

object CutpointCell {
  def apply(c: Column, cuts: Array[Double]): Column =
    GraftBridge.column(CutpointCell(GraftBridge.expression(c), cuts))
}
