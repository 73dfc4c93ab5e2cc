package graft.plans

import graft.functions.VecDot
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Catalyst rule: rewrite the composable dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *             0.0D, (acc, v) -> acc + v)
  *
  * into the native codegen'd `VecDot(a, b)` when both sides are float
  * vectors.
  *
  * Why a rule and not "just call VecDot": higher-order functions
  * evaluate INTERPRETED (outside whole-stage codegen) — ~10x per-row
  * cost on this pattern — but the HOF form is how users WRITE it, and
  * SQL text arriving from other systems can't call library helpers.
  * The rewrite keeps the declarative surface and the native speed.
  *
  * Guards keep semantics bit-identical: only the widen-THEN-multiply
  * form is rewritten (float*float rounds each product to float first —
  * a different IEEE result than VecDot's double math), the fold must
  * start at 0.0 with a bare acc+v merge (strict ordered left fold,
  * exactly VecDot's loop), and the finish lambda must be identity.
  * Null agreement: zip_with on mismatched lengths pads with null so
  * the fold yields null; VecDot returns null on mismatch too.
  */
object VecDotRewrite extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** The lambda variable under an (optional) cast-to-double. */
  private def doubleVarId(e: Expression): Option[ExprId] = e match {
    case c: Cast if c.dataType == DoubleType =>
      c.child match {
        case n: NamedLambdaVariable => Some(n.exprId)
        case _ => None
      }
    case n: NamedLambdaVariable if n.dataType == DoubleType => Some(n.exprId)
    case _ => None
  }

  private def isVarPairOp(l: Expression, r: Expression,
                          args: Seq[NamedLambdaVariable]): Boolean =
    (doubleVarId(l), doubleVarId(r)) match {
      case (Some(li), Some(ri)) =>
        Set(li, ri) == args.map(_.exprId).toSet && li != ri
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(ml, mr, _),
              margs @ Seq(_: NamedLambdaVariable, _: NamedLambdaVariable), _)),
          Literal(0.0d, DoubleType),
          LambdaFunction(Add(al, ar, _),
            aargs @ Seq(_: NamedLambdaVariable, _: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(fv: NamedLambdaVariable), _))
        if isFloatArray(a) && isFloatArray(b) &&
          isVarPairOp(ml, mr, margs.asInstanceOf[Seq[NamedLambdaVariable]]) &&
          isVarPairOp(al, ar, aargs.asInstanceOf[Seq[NamedLambdaVariable]]) &&
          fin.exprId == fv.exprId =>
        VecDot(a, b)
    }
}
