package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native signed-random-projection signature (SimHash for vectors).
  *
  * Bit p of the result is the sign of the vector's dot product with
  * pseudo-random hyperplane p, whose component for dimension i is
  * `pmod(xxhash64(p, i), 1e6) / 1e6 - 0.5` — deterministic, seedless
  * state, so signatures are reproducible across runs, clusters, and
  * partitionings.
  *
  * Replaces the composable form
  *   aggregate(zip_with(vec, sequence(0, size-1), (x,i) -> x * comp(p,i)), 0d, acc+x)
  * summed over p — higher-order functions evaluate interpreted, and the
  * HOF tree did bits×dim work through interpreter dispatch. This is one
  * fused loop (dim-major per plane, strict left fold — the identical
  * IEEE result) that stays inside whole-stage codegen. Parity with the
  * HOF form is pinned by SrpSignatureSpec.
  *
  * Null/edge semantics mirror the HOF tree exactly: a NULL input array
  * is NULL; a null ELEMENT poisons every projection (null `when`
  * predicate → otherwise-0 bit), so the signature is 0; an EMPTY vector
  * is also 0 — in the HOF tree sequence(0, size-1) = sequence(0, -1)
  * steps DOWN to [0, -1], zip_with null-pads the empty side, and the
  * null products poison the fold just like a null element.
  */
object SrpSignatureUtil {
  /** The plane-p hyperplane hash chain state: xxhash64(p) with Spark's
    * default seed 42, matching XxHash64's per-child fold.
    */
  def planeSeed(p: Int): Long = XXH64.hashInt(p, 42L)

  def signature(v: ArrayData, bits: Int): Long = {
    val n = v.numElements()
    if (n == 0) return 0L // HOF tree: sequence(0,-1) pads → null fold → all bits 0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return 0L // null element → every projection null → all bits 0
      i += 1
    }
    var sig = 0L
    var p = 0
    while (p < bits) {
      val hp = planeSeed(p)
      var acc = 0.0
      var d = 0
      while (d < n) {
        val comp =
          java.lang.Math.floorMod(XXH64.hashInt(d, hp), 1000000L) / 1000000.0 - 0.5
        acc += v.getFloat(d).toDouble * comp
        d += 1
      }
      if (acc >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }
}

case class SrpSignature(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 62, "signature packed into a long")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"srp_signature requires array<float> input, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    SrpSignatureUtil.signature(v.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.functions.SrpSignatureUtil.signature($v, $bits)")

  override protected def withNewChildInternal(c: Expression): SrpSignature =
    copy(child = c)
}

object SrpSignature {
  def apply(vec: Column, bits: Int): Column =
    GraftBridge.column(SrpSignature(GraftBridge.expression(vec), bits))
}
