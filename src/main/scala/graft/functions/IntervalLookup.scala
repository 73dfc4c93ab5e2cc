package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Point-in-interval lookup against a broadcast-style sorted interval
  * table — the kernel of [[graft.ops.RangeJoin.lookupJoin]] (IP→geo,
  * time-slice → tariff, id-range → shard): returns the `value` of the
  * unique non-overlapping interval [lo, hi] containing the key, or
  * NULL when no interval does.
  *
  * Spark plans a `BETWEEN`-join as BroadcastNestedLoopJoin — O(rows ×
  * intervals) comparisons. This expression rides the interval table
  * into the plan as three sorted long arrays (addReferenceObj, like a
  * broadcast var but codegen-reachable) and binary-searches: O(log m)
  * per row, zero joins, zero shuffle — the probe is a PROJECTION, so
  * filters still push down past it and the scan stays pruned.
  */
case class IntervalLookup(child: Expression, table: IntervalTable)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"interval_lookup requires a bigint key, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = table.lookup(input.asInstanceOf[Long])
    if (v == IntervalTable.Miss) null else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("intervalTable", table,
      classOf[IntervalTable].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      long lookup_${ev.value} = $ref.lookup($c);
      if (lookup_${ev.value} == ${IntervalTable.Miss}L) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = lookup_${ev.value};
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): IntervalLookup =
    copy(child = newChild)
}

/** Sorted, validated, serializable interval set. Construct via
  * [[IntervalTable.build]] — enforces non-overlap so the containing
  * interval (and therefore the join result) is unique.
  */
final class IntervalTable private (
    val los: Array[Long], val his: Array[Long], val vals: Array[Long])
    extends Serializable {

  /** Value of the interval containing `key`, or [[IntervalTable.Miss]]. */
  def lookup(key: Long): Long = {
    // binary search: greatest lo <= key
    var left = 0
    var right = los.length - 1
    var cand = -1
    while (left <= right) {
      val mid = (left + right) >>> 1
      if (los(mid) <= key) { cand = mid; left = mid + 1 }
      else right = mid - 1
    }
    if (cand >= 0 && key <= his(cand)) vals(cand) else IntervalTable.Miss
  }

  def size: Int = los.length
}

object IntervalTable {
  /** Sentinel for "no interval" — Long.MinValue cannot collide with a
    * real value because build() rejects it.
    */
  val Miss: Long = Long.MinValue

  def build(rows: Array[(Long, Long, Long)]): IntervalTable = {
    val sorted = rows.sortBy(_._1)
    sorted.foreach { case (lo, hi, v) =>
      require(lo <= hi, s"empty interval [$lo, $hi]")
      require(v != Miss, "interval value Long.MinValue is reserved")
    }
    var i = 0
    while (i < sorted.length - 1) {
      require(sorted(i)._2 < sorted(i + 1)._1,
        s"overlapping intervals: [${sorted(i)._1},${sorted(i)._2}] and " +
          s"[${sorted(i + 1)._1},${sorted(i + 1)._2}]")
      i += 1
    }
    new IntervalTable(sorted.map(_._1), sorted.map(_._2), sorted.map(_._3))
  }
}

object IntervalLookup {
  def apply(key: Column, table: IntervalTable): Column =
    GraftBridge.column(IntervalLookup(GraftBridge.expression(key), table))
}
