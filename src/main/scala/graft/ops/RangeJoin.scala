package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{IntervalLookup, IntervalTable}

/** Broadcast interval (range) join: enrich facts with the value of
  * the non-overlapping interval containing a long key — IP → geo,
  * timestamp-slice → tariff, id-range → shard map.
  *
  * Spark's native plan for `fact JOIN dim ON key BETWEEN lo AND hi`
  * is a BroadcastNestedLoopJoin: every fact row is compared against
  * every interval — O(rows × intervals), the classic range-join
  * scale trap. Here the (bounded, dimension-sized) interval table is
  * collected once, validated (sorted, non-overlapping → the match is
  * unique), and carried into a codegen'd binary-search expression:
  * O(log intervals) per row, NO join operator and NO shuffle in the
  * plan at all — the probe is a projection, so it composes with scan
  * pruning and filter pushdown (pinned in PlanSpec). The as-of join
  * ([[AsOfJoin]]) remains the path when the "intervals" side is
  * fact-sized or unbounded.
  */
object RangeJoin {

  /** Collect + validate a dimension interval table. Bounded side only
    * (same contract as broadcasting it); ~24 B per interval on the
    * driver and in each task's reference set.
    */
  def intervalTable(dim: DataFrame, lo: Column, hi: Column, value: Column,
                    maxIntervals: Int = 10000000): IntervalTable = {
    // fail fast with a clear message instead of a driver OOM when the
    // "dimension" side turns out to be fact-sized
    val rows = dim.select(lo.cast("long"), hi.cast("long"), value.cast("long"))
      .limit(maxIntervals + 1)
      .collect()
    require(rows.length <= maxIntervals,
      s"interval side exceeds maxIntervals=$maxIntervals — this operator " +
        "broadcasts the interval table; use AsOfJoin/a shuffle join for " +
        "fact-sized interval sides")
    IntervalTable.build(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
  }

  /** `fact` plus `as` = matched interval value. Left semantics: rows
    * with no containing interval keep NULL (filter on the column for
    * inner semantics).
    */
  def lookupJoin(fact: DataFrame, key: Column, table: IntervalTable,
                 as: String = "interval_value"): DataFrame =
    fact.withColumn(as, IntervalLookup(key.cast("long"), table))
}
