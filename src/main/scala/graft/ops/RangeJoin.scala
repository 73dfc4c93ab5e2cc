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

  /** Interval-OVERLAP join for two FACT-SIZED interval sets — pairs
    * (l, r) with [l_lo, l_hi] ∩ [r_lo, r_hi] ≠ ∅ (closed bounds on
    * both sides). Session spans × outage windows, takedown windows ×
    * crawl batches — the case [[lookupJoin]]'s broadcast
    * binary-search cannot take (neither side is dimension-sized, and
    * intervals overlap each other) and Spark's native plan for the
    * inequality predicate is a nested-loop scan of the cross product.
    *
    * Scale shape — grid binning: each interval explodes to the bins
    * its span covers under b(x) = x DIV `binWidth` (truncating
    * integer division — monotone, so an interval covers the
    * contiguous bins b(lo)..b(hi) and any overlap point lands in a
    * shared bin: candidate generation is complete with no float
    * anywhere). Candidates hash-join ON BIN — an equi-shuffle, never
    * a cartesian — then the exact predicate filters and pairs dedup
    * (a pair sharing k bins appears k times). Pick `binWidth` near
    * the typical interval length: bins-per-row stays O(1), and the
    * per-bin population bounds the join's worst case the way LSH
    * bands bound near-dup pairing. Rows whose span would explode to
    * more than `maxBinsPerRow` bins raise rather than silently
    * flooding the shuffle (the loud-failure discipline).
    *
    * @return (l_id, r_id) distinct overlapping pairs
    */
  def overlapJoin(left: DataFrame, lId: Column, lLo: Column, lHi: Column,
                  right: DataFrame, rId: Column, rLo: Column, rHi: Column,
                  binWidth: Long, maxBinsPerRow: Long = 1024L): DataFrame = {
    require(binWidth >= 1L, s"binWidth must be >= 1, got $binWidth")
    require(maxBinsPerRow >= 1L, s"maxBinsPerRow must be >= 1, got $maxBinsPerRow")
    def bins(df: DataFrame, id: Column, lo: Column, hi: Column,
             side: String): DataFrame = {
      val b0 = expr(s"CAST(__lo AS BIGINT) DIV $binWidth")
      val b1 = expr(s"CAST(__hi AS BIGINT) DIV $binWidth")
      df.select(id.as(s"${side}_id"), lo.cast("long").as("__lo"),
          hi.cast("long").as("__hi"))
        .filter(col("__lo") <= col("__hi")) // empty intervals match nothing
        .withColumn("__nb", b1 - b0 + 1L)
        .withColumn("__bin", explode(when(col("__nb") > maxBinsPerRow,
            raise_error(concat(lit("overlapJoin: interval spans "),
              col("__nb").cast("string"),
              lit(s" bins > maxBinsPerRow $maxBinsPerRow — " +
                "raise binWidth or split the row"))))
          .otherwise(sequence(b0, b1))))
        .select(col(s"${side}_id"), col("__lo").as(s"${side}_lo"),
          col("__hi").as(s"${side}_hi"), col("__bin"))
    }
    val l = bins(left, lId, lLo, lHi, "l")
    val r = bins(right, rId, rLo, rHi, "r")
    l.join(r, Seq("__bin"))
      .filter(col("l_lo") <= col("r_hi") && col("r_lo") <= col("l_hi"))
      .select(col("l_id"), col("r_id"))
      .distinct()
  }
}
