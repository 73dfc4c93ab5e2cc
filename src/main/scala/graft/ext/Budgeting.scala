package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget corpus selection — "fill an N-token training budget
  * with the best documents": order the corpus by (score DESC, id ASC)
  * and keep the MAXIMAL PREFIX whose cumulative token count stays
  * ≤ budget. This is the final materialization step of every
  * curation pipeline (the mixture planner decides proportions; this
  * decides the actual document set), and the naive implementation is
  * a cumulative sum over ONE globally-sorted window — the exact
  * corpus-sized single partition the engine's bucket-offset
  * discipline ([[graft.ops.Ranks.bucketRank]], snakeShards) exists to
  * avoid.
  *
  * Shape: bucket documents by score high bits (b = s >> bucketShift,
  * the bucketRank sizing contract applies verbatim), ONE grouped
  * (count, token-sum) aggregation, a running token offset over the
  * BUCKET-CARDINALITY table (a window whose partitions hold one row
  * per distinct high-bit value, never corpus rows), then classify:
  * buckets with offset + own-sum ≤ budget are wholly IN, buckets
  * whose offset exceeds the budget are wholly OUT, and the (at most
  * one) boundary bucket resolves with a window over ITS OWN rows
  * only. Everything is exact integer arithmetic.
  *
  * Prefix-stop semantics, made exact by the non-negativity guard:
  * token counts are required ≥ 0, so the cumulative sum is monotone
  * and "maximal prefix" ≡ "rows whose running total ≤ budget" — a
  * document that overflows the budget excludes every lower-ranked
  * document too (no knapsack back-fill; the greedy prefix is the
  * reproducible contract, and zero-token documents AT the boundary
  * are still admitted — they cost nothing). NULL/negative scores and
  * token counts raise rather than silently vanish (the bucketRank
  * guard).
  */
object Budgeting {

  /** The bucket-sizing contract, as a pure function (unit-testable):
    * the largest shift ≤ `requested` whose score-range span
    * `(hi >> s) − (lo >> s) + 1` reaches `minBuckets`. A requested
    * shift wider than the actual score range — the VERDICT r13
    * degenerate case: `score % 256` under shift 8 collapses to ONE
    * bucket, making the "bucket-local" window corpus-sized — rescales
    * DOWN until the range yields real buckets (or shift 0, the finest
    * the representation offers). Scores are guarded non-negative, so
    * logical and arithmetic shifts agree.
    */
  def effectiveShift(lo: Long, hi: Long, requested: Int,
                     minBuckets: Long = 256L): Int = {
    require(lo >= 0L && hi >= lo, s"need 0 <= lo <= hi, got [$lo, $hi]")
    var s = requested
    while (s > 0 && (hi >>> s) - (lo >>> s) + 1 < minBuckets) s -= 1
    s
  }

  /** Select the best-first maximal prefix under `budget` total
    * tokens. Output: (id, score, n_tokens, cum_tokens) for the
    * selected documents — `cum_tokens` is the running total INCLUDING
    * the row, under the (score DESC, id ASC) order.
    *
    * Bucket sizing (the bucketRank contract, enforced rather than
    * assumed): one tiny scalar aggregation reads the actual score
    * range and [[effectiveShift]] rescales `bucketShift` down when the
    * range would degenerate to fewer than ~256 buckets — the selection
    * is shift-invariant, so outputs never change, only the window
    * partition size. If even shift 0 leaves a single score value
    * holding more than `maxBucketRows` rows, the within-bucket window
    * genuinely IS that partition and the select RAISES instead of
    * silently building a corpus-sized window partition (re-score with
    * a finer signal, or raise `maxBucketRows` deliberately).
    */
  def tokenBudgetSelect(df: DataFrame, id: Column, nTokens: Column,
                        score: Column, budget: Long,
                        bucketShift: Int = 8,
                        maxBucketRows: Long = 1L << 24): DataFrame = {
    require(budget >= 0L, s"budget must be >= 0, got $budget")
    require(bucketShift >= 0 && bucketShift < 63, "bucketShift in [0, 63)")
    require(maxBucketRows >= 1L, s"maxBucketRows must be >= 1, got $maxBucketRows")
    def guarded(c: Column, what: String): Column = {
      val v = c.cast("long")
      when(v.isNull || v < 0, raise_error(concat(
        lit(s"tokenBudgetSelect: $what must be a non-negative long, got "),
        coalesce(c.cast("string"), lit("NULL")))))
        .otherwise(v)
    }
    val preBase = df.select(id.as("id"),
      guarded(nTokens, "nTokens").as("n_tokens"),
      guarded(score, "score").as("score"))
    // one 2-value scalar action — also fires the NULL/negative guards
    // before any shuffle is planned
    val range = preBase.agg(min(col("score")), max(col("score"))).head()
    val shift =
      if (range.isNullAt(0)) bucketShift // empty input: nothing to size
      else effectiveShift(range.getLong(0), range.getLong(1), bucketShift)
    val base = preBase
      .withColumn("__b", shiftrightunsigned(col("score"), shift))

    val buckets = base.groupBy(col("__b"))
      .agg(sum(col("n_tokens")).as("__bt"), count(lit(1)).as("__bn"))
      .withColumn("__bt", when(col("__bn") > maxBucketRows, raise_error(concat(
        lit("tokenBudgetSelect: one score bucket holds "), col("__bn"),
        lit(s" rows (> maxBucketRows=$maxBucketRows) even at shift $shift — " +
          "the within-bucket window would be corpus-sized; re-score with a " +
          "finer signal or raise maxBucketRows deliberately"))))
        .otherwise(col("__bt")))
      .drop("__bn")
    // running token offset of all STRICTLY higher buckets — window
    // over the bucket-cardinality table only
    val offW = Window.orderBy(col("__b").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = buckets
      .withColumn("__off", coalesce(sum(col("__bt")).over(offW), lit(0L)))
      .select(col("__b"), col("__bt"), col("__off"))

    val tagged = base.join(broadcast(offsets), "__b")
    // wholly-in buckets: no window at all
    val fullIn = tagged.filter(col("__off") + col("__bt") <= budget)
      .withColumn("__needCum", lit(true))
    // the boundary bucket (offset ≤ budget < offset + own-sum):
    // resolve with a window partitioned by the bucket — its partition
    // holds that bucket's rows only (the bucketShift sizing contract)
    val cumW = Window.partitionBy(col("__b"))
      .orderBy(col("score").desc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = tagged
      .filter(col("__off") <= budget && col("__off") + col("__bt") > budget)
      .withColumn("__cum", col("__off") + sum(col("n_tokens")).over(cumW))
      .filter(col("__cum") <= budget)

    // cum for wholly-in buckets still needs the within-bucket running
    // sum — same bucket-partitioned window, never corpus-sized
    val withCum = fullIn.drop("__needCum")
      .withColumn("__cum", col("__off") + sum(col("n_tokens")).over(cumW))
      .unionByName(boundary)
    withCum.select(col("id"), col("score"), col("n_tokens"),
      col("__cum").as("cum_tokens"))
  }
}
