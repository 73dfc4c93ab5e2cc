package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Isotonic (monotone) probability calibration for quality classifiers —
  * the step between [[QualityTrain]]'s fitted weights and using scores
  * as KEEP-probabilities in a sampling/mixture policy. A linear model's
  * raw margin is not a probability; isotonic regression (Zadrozny &
  * Elkan, KDD 2002) fits the best monotone step function from score to
  * empirical P(label=1), making downstream decisions ("keep with
  * probability p", "take the top p-weighted slice") honest without
  * assuming a sigmoid shape.
  *
  * Exactness contract (what makes this oracle-gatable where most
  * calibration code is not): the fit is computed through the MINIMAX
  * identity for isotonic regression —
  *
  *   fitted(i) = max,,j ≤ i,, min,,k ≥ i,,  mean(y[j..k])
  *
  * which is the closed form of pool-adjacent-violators (PAVA), not an
  * iterative approximation. Each mean(y[j..k]) is ONE IEEE division of
  * two exact integers (label sum / row count from prefix sums), and
  * min/max over a finite set of doubles is order-invariant — so any
  * engine that can do integer prefix sums and a double division
  * reproduces the fit bit-for-bit. No learning rate, no convergence
  * tolerance, no iteration count.
  *
  * Scale shape (100 TB): the corpus scan collapses to at most
  * `hi-lo+1` bucket rows in one hash aggregation — everything after
  * that (the O(B³) minimax join) runs on a broadcast-tiny table inside
  * the same plan, and serving is a broadcast equi-join of rows against
  * the densified step function. The expensive part is exactly one
  * scan + one tiny shuffle, independent of corpus size.
  */
object Calibrate {

  /** One-scan bucket statistics on a dyadic score grid:
    * `bucket = clamp(floor(score·grid), lo, hi)`, with row count `n`
    * and positive-label count `pos` per nonempty bucket. The grid is
    * data-independent (a pure function of the score value), so stats
    * from disjoint corpus shards merge by addition — the fit is
    * incremental-friendly for the same reason the engine's sketches
    * are (partition-invariant integer state).
    */
  def bucketStats(df: DataFrame, score: Column, label: Column,
                  grid: Int = 8, lo: Int = -32, hi: Int = 32): DataFrame = {
    require(grid > 0, "grid must be positive")
    require(lo < hi, "bucket range must be non-empty")
    df.select(
        least(greatest(floor(score * lit(grid.toDouble)), lit(lo.toLong)),
          lit(hi.toLong)).as("bucket"),
        label.cast("long").as("__y"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("pos"))
  }

  /** Isotonic fit over a (bucket, n, pos) stats table via the minimax
    * identity. Output adds `fitted` ∈ [0,1], non-decreasing in
    * `bucket`. The stats table is bounded by the grid width, so the
    * single-partition window and the O(B³) self-joins are driver-scale
    * work expressed IN the plan (no collect — the fit composes with
    * whatever produced the stats).
    */
  def isotonicFit(stats: DataFrame): DataFrame = {
    val w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = stats.repartition(1).select(
      col("bucket"), col("n"), col("pos"),
      row_number().over(Window.orderBy("bucket")).as("r"),
      sum(col("n")).over(w).as("cumn"),
      sum(col("pos")).over(w).as("cump"))
    val j = cum.select(col("r").as("jr"),
      (col("cumn") - col("n")).as("cn0"), (col("cump") - col("pos")).as("cp0"))
    val k = cum.select(col("r").as("kr"),
      col("cumn").as("cn1"), col("cump").as("cp1"))
    // mean over the bucket run j..k, from prefix sums: ONE double division
    val pairs = j.join(k, col("jr") <= col("kr"))
      .select(col("jr"), col("kr"),
        ((col("cp1") - col("cp0")).cast("double") /
          (col("cn1") - col("cn0")).cast("double")).as("avgv"))
    val i = cum.select(col("r").as("ir"), col("bucket"), col("n"), col("pos"))
    i.join(pairs, col("jr") <= col("ir") && col("kr") >= col("ir"))
      .groupBy("ir", "bucket", "n", "pos", "jr")
      .agg(min(col("avgv")).as("mn"))
      .groupBy("ir", "bucket", "n", "pos")
      .agg(max(col("mn")).as("fitted"))
      .select(col("bucket"), col("n"), col("pos"), col("fitted"))
  }

  /** [[bucketStats]] + [[isotonicFit]] in one call. */
  def fit(df: DataFrame, score: Column, label: Column,
          grid: Int = 8, lo: Int = -32, hi: Int = 32): DataFrame =
    isotonicFit(bucketStats(df, score, label, grid, lo, hi))

  /** Serve the fitted step function: each row's score maps to the
    * fitted value of the greatest fit bucket ≤ its own (clamped into
    * the fit's bucket range, so out-of-range scores take the boundary
    * probability — the standard step-function extension). The fit
    * table is densified to the full grid range with a backward fill
    * FIRST (tiny-side window), so the per-row lookup is a plain
    * broadcast equi-join — no per-row range probe at corpus scale.
    */
  def calibrate(df: DataFrame, score: Column, fitted: DataFrame,
                grid: Int = 8): DataFrame = {
    val bounds = fitted.agg(
      min(col("bucket")).as("__minb"), max(col("bucket")).as("__maxb"))
    val dense = bounds
      .select(explode(sequence(col("__minb"), col("__maxb"))).as("bucket"))
      .join(broadcast(fitted.select(col("bucket"), col("fitted"))),
        Seq("bucket"), "left")
      .repartition(1)
      .select(col("bucket"), last(col("fitted"), ignoreNulls = true)
        .over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("calibrated"))
    df.withColumn("__b", floor(score * lit(grid.toDouble)))
      .crossJoin(broadcast(bounds))
      .withColumn("bucket",
        least(greatest(col("__b"), col("__minb")), col("__maxb")))
      .drop("__b", "__minb", "__maxb")
      .join(broadcast(dense), Seq("bucket"))
  }
}
