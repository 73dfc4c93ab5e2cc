package graft.ext

import graft.functions.QuantileSketchAgg
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-relative quality filtering: keep rows whose metric
  * falls inside a percentile band of the corpus-wide distribution.
  *
  * Training-data pipelines trim both tails of a quality metric (too
  * short = boilerplate/fragments, too long = concatenation junk) by
  * QUANTILE rather than fixed threshold, so the filter adapts as the
  * corpus mix shifts. The reference's filters are all fixed-constant
  * CHECKs (`load_quality.py:84-89`); this is the data-relative
  * extension.
  *
  * Scale: the cutoffs are ONE scalar aggregate over the metric column
  * (column-pruned scan), broadcast to the filter pass — two scans
  * total, no shuffle of the data rows. Exact `percentile` is used for
  * the oracle-gated face (it sorts per-group state — fine for a single
  * numeric column even at large row counts, since only the metric
  * values aggregate); swap in `approx_percentile(metric, p, err)` for
  * a one-pass mergeable-sketch cutoff when the metric column itself is
  * too hot to sort — rank error `err` merely shifts the cutoff, the
  * filter semantics are unchanged.
  */
object QualityFilter {

  /** The rows of `df` whose `metric` lies within the [pLo, pHi]
    * exact-percentile band (inclusive), with the two cutoffs attached
    * as columns `cut_lo` / `cut_hi`.
    */
  def quantileBand(df: DataFrame, metric: Column, pLo: Double, pHi: Double): DataFrame = {
    val cuts = df.agg(
      percentile(metric, lit(pLo)).as("cut_lo"),
      percentile(metric, lit(pHi)).as("cut_hi"))
    df.crossJoin(broadcast(cuts))
      .filter(metric.cast("double").between(col("cut_lo"), col("cut_hi")))
  }

  /** SCALE path of [[quantileBand]]: cutoffs from the mergeable
    * bounded [[QuantileSketchAgg]] instead of an exact full sort —
    * the aggregation state is ≤ k entries per partition (merged
    * map-side), so the metric column is never globally sorted and the
    * cutoff pass costs one column-pruned scan with O(k) shuffle bytes.
    *
    * `hash` must be a pure deterministic function of `metric` (use
    * MinHashLsh.portableHash32 of its canonical string form); with a
    * portable hash the sampled cutoffs — hence the kept row SET — are
    * bit-reproducible on any engine with md5, which is what lets the
    * sketch path carry its own oracle gate (q85) rather than only a
    * tolerance test.
    *
    * The p-cutoff is the smallest sampled value whose cumulative
    * sampled count reaches p × total sampled count (ties inclusive).
    * Same output contract as the exact path: input rows inside the
    * band, `cut_lo`/`cut_hi` attached. Rank error is O(1/√k); see
    * QuantileSketchSpec for the measured bound.
    */
  def quantileBandSketch(df: DataFrame, metric: Column, hash: Column,
                         pLo: Double, pHi: Double, k: Int = 512): DataFrame = {
    require(pLo <= pHi, s"pLo <= pHi required, got $pLo > $pHi")
    val sk = df.agg(QuantileSketchAgg.sample(hash, metric.cast("double"), k).as("__s"))
    // ≤ k rows from here down: the window and aggregate are trivial
    val cdf = sk.select(explode(col("__s")).as("e"))
      .select(col("e.value").as("__v"), col("e.count").as("__c"))
      .select(col("__v"),
        sum(col("__c")).over(
          Window.orderBy(col("__v")).rowsBetween(Window.unboundedPreceding, 0)).as("__cum"),
        sum(col("__c")).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).as("__tot"))
    val cuts = cdf.agg(
      min(when(col("__cum").cast("double") >= lit(pLo) * col("__tot").cast("double"),
        col("__v"))).as("cut_lo"),
      min(when(col("__cum").cast("double") >= lit(pHi) * col("__tot").cast("double"),
        col("__v"))).as("cut_hi"))
    df.crossJoin(broadcast(cuts))
      .filter(metric.cast("double").between(col("cut_lo"), col("cut_hi")))
  }
}
