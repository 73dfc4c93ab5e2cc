package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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
}
