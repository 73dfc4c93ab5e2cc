package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation primitives.
  *
  * AQE's skew-join split handles most runtime skew; these are for the
  * cases planned around it: hot grouping keys (one reducer receives a
  * disproportionate share of rows) and broadcast-ineligible joins with
  * a few hot keys.
  */
object Skew {

  /** Two-phase ("salted") aggregation for hot grouping keys: phase 1
    * aggregates on (key, salt) — spreading each hot key over `buckets`
    * reducers — phase 2 combines the partials per key. Correct for any
    * aggregate with an associative merge; the caller supplies both
    * phases (e.g. count → sum, sum → sum, min → min).
    *
    * The salt is row-positional (monotonically_increasing_id mod
    * buckets), NOT content-derived: a hot key whose rows are byte-
    * identical — the common skew case — would hash every row to ONE
    * bucket and defeat the mitigation entirely. Positional salt
    * spreads uniformly regardless of content; it is stable for a given
    * scan partitioning (not across arbitrary re-partitionings, which
    * aggregation correctness does not require).
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int,
                phase1: Seq[(String, Column)],   // outName -> agg expr
                phase2: String => Column          // outName -> combiner over phase-1 col
               ): DataFrame = {
    require(buckets > 0)
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val p1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(phase1.head._2.as(phase1.head._1),
        phase1.tail.map { case (n, c) => c.as(n) }: _*)
    p1.groupBy(keys.map(col): _*)
      .agg(phase2(phase1.head._1).as(phase1.head._1),
        phase1.tail.map { case (n, _) => phase2(n).as(n) }: _*)
  }

  /** Salted count per key — the common case packaged. */
  def saltedCount(df: DataFrame, keys: Seq[String], buckets: Int = 16): DataFrame =
    saltedAgg(df, keys, buckets,
      Seq("count" -> count(lit(1))),
      n => sum(col(n)))
}
