package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregation / sort / top-k building blocks (SURVEY.md §2.5–2.6).
  *
  * Exactness discipline: double summation is order-dependent, and Spark's
  * partial aggregation order is nondeterministic — so any aggregate that
  * must hash-match a single-threaded oracle is computed over
  * DECIMAL(38,6) (exact, associative) and only cast back to double at
  * the end. The decimal path is still map-side-combinable and
  * whole-stage-codegen'd; the cost vs double sum is negligible relative
  * to the scan.
  */
object Aggs {

  private val Dec = DecimalType(38, 6)

  /** Order-independent exact sum of a double expression. */
  def dsum(c: Column): Column = sum(c.cast(Dec))

  /** Exact sum surfaced as double (deterministic: decimal → double is a
    * single well-defined rounding).
    */
  def dsumAsDouble(c: Column): Column = dsum(c).cast(DoubleType)

  /** Ratio-of-sums (SURVEY A5/A8, Reporting.py:118-119) as double: both
    * sums are exact decimals cast to double, then one IEEE division —
    * bitwise deterministic regardless of partitioning.
    */
  def ratioOfSums(num: Column, den: Column): Column =
    dsum(num).cast(DoubleType) / dsum(den).cast(DoubleType)

  /** Exact mean as double (A9, Reporting.py:259). */
  def davg(c: Column): Column =
    dsum(c).cast(DoubleType) / count(c)

  /** HyperLogLog++ distinct-count sketch (beyond-reference): the
    * 100 TB path for cardinality — mergeable, one pass, bounded error
    * (rsd). Exact countDistinct expands rows per aggregate; at scale
    * prefer this unless exactness is required.
    */
  def approxDistinct(c: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(c, rsd)

  /** O2/O3: top-k by sort columns. Spark plans orderBy+limit as
    * TakeOrderedAndProject — per-partition heap + driver merge, no full
    * sort, no shuffle of the full data. Pass a deterministic total order
    * (include tie-breaker columns).
    */
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** GROUPED top-k via the mergeable bounded [[graft.functions.TopKAgg]]
    * aggregate — the scale form of `row_number() OVER (PARTITION BY g
    * ORDER BY score DESC, id) <= k`: the window shuffles and sorts the
    * whole fact table; this ships one ≤ k-entry buffer per (partition,
    * group) through the shuffle (ObjectHashAggregate, map-side
    * partial). Output: group columns + (rank, score, id), rank 1-based
    * strongest-first, score desc / id asc total order.
    */
  def groupedTopK(df: DataFrame, groups: Seq[Column], score: Column,
                  id: Column, k: Int,
                  rankName: String = "rank", scoreName: String = "score",
                  idName: String = "id"): DataFrame =
    df.groupBy(groups: _*)
      .agg(graft.functions.TopKAgg.topK(score, id, k).as("__topk"))
      .select(col("*"), posexplode(col("__topk")).as(Seq("__pos", "__e")))
      .select(groups ++ Seq(
        (col("__pos") + 1).cast("long").as(rankName),
        col("__e.score").as(scoreName),
        col("__e.id").as(idName)): _*)

  /** O5: top-k AND bottom-k in one result (Reporting.py:262-263), each
    * side tagged. Two TakeOrderedAndProject passes over the (small,
    * already-aggregated) input — at scale this is two cheap driver-side
    * merges, not two shuffles.
    */
  def topBottomK(df: DataFrame, k: Int, value: Column, tieBreaker: Column,
                 sideName: String = "side"): DataFrame = {
    val top = df.orderBy(value.desc, tieBreaker.asc).limit(k)
      .withColumn(sideName, lit("top"))
    val bottom = df.orderBy(value.asc, tieBreaker.asc).limit(k)
      .withColumn(sideName, lit("bottom"))
    top.unionAll(bottom)
  }
}
