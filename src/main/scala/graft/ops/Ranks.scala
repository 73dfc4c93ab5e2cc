package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe exact ranking — global or per-group — WITHOUT a
  * single-partition window.
  *
  * An unpartitioned `row_number()` (or one partitioned by a
  * corpus-sized group like "language") requires AllTuples
  * distribution: Spark funnels every row of the frame through ONE
  * task, which caps throughput at one core and one executor's memory
  * no matter how large the cluster. The bucket-offset discipline here
  * (first used by [[graft.ext.Sharding.snakeShards]], whose ranking
  * core now delegates to this object) removes that:
  *
  *   1. bucket rows by the HIGH BITS of the (long) sort score —
  *      a monotone prefix of the sort key, so bucket-major order IS
  *      the global order;
  *   2. aggregate per-(group, bucket) counts — bucket-cardinality
  *      rows, thousands not billions;
  *   3. turn counts into exclusive rank offsets with a window over
  *      THAT tiny table (per group, ordered by bucket);
  *   4. broadcast the offsets back and rank within (group, bucket)
  *      only — each window partition holds one bucket's rows, sized
  *      by `bucketShift`, not the whole frame.
  *
  * The result is bit-identical to the naive global window (gate
  * q158's oracle pins this for snakeShards; q175's for the per-group
  * form). `bucketShift` trades the two failure directions against
  * each other and MUST be sized to the score distribution:
  *
  *  - too SMALL (buckets too fine): the offsets table has one row per
  *    distinct (group, score >> bucketShift) value, and it is
  *    force-broadcast. For hash-like or widely spread scores at the
  *    default shift of 8 that cardinality approaches the corpus and
  *    the broadcast fails on driver memory — loudly, but late. Size
  *    the shift so scoreRange >> bucketShift stays ≲ 10⁶ per group
  *    (e.g. 64-bit hash scores need bucketShift ≈ 44, not 8).
  *  - too LARGE (buckets too coarse): one bucket's rows form one
  *    window partition; a bucket that outgrows an executor's memory
  *    spills or OOMs. Lower the shift until the largest bucket fits.
  *
  * The default of 8 suits the gates' small integer scores (counts,
  * gridded weights); callers ranking hashes or timestamps must pass
  * an explicit shift.
  */
object Ranks {

  /** The guarded long score: NULL or negative scores would silently
    * corrupt the ranking (NULL never matches the bucket equi-join —
    * the row would vanish; a negative lands in a huge unsigned
    * bucket), so both raise instead of mis-ranking.
    */
  private def guardedScore(score: Column): Column = {
    val s = score.cast("long")
    when(s.isNull || s < 0, raise_error(concat(
      lit("bucketRank: score must be a non-negative long, got "),
      coalesce(score.cast("string"), lit("NULL")))))
      .otherwise(s)
  }

  /** Shared core: (ranked frame, per-(group, bucket) counts). The
    * counts table is bucket-cardinality — callers needing group
    * totals sum it rather than re-scanning the corpus.
    */
  private def rankedWithCounts(df: DataFrame, part: Seq[String],
                               score: Column, tie: Column,
                               bucketShift: Int): (DataFrame, DataFrame) = {
    require(bucketShift >= 0 && bucketShift < 63, "bucketShift in [0, 63)")
    val withW = df.withColumn("__s", guardedScore(score))
      .withColumn("__b", shiftrightunsigned(col("__s"), bucketShift))
    val pCols = part.map(col)
    val counts = withW.groupBy((pCols :+ col("__b")): _*)
      .agg(count(lit(1)).as("__c"))
    // per-group running offsets over the bucket-cardinality table —
    // this window's partitions hold one row per distinct high-bit
    // value, never corpus rows
    val offW = Window.partitionBy(pCols: _*).orderBy(col("__b").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__c")).over(offW), lit(0L)))
      .select((pCols :+ col("__b") :+ col("__off")): _*)
    val rankW = Window.partitionBy((pCols :+ col("__b")): _*)
      .orderBy(col("__s").desc, tie.asc)
    val ranked = withW.join(broadcast(offsets), part :+ "__b")
      .withColumn("rank", col("__off") + row_number().over(rankW))
      .drop("__b", "__off")
      .withColumnRenamed("__s", "w")
    (ranked, counts)
  }

  /** Exact dense 1-based rank by (`score` DESC, `tie` ASC) within
    * each `part` group (empty `part` = one global ranking). `score`
    * must cast to a NON-NEGATIVE long — NULL and negative values
    * raise rather than silently vanish or mis-rank (the
    * [[graft.ext.Sharding.snakeShards]] guard).
    *
    * Output: input columns + `w` (the long score) + `rank`.
    */
  def bucketRank(df: DataFrame, part: Seq[String], score: Column,
                 tie: Column, bucketShift: Int = 8): DataFrame =
    rankedWithCounts(df, part, score, tie, bucketShift)._1

  /** Proportional n-tile per group: tile i holds the rows whose rank
    * satisfies (rank−1)·n / n_group ∈ [i−1, i) — the language-balanced
    * quality-retention primitive ("keep the top decile of every
    * language", FineWeb/CCNet style), where a per-group absolute
    * threshold would starve low-resource groups.
    *
    * The tile boundary is the mirrored-arithmetic rule the oracle
    * replays verbatim: floor((rank−1)·n / n_group) + 1 computed in
    * IEEE doubles — both engines perform the identical two exact
    * conversions, one division, one floor (exact while
    * (rank−1)·n < 2^52; a 10-tile over a 4·10^14-row group overflows
    * a cluster long before it overflows this).
    *
    * Output: input columns + `w`, `rank`, `n_part`, `tile` ∈ [1, n].
    * Filter `tile === 1` for top-1/n-per-group retention. Group
    * totals come from summing the ranking's own bucket-count table
    * (bucket-cardinality rows, broadcast back) — the corpus is
    * scanned for the ranking only, never a second time for counts —
    * and no corpus-sized window partition exists anywhere, so one
    * group holding half the corpus costs what any other shuffle of
    * that size costs.
    */
  def propTile(df: DataFrame, part: Seq[String], score: Column,
               tie: Column, n: Int, bucketShift: Int = 8): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val (ranked, bucketCounts) = rankedWithCounts(df, part, score, tie, bucketShift)
    val pCols = part.map(col)
    val counts = bucketCounts.groupBy(pCols: _*)
      .agg(sum(col("__c")).as("n_part"))
    val joined =
      if (part.isEmpty) ranked.crossJoin(broadcast(counts))
      else ranked.join(broadcast(counts), part)
    joined.withColumn("tile",
      floor(((col("rank") - 1) * n).cast("double") /
        col("n_part").cast("double")).cast("long") + 1L)
  }
}
