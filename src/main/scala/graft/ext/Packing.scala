package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing: assign documents to fixed-budget
  * training bins.
  *
  * The last step of a training-data pipeline turns a curated corpus
  * into batches of ≈ `budget` tokens. This implements offset packing:
  * documents take a deterministic md5-shuffled order, a running token
  * prefix sum is computed over that order, and a document's bin is
  * `floor(prefix_before / budget)` — every bin holds ~budget tokens,
  * documents may straddle a boundary (the consumer truncates or
  * continues across the seam, the standard packed-sequence layout).
  * Greedy close-when-full packing would need a sequential scan;
  * offset packing is a pure window computation with identical
  * steady-state utilization.
  *
  * Scale design: the order and prefix sum live INSIDE md5 hash
  * buckets ([[Sampling.bucket256]]), never globally — 256 independent
  * window partitions (one task each, ~corpus/256 rows per task), no
  * single-task global sort. Bins are (bucket, bin_in_bucket) pairs;
  * all arithmetic is integer, so the layout is bit-reproducible on
  * any cluster and any partitioning, and mirrors in ANSI SQL.
  */
object Packing {

  /** Pack rows into ≈ budget-token bins.
    * Output: key column `id`, `bucket` (0-255), `pack_pos` (1-based
    * position within the bucket's order), `cum_tokens` (inclusive
    * prefix sum), `bin_id` (0-based bin within the bucket).
    */
  def packByBudget(docs: DataFrame, id: Column, nTokens: Column,
                   budget: Long, salt: String = ""): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val h = md5(concat(id.cast("string"), lit(salt)).cast("binary"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("__h"), col("__id"))
    val cum = Window.partitionBy(col("bucket")).orderBy(col("__h"), col("__id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(id.as("__id"), nTokens.as("__n"), h.as("__h"),
        Sampling.bucket256(id, salt).as("bucket"))
      .withColumn("pack_pos", row_number().over(w).cast("long"))
      .withColumn("cum_tokens", sum(col("__n")).over(cum))
      // `div`, not `/`: Column./ is IEEE double division even on longs
      .withColumn("bin_id", expr(s"(cum_tokens - __n) div ${budget}L"))
      .select(col("__id").as("doc_id"), col("bucket").cast("long").as("bucket"),
        col("pack_pos"), col("cum_tokens"), col("bin_id"))
  }
}
