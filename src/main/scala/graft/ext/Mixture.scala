package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-mixture planning: turn per-source token inventories plus
  * target mixture weights into an exact token budget per source — the
  * arithmetic behind "60% web / 30% code / 10% books for 1T tokens,
  * nothing repeated more than 4 epochs" (the Gopher/LLaMA mixture
  * tables; DoReMi produces the weights, this plans the epochs).
  *
  * [[Sampling.weightedInterleave]] ORDERS an already-sized mixture;
  * [[epochPlan]] decides the sizes. Everything is integer arithmetic
  * on a source-sized table (one row per corpus source — driver-scale
  * by definition, like the allocation table it builds on), so the
  * plan is engine-portable and oracle-checkable exactly.
  */
object Mixture {

  /** Exact token-budget allocation with a bounded-repeat cap and ONE
    * redistribution round.
    *
    * Round 1: Hamilton-allocate `budget` tokens across sources
    * proportional to integer `parts` ([[Sampling.allocateOverCounts]]
    * — largest-remainder top-up, ties by source ascending), then cap
    * every source at `maxEpochs × n_tokens` (repeating a small source
    * past a few epochs degrades models faster than down-weighting —
    * the cap is the knob).
    *
    * Round 2: the tokens the cap freed are re-allocated across the
    * sources with headroom by the same Hamilton rule over their
    * `parts`, granted up to each source's remaining headroom. One
    * round only — a fixed-point water-fill is iteration-count-
    * dependent and therefore not oracle-stable; what one round cannot
    * place is reported honestly in `unallocated` (identical on every
    * row; 0 whenever total capacity ≥ budget and one round suffices,
    * which covers the realistic regime where few sources cap).
    *
    * @param tokens (source, n_tokens) inventory — tokens available
    *               per source at 1 epoch
    * @param parts  (source, parts) integer mixture weights; a source
    *               missing from `parts` gets 0 (excluded)
    * @return one row per source: (source, n_tokens, parts,
    *         target_tokens, full_epochs, rem_tokens, capped,
    *         unallocated); `target_tokens = full_epochs × n_tokens +
    *         rem_tokens`, Σ target_tokens + unallocated = budget
    */
  def epochPlan(tokens: DataFrame, parts: DataFrame,
                budget: Long, maxEpochs: Int): DataFrame = {
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    val inv = tokens
      .select(col("source"), col("n_tokens").cast("long").as("n_tokens"))
      .join(parts.select(col("source"), col("parts").cast("long").as("parts")),
        Seq("source"))
    val r1 = Sampling.allocateOverCounts(
        inv.select(col("source").as("stratum"), col("parts").as("n_rows")),
        budget)
      .select(col("stratum").as("source"), col("quota").as("__t1"))

    val one = Window.partitionBy(lit(1))
    val j = inv.join(r1, Seq("source"))
      .withColumn("__cap", col("n_tokens") * maxEpochs)
      .withColumn("grant1", least(col("__t1"), col("__cap")))
      .withColumn("__excess", lit(budget) - sum(col("grant1")).over(one))
      .withColumn("__head", col("__cap") - col("grant1"))

    // round 2: Hamilton over the sources with headroom, budget = the
    // excess column (not a literal), so the DIV/% run on columns
    val p2 = sum(when(col("__head") > 0, col("parts")).otherwise(0L)).over(one)
    val withP2 = j.withColumn("__p2", p2)
    val base2 = when(col("__head") > 0 && col("__p2") > 0,
      expr("(__excess * parts) DIV __p2")).otherwise(0L)
    val rem2 = when(col("__head") > 0 && col("__p2") > 0,
      expr("(__excess * parts) % __p2")).otherwise(-1L)
    val withBase = withP2
      .withColumn("__b2", base2)
      .withColumn("__r2", rem2)
      .withColumn("__seats", col("__excess") - sum(col("__b2")).over(one))
    val rnk2 = row_number().over(
      Window.orderBy(col("__r2").desc, col("source").asc))
    val alloc2 = col("__b2") +
      when(col("__r2") >= 0 && rnk2 <= col("__seats"), 1L).otherwise(0L)
    val planned = withBase
      .withColumn("grant2", least(col("__head"), alloc2))
      .withColumn("target_tokens", col("grant1") + col("grant2"))
      .withColumn("unallocated",
        col("__excess") - sum(col("grant2")).over(one))
    planned.select(col("source"), col("n_tokens"), col("parts"),
      col("target_tokens"),
      expr("target_tokens DIV n_tokens").as("full_epochs"),
      expr("target_tokens % n_tokens").as("rem_tokens"),
      (col("__t1") > col("__cap")).as("capped"),
      col("unallocated"))
  }
}
