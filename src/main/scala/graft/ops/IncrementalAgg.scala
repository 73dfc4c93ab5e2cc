package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate-state maintenance — the materialized-rollup
  * discipline at 100 TB: a corpus-wide metric table (per-group count /
  * sum / min / max) must absorb a daily delta batch WITHOUT rescanning
  * the corpus, and a takedown batch without rebuilding from scratch.
  * The state is a plain DataFrame (persist to parquet like the other
  * incremental state tables: digest ledger, signature store, CC
  * labels), and every maintenance path is join-shaped over STATE, not
  * data.
  *
  * Algebra, stated honestly:
  *  - count and DECIMAL sum form a GROUP (merge = add, retract =
  *    subtract, both exact — sums are DECIMAL(38,6), no float drift);
  *  - min and max form only a MONOID (merge = min/max, but bounded
  *    state cannot retract an extremum: if the deleted batch carried
  *    the group's min, the new min is unknowable without the retained
  *    rows). [[retract]] therefore keeps the stored extrema and flags
  *    exactly the groups whose extremum the deleted batch touched
  *    (`stale_minmax`) — the affected-only rescan list, the same
  *    contract [[graft.ext.Forget]] documents for KMV/quantile/Bloom
  *    sketch state (non-retractable; rebuild from retained).
  *
  * Identities pinned by oracle gates: merge(state(old), state(delta))
  * ≡ state(full) (q118), and retract(state(full), state(deleted)) ≡
  * count/sum of state(retained) + stored extrema + exact stale set
  * (q119).
  */
object IncrementalAgg {

  private val S = "DECIMAL(38,6)"

  /** Build the aggregate state for one batch: one partial-aggregated
    * shuffle on the group keys.
    */
  def state(df: DataFrame, keys: Seq[Column], value: Column): DataFrame =
    df.groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
           sum(value.cast(S)).as("s"),
           min(value).as("mn"),
           max(value).as("mx"))

  /** Merge any number of state tables into one — associative and
    * commutative, so partial states from shards/days/regions combine
    * in any order: union + one re-aggregation on the keys (state-sized
    * input, never data-sized).
    */
  def merge(states: Seq[DataFrame], keyNames: Seq[String]): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state")
    states.reduce(_ unionByName _)
      .groupBy(keyNames.map(col): _*)
      .agg(sum(col("n")).as("n"),
           sum(col("s").cast(S)).as("s"),
           min(col("mn")).as("mn"),
           max(col("mx")).as("mx"))
  }

  /** Retract a deleted batch's state from the stored state: exact for
    * count/sum (group inverse), stored extrema kept with
    * `stale_minmax` marking exactly the groups whose min or max the
    * deleted batch may have owned (deleted extremum == stored
    * extremum; equality is conservative — a retained duplicate value
    * keeps the extremum valid but bounded state cannot tell). Groups
    * whose count reaches zero disappear. One state-sized left join —
    * no corpus rescan anywhere.
    *
    * Contract: `deleted` describes rows that ARE in the stored state
    * (both derive from the same corpus); a deleted group absent from
    * `stored` is ignored — there is nothing to subtract from.
    */
  def retract(stored: DataFrame, deleted: DataFrame,
              keyNames: Seq[String]): DataFrame = {
    val d = deleted.select(
      keyNames.map(col) ++ Seq(col("n").as("__dn"), col("s").as("__ds"),
                               col("mn").as("__dmn"), col("mx").as("__dmx")): _*)
    stored.join(d, keyNames, "left")
      .select(
        keyNames.map(col) ++ Seq(
          (col("n") - coalesce(col("__dn"), lit(0L))).as("n"),
          (col("s") - coalesce(col("__ds"), lit(0).cast(S))).cast(S).as("s"),
          col("mn"), col("mx"),
          (col("__dmn") <=> col("mn") || col("__dmx") <=> col("mx"))
            .as("stale_minmax")): _*)
      .filter(col("n") > 0)
  }
}
