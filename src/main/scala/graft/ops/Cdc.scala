package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture application: turn a change stream of keyed
  * upserts/deletes into a latest-wins snapshot or an SCD type-2
  * history. The reference's loaders only ever INSERT (its dedup drops
  * re-sent rows — `load_hhs.py:96-137`); a warehouse ingesting mutable
  * upstream tables needs the merge semantics.
  *
  * Contract: `op` is 'U' (upsert, row carries the new image) or 'D'
  * (delete, payload ignored); `version` is strictly increasing per key
  * (ingestion sequence / LSN). Determinism requires (key, version)
  * unique — standard CDC framing.
  *
  * Scale shape: both forms are ONE shuffle on the key (window
  * partitioned by key), no joins, no iteration; Spark's window runs
  * partial sort within partitions, so skewed keys are bounded by their
  * own change count, not the table size.
  */
object Cdc {

  /** Latest-wins snapshot: the newest image per key, minus keys whose
    * newest change is a delete.
    */
  def latestSnapshot(changes: DataFrame, key: Column, version: Column,
                     op: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(version.desc)
    changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && op === "U")
      .drop("__rn")
  }

  /** SCD type-2 history: one row per upsert, carrying
    * `valid_from` = its version, `valid_to` = the next change's
    * version for that key (null = still open), and `is_current`.
    * A delete emits no row but CLOSES the preceding interval (the
    * lead() runs before delete rows are dropped).
    */
  def scd2(changes: DataFrame, key: Column, version: Column,
           op: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(version.asc)
    changes
      .withColumn("valid_from", version.cast("long"))
      .withColumn("valid_to", lead(version.cast("long"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull && op === "U")
      .filter(op === "U")
  }
}
