package graft.ops

import org.apache.spark.sql.DataFrame

/** Physical data layout for scale (SURVEY §8 scale notes): how tables
  * should be WRITTEN so the expensive operations never happen at read
  * time.
  *
  * - Bucketing: both sides of a recurring equi-join written with the
  *   same bucket count/keys join with NO shuffle — the scan is already
  *   hash-partitioned. At 100 TB, pre-bucketing fact tables on their
  *   join key turns every downstream join into a zip of local scans.
  * - Partitioning: directory-level partition columns let Catalyst prune
  *   entire partitions from the scan when filters hit them (visible as
  *   PartitionFilters in the plan) — the coarse-grained complement to
  *   parquet row-group pushdown.
  *
  * Both write through the session catalog / file layout only — no
  * external metastore needed.
  */
object Layout {

  /** Write `df` as a bucketed (and per-bucket sorted) catalog table.
    * Joins and aggregations on `keys` over this table need no
    * exchange; sorting additionally enables merge-join without a sort
    * step.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    numBuckets: Int, sorted: Boolean = true): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
    (if (sorted) w.sortBy(keys.head, keys.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Write `df` partitioned by directory on `partitionCols` — filters
    * on those columns prune at the directory level before any file is
    * opened.
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
