package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming delivery into batch table sinks (`graft.sources.TableSink`
  * targets: JDBC warehouse, parquet, JSONL shards) via foreachBatch.
  *
  * foreachBatch is AT-LEAST-ONCE: after a crash the restarted query
  * re-runs the last uncommitted micro-batch, so a plain append can
  * double-deliver. `keyedIdempotent` makes delivery effectively-once
  * at the KEY level — each micro-batch drops rows whose keys the sink
  * already holds (one anti-join against live sink state, the
  * streaming form of the HHS loader's cross-file dedup against
  * warehouse state, `load_hhs.py:96-137`): a replayed batch, or even
  * a full re-ingest from scratch, re-delivers nothing.
  *
  * Scale shape: the anti-join is per-micro-batch — batch-sized left
  * side against a key-projected read of the sink (pushed-down column
  * scan via JDBC/parquet). State lives IN the sink; the stream itself
  * keeps zero rows of state (no watermark, no state store).
  * Single-writer assumption: concurrent writers to the same keys need
  * sink-side transactions instead.
  */
object StreamSink {

  /** A started-ready writer: call `.start()` (optionally after more
    * options). `readExisting` must return the sink's current rows
    * (only `keys` columns are used); `append` performs the actual
    * write of the deduplicated batch.
    */
  def keyedIdempotent(stream: DataFrame, keys: Seq[String],
                      readExisting: () => DataFrame,
                      append: DataFrame => Unit,
                      checkpoint: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val existing = readExisting().select(keys.map(col): _*)
        val fresh = batch.dropDuplicates(keys)
          .join(existing, keys, "left_anti")
        append(fresh)
      }

  /** Continuous drift monitoring: per micro-batch, compute the
    * `Expectations.loadProfile` of the batch and append it — stamped
    * with the batch id — to a monitoring table. The streaming face of
    * the cross-load drift story: the batch pipeline compares weekly
    * load profiles (`Expectations.driftReport`); a continuous ingest
    * gets one profile row-set per micro-batch, and the same
    * driftReport runs over any two batch ids after the fact.
    *
    * Scale shape: the profile is ONE scan of the micro-batch folding
    * all columns into a single aggregate (|columns| output rows);
    * monitoring writes are |columns| rows per batch — nothing here is
    * stream-state, and the data batch itself is not double-scanned
    * unless the caller also writes it in this foreachBatch (pass
    * `alsoAppend` to share the single materialization).
    */
  def withBatchProfiles(stream: DataFrame, columns: Seq[String],
                        appendProfile: DataFrame => Unit,
                        checkpoint: String,
                        alsoAppend: Option[DataFrame => Unit] = None): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = if (alsoAppend.isDefined) batch.persist() else batch
        // finally: a throwing sink must not leak the cached batch —
        // under streaming retry each re-attempt would otherwise pin a
        // fresh copy for the session lifetime
        try {
          appendProfile(graft.ops.Expectations.loadProfile(b, columns)
            .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId)))
          alsoAppend.foreach(_(b))
        } finally if (alsoAppend.isDefined) { b.unpersist(); () }
      }
}
