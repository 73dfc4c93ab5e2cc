package graft.sources

import org.apache.spark.sql.DataFrame

/** Table sinks (SURVEY.md §2.1 S5–S7).
  *
  * The reference writes per-row INSERTs (load_hhs.py:76-137) and 500-row
  * executemany batches (load_quality.py:129-133) to PostgreSQL, plus
  * quarantine CSVs. Here both loaders write through ONE interface; the
  * harness has no live database, so parquet is the default target and
  * JDBC is configuration — swapping sinks changes no pipeline code.
  */
trait TableSink {
  def append(df: DataFrame, table: String): Unit
}

/** Parquet directory sink (default; also what the golden tests read back). */
class ParquetSink(baseDir: String) extends TableSink {
  override def append(df: DataFrame, table: String): Unit =
    df.write.mode("append").parquet(s"$baseDir/$table")
}

/** JDBC sink — the production path (S5/S6). `batchsize` reproduces the
  * reference's 500-row executemany batching; `numPartitions` caps
  * concurrent connections (each partition writes its own transaction —
  * the documented atomicity delta vs the reference's per-file commit,
  * SURVEY §3 E1).
  */
class JdbcSink(url: String, props: java.util.Properties,
               batchSize: Int = 500, numPartitions: Int = 8) extends TableSink {
  override def append(df: DataFrame, table: String): Unit =
    df.coalesce(numPartitions)
      .write.mode("append")
      .option("batchsize", batchSize)
      .jdbc(url, table, props)
}

/** JSONL sink — the training-data interchange format (one JSON object
  * per line). `maxRecordsPerFile` bounds shard size so a 100 TB export
  * emits evenly-sized files downstream trainers can stream (0 = let
  * partitioning decide); optional codec (gzip/zstd) for wire formats
  * that expect compressed shards.
  */
class JsonlSink(baseDir: String, maxRecordsPerFile: Long = 0L,
                codec: Option[String] = None) extends TableSink {
  override def append(df: DataFrame, table: String): Unit = {
    val base = df.write.mode("append")
      .option("maxRecordsPerFile", maxRecordsPerFile)
    codec.fold(base)(c => base.option("compression", c))
      .json(s"$baseDir/$table")
  }
}

/** ORC sink — same contract as ParquetSink for warehouses standardized
  * on ORC; Spark ships the reader/writer, so the swap is config only.
  */
class OrcSink(baseDir: String) extends TableSink {
  override def append(df: DataFrame, table: String): Unit =
    df.write.mode("append").orc(s"$baseDir/$table")
}

/** Quarantine sink (S7): original invalid/duplicate rows as one
  * header'd CSV per load, mirroring invalid_data/{hhs,quality}.csv
  * (load_hhs.py:152-155). coalesce(1) matches the reference's
  * single-file contract; quarantines are tiny relative to input.
  * Overwrite-per-load is the REFERENCE's behavior too (it opens the
  * file with mode "w" each run) — callers that need an audit trail
  * across loads pass a per-load path.
  */
object QuarantineSink {
  def write(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(path)
}
