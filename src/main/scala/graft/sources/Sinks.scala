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

/** ATOMIC JDBC sink — closes the per-partition-transaction delta the
  * plain [[JdbcSink]] documents (SURVEY §3 E1): Spark's JDBC writer
  * commits each partition separately, so a mid-write failure leaves the
  * target holding a PARTIAL load, which the reference's single-commit
  * psycopg pattern (`load_hhs.py:148,166` — one commit per file, full
  * rollback on any error) never does.
  *
  * Shape: executors stage the frame into a fresh per-call staging table
  * (per-partition transactions are harmless there — the target is
  * untouched and a partial stage is dropped), then ONE driver-side
  * transaction publishes: create-target-if-missing + `INSERT … SELECT`
  * + drop-stage, committed together (Derby and PostgreSQL both have
  * transactional DDL). Any failure — executor-side mid-stage or
  * driver-side mid-publish — rolls back to a byte-identical target;
  * the staging table is dropped on every path.
  *
  * Scale note: the publish statement is server-side set copy (no data
  * through the driver); the staged rows flow over JDBC exactly once,
  * same as the non-atomic path.
  */
class AtomicJdbcSink(url: String, props: java.util.Properties,
                     batchSize: Int = 500, numPartitions: Int = 8,
                     schema: Option[String] = None) extends TableSink {

  override def append(df: DataFrame, table: String): Unit = {
    val stage = s"${table}_stg_${java.util.UUID.randomUUID().toString.take(8).replace("-", "")}"
    var primary: Throwable = null
    try {
      // ErrorIfExists: a stage-name collision must fail loudly, never
      // publish another writer's rows
      df.coalesce(numPartitions)
        .write.mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
        .option("batchsize", batchSize)
        .jdbc(url, stage, props)
      publish(df.schema.fieldNames, stage, table)
    } catch {
      case e: Throwable => primary = e; throw e
    } finally {
      // The cleanup opens a NEW connection; if the failure being
      // unwound is connectivity loss, the drop fails too — that
      // secondary failure must never replace the root cause.
      try dropIfExists(stage)
      catch {
        case cleanup: Throwable =>
          if (primary == null) throw cleanup
          else primary.addSuppressed(cleanup)
      }
    }
  }

  private def connect() = java.sql.DriverManager.getConnection(url, props)

  /** Existence probe bounded to the CONNECTION'S OWN schema — a
    * catalog-wide scan would take a same-named table in an unrelated
    * schema as "exists", skip CREATE, and then publish against a
    * target the INSERT cannot resolve (the multi-schema-warehouse
    * trap). Name match is case-insensitive because the unquoted DDL
    * here case-folds per dialect while JDBC metadata reports the
    * stored form. Drivers predating JDBC 4.1 (or ones that throw on
    * `getSchema`) can't report the current schema — then the explicit
    * `schema` constructor arg is REQUIRED: falling back to a
    * catalog-wide pattern would re-open the very trap this probe
    * exists to close, so the sink refuses loudly instead.
    */
  private def tableExists(conn: java.sql.Connection, name: String): Boolean = {
    val current =
      try Option(conn.getSchema)
      catch { case _: java.sql.SQLException | _: AbstractMethodError => None }
    val schemaPattern = current.orElse(schema).getOrElse(
      throw new IllegalStateException(
        "AtomicJdbcSink: the JDBC driver cannot report its current schema " +
          "and no explicit schema was configured - refusing a catalog-wide " +
          "existence probe (a same-named table in an unrelated schema would " +
          "be mistaken for the target). Pass schema=Some(...) to the sink."))
    val meta = conn.getMetaData.getTables(null, schemaPattern, "%", Array("TABLE"))
    try {
      var exists = false
      while (!exists && meta.next())
        exists = meta.getString("TABLE_NAME").equalsIgnoreCase(name)
      exists
    } finally meta.close()
  }

  /** One transaction: target created if missing (from the stage's own
    * layout), rows published, stage retired. Column lists are quoted
    * exact-case — Spark's JDBC writer creates quoted identifiers, so
    * the publish must reference them the same way.
    *
    * First-load race: two concurrent loads to a missing target can
    * both pass the not-exists probe; the loser's CREATE fails with a
    * duplicate-table error AFTER its transaction rolled back cleanly.
    * That is "the table exists now", not a load failure — the loser
    * republishes INSERT-only, and neither load is dropped.
    */
  private def publish(fieldNames: Seq[String], stage: String, table: String): Unit = {
    val cols = fieldNames.map("\"" + _ + "\"").mkString(", ")
    val conn = connect()
    try {
      conn.setAutoCommit(false)
      def run(createFirst: Boolean): Unit = {
        val st = conn.createStatement()
        try {
          if (createFirst)
            st.executeUpdate(s"CREATE TABLE $table AS SELECT * FROM $stage WITH NO DATA")
          st.executeUpdate(s"INSERT INTO $table ($cols) SELECT $cols FROM $stage")
          st.executeUpdate(s"DROP TABLE $stage")
          conn.commit()
        } catch {
          case e: Throwable => conn.rollback(); throw e
        } finally st.close()
      }
      val needCreate = !tableExists(conn, table)
      try run(createFirst = needCreate)
      catch {
        case e: java.sql.SQLException if needCreate && isDuplicateTable(e) =>
          run(createFirst = false)
      }
    } finally conn.close()
  }

  /** Duplicate-table detection by SQLSTATE: Derby X0Y32, PostgreSQL
    * 42P07, SQL-standard-ish 42S01 (MySQL/H2) — plus the message as a
    * last resort for drivers with vendor states.
    */
  private def isDuplicateTable(e: java.sql.SQLException): Boolean = {
    val states = Iterator.iterate[java.sql.SQLException](e)(_.getNextException)
      .takeWhile(_ != null).take(8).flatMap(x => Option(x.getSQLState)).toSet
    states.exists(Set("X0Y32", "42P07", "42S01")) ||
      Option(e.getMessage).exists(_.toLowerCase.contains("already exists"))
  }

  /** Best-effort stage cleanup for the failure paths (the success path
    * already dropped it inside the publish transaction).
    */
  private def dropIfExists(stage: String): Unit = {
    val conn = connect()
    try {
      if (tableExists(conn, stage)) {
        val st = conn.createStatement()
        try st.executeUpdate(s"DROP TABLE $stage") finally st.close()
      }
    } finally conn.close()
  }
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
