package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Readers for the driver-generated testdata star schema (TESTDATA.md).
  *
  * Each table is a single parquet file under `\$dir/<name>.parquet`. All
  * reads go through here so scan-level tuning (schema pinning, pushdown
  * options) lives in one place.
  */
object Tables {
  // Per-session memo of source DataFrames: `spark.read.parquet` lists
  // files and reads footers to infer the schema on EVERY call, so 47
  // gate queries re-paid that driver-side cost per query. The memo
  // reuses the resolved relation (plan-level only — no data caching).
  //
  // Lifecycle: bounded LRU over sessions (a cached DataFrame strongly
  // references its session, so weak keys can't work — the value would
  // pin the key). A process that cycles sessions ages old ones out
  // after MaxSessions newer sessions are seen, bounding retention.
  //
  // Staleness contract: this reader serves ONLY the driver's immutable
  // testdata tables (TESTDATA.md: read-only, never regenerated). The
  // cached relation pins the file listing of the first call; anything
  // mutable (warehouse dirs, quarantine output) must NOT be read
  // through here — the aragon Warehouse has its own readers.
  private val MaxSessions = 4
  private val memo =
    new java.util.LinkedHashMap[SparkSession, java.util.HashMap[String, DataFrame]](
      16, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[SparkSession, java.util.HashMap[String, DataFrame]])
          : Boolean = size() > MaxSessions
    }

  /** Stopped sessions must not be retained by their cached DataFrames —
    * drop them whenever the memo is touched (≤ MaxSessions entries, so
    * the sweep is trivia inside the lock).
    */
  private def evictStopped(): Unit = {
    val it = memo.keySet().iterator()
    while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
  }

  /** Engine-wide contract: `events.ts` is nanoseconds-since-epoch
    * BIGINT. Early testdata wrote parquet TIMESTAMP(NANOS), which
    * `nanosAsLong=true` already surfaces as exactly that; current
    * testdata writes TIMESTAMP(MICROS), which Spark reads as
    * TIMESTAMP_NTZ. Convert at the only loader so every operator (and
    * every plan pin) keeps seeing ns-longs. Under the UTC session
    * timezone `unix_micros(cast(ntz as timestamp)) * 1000` is the same
    * instant DuckDB's `epoch_ns(ts)` computes for the oracle side, so
    * the cross-engine gates stay value-identical.
    *
    * Scan-cost note for 100 TB deployments: the converted `ts` is a
    * DERIVED column, so a literal range predicate on it no longer
    * reaches the parquet scan (PushedFilters) — no current operator
    * filters ts against literals (they filter event_type/user_id,
    * which still push down), but a pipeline that slices raw time
    * ranges at scale should either filter the on-disk column BEFORE
    * this conversion or land data in the engine contract (INT64 ns)
    * at rest, where pushdown and row-group pruning apply directly.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampNTZType) | Some(TimestampType) =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case _ => df
    }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val cached = memo.synchronized {
      evictStopped()
      val perSession = memo.get(spark)
      if (perSession != null) perSession.get(path) else null
    }
    if (cached != null) return cached
    // File listing + footer schema inference stays OUTSIDE the lock:
    // concurrent first reads of different tables/sessions must not
    // serialize on driver I/O. A racing duplicate read is harmless —
    // putIfAbsent keeps the first relation, the loser is garbage.
    val df = normalizeEventTs(spark.read.parquet(path))
    memo.synchronized {
      val perSession = {
        val existing = memo.get(spark)
        if (existing != null) existing
        else {
          val m = new java.util.HashMap[String, DataFrame]()
          memo.put(spark, m)
          m
        }
      }
      val prior = perSession.putIfAbsent(path, df)
      if (prior != null) prior else df
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
