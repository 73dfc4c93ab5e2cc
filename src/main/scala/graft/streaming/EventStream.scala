package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming over the events table: tumbling-window rollups
  * and session windows with watermarking — the streaming face of the
  * batch rollup/sessionization queries (ExtQueries q26/q27).
  *
  * Source schema matches events.parquet with its TIMESTAMP(NANOS)
  * column read as ns-longs (nanosAsLong); `withEventTime` converts to a
  * proper µs timestamp column once, up front.
  *
  * Scale notes: both aggregations are keyed state — state size is
  * bounded by the watermark horizon; at 1000 executors the state store
  * partitions on the group key (window × type / user), no skew beyond
  * key skew itself.
  */
object EventStream {

  /** events.parquet schema under nanosAsLong. */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanoseconds since epoch
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def readStream(spark: SparkSession, dir: String,
                 maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** ns-long → event-time timestamp column. */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("ts_us", expr("timestamp_micros(ts div 1000)"))

  /** Tumbling-window count/sum per event type with a late-data
    * watermark (streaming analogue of q26_event_hourly).
    */
  def hourlyRollup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    withEventTime(events)
      .withWatermark("ts_us", watermark)
      .groupBy(window(col("ts_us"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Session windows per user with a 30-minute gap — the built-in
    * session_window operator keeps per-user state and emits a session
    * row when the watermark passes the gap (streaming analogue of
    * q27_sessionize).
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
                 watermark: String = "2 hours"): DataFrame =
    withEventTime(events)
      .withWatermark("ts_us", watermark)
      .groupBy(session_window(col("ts_us"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))
}
