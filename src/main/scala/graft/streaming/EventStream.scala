package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table: tumbling-window rollups
  * and session windows with watermarking — the streaming face of the
  * batch rollup/sessionization queries (ExtQueries q26/q27).
  *
  * Source rows carry `ts` as ns-longs regardless of the on-disk
  * encoding (see [[readStream]]); `withEventTime` converts to a
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

  /** File-source stream over an events directory. Streaming file
    * sources require a caller-supplied schema, and the on-disk `ts`
    * encoding varies (TIMESTAMP(NANOS)→ns-long under nanosAsLong,
    * TIMESTAMP(MICROS)→TIMESTAMP_NTZ, or plain int64 for frames this
    * engine wrote itself), so peek at the existing files' footers with
    * a one-off batch read and then re-impose the engine contract —
    * `ts` as ns-longs — via the shared [[graft.Tables.normalizeEventTs]].
    * The batch read touches only footers already present at start-up;
    * files that arrive later must match them, which is the standard
    * file-source contract anyway.
    *
    * Starting on an EMPTY (or not-yet-created) directory: there is no
    * footer to peek, so the stream assumes the ENGINE's own contract
    * (`ts` INT64 ns) — correct for directories this engine's sinks
    * feed. A producer that writes a FOREIGN encoding
    * (TIMESTAMP_MICROS/NANOS) into a dir the consumer opened first
    * will fail every batch with a parquet type mismatch: either land
    * one file before the stream starts (so the peek sees it) or write
    * the engine contract at rest — a file source cannot re-resolve
    * its schema after start.
    */
  def readStream(spark: SparkSession, dir: String,
                 maxFilesPerTrigger: Int = 1): DataFrame = {
    val fileSchema =
      try spark.read.parquet(dir).schema
      catch { case _: org.apache.spark.sql.AnalysisException => eventSchema }
    graft.Tables.normalizeEventTs(
      spark.readStream
        .schema(fileSchema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .parquet(dir))
  }

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

  /** Streaming distinct-user KMV sketch per event type (streaming
    * analogue of q50_kmv_distinct). The bounded k-minimum-values
    * aggregate works unchanged under incremental execution because its
    * state is mergeable: each micro-batch's partial sketches merge
    * into the store's ≤ k-long buffer per group — constant state per
    * key over an unbounded stream, where an exact distinct count would
    * grow without bound. Complete output mode; no watermark needed
    * since the state never grows past k longs per group.
    */
  def distinctUsersSketch(events: DataFrame, k: Int = 12): DataFrame =
    events
      .select(col("event_type"),
        graft.ext.MinHashLsh.portableHash32(col("user_id").cast("string")).as("h32"))
      .groupBy(col("event_type"))
      .agg(graft.functions.KmvSketchAgg.kMinima(col("h32"), k).as("mins"))

  /** Streaming per-type value-distribution sketch (the
    * [[graft.functions.QuantileSketchAgg]] under incremental
    * execution): like the KMV sketch, its bottom-k-by-hash state is
    * MERGEABLE and bounded, so each micro-batch's partials fold into
    * ≤ k entries per group on an unbounded stream — and because the
    * sketch is a pure function of the input multiset, the streamed
    * state is IDENTICAL to the batch sketch over the same rows, not
    * merely approximately equal. Complete mode; no watermark needed.
    */
  def valueQuantileSketch(events: DataFrame, k: Int = 32): DataFrame =
    events
      .select(col("event_type"),
        graft.ext.MinHashLsh.portableHash32(col("value").cast("string")).as("__h"),
        col("value").cast("double").as("__v"))
      .groupBy(col("event_type"))
      .agg(graft.functions.QuantileSketchAgg.sample(col("__h"), col("__v"), k)
        .as("sketch"))

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

  /** Streaming exact dedup: drop re-deliveries of the same key across
    * micro-batches (at-least-once sources re-send; training pipelines
    * must not double-count documents/events). State holds one entry per
    * key seen within the watermark horizon and is evicted beyond it —
    * bounded memory, the streaming analogue of ExactDedup/q20.
    */
  def dedupedStream(events: DataFrame, keys: Seq[String] = Seq("event_id"),
                    watermark: String = "2 hours"): DataFrame =
    withEventTime(events)
      .withWatermark("ts_us", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Stream-static enrichment: join the event stream against a slowly
    * changing dimension snapshot (broadcast — no stream-side shuffle,
    * re-resolved per micro-batch so a refreshed static frame is picked
    * up on restart).
    */
  def enriched(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-STREAM interval join: attribute each click to the views by
    * the same user within the preceding `windowMinutes` — the streaming
    * attribution pattern. Both sides carry watermarks and the join
    * condition bounds event-time distance, so Spark can expire join
    * state (unbounded stream-stream joins are rejected by the planner;
    * the interval is what makes state finite). Derived twice from ONE
    * source stream (self-join on different filters — supported, each
    * side keeps its own state store).
    */
  def clickViewAttribution(events: DataFrame, windowMinutes: Int = 30,
                           watermark: String = "2 hours"): DataFrame = {
    val clicks = withEventTime(events)
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts_us").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val views = withEventTime(events)
      .filter(col("event_type") === "view")
      .select(col("user_id").as("view_user"), col("value").as("view_value"),
        col("ts_us").as("view_ts"))
      .withWatermark("view_ts", watermark)
    clicks.join(views,
      col("user_id") === col("view_user") &&
        col("view_ts") <= col("click_ts") &&
        col("view_ts") >= col("click_ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("view_ts"), col("view_value"))
  }

  /** Streaming AS-OF enrichment: attach to each click the SINGLE most
    * recent view by the same user within `lookbackMinutes` — the
    * stream-side analogue of AsOfJoin.backward + tolerance (q38/q74
    * semantics), the feature-pipeline shape ("most recent profile
    * snapshot at event time") batch as-of covers offline.
    *
    * Composition, both stages Catalyst-native stateful operators:
    *   1. late-bounded stream-stream interval join (state bounded by
    *      watermark + lookback interval, exactly clickViewAttribution's
    *      envelope) emitting ALL views within the lookback;
    *   2. event-time-windowed argmax — group by (click window,
    *      click_id) and keep the match with max_by view_ts, with
    *      view_ts DESC, view_value DESC as the deterministic tie-break
    *      (the batch rightTieBreak convention). The window key is what
    *      licenses append-mode emission downstream of a join (chained
    *      stateful operators need an event-time window key to know
    *      when a group is final).
    *
    * Semantics note: inner as-of — clicks with NO view inside the
    * lookback produce no row (the batch form emits them with null
    * payload; a streaming operator cannot emit "no match yet" before
    * the watermark closes the group, and emitting nulls at close is a
    * policy choice left to the caller's outer reconciliation).
    * StreamingSpec pins equivalence with the batch as-of's MATCHED
    * subset.
    *
    * Scale: join state is |views in lookback+watermark| + |clicks in
    * watermark| per user partition; the argmax state is one small
    * struct per open (window, click) group — both watermark-evicted.
    */
  def asofEnrichment(events: DataFrame, lookbackMinutes: Int = 30,
                     watermark: String = "2 hours"): DataFrame = {
    val matches = clickViewAttribution(events, lookbackMinutes, watermark)
    matches
      .groupBy(window(col("click_ts"), "1 hour"), col("click_id"))
      .agg(
        first(col("user_id")).as("user_id"),
        first(col("click_ts")).as("click_ts"),
        max_by(struct(col("view_ts"), col("view_value")),
          struct(col("view_ts"), col("view_value"))).as("__best"))
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("__best.view_ts").as("view_ts"),
        col("__best.view_value").as("view_value"))
  }

  // ---- custom state: flatMapGroupsWithState ---------------------------

  final case class SessionState(start: Long, last: Long, n: Long) // ns epoch
  final case class SessionOut(user_id: Long, session_start_ns: Long,
                              session_end_ns: Long, n_events: Long)

  /** Same 30-minute-gap sessionization, but with EXPLICIT state — the
    * escape hatch for session semantics session_window can't express
    * (per-session feature vectors, custom eviction, early emission).
    * State per user: (start, last-seen, count) of the open session;
    * closed sessions are emitted when a later event crosses the gap or
    * the event-time timeout fires after the watermark passes.
    *
    * Works identically over a bounded stream OR a batch Dataset run
    * through the streaming runtime; StreamingSpec pins equivalence with
    * the lag-based batch query and the session_window variant.
    */
  def sessionizeCustomState(events: DataFrame, gapNs: Long = 1800L * 1000000000L,
                            watermark: String = "2 hours"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[SessionOut]

    // the watermark column must survive into the grouped Dataset —
    // session logic runs on exact ns longs, ts_us exists for the
    // watermark/timeout machinery
    val typed: Dataset[(Long, Long, java.sql.Timestamp)] = withEventTime(events)
      .withWatermark("ts_us", watermark)
      .select(col("user_id"), col("ts"), col("ts_us"))
      .as[(Long, Long, java.sql.Timestamp)]

    def fn(userId: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
           state: GroupState[SessionState]): Iterator[SessionOut] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      if (state.hasTimedOut) {
        state.getOption.foreach(s =>
          out += SessionOut(userId, s.start, s.last, s.n))
        state.remove()
      } else {
        // micro-batch may deliver unordered events for the group
        val sorted = rows.map(_._2).toArray.sorted
        var cur = state.getOption
        sorted.foreach { t =>
          cur match {
            case Some(s) if t - s.last <= gapNs =>
              // min/max, not plain assignment: a late-but-within-watermark
              // event from a later micro-batch may precede the stored
              // session; regressing `last` would split future sessions
              // that the batch (fully-ordered) semantics keeps together
              cur = Some(SessionState(math.min(s.start, t), math.max(s.last, t), s.n + 1))
            case Some(s) =>
              out += SessionOut(userId, s.start, s.last, s.n)
              cur = Some(SessionState(t, t, 1))
            case None =>
              cur = Some(SessionState(t, t, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // close the open session once the watermark passes last + gap
          state.setTimeoutTimestamp((s.last + gapNs) / 1000000L)
        }
      }
      out.iterator
    }

    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
      .toDF()
  }
}
