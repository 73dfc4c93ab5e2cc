package graft.streaming

import graft.SparkTestBase
import graft.{ExtQueries, Tables}
import org.apache.spark.sql.functions._

/** Streaming specs run the event queries through Structured Streaming
  * (memory sink, processAllAvailable) and cross-check the streamed
  * results against their batch equivalents — same data, two execution
  * models, identical answers.
  */
class StreamingSpec extends SparkTestBase {

  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  /** FileStreamSource wants a directory; stage the single-file table. */
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("hourlyRollup streams the same totals as the batch rollup") {
    val stream = EventStream.readStream(spark, eventsDir)
    val q = EventStream.hourlyRollup(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("rollup").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("rollup")
        .agg(sum("n_events")).as[Long].head()
      val batch = Tables.events(spark, sfDir).count()
      assert(streamed == batch)
      // spot-check one bucket against the batch oracle query
      val batchHourly = ExtQueries.q26.run(spark, sfDir)
      val streamedBuckets = spark.table("rollup").count()
      assert(streamedBuckets == batchHourly.count())
    } finally q.stop()
  }

  test("sessionize (session_window) matches the batch lag-gap session count") {
    val stream = EventStream.readStream(spark, eventsDir)
    val q = EventStream.sessionize(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("sessions").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sessions")
        .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      val batch = ExtQueries.q27.run(spark, sfDir)
        .select("user_id", "n_sessions")
      val diff = streamed.join(batch, "user_id")
        .filter(streamed("n_sessions") =!= batch("n_sessions"))
      assert(diff.count() == 0)
      assert(streamed.count() == batch.count())
    } finally q.stop()
  }
}
