package graft
import org.apache.spark.sql.SparkSession

/** One local-session factory for every main (Verify, Bench, BenchOne,
  * ScaleCheck) — the config stanza (UTC, nanos-as-long for the events
  * table, AQE, partitions=cores) must stay identical across them or
  * results drift between the correctness and benchmark surfaces.
  */
object GraftSession {
  def local(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
