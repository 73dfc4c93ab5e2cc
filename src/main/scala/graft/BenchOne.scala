package graft
import org.apache.spark.sql.SparkSession

/** Dev profiling main: time a subset of SparkEntry.queries repeatedly.
  *
  *   runMain graft.BenchOne <sfDir> <reps> <queryName>...
  *
  * Prints per-rep wall times so cold/warm effects are visible; the
  * driver-facing benchmark stays graft.Bench.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    catch { case _: Throwable => }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { rep =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[benchone] $name rep$rep: $dt%.3f s ($n rows)")
      }
    }
    spark.stop()
  }
}
