package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev tool: per-JOB wall breakdown of a SparkEntry query.
  *
  *   runMain graft.JobProfile <sfDir> <queryName>...
  *
  * Runs each query once untimed (JIT/codegen warm), then once under a
  * listener that records every Spark job's wall time, stage count and
  * task count — the view that tells a fixture-bound gate (many tiny
  * sequential jobs) apart from a data-bound one (few large jobs).
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    catch { case _: Throwable => }

    case class JobRec(id: Int, desc: String, var start: Long = 0L,
                      var end: Long = 0L, var nStages: Int = 0, var nTasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .filter(_.nonEmpty)
          .getOrElse(js.stageInfos.sortBy(_.stageId).lastOption
            .map(_.name).getOrElse(""))
        val r = JobRec(js.jobId, desc)
        r.start = js.time
        r.nStages = js.stageInfos.size
        r.nTasks = js.stageInfos.map(_.numTasks).sum
        jobs.put(js.jobId, r)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach(_.end = je.time)
      }
    }

    def drop(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }

    args.drop(1).foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm pass
      try { fn(spark, sfDir).count(): Unit } catch { case e: Throwable =>
        System.err.println(s"[jobprofile] $name warm failed: $e") }
      drop()
      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      // listener events are async; give the bus a moment to drain
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val recs = jobs.values.asScala.toSeq.sortBy(_.id)
      val jobWall = recs.map(r => (r.end - r.start) / 1e3).sum
      println(f"===== $name: $dt%.3f s total, ${recs.size} jobs, " +
        f"$jobWall%.3f s in-job ($n rows) =====")
      recs.foreach { r =>
        val w = (r.end - r.start) / 1e3
        println(f"  job ${r.id}%4d ${w}%8.3f s  stages=${r.nStages}%3d tasks=${r.nTasks}%5d  ${r.desc.take(100)}")
      }
      drop()
    }
    spark.stop()
  }
}
