package graft

/** Dev tool: print the plan of a SparkEntry query.
  *
  *   runMain graft.PlanDump <sfDir> <queryName>...
  *
  * Prints `explain("formatted")` output (operator list with pushed
  * filters / read schema / join strategy details — what the round's
  * plans/ artifacts record); SPARK_GRAFT_PLAN_OUT=<dir> additionally
  * writes each query's plan to <dir>/<queryName><SPARK_GRAFT_PLAN_SUFFIX>.txt.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val outDir = sys.env.get("SPARK_GRAFT_PLAN_OUT")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "")
    args.drop(1).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"===== $name =====")
      println(plan)
      outDir.foreach { d =>
        new java.io.File(d).mkdirs()
        java.nio.file.Files.write(
          java.nio.file.Paths.get(d, s"$name$suffix.txt"),
          plan.getBytes("UTF-8"))
      }
    }
    spark.stop()
  }
}
