package graft

/** Dev tool: materialize a Blowup dir so BenchOne can profile a gate
  * at ×N scale without running the whole Bench tier machinery.
  *
  *   runMain graft.BlowupBuild <srcDir> <outDir> <times> [table...]
  */
object BlowupBuild {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val tables =
      if (args.length > 3) args.drop(3).toSet
      else Set("documents")
    println("[blowup] " + Blowup.build(spark, args(0), args(1), args(2).toInt,
      tables))
    spark.stop()
  }
}
