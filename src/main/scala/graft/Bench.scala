package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus)
    // untimed warm-up: initialize codegen, parquet footers, shuffle
    // machinery — JVM startup cost shouldn't land on whichever query
    // happens to run first
    // NonFatal only: an OOM/JVM fault must abort the run, not let it
    // report mis-timed numbers from a corrupted JVM; failures are
    // logged so a cold warm-up is visible in the driver tail
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    catch { case NonFatal(e) => System.err.println(s"[bench] warmup(scan) failed: $e") }
    // ...and the operator machinery the query set exercises beyond a
    // plain hash-agg: generate/explode, ObjectHashAggregate (signature
    // aggregates), collect_set, window functions, and the nested-loop
    // join path — their first codegen/JIT pass costs seconds and is JVM
    // infrastructure, not query work (ten in-memory rows, still untimed)
    try {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val tiny = (1L to 10L).map(i => (i, s"warm up row number $i")).toDF("id", "t")
      // every intermediate column feeds the final aggregate — column
      // pruning would otherwise drop the signature/collect_set aggs and
      // eliminate the window, leaving those paths cold
      tiny.select($"id", explode(graft.functions.NGrams.wordNGramSeq($"t", 2)).as("g"))
        .select($"id", xxhash64($"g").as("h"))
        .groupBy("id")
        .agg(graft.functions.MinHashAgg.minhash($"h", 8).as("sig"),
          collect_set($"h").as("s"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy($"id").orderBy($"id")))
        .crossJoin(tiny.select($"id".as("id2")))
        .filter($"id" < $"id2")
        .agg(sum(size($"sig") + size($"s") + $"rn")).collect()
    } catch { case NonFatal(e) => System.err.println(s"[bench] warmup(ops) failed: $e") }
    // Between timed queries: drop RDD blocks left behind by
    // localCheckpoint-based operators (LSH candidate sets, CC rounds).
    // Dataset.unpersist cannot free those (plan-level only), so without
    // this they accumulate across the ~60-query run and later queries
    // pay their GC pressure — r3 vs r4 showed identical code swinging
    // up to 6× on late-running queries. Cleanup runs OUTSIDE the timed
    // region; each query still pays for its own blocks.
    def dropResidualBlocks(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt.max(1)
    def timeOnce(dir: String, skip: Set[String]): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).filterNot(q => skip(q._1)).map {
        case (name, fn) =>
          val t0 = System.nanoTime()
          try { fn(spark, dir).count() }
          catch { case NonFatal(e) => System.err.println(s"[bench] $name failed: $e"); -1L }
          val dt = (System.nanoTime() - t0) / 1e9
          dropResidualBlocks()
          name -> dt
      }
    // min over reps: a single-shot wall time in a shared 32-thread JVM
    // is hostage to whichever GC pause lands on it; the per-query
    // minimum is the reproducible cost of the plan itself.
    def timeAll(dir: String, skip: Set[String]): Seq[(String, Double)] =
      (1 to reps).map(_ => timeOnce(dir, skip)).reduce { (a, b) =>
        a.zip(b).map { case ((n, x), (_, y)) => n -> math.min(x, y) }
      }
    def toJson(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")

    val results = timeAll(sfDir, Set.empty)
    val total = results.map(_._2).sum

    // second pass at ×10 synthetic scale: at the gate SF fixed cost
    // dominates, so data-proportional regressions hide; the blowup pass
    // is where super-linear growth shows. q34 is excluded BY DESIGN:
    // it is the exact all-pairs cosine oracle kernel (quadratic in the
    // corpus, documented as a bounded-slice rerank primitive) — its
    // scale path is the SRP-bucketed lshNearDupPairs. Disable the pass
    // with SPARK_GRAFT_X10=0.
    val x10Skip = Set("q34_embed_neardup")
    val x10Json =
      if (sys.env.getOrElse("SPARK_GRAFT_X10", "1") == "0") ""
      else try {
        val sfName = new java.io.File(sfDir).getName
        val x10Dir = Blowup.build(spark, sfDir,
          s"${sys.props("java.io.tmpdir")}/graft_x10_$sfName", times = 10)
        val r10 = timeAll(x10Dir, x10Skip)
        s""","x10_total":${r10.map(_._2).sum},"x10_queries":${toJson(r10)}""" +
          s""","x10_skipped":${x10Skip.map("\"" + _ + "\"").mkString("[", ",", "]")}"""
      } catch {
        case NonFatal(e) =>
          System.err.println(s"[bench] x10 pass failed: $e"); ""
      }

    println(s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"queries":${toJson(results)},"sf":"$sfDir"$x10Json}""")
    spark.stop()
  }
}
