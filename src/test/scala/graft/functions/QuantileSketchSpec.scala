package graft.functions

import graft.SparkTestBase
import graft.ext.{MinHashLsh, QualityFilter}
import org.apache.spark.sql.functions._

/** Mergeable bounded quantile sketch: partition invariance (the
  * property KLL/t-digest cannot give), exact-count semantics, and the
  * measured rank-error bound vs the exact percentile path.
  */
class QuantileSketchSpec extends SparkTestBase {

  import spark.implicits._

  private def hashOf(c: org.apache.spark.sql.Column) =
    MinHashLsh.portableHash32(c.cast("long").cast("string"))

  test("sample builder casts inputs: int hash / int value columns work, matching the pre-cast form") {
    val df = (1 to 500).map(i => (i % 97, i % 50)).toDF("h", "v")
    def rows(s: org.apache.spark.sql.DataFrame) =
      s.select(explode(col("s")).as("e")).select(col("e.value"), col("e.count"))
        .as[(Double, Long)].collect().toSeq
    // raw IntegerType columns — previously a runtime ClassCastException
    val auto = rows(df.agg(QuantileSketchAgg.sample($"h", $"v", 16).as("s")))
    val explicitCast = rows(df.agg(
      QuantileSketchAgg.sample($"h".cast("long"), $"v".cast("double"), 16).as("s")))
    assert(auto == explicitCast && auto.nonEmpty)
  }

  test("sketch is a pure function of the multiset: identical across partitionings") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map(_ => rnd.nextInt(300).toLong)
    val df = rows.toDF("v")
    def sket(parts: Int) =
      df.repartition(parts)
        .agg(QuantileSketchAgg.sample(hashOf($"v"), $"v".cast("double"), 64).as("s"))
        .select(explode($"s").as("e")).select($"e.value", $"e.count")
        .as[(Double, Long)].collect().toSeq
    val one = sket(1)
    assert(one.length == 64)
    assert(sket(13) == one && sket(32) == one,
      "sketch state must be merge-order invariant")
  }

  test("small domains are captured exactly with exact counts") {
    // 10 distinct values < k=32 → the sketch IS the full histogram
    val rows = (1 to 1000).map(i => (i % 10).toLong)
    val out = rows.toDF("v").repartition(9)
      .agg(QuantileSketchAgg.sample(hashOf($"v"), $"v".cast("double"), 32).as("s"))
      .select(explode($"s").as("e")).select($"e.value", $"e.count")
      .as[(Double, Long)].collect().toSeq
    assert(out == (0 until 10).map(d => (d.toDouble, 100L)))
  }

  test("survivor counts are exact, not approximate") {
    // skewed multiplicities: value v appears v times
    val rows = (1L to 100L).flatMap(v => Seq.fill(v.toInt)(v))
    val out = rows.toDF("v").repartition(11)
      .agg(QuantileSketchAgg.sample(hashOf($"v"), $"v".cast("double"), 20).as("s"))
      .select(explode($"s").as("e")).select($"e.value", $"e.count")
      .as[(Double, Long)].collect().toSeq
    assert(out.length == 20)
    out.foreach { case (v, c) => assert(c == v.toLong, s"value $v carried count $c") }
  }

  test("measured rank error of sketch cutoffs stays within the O(1/sqrt k) envelope") {
    val rnd = new scala.util.Random(11)
    // lognormal-ish skewed metric, the shape of doc-length columns
    val rows = (1 to 20000).map(_ => math.exp(rnd.nextGaussian() * 1.2 + 5.0).toLong)
    val df = rows.toDF("v").repartition(16)
    val sorted = rows.sorted
    for (p <- Seq(0.1, 0.5, 0.9); k <- Seq(256, 1024)) {
      val cut = df.agg(QuantileSketchAgg.sample(hashOf($"v"), $"v".cast("double"), k).as("s"))
        .select(explode($"s").as("e")).select($"e.value".as("v"), $"e.count".as("c"))
        .select($"v", sum($"c").over(org.apache.spark.sql.expressions.Window.orderBy($"v")
          .rowsBetween(Long.MinValue, 0)).as("cum"),
          sum($"c").over(org.apache.spark.sql.expressions.Window
            .rowsBetween(Long.MinValue, Long.MaxValue)).as("tot"))
        .agg(min(when($"cum".cast("double") >= lit(p) * $"tot".cast("double"), $"v")))
        .as[Double].head()
      // true rank of the estimated cutoff
      val rank = sorted.count(_ <= cut).toDouble / sorted.length
      val eps = 3.0 / math.sqrt(k.toDouble) // ~3σ sampling envelope
      assert(math.abs(rank - p) <= eps,
        s"p=$p k=$k: cutoff $cut has true rank $rank (ε=$eps)")
    }
  }

  test("quantileBandSketch keeps a band close to the exact path and attaches cutoffs") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 8000).map(i => (i.toLong, 50L + rnd.nextInt(1000).toLong))
    val df = rows.toDF("id", "n")
    val approx = QualityFilter.quantileBandSketch(df, $"n", hashOf($"n"), 0.1, 0.9, k = 512)
    val exact = QualityFilter.quantileBand(df, $"n", 0.1, 0.9)
    assert(approx.columns.toSeq == Seq("id", "n", "cut_lo", "cut_hi"))
    val a = approx.count().toDouble
    val e = exact.count().toDouble
    assert(math.abs(a - e) / e < 0.15, s"approx kept $a rows vs exact $e")
    // the sketch path never global-sorts the data: no exchange feeding a Sort
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"), plan)
  }
}
