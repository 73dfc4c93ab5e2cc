package graft.functions

import graft.SparkTestBase
import graft.ext.TextAnalysis
import org.apache.spark.sql.functions._

class SimHashAggSpec extends SparkTestBase {

  import spark.implicits._

  test("SimHashAgg equals the 64-conditional-sum formulation on real text") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").limit(200)
    val tok = docs.select($"doc_id".as("__id"),
      explode(TextAnalysis.tokens($"text")).as("__t"))
      .withColumn("__h", xxhash64(col("__t")))

    val viaAgg = tok.groupBy("__id")
      .agg(SimHashAgg.simhash(col("__h")).as("fp"))

    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("__h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i")
    }
    val wide = tok.groupBy("__id").agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 64).map { i =>
      when(col(s"b$i") >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a + b)
    val viaSums = wide.select(col("__id"), fp.as("fp"))

    val diff = viaAgg.as("a").join(viaSums.as("s"), "__id")
      .filter($"a.fp" =!= $"s.fp")
    assert(diff.count() == 0)
    assert(viaAgg.count() == 200)
  }

  test("SimHashAgg survives serialization across a repartition (merge path)") {
    val tok = (1 to 1000).map(i => (i % 7, s"tok$i")).toDF("k", "t")
      .repartition(16)
      .withColumn("h", xxhash64(col("t")))
    val one = tok.coalesce(1).groupBy("k").agg(SimHashAgg.simhash(col("h")).as("fp"))
    val many = tok.groupBy("k").agg(SimHashAgg.simhash(col("h")).as("fp"))
    val diff = one.as("a").join(many.as("b"), "k").filter($"a.fp" =!= $"b.fp")
    assert(diff.count() == 0)
  }
}
