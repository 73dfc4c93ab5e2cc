package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** KMV sketch aggregate: k smallest DISTINCT hashes, partition-invariant. */
class KmvSketchAggSpec extends SparkTestBase {
  import spark.implicits._

  test("kMinima returns the k smallest distinct values, sorted") {
    val vals = Seq(9L, 3L, 7L, 3L, 1L, 8L, 1L, 5L, 2L, 6L).toDF("h")
    val out = vals.agg(KmvSketchAgg.kMinima($"h", 4)).as[Seq[Long]].head()
    assert(out == Seq(1L, 2L, 3L, 5L))
  }

  test("fewer than k distinct values yields the full distinct set") {
    val vals = Seq(4L, 4L, 2L, 2L, 9L).toDF("h")
    val out = vals.agg(KmvSketchAgg.kMinima($"h", 8)).as[Seq[Long]].head()
    assert(out == Seq(2L, 4L, 9L))
  }

  test("result is invariant to partitioning (merge path exercised)") {
    val data = (1 to 1000).map(i => MixHash64.splitmix64(i.toLong))
    val expected = data.distinct.sorted.take(16)
    for (parts <- Seq(1, 3, 8)) {
      val out = data.toDF("h").repartition(parts)
        .agg(KmvSketchAgg.kMinima($"h", 16)).as[Seq[Long]].head()
      assert(out == expected, s"parts=$parts")
    }
  }

  test("grouped sketch: per-group minima independent") {
    val df = Seq(("a", 5L), ("a", 1L), ("a", 9L), ("b", 2L), ("b", 2L), ("b", 8L))
      .toDF("g", "h")
    val out = df.groupBy($"g").agg(KmvSketchAgg.kMinima($"h", 2).as("m"))
      .orderBy($"g").as[(String, Seq[Long])].collect()
    assert(out.toSeq == Seq(("a", Seq(1L, 5L)), ("b", Seq(2L, 8L))))
  }
}
