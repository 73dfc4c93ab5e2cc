package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Exact ES weighted sampling without replacement: the min-of-w-draws
  * identities the q170 oracle gate relies on.
  */
class WeightedTakeSpec extends SparkTestBase {

  import spark.implicits._

  private def corpus = (1 to 300).map(i => (i.toLong, 1L + i % 7))
    .toDF("id", "wt")

  test("selection is deterministic and partition-invariant") {
    val a = Sampling.weightedTake(corpus, $"id", $"wt", k = 40, salt = "s")
      .select("id", "w", "draw").collect().toSeq
    val b = Sampling.weightedTake(corpus.repartition(13).orderBy(desc("id")),
        $"id", $"wt", k = 40, salt = "s")
      .select("id", "w", "draw").collect().toSeq
    assert(a == b)
    assert(a.size == 40)
  }

  test("draw equals the minimum over w explicit per-draw hashes") {
    val got = Sampling.weightedTake(corpus, $"id", $"wt", k = 300, salt = "x")
      .select("id", "draw").as[(Long, Long)].collect().toMap
    // brute force: explode each row into its w draws and take the min
    val brute = corpus
      .select($"id", explode(sequence(lit(1L), $"wt")).as("j"))
      .select($"id", MinHashLsh.portableHash32(
        concat($"id".cast("string"), lit(":x:"), $"j".cast("string"))).as("h"))
      .groupBy("id").agg(min("h").as("draw"))
      .as[(Long, Long)].collect().toMap
    assert(got == brute)
  }

  test("rows with weight < 1 never qualify; weight > maxWeight errors") {
    val withZero = Seq((1L, 0L), (2L, -3L), (3L, 2L)).toDF("id", "wt")
    val sel = Sampling.weightedTake(withZero, $"id", $"wt", k = 10)
      .select("id").as[Long].collect().toSeq
    assert(sel == Seq(3L))
    val huge = Seq((1L, 50L)).toDF("id", "wt")
    val e = intercept[Exception] {
      Sampling.weightedTake(huge, $"id", $"wt", k = 1, maxWeight = 10).collect()
    }
    assert(e.getMessage.contains("maxWeight"), e.getMessage)
  }

  test("inclusion frequency grows with weight across salts") {
    // two rows, weights 1 and 8, k=1: over 64 salts the heavy row must
    // win clearly more often (exact ES expectation: 8/9 of the time)
    val two = Seq((1L, 8L), (2L, 1L)).toDF("id", "wt")
    val wins = (0 until 64).map { s =>
      Sampling.weightedTake(two, $"id", $"wt", k = 1, salt = s"s$s")
        .select("id").as[Long].head()
    }
    val heavy = wins.count(_ == 1L)
    assert(heavy > 40, s"weight-8 row won only $heavy/64")
  }
}
