package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Largest-remainder allocation + exact-budget stratified take: the
  * integer identities the q132 oracle gate relies on.
  */
class StratifiedBudgetSpec extends SparkTestBase {

  import spark.implicits._

  private def corpus(sizes: Map[String, Int]) =
    sizes.toSeq.sortBy(_._1).flatMap { case (g, n) =>
      (0 until n).map(i => (s"$g$i".hashCode.toLong.abs * 1000 + i, g))
    }.zipWithIndex.map { case ((_, g), i) => (i.toLong, g) }
      .toDF("doc_id", "stratum")

  test("quotas sum to exactly the budget and follow proportionality") {
    val df = corpus(Map("a" -> 50, "b" -> 30, "c" -> 20))
    val alloc = Sampling.allocateLargestRemainder(df, $"stratum", 37L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(alloc.values.sum == 37L, s"budget not exact: $alloc")
    // exact proportions are 18.5 / 11.1 / 7.4 — bases 18/11/7 leave one
    // seat; 'a' has the largest remainder (0.5)
    assert(alloc == Map("a" -> 19L, "b" -> 11L, "c" -> 7L), alloc.toString)
  }

  test("remainder ties break by stratum ascending") {
    // two equal strata, odd budget: remainders tie, 'a' wins the seat
    val df = corpus(Map("a" -> 10, "b" -> 10))
    val alloc = Sampling.allocateLargestRemainder(df, $"stratum", 5L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(alloc == Map("a" -> 3L, "b" -> 2L), alloc.toString)
  }

  test("budget == total gives every stratum its full size") {
    val df = corpus(Map("a" -> 7, "b" -> 13))
    val alloc = Sampling.allocateLargestRemainder(df, $"stratum", 20L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(alloc == Map("a" -> 7L, "b" -> 13L))
  }

  test("takeStratified returns exactly the quota per stratum, stable under repartition") {
    val df = corpus(Map("a" -> 40, "b" -> 25, "c" -> 15))
    val take = Sampling.takeStratified(df, $"stratum", $"doc_id", 23L, "s")
    val byStratum = take.collect().groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byStratum.values.sum == 23, byStratum.toString)
    val ids1 = take.collect().map(_.getLong(0)).sorted
    val ids2 = Sampling.takeStratified(df.repartition(9), $"stratum", $"doc_id", 23L, "s")
      .collect().map(_.getLong(0)).sorted
    assert(ids1.sameElements(ids2), "draw not partition-invariant")
  }

  test("different salts draw different samples of the same exact size") {
    val df = corpus(Map("a" -> 60, "b" -> 60))
    val s1 = Sampling.takeStratified(df, $"stratum", $"doc_id", 30L, "x")
      .collect().map(_.getLong(0)).toSet
    val s2 = Sampling.takeStratified(df, $"stratum", $"doc_id", 30L, "y")
      .collect().map(_.getLong(0)).toSet
    assert(s1.size == 30 && s2.size == 30)
    assert(s1 != s2, "salt must change the draw")
  }
}
