package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BloomSpec extends SparkTestBase {

  import spark.implicits._

  private val keys = (1 to 40).map(i => (i.toLong, s"member key number $i"))
  private val probes = (1 to 200).map(i => (1000L + i, s"probe value $i"))

  test("Bloom: no false negatives — every inserted key probes true") {
    val df = keys.toDF("id", "k")
    val bloom = Bloom.build(df, $"k", k = 3, words = 8)
    val hits = df.crossJoin(broadcast(bloom))
      .filter(Bloom.mightContain($"bloom", $"k", k = 3, words = 8))
      .count()
    assert(hits == keys.size)
  }

  test("Bloom: probe set behaves — misses dominate, FP rate bounded") {
    val bloom = Bloom.build(keys.toDF("id", "k"), $"k", k = 3, words = 8)
    // 40 keys * 3 probes into 256 bits: fill <= 38%, expected FP < 6%.
    // Deterministic (md5), so this is a fixed count, not a flaky bound;
    // the assert allows 4x the expectation to make the test's intent
    // (filter actually filters) robust to parameter tweaks.
    val fp = probes.toDF("id", "k").crossJoin(broadcast(bloom))
      .filter(Bloom.mightContain($"bloom", $"k", k = 3, words = 8))
      .count()
    assert(fp < probes.size / 4, s"false-positive count $fp out of ${probes.size}")
  }

  test("decontaminateExact: confirmed set == exact intersection, FPs flagged") {
    val eval = keys.toDF("id", "text")
    val contaminated = keys.take(7).map { case (i, t) => (500L + i, t) }
    val clean = probes.map { case (i, t) => (i, t) }
    val train = (contaminated ++ clean).toDF("id", "text")
    // undersized filter so FPs are plausible; correctness must hold anyway
    val out = Bloom.decontaminateExact(train, eval, $"id", $"text",
      k = 2, words = 1).as[(Long, Boolean)].collect()
    val confirmed = out.filter(_._2).map(_._1).toSet
    assert(confirmed == contaminated.map(_._1).toSet)
    // every unconfirmed candidate is a genuine non-member (FP of the
    // filter, not of the operator)
    val cleanIds = clean.map(_._1).toSet
    assert(out.filterNot(_._2).forall(r => cleanIds(r._1)))
  }
}
