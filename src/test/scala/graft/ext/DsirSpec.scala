package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** DSIR importance weighting: in-domain documents out-weigh
  * off-domain ones under a target/raw model pair, the selection cut
  * is exact-rank deterministic, and the weight is a total function
  * (JM scores are floored by the unigram back-off).
  */
class DsirSpec extends SparkTestBase {

  import spark.implicits._

  private val domain = Seq(
    "the model trains on clean data",
    "clean data makes the model strong",
    "a strong model needs clean data")
  private val offDomain = Seq(
    "rain fell over the quiet harbor",
    "boats rocked in the grey swell",
    "gulls wheeled above the pier")

  private def corpus = (0 until 30).map { i =>
    val s = if (i % 2 == 0) domain(i % 3) else offDomain(i % 3)
    (i.toLong, s)
  }.toDF("doc_id", "text")

  test("target-domain documents carry weight > 1, off-domain < 1, and the top cut finds them") {
    val target = corpus.filter($"text".contains("model"))
    val tm = NgramLm.train(target, $"text")
    val rm = NgramLm.train(corpus, $"text")
    val probes = Seq(
      (100L, "the model trains on clean data"),
      (101L, "boats rocked above the quiet pier")).toDF("doc_id", "text")
    val w = Dsir.importanceWeights(probes, $"doc_id", $"text", tm, rm)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("weight")).toMap
    info(f"weights: in-domain=${w(100L)}%.4f off-domain=${w(101L)}%.4f")
    assert(w(100L) > 1.0, s"target model must prefer its own domain, got ${w(100L)}")
    assert(w(101L) < 1.0, s"raw model must prefer off-domain text, got ${w(101L)}")

    val sel = Dsir.selectTopFraction(
        Dsir.importanceWeights(probes, $"doc_id", $"text", tm, rm),
        $"doc_id", $"weight", 1, 2)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("selected")).toMap
    assert(sel(100L) == 1L && sel(101L) == 0L)
  }

  test("selection fraction is integer-exact and tie-stable") {
    val weighted = Seq(
      (1L, 3.0), (2L, 2.0), (3L, 2.0), (4L, 1.0)).toDF("doc_id", "weight")
    // 1/4 of 4 rows = exactly 1: only the top row
    val one = Dsir.selectTopFraction(weighted, $"doc_id", $"weight", 1, 4)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("selected")).toMap
    assert(one == Map(1L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
    // 1/2 of 4 = 2: the score tie at 2.0 breaks on the lower id
    val half = Dsir.selectTopFraction(weighted, $"doc_id", $"weight", 1, 2)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("selected")).toMap
    assert(half == Map(1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 0L))
  }

  test("weights are defined for fully-OOV candidates (strictly positive JM floor)") {
    val tm = NgramLm.train(corpus.limit(6), $"text")
    val rm = NgramLm.train(corpus, $"text")
    val w = Dsir.importanceWeights(
        Seq((1L, "zzq wwk vvm zzq")).toDF("doc_id", "text"),
        $"doc_id", $"text", tm, rm)
      .collect().head
    assert(w.getAs[Double]("score_raw") > 0.0)
    assert(!w.getAs[Double]("weight").isNaN && !w.getAs[Double]("weight").isInfinite)
  }
}
