package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Linear quality classifier: partition invariance, threshold
  * semantics, weight-table contract. Cross-engine value equality is
  * the q93 oracle gate's job.
  */
class QualityModelSpec extends SparkTestBase {

  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select($"doc_id", $"text")

  test("score is a pure per-row function: identical across partitionings") {
    def scored(parts: Int) =
      QualityModel.classify(docs.repartition(parts), $"text")
        .select($"doc_id", $"quality_score")
        .as[(Long, Double)].collect().sortBy(_._1).toSeq
    val one = scored(1)
    assert(one.nonEmpty)
    assert(scored(13) == one && scored(32) == one)
  }

  test("threshold splits the corpus; keep == (score >= threshold) row-for-row") {
    val out = QualityModel.classify(docs, $"text", threshold = 0.0)
      .select($"quality_score", $"keep").as[(Double, Boolean)].collect()
    assert(out.forall { case (s, k) => k == (s >= 0.0) })
    val kept = out.count(_._2)
    assert(kept > 0 && kept < out.length,
      s"fixture should split on the default threshold, kept $kept/${out.length}")
    // a prose-heavy row outscores a digit-heavy row under the
    // checked-in reference weights
    val pair = Seq(
      (1L, "the cat sat on the mat and the dog is a friend of the house"),
      (2L, "4831 9982 1203 5561 7730 0021 8859"))
      .toDF("doc_id", "text")
    val s = QualityModel.classify(pair, $"text")
      .select($"doc_id", $"quality_score").as[(Long, Double)].collect().toMap
    assert(s(1L) > s(2L))
  }

  test("weight table contract: intercept first, names bound positionally, mismatches rejected") {
    val df = Seq((1L, "some text here")).toDF("doc_id", "text")
    // doubling every weight doubles the score exactly (linearity)
    val w2 = QualityModel.defaultWeights.map { case (n, w) => (n, w * 2) }
    val base = QualityModel.classify(df, $"text")
      .select($"quality_score").as[Double].head()
    val doubled = QualityModel.classify(df, $"text", weights = w2)
      .select($"quality_score").as[Double].head()
    assert(math.abs(doubled - 2 * base) < 1e-12)
    intercept[IllegalArgumentException] {
      QualityModel.score($"text", QualityModel.defaultWeights.tail)
    }
    intercept[IllegalArgumentException] {
      QualityModel.score($"text",
        QualityModel.defaultWeights.map { case (n, w) => (n.reverse, w) })
    }
  }
}
