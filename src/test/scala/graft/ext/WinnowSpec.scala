package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Winnowing: column face ≡ DataFrame face, the shared-substring
  * guarantee, and the pair join's df cap.
  */
class WinnowSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "a completely different sentence with nothing shared here"),
    (3L, "the quick brown fox jumps over the sleepy cat"), // shares a long prefix with 1
    (4L, "short")
  ).toDF("id", "body")

  test("column face and DataFrame face select identical fingerprints") {
    val fromCol = docs.select(col("id"),
        explode(TextAnalysis.winnowFingerprintsPortable(col("body"), 5, 4)).as("fp"))
      .distinct().as[(Long, Long)].collect().toSet
    val fromDf = TextAnalysis.winnowFingerprintsDf(docs, col("id"), col("body"), 5, 4)
      .as[(Long, Long)].collect().toSet
    assert(fromCol == fromDf)
  }

  test("documents sharing a long substring share fingerprints; disjoint ones do not pair") {
    val pairs = TextAnalysis.winnowPairs(docs, col("id"), col("body"),
        k = 5, w = 4, minShared = 3, maxDf = 4)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 3L)), s"got $pairs")
    assert(!pairs.exists { case (a, b) => a == 2L || b == 2L }, s"got $pairs")
  }

  test("an exact duplicate shares every fingerprint with its source") {
    val withDup = docs.unionAll(Seq((10L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "body"))
    val fps = TextAnalysis.winnowFingerprintsDf(withDup, col("id"), col("body"))
    val of1 = fps.filter(col("id") === 1).select("fp").as[Long].collect().toSet
    val of10 = fps.filter(col("id") === 10).select("fp").as[Long].collect().toSet
    assert(of1 == of10 && of1.nonEmpty)
  }

  test("ubiquitous fingerprints are excluded by the df cap") {
    // every doc shares the token "common12345" → its grams have df = 4 > maxDf = 2
    val boiler = (1 to 4).map(i => (i.toLong, s"common12345 unique text nr $i padded out"))
      .toDF("id", "body")
    val pairs = TextAnalysis.winnowPairs(boiler, col("id"), col("body"),
      k = 5, w = 4, minShared = 1, maxDf = 2)
    assert(pairs.count() == 0)
  }
}
