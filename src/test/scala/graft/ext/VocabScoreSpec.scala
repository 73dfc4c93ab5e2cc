package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Vocabulary-coverage quality scoring. */
class VocabScoreSpec extends SparkTestBase {

  import spark.implicits._

  test("prose scores high, planted gibberish scores low, arithmetic is exact") {
    val prose = (1L to 20L).map(i => (i, "the quick brown fox jumps over the lazy dog"))
    val junk = Seq((100L, "xqzt vvkpw zzzyx qqjjm wwvvx"))
    val docs = (prose ++ junk).toDF("doc_id", "text")
    val out = VocabScore.coverage(docs, $"doc_id", $"text", topN = 8)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // corpus vocab = the 8 prose words (each appears 20x; "the" 40x);
    // junk tokens appear once each and lose every tie to prose words
    val proseRow = out.find(_._1 == 1L).get
    assert(proseRow._2 == 9L && proseRow._3 == 9L && proseRow._4 == 1.0)
    val junkRow = out.find(_._1 == 100L).get
    assert(junkRow._2 == 5L && junkRow._3 == 0L && junkRow._4 == 0.0)
  }

  test("top-N boundary ties break deterministically (count desc, token asc)") {
    // four tokens, all count 2 → topN=2 must take the two lexicographically first
    val docs = Seq((1L, "aa bb"), (2L, "cc dd"), (3L, "aa bb"), (4L, "cc dd"))
      .toDF("doc_id", "text")
    val out = VocabScore.coverage(docs, $"doc_id", $"text", topN = 2)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(r => r._1 -> r._3).toSeq ==
      Seq(1L -> 2L, 2L -> 0L, 3L -> 2L, 4L -> 0L))
  }

  test("coverageWithVocab against a stored vocabulary equals the self-contained form") {
    val docs = (1L to 30L).map(i => (i, s"alpha beta gamma word$i")).toDF("doc_id", "text")
    val vocab = VocabScore.topVocabulary(docs, $"doc_id", $"text", topN = 3)
    assert(vocab.as[String].collect().sorted.toSeq == Seq("alpha", "beta", "gamma"))
    // round-trip through parquet: the production single-pass path
    val dir = java.nio.file.Files.createTempDirectory("vocab").toString
    vocab.write.mode("overwrite").parquet(dir)
    val a = VocabScore.coverageWithVocab(docs, $"doc_id", $"text",
        spark.read.parquet(dir))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val b = VocabScore.coverage(docs, $"doc_id", $"text", topN = 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(a == b)
    assert(a.forall(r => r._2 == 4L && r._3 == 3L && r._4 == 0.75))
  }

  test("result is partition-invariant; zero-token docs yield no row") {
    val docs = ((1L to 50L).map(i => (i, s"common words here plus token$i"))
      ++ Seq((99L, "   "))).toDF("doc_id", "text")
    val a = VocabScore.coverage(docs.repartition(1), $"doc_id", $"text", 4)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val b = VocabScore.coverage(docs.repartition(7, $"text"), $"doc_id", $"text", 4)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(a == b)
    assert(a.length == 50 && !a.exists(_._1 == 99L))
    // "common","words","here","plus" dominate (50x each) → 4/5 coverage
    assert(a.forall(r => r._2 == 5L && r._3 == 4L && r._4 == 0.8))
  }
}
