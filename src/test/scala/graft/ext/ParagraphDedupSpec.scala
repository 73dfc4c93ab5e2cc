package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Paragraph-level exact dedup: corpus-duplicated paragraphs removed
  * from every document, structure preserved, all docs survive.
  */
class ParagraphDedupSpec extends SparkTestBase {

  import spark.implicits._

  private val footer = "Subscribe to our newsletter"

  test("a boilerplate paragraph shared across docs is cut from all of them") {
    val docs = Seq(
      (1L, s"unique body one\n\n$footer"),
      (2L, s"unique body two\n\n$footer"),
      (3L, "unique body three")).toDF("doc_id", "text")
    val out = ParagraphDedup.dedupParagraphs(docs, $"doc_id", $"text")
      .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "unique body one", 1L, 1L),
      (2L, "unique body two", 1L, 1L),
      (3L, "unique body three", 1L, 0L)))
  }

  test("whole-document duplicates empty out but stay in the corpus") {
    val docs = Seq(
      (1L, "same exact content"),
      (2L, "same exact content"),
      (3L, "different")).toDF("doc_id", "text")
    val out = ParagraphDedup.dedupParagraphs(docs, $"doc_id", $"text")
      .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq((1L, "", 0L, 1L), (2L, "", 0L, 1L), (3L, "different", 1L, 0L)))
  }

  test("a doc repeating its OWN paragraph is not cut (df counts distinct docs)") {
    val docs = Seq(
      (1L, "repeat me\n\nrepeat me"),
      (2L, "other")).toDF("doc_id", "text")
    val out = ParagraphDedup.dedupParagraphs(docs, $"doc_id", $"text")
      .filter($"id" === 1L).as[(Long, String, Long, Long)].head()
    assert(out == ((1L, "repeat me\n\nrepeat me", 2L, 0L)))
  }

  test("paragraph order and blank separators survive; minDf raises the bar") {
    val docs = Seq(
      (1L, s"alpha\n\n$footer\n\nomega"),
      (2L, footer), (3L, footer)).toDF("doc_id", "text")
    val out2 = ParagraphDedup.dedupParagraphs(docs, $"doc_id", $"text", minDf = 2)
      .filter($"id" === 1L).as[(Long, String, Long, Long)].head()
    assert(out2._2 == "alpha\n\nomega" && out2._4 == 1L)
    // at minDf=4 nothing is hot
    val out4 = ParagraphDedup.dedupParagraphs(docs, $"doc_id", $"text", minDf = 4)
      .agg(sum($"n_removed")).as[Long].head()
    assert(out4 == 0L)
  }

  test("result is partition-invariant") {
    val docs = (1L to 60L).map { i =>
      val extra = if (i % 3 == 0) s"\n\n$footer" else ""
      (i, s"body of document number $i$extra")
    }.toDF("doc_id", "text")
    val a = ParagraphDedup.dedupParagraphs(docs.repartition(1), $"doc_id", $"text")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    val b = ParagraphDedup.dedupParagraphs(docs.repartition(7, $"text"), $"doc_id", $"text")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
    assert(a.count(_._4 > 0) == 20)
  }
}
