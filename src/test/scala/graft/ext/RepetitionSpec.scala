package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Gopher repetition signals: hand-computed coverage values, the
  * short-doc fallback, and the cascade verdict (the arithmetic gate
  * q176/q177 pins cross-engine on real data).
  */
class RepetitionSpec extends SparkTestBase {

  import spark.implicits._

  private val docs = Seq(
    (1L, "click here click here click here click here"),
    (2L, "spam spam spam spam spam spam spam spam"),
    (3L, "the arctic tern migrates farther than any other bird"),
    (4L, "tiny doc")).toDF("doc_id", "text")

  test("gramRepetition: hand-computed bigram coverage") {
    val out = QualityFilter.gramRepetition(docs, $"doc_id", $"text", ns = Seq(2))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // doc 1: 7 sliding bigrams — "click here"×4 (len 10), "here click"×3
    assert(out(1L) == ((7L, 40L, 70L)), out(1L).toString)
    // doc 2: "spam spam"×7 (len 9)
    assert(out(2L) == ((7L, 63L, 63L)), out(2L).toString)
    // doc 3: 8 distinct bigrams, top = the longest one ("migrates farther", 16)
    assert(out(3L)._1 == 8L && out(3L)._3 == 0L, out(3L).toString)
    assert(out(3L)._2 == 16L, out(3L).toString)
  }

  test("gramRepetition: docs shorter than n contribute the whole join as one gram") {
    val out = QualityFilter.gramRepetition(docs, $"doc_id", $"text", ns = Seq(5))
      .filter($"doc_id" === 4L).collect()(0)
    assert(out.getLong(2) == 1L && out.getLong(3) == 8L && out.getLong(4) == 0L,
      out.toString) // "tiny doc" joined, len 8, count 1
  }

  test("lineRepetition: duplicate rows and character mass, blanks dropped") {
    val d = Seq(
      (1L, "alpha line\nbeta line\nalpha line\n\n   \nalpha line"),
      (2L, "one\ntwo\nthree"),
      (3L, "dup\ndup\ndup\ndup")).toDF("doc_id", "text")
    val out = QualityFilter.lineRepetition(d, $"doc_id", $"text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == ((4L, 2L, 39L, 20L)), out(1L).toString)
    assert(out(2L) == ((3L, 0L, 11L, 0L)), out(2L).toString)
    assert(out(3L) == ((4L, 3L, 12L, 9L)), out(3L).toString)
  }

  test("repetitionPasses: repetitive docs fail, clean prose passes") {
    val d = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),       // gram-dup fail
      (2L, "dup line\ndup line\ndup line\ndup line"),        // line-dup fail
      // clean prose at the length the paper's cascade applies to
      // (the ≥50-word filter runs first; a 10-word doc's longest
      // unique trigram alone exceeds 18% of its characters)
      (3L, "the arctic tern migrates farther than any other bird known\n" +
           "crossing open oceans high deserts and violent storm systems\n" +
           "navigating by sun position magnetic fields and star patterns\n" +
           "resting briefly on remote islands before continuing south\n" +
           "covering roughly seventy thousand kilometres in a single year\n" +
           "researchers tracking them report consistent routes across decades"))
      .toDF("doc_id", "text")
    val out = QualityFilter.repetitionPasses(d, $"doc_id", $"text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L), out.toString)
  }
}
