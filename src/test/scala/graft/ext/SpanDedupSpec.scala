package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SpanDedupSpec extends SparkTestBase {

  import spark.implicits._

  private def clean(rows: Seq[(Long, String)], n: Int, minCount: Long = 2L) =
    SpanDedup.cleanRepeatedSpans(rows.toDF("doc_id", "text"), $"doc_id", $"text", n, minCount)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)

  test("SpanDedup: a span shared by two docs is cut from both, unique text survives") {
    val out = clean(Seq(
      (1L, "alpha beta gamma delta epsilon unique one tail"),
      (2L, "other prefix alpha beta gamma delta epsilon different end"),
      (3L, "totally unrelated words in this document here")), n = 5)
    // the 5-token span "alpha beta gamma delta epsilon" occurs twice
    assert(out(0) == ((1L, "unique one tail", 3L, 5L)))
    assert(out(1) == ((2L, "other prefix different end", 4L, 5L)))
    assert(out(2)._3 == 7L && out(2)._4 == 0L) // untouched
  }

  test("SpanDedup: a doc repeating its OWN span is cut (multiplicity, not df)") {
    val out = clean(Seq(
      (1L, "a b c d e x a b c d e y"),
      (2L, "completely different words here now then")), n = 5)
    assert(out(0)._2 == "x y" && out(0)._4 == 10L)
    assert(out(1)._4 == 0L)
  }

  test("SpanDedup: spans LONGER than n are removed whole (window union covers them)") {
    val long = "p q r s t u v w" // 8-token duplicated span
    val out = clean(Seq(
      (1L, s"start1 one $long end1"),
      (2L, s"start2 two $long end2 extra")), n = 5)
    assert(out(0)._2 == "start1 one end1")
    assert(out(1)._2 == "start2 two end2 extra")
  }

  test("SpanDedup: identical whole documents empty out; short docs are never cut") {
    val out = clean(Seq(
      (1L, "dup dup dup dup dup dup"),
      (2L, "dup dup dup dup dup dup"),
      (3L, "too short")), n = 5)
    assert(out(0) == ((1L, "", 0L, 6L)))
    assert(out(1) == ((2L, "", 0L, 6L)))
    assert(out(2) == ((3L, "too short", 2L, 0L)))
  }

  test("SpanDedup: result is partition-invariant") {
    val docs = (1L to 40L).map { i =>
      val span = if (i % 4 == 0) " shared span alpha beta gamma delta epsilon" else ""
      (i, s"document $i body token$i more$i filler$i$span")
    }
    val df = docs.toDF("doc_id", "text")
    val a = SpanDedup.cleanRepeatedSpans(df.repartition(1), $"doc_id", $"text", 5)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    val b = SpanDedup.cleanRepeatedSpans(df.repartition(7, $"text"), $"doc_id", $"text", 5)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
    assert(a.count(_._4 > 0) == 10) // exactly the planted docs were cut
  }
}
