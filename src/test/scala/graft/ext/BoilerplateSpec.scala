package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkTestBase {

  import spark.implicits._

  test("frequentGrams: df counts distinct docs; threshold filters") {
    val footer = "all rights reserved"
    val docs = (1 to 10).map(i => (i.toLong, s"unique words $i here $footer")) ++
      Seq((11L, "nothing shared at all"),
        // gram repeated INSIDE one doc must count once
        (12L, s"$footer $footer"))
    val out = Boilerplate.frequentGrams(docs.toDF("id", "t"), $"id", $"t",
        n = 3, minDf = 5L)
      .as[(String, Long)].collect().toMap
    assert(out("all rights reserved") == 11L) // 10 footers + doc 12
    assert(out.keys.forall(_ != "nothing shared at"))
    // "words N here" varies per doc -> below threshold
    assert(out.keySet.forall(g => g.contains("rights") || g.contains("reserved") ||
      g.contains("here all")))
  }

  test("hostTemplateStats: host-scoped df, cross-host footers don't count, within-doc repeats count once") {
    val docs = Seq(
      (1L, "a.com", "Lead one today. Shared footer here."),
      (2L, "a.com", "Lead two today. Shared footer here."),
      (3L, "a.com", "Shared footer here. Shared footer here. Fresh tail."),
      (4L, "b.com", "Shared footer here."), // same sentence, other host
      (5L, "b.com", "Entirely different text with no terminator"))
      .toDF("doc_id", "host", "text")
    val out = Boilerplate.hostTemplateStats(docs, col("doc_id"), col("host"),
        col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((2L, 1L)), out(1L).toString)
    assert(out(2L) == ((2L, 1L)), out(2L).toString)
    // doc 3's double footer counts once toward df; its distinct
    // sentences are the footer (common) and the fresh tail (not)
    assert(out(3L) == ((2L, 1L)), out(3L).toString)
    // b.com has the footer only once -> not a template there
    assert(out(4L) == ((1L, 0L)), out(4L).toString)
    assert(out(5L) == ((1L, 0L)), out(5L).toString)
  }
}
