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

  test("densityStats drops nav/footer chrome the flat regex strip keeps") {
    val prose = "The quick brown fox jumps over the lazy dog near the river bank."
    val page = "<html><body>" +
      "<div class=nav><a href=/>Home</a> <a href=/a>About the team</a> <a href=/c>Contact</a></div>" +
      s"<p>$prose</p>" +
      "<div class=footer>Copyright <a href=/t>terms</a> <a href=/p>privacy</a></div>" +
      "<script>var x = 'nav junk';</script></body></html>"
    val docs = Seq((1L, page)).toDF("doc_id", "html")
    val out = Boilerplate.densityStats(docs, col("doc_id"), col("html"))
      .collect().head
    // three nonblank segments: nav, prose, footer
    assert(out.getLong(1) == 3L, s"n_segments=${out.getLong(1)}")
    // only the prose survives the density + length rules
    assert(out.getLong(2) == 1L, s"n_kept=${out.getLong(2)}")
    assert(out.getString(3) == prose)
    // the flat regex face keeps the chrome — the gap this operator closes
    val flat = docs.select(TextAnalysis.htmlToText(col("html")).as("t"))
      .collect().head.getString(0)
    assert(flat.contains("Home") && flat.contains("Copyright"))
    assert(!out.getString(3).contains("Home") &&
      !out.getString(3).contains("Copyright"))
  }

  test("densityStats rule boundaries: length cut, density equality, pure links, null html") {
    val docs = Seq(
      (1L, "<p>hi</p>"),                      // len 2 < minChars 5
      (2L, "<p>hello</p>"),                   // len 5 kept
      (3L, "<p>abcde <a href=/x>xyz</a></p>"), // len 9, lk 3: 9 <= 9 kept
      (4L, "<p>abcd <a href=/x>xyz</a></p>"),  // len 8, lk 3: 9 > 8 dropped
      (5L, "<ul><li><a href=/1>only links</a></li></ul>"),
      (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "html")
    val out = Boilerplate.densityStats(docs, col("doc_id"), col("html"),
        minChars = 5)
      .orderBy(col("doc_id")).collect()
    assert(out(0).getLong(2) == 0L)
    assert(out(1).getLong(2) == 1L && out(1).getString(3) == "hello")
    assert(out(2).getLong(2) == 1L && out(2).getString(3) == "abcde xyz")
    assert(out(3).getLong(2) == 0L)
    assert(out(4).getLong(2) == 0L && out(4).getLong(1) == 1L)
    assert(out(5).isNullAt(1) && out(5).isNullAt(2) && out(5).isNullAt(3))
  }
}
