package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Decontaminate / Keywords / QualityFilter — the corpus-curation
  * extension operators added in round 3.
  */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("contamination flags exactly the docs sharing a word 3-gram") {
    val evalDocs = docs(1L -> "the quick brown fox jumps")
    val train = docs(
      10L -> "a very quick brown fox indeed",     // shares "quick brown fox"
      11L -> "completely unrelated text here now", // clean
      12L -> "the quick brown fox jumps again")    // shares several
    val out = Decontaminate.contamination(train, evalDocs, $"doc_id", $"text", 3)
      .orderBy($"doc_id").as[(Long, Long)].collect().toSeq
    // doc 10 shares {quick brown fox, brown fox?} — grams of doc10:
    //  {a very quick, very quick brown, quick brown fox, brown fox indeed}
    //  eval grams: {the quick brown, quick brown fox, brown fox jumps}
    //  → 1 shared. doc 12: {the quick brown, quick brown fox, brown fox jumps} → 3.
    assert(out == Seq(10L -> 1L, 12L -> 3L))
  }

  test("decontaminate removes flagged docs and keeps the rest intact") {
    val evalDocs = docs(1L -> "alpha beta gamma delta")
    val train = docs(
      20L -> "alpha beta gamma epsilon",  // shares "alpha beta gamma"
      21L -> "zeta eta theta iota kappa")
    val kept = Decontaminate.decontaminate(train, evalDocs, $"doc_id", $"text", 3)
      .select($"doc_id").as[Long].collect().toSeq
    assert(kept == Seq(21L))
  }

  test("contamination plan broadcasts the eval gram side") {
    val evalDocs = docs(1L -> "one two three four")
    val train = docs(2L -> "five six seven eight")
    val plan = Decontaminate.contamination(train, evalDocs, $"doc_id", $"text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("topKeywords ranks rare tokens above common ones") {
    val corpus = docs(
      1L -> "shared shared rareword",
      2L -> "shared common tokens appear",
      3L -> "shared common extra words")
    // N=3. "shared" df=3, "rareword" df=1: doc1 scores
    //   rareword: 1 * (4/2) = 2.0 ; shared: 2 * (4/4) = 2.0 → tie →
    //   lexicographic token order: "rareword" < "shared"
    val out = Keywords.topKeywords(corpus, $"doc_id", $"text", k = 2)
      .filter($"doc_id" === 1L).orderBy($"rank")
      .select($"token", $"score").as[(String, Double)].collect().toSeq
    assert(out == Seq("rareword" -> 2.0, "shared" -> 2.0))
  }

  test("tfIdfLog is monotonic in tf and anti-monotonic in df") {
    val base = Keywords.tfIdfLog(lit(2), lit(5), lit(100))
    val moreTf = Keywords.tfIdfLog(lit(3), lit(5), lit(100))
    val moreDf = Keywords.tfIdfLog(lit(2), lit(50), lit(100))
    val row = spark.range(1).select(base.as("b"), moreTf.as("t"), moreDf.as("d"))
      .as[(Double, Double, Double)].head()
    assert(row._2 > row._1 && row._3 < row._1)
  }

  test("empty eval corpus contaminates nothing; empty train yields empty") {
    val train = docs(1L -> "some training text here")
    val emptyDocs = docs()
    assert(Decontaminate.contamination(train, emptyDocs, $"doc_id", $"text", 3).count() == 0)
    assert(Decontaminate.decontaminate(train, emptyDocs, $"doc_id", $"text", 3).count() == 1)
    assert(Decontaminate.contamination(emptyDocs, train, $"doc_id", $"text", 3).count() == 0)
  }

  test("htmlToText strips blocks and tags, decodes entities in safe order") {
    val cases = Seq(
      ("<p>hello <b>world</b></p>", "hello world"),
      ("<script>var x = '<div>';</script>keep", "keep"),
      ("<STYLE media=\"all\">p{}</STYLE>text", "text"),
      // &amp;lt; must decode to literal "&lt;", NOT to "<" (single pass,
      // &amp; last — the classic double-decode bug)
      ("&amp;lt;", "&lt;"),
      ("a&nbsp;b &amp; c &lt;d&gt; &quot;e&quot; &#39;f&#39;", "a b & c <d> \"e\" 'f'"),
      ("unclosed <tag attr=\"x\" and text", "unclosed <tag attr=\"x\" and text"))
    cases.foreach { case (in, want) =>
      val got = Seq(in).toDF("t")
        .select(TextAnalysis.normalize(TextAnalysis.htmlToText($"t")).as("o"))
        .as[String].head()
      assert(got == want.toLowerCase, s"input: $in")
    }
  }

  test("incremental dedup drops replayed content and intra-batch dups, keeps fresh") {
    val existing = docs(1L -> "seen before", 2L -> "also seen")
    val incoming = docs(
      10L -> "brand new content",
      11L -> "seen before",        // replay of existing → dropped
      12L -> "repeated in batch",  // intra-batch dup, smallest id wins
      13L -> "repeated in batch")
    val kept = ExactDedup.incremental(incoming, existing, $"text", "doc_id")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(10L, 12L))
  }

  test("quantileBand keeps the inner band and attaches cutoffs") {
    val df = (1 to 100).map(i => (i.toLong, i)).toDF("id", "m")
    val out = QualityFilter.quantileBand(df, $"m", 0.10, 0.90)
    val ms = out.select($"m").as[Int].collect().sorted
    // quantile_cont(0.1) over 1..100 = 10.9; 0.9 = 90.1 → band 11..90
    assert(ms.head == 11 && ms.last == 90 && ms.length == 80)
    val cuts = out.select($"cut_lo", $"cut_hi").distinct().as[(Double, Double)].head()
    assert(math.abs(cuts._1 - 10.9) < 1e-9 && math.abs(cuts._2 - 90.1) < 1e-9)
  }
}
