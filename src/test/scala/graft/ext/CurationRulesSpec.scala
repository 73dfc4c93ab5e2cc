package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Gopher fixed-rule cascade: every rule trips on exactly the planted
  * document built to trip it (and only that rule where the fixture is
  * clean), plus the CCNet perplexity-bucket thirds arithmetic.
  */
class CurationRulesSpec extends SparkTestBase {

  import spark.implicits._

  private def flagsFor(text: String): Map[String, Long] = {
    val row = QualityFilter.gopherFlags(
      Seq((1L, text)).toDF("doc_id", "text"), $"doc_id", $"text").collect().head
    row.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> row.getLong(i) }.toMap
  }

  private val passing = ("the quick brown fox jumps over the lazy dog " +
    "and runs to the river of dreams ") * 4

  test("a well-formed 64-word document passes every rule") {
    val f = flagsFor(passing.trim)
    assert(f("n_words") == 64L)
    assert(f("passes") == 1L, s"expected clean pass, got $f")
  }

  test("each rule trips on its planted document") {
    val short = flagsFor("the cat sat on the mat and that is all")
    assert(short("f_word_count") == 0L && short("n_words") == 10L)

    val longWords = flagsFor(("pneumonoultramicroscopic " * 60).trim)
    assert(longWords("f_mean_word_len") == 0L,
      "24-char mean word length must fail the [3,10] band")
    assert(longWords("f_word_count") == 1L)

    val symbols = flagsFor(("# value " * 30).trim + " the of")
    assert(symbols("f_symbol_ratio") == 0L && symbols("n_hash") == 30L)

    val bullets = flagsFor("- item one\n- item two\n- item three\n- item four")
    assert(bullets("f_bullet_lines") == 0L && bullets("n_bullet_lines") == 4L &&
      bullets("n_lines") == 4L)

    val ellipsis = flagsFor(
      "well this is a line...\nand another line goes here...\nthe final line is plain")
    assert(ellipsis("f_ellipsis_lines") == 0L && ellipsis("n_ellipsis_lines") == 2L)
    assert(ellipsis("n_ellipsis") == 2L, "the symbol counter sees the same dots")

    val noStop = flagsFor(
      ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5).trim)
    assert(noStop("f_stopwords") == 0L && noStop("n_stopwords") == 0L)
    assert(noStop("f_word_count") == 1L && noStop("f_alpha_words") == 1L)
  }

  test("boundary arithmetic is integer-exact: 50 words passes, 49 fails; mean length 3.0 passes") {
    def words(n: Int) = (Seq.fill(n - 2)("cat") :+ "the" :+ "and").mkString(" ")
    assert(flagsFor(words(50))("f_word_count") == 1L)
    assert(flagsFor(words(49))("f_word_count") == 0L)
    // 50 three-char words: 3·50 = 150 = Σlen exactly — inclusive bound
    assert(flagsFor(words(50))("f_mean_word_len") == 1L)
  }

  test("ellipsis counting is non-overlapping left-to-right in both conventions") {
    // 5 dots = one '...' + remainder '..'; 6 dots = two
    assert(flagsFor("a b .....")("n_ellipsis") == 1L)
    assert(flagsFor("a b ......")("n_ellipsis") == 2L)
  }

  test("hostNeighborhoodScreen: spam-farm's passing page drops; tiny hosts keep individual verdicts; exact 3/4 boundary") {
    val docs = Seq(
      // farm: 1 pass of 4 -> bad neighborhood
      (1L, "farm", false), (2L, "farm", false), (3L, "farm", false),
      (4L, "farm", true),
      // good: 3 pass of 4 -> exactly ON the 3/4 threshold -> acceptable
      (5L, "good", true), (6L, "good", true), (7L, "good", true),
      (8L, "good", false),
      // tiny: below minDocs -> individual verdicts stand
      (9L, "tiny", true), (10L, "tiny", false))
      .toDF("doc_id", "host", "p")
    val out = QualityFilter.hostNeighborhoodScreen(docs, $"doc_id", $"host",
        $"p", minDocs = 3L, num = 3, den = 4)
      .orderBy($"doc_id")
      .select($"doc_id", $"kept").as[(Long, Boolean)].collect().toMap
    // the farm's one tidy page fails the combined screen
    assert(!out(4L))
    assert(!out(1L) && !out(2L) && !out(3L))
    // exact boundary: 3*4 >= 4*3 keeps the good host's passing pages
    assert(out(5L) && out(6L) && out(7L) && !out(8L))
    // tiny host: doc verdicts pass through
    assert(out(9L) && !out(10L))
    // guards
    intercept[IllegalArgumentException] {
      QualityFilter.hostNeighborhoodScreen(docs, $"doc_id", $"host", $"p",
        minDocs = 0L, num = 3, den = 4)
    }
    intercept[IllegalArgumentException] {
      QualityFilter.hostNeighborhoodScreen(docs, $"doc_id", $"host", $"p",
        minDocs = 3L, num = 5, den = 4)
    }
  }

  test("perplexity buckets: exact-rank thirds with the documented integer cut rule") {
    // 10 rows, distinct scores 10..1 on ids 1..10 (best score = id 1)
    val scored = (1 to 10).map(i => (i.toLong, (11 - i).toDouble))
      .toDF("doc_id", "lm_score")
    val out = NgramLm.perplexityBuckets(scored, $"doc_id", $"lm_score")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // rank·3 ≤ 10 → head = ranks 1-3; rank·3 ≤ 20 → middle = 4-6; tail = 7-10
    assert((1L to 3L).forall(out(_) == "head"))
    assert((4L to 6L).forall(out(_) == "middle"))
    assert((7L to 10L).forall(out(_) == "tail"))
    // ties on score break on id: two equal scores stay deterministic
    val tied = Seq((5L, 1.0), (2L, 1.0), (9L, 1.0)).toDF("doc_id", "lm_score")
    val t = NgramLm.perplexityBuckets(tied, $"doc_id", $"lm_score")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(t(2L) == "head" && t(5L) == "middle" && t(9L) == "tail")
  }
}
