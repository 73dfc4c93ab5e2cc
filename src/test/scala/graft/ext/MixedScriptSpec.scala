package graft.ext

import graft.SparkTestBase

/** mixedScriptStats: homoglyph tokens flag, single-script text (any
  * script) does not, between-token script switches do not.
  */
class MixedScriptSpec extends SparkTestBase {
  import spark.implicits._

  private def stats(rows: Seq[(Long, String)]) =
    TextAnalysis.mixedScriptStats(rows.toDF("id", "text"), $"id", $"text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap

  test("homoglyph tokens flag; clean scripts do not") {
    val out = stats(Seq(
      (1L, "urgent pаypal verification nоw"),   // Cyrillic а and о inside Latin
      (2L, "чисто русский текст"),               // pure Cyrillic
      (3L, "plain ascii text"),                  // pure Latin
      (4L, "Ωμέγα λόγος"),                       // pure Greek
      (5L, "the Ωmega option"),                  // Greek+Latin in ONE token
      (6L, "hello мир switch between tokens"))) // switch BETWEEN tokens only
    assert(out(1L) == ((4L, 2L, true)))
    assert(out(2L) == ((3L, 0L, false)))
    assert(out(3L) == ((3L, 0L, false)))
    assert(out(4L) == ((2L, 0L, false)))
    assert(out(5L) == ((3L, 1L, true)))
    assert(out(6L) == ((5L, 0L, false)))
  }

  test("cyrillic-greek mixing flags without any latin") {
    val out = stats(Seq((1L, "словΩ weird")))
    assert(out(1L)._2 == 1L && out(1L)._3)
  }

  test("zero-shuffle plan: no exchange anywhere") {
    val df = Seq((1L, "pаypal")).toDF("id", "text")
    val plan = TextAnalysis.mixedScriptStats(df, $"id", $"text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("typeTokenStats: both tails, case folding, split-count convention, zero shuffle") {
    val df = Seq(
      (1L, "spam spam spam spam"),
      (2L, "all fresh words here"),
      (3L, "The the THE"),
      (4L, "")).toDF("id", "text")
    val out = TextAnalysis.typeTokenStats(df, $"id", $"text")
      .orderBy($"id").as[(Long, Long, Long, Double)].collect()
    assert(out(0) == ((1L, 4L, 1L, 0.25)))
    assert(out(1) == ((2L, 4L, 4L, 1.0)))
    assert(out(2) == ((3L, 3L, 1L, 1.0 / 3.0)))
    // empty text = one empty token (the corpus split convention)
    assert(out(3) == ((4L, 1L, 1L, 1.0)))
    val plan = TextAnalysis.typeTokenStats(df, $"id", $"text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
