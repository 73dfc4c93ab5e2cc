package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** N-gram LM quality scoring: separation on a STRUCTURED fixture
  * (in-distribution > same-vocab word salad > OOV gibberish — the
  * ordering vocabulary coverage cannot produce, measured side by
  * side), OOV accounting, the log-face ordering agreement, and model
  * parquet round-trip.
  */
class NgramLmSpec extends SparkTestBase {

  import spark.implicits._

  private val sentences = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a stitch in time saves nine every single day",
    "practice makes perfect when the work is steady")

  // reference corpus: the three sentences, repeated — REAL structure
  // (stable bigrams), unlike the random-word synthetic corpus
  private def reference = (0 until 30)
    .map(i => (i.toLong, sentences(i % 3))).toDF("doc_id", "text")

  // candidates: an in-distribution doc, a word salad over the SAME
  // vocabulary (every token known, no bigram structure), and OOV junk
  private def candidates = Seq(
    (100L, sentences.head),
    (101L, "fox the over quick dog lazy brown jumps the fox"),
    (102L, "zzz qqq xxx zzz qqq xxx zzz")).toDF("doc_id", "text")

  test("score separation: in-distribution > same-vocab salad > OOV gibberish; coverage can't see the salad") {
    val model = NgramLm.train(reference, $"text")
    val scored = NgramLm.scoreDocs(candidates, $"doc_id", $"text", model)
      .collect().map(r => r.getLong(0) -> r).toMap
    val sIn = scored(100L).getDouble(3)
    val sSalad = scored(101L).getDouble(3)
    val sJunk = scored(102L).getDouble(3)
    info(f"add-1 lm_score: in-dist=$sIn%.6f salad=$sSalad%.6f oov=$sJunk%.6f")
    // The add-one face separates REAL text from both kinds of noise,
    // but canNOT order salad above OOV junk: an unseen bigram after a
    // popular history scores 1/(c1+V) < 1/(0+V) — the additive-
    // smoothing artifact the interpolated face exists to fix.
    assert(sIn > sSalad && sIn > sJunk,
      f"add-1 LM must put in-dist above both noise classes, got $sIn%.6f / $sSalad%.6f / $sJunk%.6f")
    // OOV accounting: junk is 100% OOV, in-dist 0%
    assert(scored(102L).getLong(2) == scored(102L).getLong(1))
    assert(scored(100L).getLong(2) == 0L)

    // The interpolated (Jelinek–Mercer) face restores the full
    // curation ordering: known-word soup ≻ unknown-word soup.
    val jm = NgramLm.scoreDocsInterpolated(candidates, $"doc_id", $"text", model)
      .collect().map(r => r.getLong(0) -> r).toMap
    val jIn = jm(100L).getDouble(3)
    val jSalad = jm(101L).getDouble(3)
    val jJunk = jm(102L).getDouble(3)
    info(f"interpolated lm_score: in-dist=$jIn%.6f salad=$jSalad%.6f oov=$jJunk%.6f")
    assert(jIn > jSalad && jSalad > jJunk,
      f"interpolated LM must order in-dist > salad > junk, got $jIn%.6f / $jSalad%.6f / $jJunk%.6f")
    // and by a margin, not a rounding accident
    assert(jSalad > 2 * jJunk)

    // the measured VocabScore comparison: the salad covers the
    // reference vocabulary perfectly, so coverage CANNOT separate it
    // from the in-distribution doc — the LM's bigram structure can
    val vocab = VocabScore.topVocabulary(reference, $"doc_id", $"text", 1000)
    val cov = VocabScore.coverageWithVocab(candidates, $"doc_id", $"text", vocab)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("coverage")).toMap
    info(f"coverage: in-dist=${cov(100L)}%.3f salad=${cov(101L)}%.3f oov=${cov(102L)}%.3f")
    assert(cov(100L) == 1.0 && cov(101L) == 1.0,
      "fixture invariant: salad must be coverage-indistinguishable from real text")
    assert(cov(102L) == 0.0)
  }

  test("log face agrees with the rational add-1 face on the fixture's ranking") {
    val model = NgramLm.train(reference, $"text")
    val lp = NgramLm.avgLogProb(candidates, $"doc_id", $"text", model)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("avg_logp")).toMap
    val sc = NgramLm.scoreDocs(candidates, $"doc_id", $"text", model)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("lm_score")).toMap
    // same smoothing, so same top doc...
    assert(lp(100L) > lp(101L) && lp(100L) > lp(102L))
    // ...and the two noise classes rank the same way under both faces
    // (whichever way add-1 put them — see the separation test)
    assert((lp(101L) > lp(102L)) == (sc(101L) > sc(102L)))
  }

  test("unseen-history path: OOV bigram scores exactly 1/(0+V)") {
    val model = NgramLm.train(reference, $"text")
    val v = model.vocabSize.toDouble
    val one = NgramLm.scoreDocs(Seq((1L, "zzz qqq")).toDF("doc_id", "text"),
      $"doc_id", $"text", model).collect().head
    assert(one.getLong(1) == 1 && one.getLong(2) == 1)
    // mean of the single term (1/V)·1e6 quantized at 6 dp then back
    val expected = math.floor(1.0 / v * 1e6 * 1e6 + 0.5) / 1e6 / 1e6
    assert(math.abs(one.getDouble(3) - expected) < 1e-12,
      s"got ${one.getDouble(3)}, expected $expected (V=$v)")
  }

  test("Kneser–Ney face: full curation ordering, and continuation counts beat raw frequency") {
    val model = NgramLm.train(reference, $"text")
    val kn = NgramLm.scoreDocsKneserNey(candidates, $"doc_id", $"text", model)
      .collect().map(r => r.getLong(0) -> r).toMap
    val kIn = kn(100L).getDouble(3)
    val kSalad = kn(101L).getDouble(3)
    val kJunk = kn(102L).getDouble(3)
    info(f"kneser-ney lm_score: in-dist=$kIn%.6f salad=$kSalad%.6f oov=$kJunk%.6f")
    // KN separates real text from both noise classes. It does NOT
    // order salad above junk: a seen history discounts its unseen
    // continuations by λ(w1) = D·N1+(w1·)/c1 — far below the bland
    // continuation prior an unseen history falls back to. That is
    // textbook KN (confident histories punish surprises hardest);
    // ordering known-word soup above unknown-word soup remains the
    // Jelinek–Mercer face's job (see the separation test above).
    assert(kIn > kSalad && kIn > kJunk,
      f"KN must put in-dist above both noise classes, got $kIn%.6f / $kSalad%.6f / $kJunk%.6f")

    // THE property KN buys over Jelinek–Mercer: the back-off rewards
    // words seen after MANY DISTINCT histories, not raw-frequent words.
    // "francisco" appears 5 times but always after "san" (one distinct
    // history); "day" appears 3 times after 3 distinct histories. After
    // an unseen history both faces are pure back-off — JM (unigram
    // back-off) ranks francisco above day, KN (continuation back-off)
    // ranks day above francisco.
    val ref2 = Seq(
      "we saw san francisco at dawn",
      "san francisco is hilly",
      "back to san francisco again",
      "san francisco by night",
      "crossing san francisco slowly",
      "one fine day",
      "another good day",
      "a long day").zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val m2 = NgramLm.train(ref2, $"text")
    val probes = Seq((1L, "zzzq francisco"), (2L, "zzzq day")).toDF("doc_id", "text")
    val knP = NgramLm.scoreDocsKneserNey(probes, $"doc_id", $"text", m2)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("lm_score")).toMap
    val jmP = NgramLm.scoreDocsInterpolated(probes, $"doc_id", $"text", m2)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("lm_score")).toMap
    info(f"after unseen history: KN francisco=${knP(1L)}%.8f day=${knP(2L)}%.8f; " +
      f"JM francisco=${jmP(1L)}%.8f day=${jmP(2L)}%.8f")
    assert(knP(2L) > knP(1L),
      "KN continuation back-off must rank the many-history word above the one-history word")
    assert(jmP(1L) > jmP(2L),
      "fixture invariant: JM's raw-frequency back-off must rank them the other way")
  }

  test("Kneser–Ney unseen-history bigram scores exactly the add-one continuation probability") {
    val model = NgramLm.train(reference, $"text")
    val b = model.bigrams.count()
    val denom = (b + model.vocabSize).toDouble
    val one = NgramLm.scoreDocsKneserNey(Seq((1L, "zzz qqq")).toDF("doc_id", "text"),
      $"doc_id", $"text", model).collect().head
    assert(one.getLong(1) == 1 && one.getLong(2) == 1)
    // pcont(qqq) = (0 + 1)/(B + V), then the 1e6 DECIMAL quantization
    val expected = math.floor(1.0 / denom * 1e6 * 1e6 + 0.5) / 1e6 / 1e6
    assert(math.abs(one.getDouble(3) - expected) < 1e-12,
      s"got ${one.getDouble(3)}, expected $expected (B=$b, V=${model.vocabSize})")
  }

  test("documents with fewer than two tokens drop out; model round-trips through parquet") {
    val model = NgramLm.train(reference, $"text")
    val scored = NgramLm.scoreDocs(
      Seq((1L, "single"), (2L, ""), (3L, "two tokens")).toDF("doc_id", "text"),
      $"doc_id", $"text", model)
    assert(scored.select("doc_id").as[Long].collect().toSet == Set(3L))

    val dir = java.nio.file.Files.createTempDirectory("ngramlm").toString
    NgramLm.writeModel(model, dir)
    val back = NgramLm.readModel(spark, dir)
    assert(back.vocabSize == model.vocabSize)
    assert(back.totalTokens == model.totalTokens) // meta fields not swapped
    val a = NgramLm.scoreDocs(candidates, $"doc_id", $"text", model)
      .orderBy($"doc_id").collect().toSeq
    val b = NgramLm.scoreDocs(candidates, $"doc_id", $"text", back)
      .orderBy($"doc_id").collect().toSeq
    assert(a == b)
    // the reloaded unigram table + totals drive the interpolated face
    // identically — the round-trip pieces scoreDocs never touches
    val ja = NgramLm.scoreDocsInterpolated(candidates, $"doc_id", $"text", model)
      .orderBy($"doc_id").collect().toSeq
    val jb = NgramLm.scoreDocsInterpolated(candidates, $"doc_id", $"text", back)
      .orderBy($"doc_id").collect().toSeq
    assert(ja == jb)
  }

  test("readModel fails loudly on pre-unigram model state instead of mis-scoring") {
    val model = NgramLm.train(reference, $"text")
    val dir = java.nio.file.Files.createTempDirectory("ngramlm-old").toString
    // the pre-round-10 layout: history/bigrams + vocab_size-only meta
    model.history.write.parquet(s"$dir/history")
    model.bigrams.write.parquet(s"$dir/bigrams")
    spark.range(1).select(lit(model.vocabSize).as("vocab_size"))
      .write.parquet(s"$dir/meta")
    val e = intercept[IllegalArgumentException](NgramLm.readModel(spark, dir))
    assert(e.getMessage.contains("pre-unigram"))
  }
}
