package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Curation cascade: every stage boundary from both sides on a hand
  * fixture, ledger consistency (n_in chains), kept ≡ ledger tail,
  * sequentiality (a doc dropped at stage k is invisible to k+1's
  * n_in), the full-corpus rate convention for the source screen, and
  * parameter guards.
  */
class CurationSpec extends SparkTestBase {

  import spark.implicits._

  private val p = Curation.CascadeParams(
    minWords = 3L, maxWords = 6L,
    minLenTenths = 20L, maxLenTenths = 60L,
    srcMinDocs = 3L, srcNum = 1, srcDen = 2)

  private val fixture = Seq(
    // stage 1 both sides: 2 words drop, 3 words keep, 7 words drop
    // (docs 1-9 share one source whose pass rate 5/9 >= 1/2 clears the
    // stage-4 screen, so stages 1-3 are observed in isolation)
    (1L, "aa bb", "bulk"),
    (2L, "aa bb cc", "bulk"),
    (3L, "aa bb cc dd ee ff gg", "bulk"),
    // stage 2 both sides at mean-len bounds [2.0, 6.0]:
    // mean 2.0 exactly (keep), mean < 2 (drop), mean 6.0 exactly
    // (keep), mean > 6 (drop)
    (4L, "ab cd ef", "bulk"),
    (5L, "a b cc", "bulk"),
    (6L, "abcdef ghijkl mnopqr", "bulk"),
    (7L, "abcdefg hijklmn opqrstu", "bulk"),
    // stage 3: duplicate pair — min doc_id wins regardless of order
    (8L, "dup text here", "bulk"),
    (9L, "dup text here", "bulk"),
    // stage 4: farm with 3 docs, 1 passing → rate 1/3 < 1/2: the
    // passing doc must drop; tiny source (2 docs < minDocs) with a
    // failing rate keeps its survivor
    (10L, "x", "farm"),
    (11L, "y", "farm"),
    (12L, "farm tidy page", "farm"),
    (13L, "z", "tiny"),
    (14L, "tiny clean page", "tiny")).toDF("doc_id", "text", "source")

  test("hand-computed ledger over every stage boundary") {
    val (ledger, kept) = Curation.cascade(fixture, $"doc_id", $"text", $"source", p)
    val rows = ledger.orderBy($"stage_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // s1 pass: 2,4,5,6,7,8,9,12,14 (3-word docs) = 9 of 14
    // s2 pass: drops 5 (mean 4/3 < 2) and 7 (mean 7 > 6) → 7
    // s3: 9 duplicates 8 → 6
    // s4: 12 drops (farm rate 1/3 < 1/2); 14 kept (tiny below minDocs) → 5
    assert(rows.toSeq == Seq(
      (1L, "word_bounds", 14L, 9L),
      (2L, "word_len", 9L, 7L),
      (3L, "exact_dedup", 7L, 6L),
      (4L, "source_rate", 6L, 5L)))
    assert(kept.orderBy($"doc_id").as[Long].collect().toSeq ==
      Seq(2L, 4L, 6L, 8L, 14L))
  }

  test("ledger chains: stage k+1 n_in equals stage k n_kept") {
    val (ledger, _) = Curation.cascade(fixture, $"doc_id", $"text", $"source", p)
    val rows = ledger.orderBy($"stage_id").collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    rows.sliding(2).foreach { w =>
      assert(w(0)._2 == w(1)._1, s"ledger does not chain: $rows")
    }
  }

  test("source rate is computed over the FULL corpus, not survivors") {
    // the farm's failing docs fail at stage 1 — if the rate were
    // computed over stage-3 survivors the farm would be 1-doc
    // (below minDocs) and its tidy page would survive
    val surv = Curation.survival(fixture, $"doc_id", $"text", $"source", p)
    val farm = surv.filter($"doc_id" === 12L).head()
    assert(farm.getAs[Boolean]("s3"), "tidy page should reach stage 4")
    assert(!farm.getAs[Boolean]("s4"), "farm rate 1/3 must drop it")
  }

  test("survival flags are monotone (s1 >= s2 >= s3 >= s4)") {
    val surv = Curation.survival(fixture, $"doc_id", $"text", $"source", p)
      .collect()
    surv.foreach { r =>
      val flags = Seq("s1", "s2", "s3", "s4").map(r.getAs[Boolean])
      flags.sliding(2).foreach(w => assert(w(0) || !w(1),
        s"non-monotone survival for doc ${r.getAs[Long]("doc_id")}: $flags"))
    }
  }

  test("per-source attrition: each planted source shows its designed shape") {
    val surv = Curation.survival(fixture, $"doc_id", $"text", $"source", p)
    val rows = Curation.ledgerBySource(surv)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(3), r.getLong(4))))
      .toMap
    // farm: 3 junk +1 tidy; tidy survives to stage 4 then the 1/3
    // rate kills it
    assert(rows(("farm", 1L)) == (3L, 1L))
    assert(rows(("farm", 4L)) == (1L, 0L))
    // tiny: below minDocs — its clean page keeps
    assert(rows(("tiny", 4L)) == (1L, 1L))
    // bulk: 9 docs → 9 pass words? no: 2-word and 7-word drop → 7...
    assert(rows(("bulk", 1L)) == (9L, 7L))
    assert(rows(("bulk", 4L)) == (4L, 4L))
    // per-source ledgers sum to the global one at every stage
    val global = Curation.ledger(surv).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    (1L to 4L).foreach { k =>
      val in = rows.collect { case ((_, `k`), (i, _)) => i }.sum
      val kept = rows.collect { case ((_, `k`), (_, o)) => o }.sum
      assert((in, kept) == global(k), s"stage $k: per-source != global")
    }
  }

  test("partitioning-invariant ledger") {
    val a = Curation.cascade(fixture.repartition(1), $"doc_id", $"text",
      $"source", p)._1.orderBy($"stage_id").collect().map(_.toSeq)
    val b = Curation.cascade(fixture.repartition(11), $"doc_id", $"text",
      $"source", p)._1.orderBy($"stage_id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("NULL source raises instead of silently vanishing from the ledger") {
    // ADVICE r13: the stage-4 source equi-join would silently DROP a
    // null-source document, undercounting n0 with no desync signal —
    // the guard raises at the first computation over the flags
    val withNull = fixture.unionByName(
      Seq((999L, "a clean document with enough words here", null: String))
        .toDF("doc_id", "text", "source"))
    val e = intercept[Exception] {
      Curation.ledger(Curation.survival(withNull, $"doc_id", $"text",
        $"source", p)).collect()
    }
    assert(e.getMessage.contains("NULL source"))
  }

  test("parameter guards raise") {
    intercept[IllegalArgumentException] {
      Curation.survival(fixture, $"doc_id", $"text", $"source",
        Curation.CascadeParams(minWords = 5L, maxWords = 4L))
    }
    intercept[IllegalArgumentException] {
      Curation.survival(fixture, $"doc_id", $"text", $"source",
        Curation.CascadeParams(srcNum = 3, srcDen = 2))
    }
  }
}
