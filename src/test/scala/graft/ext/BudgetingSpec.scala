package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget selection: prefix-stop semantics on a hand fixture
  * (overflow excludes lower-ranked SMALLER docs — no knapsack
  * back-fill), zero-token admission at the exact boundary,
  * bucket-offset ≡ naive global window on the corpus across shifts,
  * partition invariance, degenerate budgets, guards, and the plan
  * claim (no empty-key corpus-sized window partition).
  */
class BudgetingSpec extends SparkTestBase {

  import spark.implicits._

  // (id, n_tokens, score)
  private val fx = Seq(
    (1L, 10L, 90L), // cum 10
    (2L, 10L, 80L), // cum 20
    (3L, 25L, 70L), // would be cum 45 > 30: overflow — stops here
    (4L, 1L, 60L),  // smaller and lower-ranked: must NOT back-fill
    (5L, 0L, 50L)   // zero tokens, after the stop: excluded too
  ).toDF("id", "n", "sc")

  test("prefix-stop: an overflowing doc excludes every lower rank, no back-fill") {
    val out = Budgeting.tokenBudgetSelect(fx, $"id", $"n", $"sc",
        budget = 30L, bucketShift = 2)
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 10L), (2L, 20L)))
  }

  test("zero-token documents AT the boundary are admitted (they cost nothing)") {
    val fx2 = Seq((1L, 30L, 90L), (2L, 0L, 80L), (3L, 5L, 70L))
      .toDF("id", "n", "sc")
    val out = Budgeting.tokenBudgetSelect(fx2, $"id", $"n", $"sc",
        budget = 30L, bucketShift = 2)
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 30L), (2L, 30L)))
  }

  test("ties break by id ascending across the whole prefix") {
    val fx3 = Seq((7L, 10L, 50L), (3L, 10L, 50L), (5L, 10L, 50L))
      .toDF("id", "n", "sc")
    val out = Budgeting.tokenBudgetSelect(fx3, $"id", $"n", $"sc",
        budget = 20L, bucketShift = 2)
      .select($"id").as[Long].collect().toSet
    assert(out == Set(3L, 5L))
  }

  test("bucket-offset ≡ naive global window on the corpus, across shifts") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val base = docs.select($"doc_id",
      size(filter(split(lower(trim($"text")), "\\s+"), w => w =!= lit("")))
        .cast("long").as("n"),
      pmod($"n_chars", lit(256L)).as("sc"))
    val budget = base.agg(sum($"n")).head.getLong(0) / 2
    val naive = base
      .withColumn("cum", sum($"n").over(
        Window.orderBy($"sc".desc, $"doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter($"cum" <= budget)
      .select($"doc_id", $"cum").orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    Seq(0, 4, 8).foreach { shift =>
      val fast = Budgeting.tokenBudgetSelect(base, $"doc_id", $"n", $"sc",
          budget, bucketShift = shift)
        .select($"id", $"cum_tokens").orderBy($"id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(fast.toSeq == naive.toSeq, s"mismatch at shift=$shift")
    }
  }

  test("partitioning-invariant") {
    val a = Budgeting.tokenBudgetSelect(fx.repartition(1), $"id", $"n", $"sc",
      30L, 2).orderBy($"id").collect().map(_.toSeq)
    val b = Budgeting.tokenBudgetSelect(fx.repartition(7), $"id", $"n", $"sc",
      30L, 2).orderBy($"id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("degenerate budgets: 0 admits only leading zero-token docs; huge admits all") {
    val fx4 = Seq((1L, 0L, 90L), (2L, 5L, 80L)).toDF("id", "n", "sc")
    val zero = Budgeting.tokenBudgetSelect(fx4, $"id", $"n", $"sc", 0L, 2)
      .select($"id").as[Long].collect().toSeq
    assert(zero == Seq(1L))
    val all = Budgeting.tokenBudgetSelect(fx, $"id", $"n", $"sc", 1000L, 2)
    assert(all.count() == 5L)
    assert(all.agg(max($"cum_tokens")).head.getLong(0) == 46L)
  }

  test("guards: null/negative tokens or score raise; bad params raise") {
    val bad = Seq((1L, -1L, 5L)).toDF("id", "n", "sc")
    val ex1 = intercept[Exception] {
      Budgeting.tokenBudgetSelect(bad, $"id", $"n", $"sc", 10L, 2).collect()
    }
    assert(ex1.getMessage != null)
    val badS = Seq((1L, 1L, -5L)).toDF("id", "n", "sc")
    intercept[Exception] {
      Budgeting.tokenBudgetSelect(badS, $"id", $"n", $"sc", 10L, 2).collect()
    }
    intercept[IllegalArgumentException] {
      Budgeting.tokenBudgetSelect(fx, $"id", $"n", $"sc", -1L, 2)
    }
    intercept[IllegalArgumentException] {
      Budgeting.tokenBudgetSelect(fx, $"id", $"n", $"sc", 10L, 63)
    }
  }

  test("effectiveShift: rescales a too-wide shift down to the score range") {
    // the VERDICT r13 degenerate case: scores in [0, 255] under
    // shift 8 collapse to ONE bucket; the sizing contract rescales to
    // shift 0 (256 buckets)
    assert(Budgeting.effectiveShift(0L, 255L, 8) == 0)
    // a genuinely wide range keeps the requested shift
    assert(Budgeting.effectiveShift(0L, (1L << 20) - 1, 8) == 8)
    // partial rescale: range 0..2^12-1 at shift 8 gives 16 buckets —
    // rescale until >= 256 (shift 4 gives exactly 256)
    assert(Budgeting.effectiveShift(0L, (1L << 12) - 1, 8) == 4)
    // single score value: shift 0 is the floor (the raise guard in
    // tokenBudgetSelect owns the hot-bucket case)
    assert(Budgeting.effectiveShift(42L, 42L, 8) == 0)
    intercept[IllegalArgumentException] { Budgeting.effectiveShift(5L, 4L, 8) }
  }

  test("narrow-score fixture: auto-rescaled shift still matches the naive window") {
    // scores mod 8 under the default shift 8 — the exact q210-shape
    // collapse; output must equal the naive global window regardless
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", ($"n_chars" % 17L).as("n"),
        pmod($"n_chars", lit(8L)).as("sc"))
    val budget = docs.agg(sum($"n")).head.getLong(0) / 3
    val naive = docs
      .withColumn("cum", sum($"n").over(
        Window.orderBy($"sc".desc, $"doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter($"cum" <= budget)
      .select($"doc_id", $"cum").orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val fast = Budgeting.tokenBudgetSelect(docs, $"doc_id", $"n", $"sc",
        budget, bucketShift = 8)
      .select($"id", $"cum_tokens").orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fast.toSeq == naive.toSeq)
  }

  test("hot single-score bucket beyond maxBucketRows raises") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", lit(1L).as("n"), lit(7L).as("sc")) // ONE score value
    val e = intercept[Exception] {
      Budgeting.tokenBudgetSelect(docs, $"doc_id", $"n", $"sc",
        budget = 10L, bucketShift = 8, maxBucketRows = 4L).collect()
    }
    assert(e.getMessage.contains("maxBucketRows"))
  }

  test("plan: every window partitions by the bucket key — no empty-key corpus window") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"n_chars".as("n"), pmod($"n_chars", lit(256L)).as("sc"))
    val p = Budgeting.tokenBudgetSelect(docs, $"doc_id", $"n", $"sc",
        1000000L, bucketShift = 4)
      .queryExecution.executedPlan.toString
    val rowWindows = p.linesIterator
      .filter(l => l.contains("Window") && l.contains("n_tokens"))
    rowWindows.foreach { l =>
      assert(l.contains("__b"), s"corpus-row window must partition by __b:\n$l")
    }
    assert(!p.contains("ScalaUDF"), p)
  }
}
