package graft.ext

import graft.SparkTestBase

/** crossSourceOverlap: hand-computed matrix on a fixture with
  * asymmetric copy counts, no diagonal, and disjoint sources absent.
  */
class CrossSourceSpec extends SparkTestBase {
  import spark.implicits._

  test("directional overlap matrix matches hand computation") {
    val docs = Seq(
      (1L, "alpha", "a"), (2L, "alpha", "a"), // two copies of alpha in a
      (3L, "alpha", "b"),                     // one in b
      (4L, "beta", "a"), (5L, "beta", "c"),   // beta shared a<->c
      (6L, "gamma", "c")                      // gamma only in c
    ).toDF("id", "text", "source")
    val out = ExactDedup.crossSourceOverlap(docs, $"text", $"source")
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      ("a", "b") -> ((1L, 2L)), // alpha: 2 rows of a already in b
      ("b", "a") -> ((1L, 1L)),
      ("a", "c") -> ((1L, 1L)), // beta
      ("c", "a") -> ((1L, 1L))
    ), s"got $out")
  }

  test("no overlap yields an empty matrix") {
    val docs = Seq((1L, "x", "a"), (2L, "y", "b")).toDF("id", "text", "source")
    assert(ExactDedup.crossSourceOverlap(docs, $"text", $"source").count() == 0)
  }

  private val lifecycle = Seq(
    (1L, "alpha", "a"), (2L, "alpha", "a"), (3L, "alpha", "b"),
    (4L, "beta", "a"), (5L, "beta", "c"), (6L, "gamma", "c"),
    (7L, "beta", "b"), (8L, "gamma", "a")
  ).toDF("id", "text", "source")

  private def matrixOf(df: org.apache.spark.sql.DataFrame) =
    ExactDedup.crossSourceOverlap(df, $"text", $"source")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap

  test("merge identity: matrix(state(old) + state(delta)) = matrix(full)") {
    val old = lifecycle.filter($"id" % 3 =!= 0)
    val delta = lifecycle.filter($"id" % 3 === 0)
    val merged = ExactDedup.overlapFromState(
      ExactDedup.mergePresenceStates(Seq(
        ExactDedup.sourcePresenceState(old, $"text", $"source"),
        ExactDedup.sourcePresenceState(delta, $"text", $"source"))))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(merged == matrixOf(lifecycle))
  }

  test("retract identity: state(full) − state(delta) gives matrix(old)") {
    val old = lifecycle.filter($"id" % 3 =!= 0)
    val delta = lifecycle.filter($"id" % 3 === 0)
    val retracted = ExactDedup.overlapFromState(
      ExactDedup.retractPresenceState(
        ExactDedup.sourcePresenceState(lifecycle, $"text", $"source"),
        ExactDedup.sourcePresenceState(delta, $"text", $"source")))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(retracted == matrixOf(old))
  }

  test("desynchronizing deletes raise: unknown digest and over-delete") {
    val full = ExactDedup.sourcePresenceState(lifecycle, $"text", $"source")
    val phantom = Seq((99L, "never-there", "a")).toDF("id", "text", "source")
    intercept[Exception] {
      ExactDedup.retractPresenceState(full,
        ExactDedup.sourcePresenceState(phantom, $"text", $"source")).count()
    }
    // "alpha" exists once under source b; deleting two copies must raise
    val over = Seq((1L, "alpha", "b"), (2L, "alpha", "b"))
      .toDF("id", "text", "source")
    intercept[Exception] {
      ExactDedup.retractPresenceState(full,
        ExactDedup.sourcePresenceState(over, $"text", $"source")).count()
    }
  }
}
