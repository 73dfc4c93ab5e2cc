package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkTestBase {

  import spark.implicits._

  // left: observations; right: state changes
  private lazy val left = Seq(
    (1L, 5L, "l-a"), (1L, 15L, "l-b"), (1L, 25L, "l-c"),
    (2L, 10L, "l-d"), (3L, 10L, "l-e")).toDF("k", "ts", "obs")
  private lazy val right = Seq(
    (1L, 10L, 1.0), (1L, 20L, 2.0),
    (2L, 10L, 3.0), (2L, 30L, 4.0)).toDF("k", "rts", "v")

  test("backward: most recent at-or-before match, null when none, per key") {
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts")
      .select($"k", $"ts", $"obs", $"v")
      .as[(Long, Long, String, Option[Double])].collect().toSet
    assert(out == Set(
      (1L, 5L, "l-a", None),          // before any right row
      (1L, 15L, "l-b", Some(1.0)),    // rts=10 is the latest <= 15
      (1L, 25L, "l-c", Some(2.0)),
      (2L, 10L, "l-d", Some(3.0)),    // exact tie: at-or-before includes ts
      (3L, 10L, "l-e", None)))        // key with no right rows at all
  }

  test("forward: earliest at-or-after match") {
    val out = AsOfJoin.forward(left, right, Seq("k"), "ts", "rts")
      .select($"k", $"ts", $"v")
      .as[(Long, Long, Option[Double])].collect().toSet
    assert(out == Set(
      (1L, 5L, Some(1.0)),
      (1L, 15L, Some(2.0)),
      (1L, 25L, None),                // nothing after 25
      (2L, 10L, Some(3.0)),           // exact tie
      (3L, 10L, None)))
  }

  test("tie-break pins the winner among duplicate right timestamps") {
    val dupRight = Seq((1L, 10L, 7L, 100.0), (1L, 10L, 9L, 200.0))
      .toDF("k", "rts", "seq", "v")
    val out = AsOfJoin.backward(
        left.filter($"ts" === 15L), dupRight, Seq("k"), "ts", "rts",
        rightTieBreak = Seq("seq"))
      .select($"v").as[Double].collect()
    assert(out.toSeq == Seq(200.0)) // greatest tie-break wins in backward mode

    // forward mode follows the SAME convention (greatest wins) — the
    // desc timestamp scan must not silently invert the tie-break
    val fwd = AsOfJoin.forward(
        left.filter($"ts" === 5L), dupRight, Seq("k"), "ts", "rts",
        rightTieBreak = Seq("seq"))
      .select($"v").as[Double].collect()
    assert(fwd.toSeq == Seq(200.0)) // greatest tie-break wins in forward mode too
  }

  test("null timestamps and null keys never match (join semantics)") {
    val l = Seq((Some(1L), Some(5L), "a"), (Some(1L), None, "b"), (None, Some(5L), "c"))
      .toDF("k", "ts", "obs")
    val r = Seq((Some(1L), Some(3L), 1.0), (Some(1L), None, 99.0), (None, Some(3L), 88.0))
      .toDF("k", "rts", "v")
    val back = AsOfJoin.backward(l, r, Seq("k"), "ts", "rts")
      .select($"obs", $"v").as[(String, Option[Double])].collect().toSet
    assert(back == Set(
      ("a", Some(1.0)),  // real match; the null-ts right row (99.0) is invisible
      ("b", None),       // null left ts matches nothing
      ("c", None)))      // null key matches nothing (NULL = NULL is no match)
    val fwd = AsOfJoin.forward(l, r, Seq("k"), "ts", "rts")
      .select($"obs", $"v").as[(String, Option[Double])].collect().toSet
    assert(fwd == Set(("a", None), ("b", None), ("c", None)))
  }

  test("struct-path metacharacters in payload names resolve correctly") {
    val l = Seq((1L, 5L, "x")).toDF("k", "ts", "a.b")
    val r = Seq((1L, 3L, 7.0)).toDF("k", "rts", "v.w")
    val out = AsOfJoin.backward(l, r, Seq("k"), "ts", "rts")
    assert(out.columns.toSeq == Seq("k", "ts", "a.b", "v.w"))
    assert(out.select(col("`a.b`"), col("`v.w`")).as[(String, Double)].head() == (("x", 7.0)))
  }

  test("property: equals the range-join reference on random frames (both directions)") {
    // deterministic pseudo-random frames with few keys and clustered
    // timestamps → dense tie/no-match/multi-match coverage
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      val lRows = Seq.fill(120)((rnd.nextInt(6).toLong, rnd.nextInt(40).toLong, rnd.nextInt()))
      // unique (k, ts) on the right — the operator's documented contract
      val rRows = Seq.fill(120)((rnd.nextInt(6).toLong, rnd.nextInt(40).toLong))
        .distinct.map { case (k, t) => (k, t, rnd.nextDouble()) }
      val l = lRows.toDF("k", "ts", "obs")
      val r = rRows.toDF("k", "rts", "v")

      def reference(cmp: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column,
                    pickDesc: Boolean) = {
        val pairs = l.as("l").join(r.as("r"),
          $"l.k" === $"r.k" && cmp($"r.rts", $"l.ts"), "left")
        val ord = if (pickDesc) $"r.rts".desc_nulls_last else $"r.rts".asc_nulls_last
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"l.k", $"l.ts", $"l.obs").orderBy(ord)
        pairs.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
          .select($"l.k", $"l.ts", $"l.obs", $"r.v")
      }

      val back = AsOfJoin.backward(l, r, Seq("k"), "ts", "rts").select($"k", $"ts", $"obs", $"v")
      val backRef = reference((rts, ts) => rts <= ts, pickDesc = true)
      assert(back.except(backRef).count() == 0 && backRef.except(back).count() == 0,
        s"backward mismatch on trial $trial")

      val fwd = AsOfJoin.forward(l, r, Seq("k"), "ts", "rts").select($"k", $"ts", $"obs", $"v")
      val fwdRef = reference((rts, ts) => rts >= ts, pickDesc = false)
      assert(fwd.except(fwdRef).count() == 0 && fwdRef.except(fwd).count() == 0,
        s"forward mismatch on trial $trial")
    }
  }

  test("tolerance: stale matches revert to null in both directions; boundary inclusive") {
    val right = Seq((1L, 10L, "r10"), (1L, 100L, "r100")).toDF("k", "ts", "rv")
    val left = Seq((1L, 12L), (1L, 50L), (1L, 100L), (1L, 105L)).toDF("k", "ts")
    val back = AsOfJoin.backward(left, right, Seq("k"), "ts", "ts",
        tolerance = Some(5L))
      .as[(Long, Long, Option[String])].collect().sortBy(_._2).toSeq
    // 12-10=2 <= 5 match; 50-10=40 stale; 100/105 match r100 (gap 0/5)
    assert(back == Seq((1L, 12L, Some("r10")), (1L, 50L, None),
      (1L, 100L, Some("r100")), (1L, 105L, Some("r100"))))
    val fwd = AsOfJoin.forward(left, right, Seq("k"), "ts", "ts",
        tolerance = Some(5L))
      .as[(Long, Long, Option[String])].collect().sortBy(_._2).toSeq
    // 12→100 gap 88 stale; 50→100 gap 50 stale; 100→100 gap 0; 105→none
    assert(fwd == Seq((1L, 12L, None), (1L, 50L, None),
      (1L, 100L, Some("r100")), (1L, 105L, None)))
  }

  test("matches the quadratic range-join formulation on real event data") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val views = ev.filter($"event_type" === "view")
      .groupBy($"user_id", $"ts").agg(max($"value").as("vv"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val merged = AsOfJoin.backward(clicks, views, Seq("user_id"), "ts", "ts")
      .select($"event_id", $"vv")

    // reference implementation: range join + max-ts pick (small data only)
    val pairs = clicks.as("c").join(views.as("v"),
        $"c.user_id" === $"v.user_id" && $"v.ts" <= $"c.ts", "left")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"c.event_id").orderBy($"v.ts".desc_nulls_last)
    val expected = pairs.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).select($"c.event_id", $"v.vv")

    assert(merged.except(expected).count() == 0)
    assert(expected.except(merged).count() == 0)
    assert(merged.count() == clicks.count())
  }
}
