package graft.ext

import graft.SparkTestBase

/** bandingPlan: the ppm-grid S-curve tracks the real-valued banding
  * probability within the documented floor-error bound, is monotone in
  * j per band choice, and puts the 0.5-crossings where the closed form
  * says (k=128: b=32 → 0.40 on a 5% grid, b=16 → 0.70, b=8 → 0.90).
  */
class LshPlanSpec extends SparkTestBase {

  private lazy val rows =
    MinHashLsh.bandingPlan(spark, k = 128, bandOptions = Seq(8, 16, 32))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("ppm grid tracks the closed form within the floor-error bound") {
    assert(rows.length == 3 * 19)
    rows.foreach { case (b, r, j, p) =>
      assert(r == 128 / b)
      val exact = 1.0 - math.pow(1.0 - math.pow(j / 1e6, r.toDouble), b.toDouble)
      // each of the (r−1)+(b−1) floors discards < 1 ppm, amplified by
      // at most b through the outer power — 500 ppm is generous slack
      assert(math.abs(p - exact * 1e6) <= 500.0,
        s"b=$b j=$j: grid $p vs exact ${exact * 1e6}")
    }
  }

  test("monotone nondecreasing in j within each band option") {
    rows.groupBy(_._1).foreach { case (_, g) =>
      val ps = g.sortBy(_._3).map(_._4)
      assert(ps.zip(ps.tail).forall { case (a, c) => a <= c })
    }
  }

  test("0.5-crossings land on the documented grid points") {
    def crossing(b: Long): Long =
      rows.filter(t => t._1 == b && t._4 >= 500000L).map(_._3).min
    assert(crossing(32) == 400000L) // closed form 0.3826
    assert(crossing(16) == 700000L) // closed form 0.6736
    assert(crossing(8) == 900000L)  // closed form 0.8559
  }

  test("band options that do not divide k are rejected") {
    intercept[IllegalArgumentException] {
      MinHashLsh.bandingPlan(spark, k = 128, bandOptions = Seq(12))
    }
  }
}
