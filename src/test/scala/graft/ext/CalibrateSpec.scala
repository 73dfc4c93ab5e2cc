package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Isotonic calibration: PAVA pooling on hand fixtures, monotonicity,
  * mean preservation, and the densified serving path (range clamp +
  * interior-gap backward fill).
  */
class CalibrateSpec extends SparkTestBase {
  import spark.implicits._

  // bucket means 0.2, 0.6, 0.4, 0.8 — the middle pair violates
  // monotonicity and must pool to (3+2)/(5+5) = 0.5
  private def handStats = Seq(
    (0L, 5L, 1L),   // mean 0.2
    (1L, 5L, 3L),   // mean 0.6  ┐ pooled
    (2L, 5L, 2L),   // mean 0.4  ┘  → 0.5
    (3L, 5L, 4L)    // mean 0.8
  ).toDF("bucket", "n", "pos")

  test("PAVA pools adjacent violators to the weighted mean") {
    val fit = Calibrate.isotonicFit(handStats)
      .orderBy("bucket").collect()
    assert(fit.map(_.getDouble(3)).toSeq == Seq(0.2, 0.5, 0.5, 0.8))
  }

  test("fitted values are non-decreasing and preserve the global mean") {
    val docs = (0 until 400).map { i =>
      // score = i/40 with a deterministic sawtooth label
      (i.toLong, i / 40.0, if ((i * 7) % 10 < (i / 40)) 1 else 0)
    }.toDF("id", "score", "label")
    val fit = Calibrate.fit(docs, col("score"), col("label"),
        grid = 4, lo = 0, hi = 40)
      .orderBy("bucket").collect()
    val fitted = fit.map(_.getDouble(3)).toSeq
    assert(fitted.zip(fitted.tail).forall { case (a, b) => a <= b },
      s"not monotone: $fitted")
    // isotonic regression preserves the weighted mean exactly
    val wsum = fit.map(r => r.getLong(1) * r.getDouble(3)).sum
    val n = fit.map(_.getLong(1)).sum
    val posTotal = fit.map(_.getLong(2)).sum
    assert(math.abs(wsum - posTotal.toDouble) < 1e-9 * n)
  }

  test("single bucket and all-equal labels are fixed points") {
    val one = Seq((5L, 10L, 7L)).toDF("bucket", "n", "pos")
    assert(Calibrate.isotonicFit(one).collect().head.getDouble(3) == 0.7)
    val flat = Seq((0L, 4L, 4L), (1L, 6L, 6L)).toDF("bucket", "n", "pos")
    assert(Calibrate.isotonicFit(flat).orderBy("bucket").collect()
      .map(_.getDouble(3)).toSeq == Seq(1.0, 1.0))
  }

  test("calibrate clamps out-of-range scores and fills interior gaps") {
    // fit over buckets {0, 1, 3} (gap at 2), grid = 1
    val fit = Calibrate.isotonicFit(Seq(
      (0L, 4L, 0L), (1L, 4L, 2L), (3L, 4L, 4L)).toDF("bucket", "n", "pos"))
    val rows = Seq(
      (-1L, -5.0),  // below range → bucket 0's value
      (0L, 0.5),    // bucket 0
      (2L, 2.5),    // gap → backward fill from bucket 1
      (9L, 9.0)     // above range → bucket 3's value
    ).toDF("id", "score")
    val out = Calibrate.calibrate(rows, col("score"), fit, grid = 1)
      .orderBy("id").select("id", "calibrated").as[(Long, Double)].collect()
    assert(out.toSeq == Seq((-1L, 0.0), (0L, 0.0), (2L, 0.5), (9L, 1.0)))
  }
}
