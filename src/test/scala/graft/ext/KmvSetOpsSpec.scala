package graft.ext

import graft.SparkTestBase
import graft.functions.KmvSketchAgg
import org.apache.spark.sql.functions._

/** Set algebra from KMV sketch state: exact in the degenerate regime,
  * inclusion–exclusion-consistent and usefully accurate in the
  * estimator regime.
  */
class KmvSetOpsSpec extends SparkTestBase {
  import spark.implicits._

  // two overlapping integer sets: A = 1..600, B = 401..1000 (overlap 200)
  private def sketches(k: Int) = {
    val a = spark.range(1L, 601L).toDF("v")
      .select(MinHashLsh.portableHash32($"v".cast("string")).as("h"))
      .agg(KmvSketchAgg.kMinima($"h", k).as("a"))
    val b = spark.range(401L, 1001L).toDF("v")
      .select(MinHashLsh.portableHash32($"v".cast("string")).as("h"))
      .agg(KmvSketchAgg.kMinima($"h", k).as("b"))
    a.crossJoin(b)
  }

  private def ests(k: Int): (Double, Double, Double, Double) = {
    val r = sketches(k).select(
      KmvSetOps.unionEstimate($"a", $"b", k).as("u"),
      KmvSetOps.intersectEstimate($"a", $"b", k).as("i"),
      KmvSetOps.differenceEstimate($"a", $"b", k).as("dab"),
      KmvSetOps.differenceEstimate($"b", $"a", k).as("dba")).collect()(0)
    (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
  }

  test("degenerate regime (k beyond both cardinalities) is exact") {
    val (u, i, dab, dba) = ests(2048)
    assert(u == 1000.0 && i == 200.0 && dab == 400.0 && dba == 400.0,
      s"($u, $i, $dab, $dba)")
  }

  test("estimator regime: within 20% at k=256, and the three parts sum to the union exactly") {
    // RSE of the part estimates is ~1/sqrt(k·p); at k=256 over a
    // 1000-element union the worst part here measures ~16% on this
    // fixed hash draw (the draw is deterministic — this is a pinned
    // reading, not a flaky sample)
    val (u, i, dab, dba) = ests(256)
    assert(math.abs(u - 1000.0) / 1000.0 < 0.20, s"union est $u")
    assert(math.abs(i - 200.0) / 200.0 < 0.20, s"intersect est $i")
    assert(math.abs(dab - 400.0) / 400.0 < 0.20, s"diff est $dab")
    // inclusion–exclusion consistency is structural, not approximate:
    // the three survivor counts partition the k union samples
    assert(math.abs((i + dab + dba) - u) < 1e-6, s"$i + $dab + $dba != $u")
  }

  test("disjoint sets: intersection estimates to zero in both regimes") {
    val a = spark.range(1L, 301L).toDF("v")
      .select(MinHashLsh.portableHash32(concat(lit("a"), $"v")).as("h"))
      .agg(KmvSketchAgg.kMinima($"h", 32).as("a"))
    val b = spark.range(1L, 301L).toDF("v")
      .select(MinHashLsh.portableHash32(concat(lit("b"), $"v")).as("h"))
      .agg(KmvSketchAgg.kMinima($"h", 32).as("b"))
    val r = a.crossJoin(b).select(
      KmvSetOps.intersectEstimate($"a", $"b", 32).as("i")).collect()(0)
    assert(r.getDouble(0) == 0.0)
  }
}
