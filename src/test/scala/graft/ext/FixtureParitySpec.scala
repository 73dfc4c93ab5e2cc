package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The q95 gate builds its stored-label fixture ANALYTICALLY (each
  * decade chain d—d+1—d+2—d+3 has component min = d) instead of paying
  * a full connectedComponents invocation per bench pass. This spec is
  * the proof obligation for that shortcut: on the gate's exact pair
  * list, analytic labels ≡ connectedComponents output, row for row.
  */
class FixtureParitySpec extends SparkTestBase {
  import spark.implicits._

  test("q95 analytic stored-label fixture equals a real CC run on the gate's pair list") {
    val d = spark.range(0L, 200L).toDF("i")
    val pairs = d.filter($"i" % 10 <= 2)
      .select($"i".as("id1"), ($"i" + 1L).as("id2"))
    val analytic = pairs.select($"id1".as("id"))
      .unionAll(pairs.select($"id2".as("id")))
      .distinct()
      .select($"id", ($"id" - $"id" % 10).as("component"))
    val real = DedupClusters.connectedComponents(pairs)
    assert(analytic.count() == 80)                         // 20 decades × 4 nodes
    assert(analytic.except(real).isEmpty && real.except(analytic).isEmpty,
      "analytic fixture diverged from connectedComponents output")
  }
}
