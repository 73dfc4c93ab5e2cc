package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CdcSpec extends SparkTestBase {

  import spark.implicits._

  // (key, payload, version, op): k1 updated twice; k2 deleted last;
  // k3 insert only; k4 deleted then re-inserted
  private val changes = Seq(
    (1L, "a1", 1, "U"), (1L, "a2", 2, "U"), (1L, "a3", 5, "U"),
    (2L, "b1", 1, "U"), (2L, "b?", 3, "D"),
    (3L, "c1", 2, "U"),
    (4L, "d1", 1, "U"), (4L, "d?", 2, "D"), (4L, "d2", 4, "U"))
    .toDF("k", "payload", "v", "op")

  test("latestSnapshot: newest image wins, deleted keys drop") {
    val snap = Cdc.latestSnapshot(changes, $"k", $"v", $"op")
      .select($"k", $"payload").as[(Long, String)].collect().toSet
    assert(snap == Set((1L, "a3"), (3L, "c1"), (4L, "d2")))
  }

  test("scd2: intervals chain, deletes close but emit nothing") {
    val hist = Cdc.scd2(changes, $"k", $"v", $"op")
      .select($"k", $"payload", $"valid_from", $"valid_to", $"is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect()
      .sortBy(r => (r._1, r._3))
    assert(hist.toSeq == Seq(
      (1L, "a1", 1L, Some(2L), false),
      (1L, "a2", 2L, Some(5L), false),
      (1L, "a3", 5L, None, true),
      (2L, "b1", 1L, Some(3L), false), // closed by the delete
      (3L, "c1", 2L, None, true),
      (4L, "d1", 1L, Some(2L), false),
      (4L, "d2", 4L, None, true)))
  }
}
