package graft.ops

import graft.SparkTestBase
import graft.functions.IntervalTable
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {

  import spark.implicits._

  test("lookupJoin: containment, boundary keys, and misses") {
    val dim = Seq((10L, 19L, 1L), (20L, 29L, 2L), (100L, 100L, 3L))
      .toDF("lo", "hi", "v")
    val table = RangeJoin.intervalTable(dim, $"lo", $"hi", $"v")
    val facts = Seq(9L, 10L, 15L, 19L, 20L, 29L, 30L, 99L, 100L, 101L)
      .toDF("key")
    val got = RangeJoin.lookupJoin(facts, $"key", table, "v")
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(
      9L -> None, 10L -> Some(1L), 15L -> Some(1L), 19L -> Some(1L),
      20L -> Some(2L), 29L -> Some(2L), 30L -> None, 99L -> None,
      100L -> Some(3L), 101L -> None))
  }

  test("intervalTable rejects overlaps, empty intervals, and the reserved value") {
    intercept[IllegalArgumentException] {
      IntervalTable.build(Array((1L, 10L, 1L), (10L, 20L, 2L))) // shared point
    }
    intercept[IllegalArgumentException] {
      IntervalTable.build(Array((5L, 4L, 1L)))
    }
    intercept[IllegalArgumentException] {
      IntervalTable.build(Array((1L, 2L, Long.MinValue)))
    }
    assert(IntervalTable.build(Array.empty[(Long, Long, Long)]).lookup(7L)
      == IntervalTable.Miss)
  }

  test("FuzzyJoin: same-block typos matched within maxDist; cross-block pairs unreachable") {
    val gold = Seq((1L, "saint marys medical center"),
      (2L, "oak valley clinic"), (3L, "riverside hospital")).toDF("id", "name")
    val dirty = Seq((10L, "saint marys medical centre"),   // dist 2 to id 1
      (11L, "oak valey clinic"),                            // dist 1 to id 2
      (12L, "stone riverside hospital")                     // close to id 3 but block 'stone'
    ).toDF("id", "name")
    val got = FuzzyJoin.byEditDistance(gold, $"id", $"name",
        dirty, $"id", $"name", t => split(t, " ")(0), maxDist = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // 3↔12 is in another block ('riverside' vs 'stone') — unreachable
    assert(got == Seq((1L, 10L, 2L), (2L, 11L, 1L)))

    val none = FuzzyJoin.byEditDistance(gold, $"id", $"name",
        dirty, $"id", $"name", t => split(t, " ")(0), maxDist = 0)
    assert(none.count() == 0)
  }

  test("Expectations: a clean table reports every check with zero violations") {
    val dim = Seq((1L, "a"), (2L, "b")).toDF("pk", "x")
    val facts = Seq((10L, 1L, 5.0), (11L, 2L, 7.5), (12L, 1L, 1.0))
      .toDF("id", "fk", "v")
    val rep = Expectations.report(facts,
        rowChecks = Seq("v_positive" -> ($"v" <= 0), "fk_not_null" -> $"fk".isNull),
        uniqueKeys = Seq("id_unique" -> Seq($"id")),
        foreignKeys = Seq(("fk_valid", $"fk", dim, $"pk")))
      .as[(String, Long)].collect().toMap
    // green rows are still emitted — a passing check is visible, not absent
    assert(rep == Map("v_positive" -> 0L, "fk_not_null" -> 0L,
      "id_unique" -> 0L, "fk_valid" -> 0L))
  }

  test("lookupJoin matches Spark's native BETWEEN join on random interval sets") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      // random non-overlapping intervals via a sorted cut sequence
      var cursor = 0L
      val ivs = (1L to 40L).map { v =>
        val lo = cursor + 1 + rnd.nextInt(5)
        val hi = lo + rnd.nextInt(8)
        cursor = hi
        (lo, hi, v)
      }
      val dim = ivs.toDF("lo", "hi", "v")
      val keys = (1 to 300).map(_ => rnd.nextLong(cursor + 10)).toDF("key")
      val table = RangeJoin.intervalTable(dim, $"lo", $"hi", $"v")
      val viaLookup = RangeJoin.lookupJoin(keys, $"key", table, "v")
        .filter($"v".isNotNull).as[(Long, Long)].collect().sorted.toSeq
      val viaJoin = keys.join(dim, $"key" >= $"lo" && $"key" <= $"hi")
        .select($"key", $"v").as[(Long, Long)].collect().sorted.toSeq
      assert(viaLookup == viaJoin, s"seed=$seed")
    }
  }
}
