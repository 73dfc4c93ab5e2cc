package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Containment (asymmetric subset-dup) join: completeness of the
  * prefix-filtered candidate generation against a brute-force mirror,
  * the asymmetry itself (excerpt→source fires, source→excerpt does
  * not), exact integer threshold behavior at the boundary, and the
  * plan shape (equi-joins only — no cartesian anywhere).
  */
class ContainmentSpec extends SparkTestBase {
  import spark.implicits._

  private val prose = Seq(
    "the migration of arctic terns spans both hemispheres each year " +
      "crossing oceans deserts and storm systems on a route longer than " +
      "any other animal journey known to science",
    "volcanic soils hold water differently from clay which is why the " +
      "terraced fields of the region drain overnight even after days of " +
      "heavy rain during the monsoon season",
    "a completely unrelated recipe for flatbread needs flour water salt " +
      "and a very hot stone surface to bake on within a minute or two")

  test("excerpt is contained in its source, not vice versa") {
    val excerpt = prose.head.substring(20, 120)
    val docs = (prose.zipWithIndex.map { case (t, i) => (i.toLong, t) } :+
      (100L, excerpt)).toDF("id", "text")
    val out = Containment.containedPairs(docs, $"id", $"text", n = 8,
      tauNum = 9, tauDen = 10).collect()
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((100L, 0L)), s"excerpt→source missing: ${pairs}")
    assert(!pairs.contains((0L, 100L)), "source must not be 'contained' in its excerpt")
    val row = out.find(r => r.getLong(0) == 100L && r.getLong(1) == 0L).get
    // every 8-gram of a contiguous substring is an 8-gram of the source
    assert(row.getAs[Double]("containment") == 1.0)
    assert(row.getAs[Long]("inter") == row.getAs[Long]("n1"))
  }

  test("prefix-filtered candidates lose nothing vs the exhaustive join") {
    // overlapping text blocks engineered so several partial-overlap
    // pairs sit above AND below the threshold
    val docs = (0 until 24).map { i =>
      val words = (0 until 30).map(j => s"w${(i * 7 + j * 3) % 40}")
      (i.toLong, words.mkString(" "))
    }.toDF("id", "text")
    val fast = Containment.containedPairs(docs, $"id", $"text", n = 8,
        tauNum = 3, tauDen = 5)
      .select("id1", "id2", "n1", "inter").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // brute force: full inverted-index join, no prefix filter
    val sh = docs.select($"id", explode(ShingleJaccard.charShingles($"text", 8)).as("s"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n1"))
    val brute = sh.select($"id".as("id1"), $"s")
      .join(sh.select($"id".as("id2"), $"s"), Seq("s"))
      .filter($"id1" =!= $"id2")
      .groupBy("id1", "id2").agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed("id", "id1"), Seq("id1"))
      .filter($"inter" * 5 >= $"n1" * 3)
      .select("id1", "id2", "n1", "inter").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(fast == brute,
      s"prefix filter dropped pairs: missing=${brute -- fast} extra=${fast -- brute}")
    assert(brute.nonEmpty, "fixture should produce at least one pair")
  }

  test("threshold boundary is exact integer arithmetic") {
    // A = "abcdefghijkl" has 5 8-grams; B concatenates exactly 4 of
    // them ('|' separators add grams that are not A's): containment
    // is exactly 4/5 — must PASS at tau = 4/5 (>=) and FAIL at 81/100
    val tA = "abcdefghijkl"
    val grams = (0 until 5).map(i => tA.substring(i, i + 8))
    val tB = grams.take(4).mkString("|")
    val docs = Seq((1L, tA), (2L, tB)).toDF("id", "text")
    val pass = Containment.containedPairs(docs, $"id", $"text", 8, 4, 5)
      .filter($"id1" === 1).collect()
    assert(pass.length == 1 && pass.head.getAs[Long]("inter") == 4L &&
      pass.head.getAs[Long]("n1") == 5L)
    val fail = Containment.containedPairs(docs, $"id", $"text", 8, 81, 100)
      .filter($"id1" === 1).collect()
    assert(fail.isEmpty, "4/5 must fail an 81/100 threshold")
  }

  test("short documents (single whole-text shingle) behave") {
    val docs = Seq((1L, "tiny"), (2L, "tiny plus a long continuation here"),
      (3L, "tiny")).toDF("id", "text")
    val out = Containment.containedPairs(docs, $"id", $"text", 8, 1, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // "tiny" (one shingle: the whole text) is NOT an 8-gram of doc 2
    // (its shingles are 8-char windows), but 1 and 3 are identical
    assert(out == Set((1L, 3L), (3L, 1L)), s"got $out")
  }

  test("plan: equi-joins only, no cartesian or nested loop") {
    val docs = prose.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val plan = Containment.containedPairs(docs, $"id", $"text", 8, 4, 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
