package graft.functions

import graft.SparkTestBase
import graft.ops.Aggs
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkTestBase {

  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy($"g").orderBy($"s".desc, $"i".asc)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
      .select($"g", $"rank", $"s".as("score"), $"i".as("id"))
  }

  test("groupedTopK matches the window formulation on random data with score ties") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      // few distinct scores → plenty of ties exercising the id tiebreak
      val rows = (1L to 400L).map(i => (s"g${rnd.nextInt(6)}", rnd.nextInt(9).toDouble, i))
      val df = rows.toDF("g", "s", "i").repartition(7)
      val got = Aggs.groupedTopK(df, Seq($"g"), $"s", $"i", k = 5)
        .as[(String, Long, Double, Long)].collect().sorted.toSeq
      val want = windowTopK(df, 5)
        .as[(String, Long, Double, Long)].collect().sorted.toSeq
      assert(got == want, s"seed=$seed")
    }
  }

  test("duplicate (score, id) rows are retained like the window formulation") {
    // two full duplicates of (2.0, 7) in group a: row_number() keeps
    // both; a set-backed buffer would collapse them to one
    val df = Seq(("a", 2.0, 7L), ("a", 2.0, 7L), ("a", 1.0, 1L), ("a", 3.0, 2L),
      ("b", 5.0, 3L)).toDF("g", "s", "i").repartition(4)
    val got = Aggs.groupedTopK(df, Seq($"g"), $"s", $"i", k = 3)
      .as[(String, Long, Double, Long)].collect().sorted.toSeq
    val want = windowTopK(df, 3)
      .as[(String, Long, Double, Long)].collect().sorted.toSeq
    assert(got == want)
    assert(got.count(r => r._1 == "a" && r._3 == 2.0 && r._4 == 7L) == 2)
  }

  test("duplicate retention matches the window form across partitions and eviction") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      // ids drawn from a tiny space → many exact (score, id) duplicates
      val rows = (1 to 500).map(_ => (s"g${rnd.nextInt(4)}", rnd.nextInt(5).toDouble,
        rnd.nextInt(8).toLong))
      val df = rows.toDF("g", "s", "i").repartition(11)
      val got = Aggs.groupedTopK(df, Seq($"g"), $"s", $"i", k = 6)
        .as[(String, Long, Double, Long)].collect().sorted.toSeq
      val want = windowTopK(df, 6)
        .as[(String, Long, Double, Long)].collect().sorted.toSeq
      assert(got == want, s"seed=$seed")
    }
  }

  test("groups smaller than k return all members; k=1 returns the max") {
    val df = Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("b", 5.0, 3L)).toDF("g", "s", "i")
    val all3 = Aggs.groupedTopK(df, Seq($"g"), $"s", $"i", k = 10)
      .as[(String, Long, Double, Long)].collect()
    assert(all3.length == 3)
    val top1 = Aggs.groupedTopK(df, Seq($"g"), $"s", $"i", k = 1)
      .as[(String, Long, Double, Long)].collect().sortBy(_._1).toSeq
    assert(top1 == Seq(("a", 1L, 2.0, 2L), ("b", 1L, 5.0, 3L)))
  }

  test("result is partition-invariant (merge path exercised)") {
    val rows = (1L to 300L).map(i => ("g" + i % 3, (i % 11).toDouble, i))
    val df = rows.toDF("g", "s", "i")
    val a = Aggs.groupedTopK(df.repartition(1), Seq($"g"), $"s", $"i", 4)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val b = Aggs.groupedTopK(df.repartition(13, $"i"), Seq($"g"), $"s", $"i", 4)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(a == b)
  }

  test("plans as ObjectHashAggregate with map-side partial — no Window, no full sort") {
    val df = graft.Tables.table(spark, "/root/testdata/sf0.001", "orders")
    val plan = Aggs.groupedTopK(df, Seq($"o_custkey"), $"o_totalprice", $"o_orderkey", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_topkagg") || plan.contains("partial_"), plan)
    assert(!plan.contains("Window"), plan)
  }
}
