package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Token-budget epoch planning: hand-computable allocations, the cap
  * and redistribution semantics, and the accounting identity the
  * planner promises (Σ target + unallocated = budget).
  */
class MixtureSpec extends SparkTestBase {

  import spark.implicits._

  private def plan(tokens: Seq[(String, Long)], parts: Seq[(String, Long)],
                   budget: Long, maxEpochs: Int) =
    Mixture.epochPlan(tokens.toDF("source", "n_tokens"),
        parts.toDF("source", "parts"), budget, maxEpochs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6), r.getLong(7)))
      .toMap

  test("uncapped plan is plain Hamilton over parts") {
    // 100 tokens, parts 1:3 -> 25/75; inventories big enough to hold it
    val p = plan(Seq(("a", 1000L), ("b", 1000L)),
      Seq(("a", 1L), ("b", 3L)), budget = 100L, maxEpochs = 4)
    assert(p("a") == ((25L, 0L, 25L, false, 0L)), p.toString)
    assert(p("b") == ((75L, 0L, 75L, false, 0L)), p.toString)
  }

  test("cap frees tokens that flow to the source with headroom") {
    // equal parts -> 50/50, but a holds only 10 tokens * 2 epochs = 20;
    // the freed 30 flows entirely to b
    val p = plan(Seq(("a", 10L), ("b", 1000L)),
      Seq(("a", 1L), ("b", 1L)), budget = 100L, maxEpochs = 2)
    assert(p("a") == ((20L, 2L, 0L, true, 0L)), p.toString)
    assert(p("b") == ((80L, 0L, 80L, false, 0L)), p.toString)
  }

  test("one redistribution round only: overflow past every cap is reported unallocated") {
    // total capacity 2*(10+20)=60 < budget 100 -> 40 must be honest
    val p = plan(Seq(("a", 10L), ("b", 20L)),
      Seq(("a", 1L), ("b", 1L)), budget = 100L, maxEpochs = 2)
    assert(p("a")._1 == 20L && p("a")._4, p.toString)
    assert(p("b")._1 == 40L && p("b")._4, p.toString)
    assert(p("a")._5 == 40L, s"unallocated must be 40: $p")
  }

  test("accounting identity holds on an awkward mixture") {
    val tokens = Seq(("a", 7L), ("b", 13L), ("c", 997L), ("d", 101L))
    val parts = Seq(("a", 3L), ("b", 1L), ("c", 2L), ("d", 5L))
    val budget = 333L
    val rows = Mixture.epochPlan(tokens.toDF("source", "n_tokens"),
        parts.toDF("source", "parts"), budget, maxEpochs = 3)
      .collect()
    val sumTarget = rows.map(_.getLong(3)).sum
    val unalloc = rows.map(_.getLong(7)).distinct
    assert(unalloc.length == 1)
    assert(sumTarget + unalloc.head == budget,
      s"sum=$sumTarget unalloc=${unalloc.head} budget=$budget")
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(4) * tokens.toMap.apply(r.getString(0))
        + r.getLong(5), s"epoch decomposition broken: $r")
      assert(r.getLong(4) <= 3L)
    }
  }

  test("a source missing from the parts table is excluded") {
    val p = plan(Seq(("a", 100L), ("b", 100L), ("ghost", 100L)),
      Seq(("a", 1L), ("b", 1L)), budget = 50L, maxEpochs = 2)
    assert(!p.contains("ghost") && p("a")._1 == 25L && p("b")._1 == 25L)
  }
}
