package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Count-Min: the overcount-only invariant (estimate >= truth, always),
  * the candidate-superset property the confirm pass relies on, merge
  * invariance across partition layouts, and the pruning behaviour on a
  * planted skewed corpus (confirm pass touches only candidate keys).
  */
class CountMinSpec extends SparkTestBase {

  import spark.implicits._

  // planted Zipf-ish corpus: "hot" 60×, "warm" 12×, 40 singletons
  private def corpus = {
    val rows = Seq.fill(60)("hot") ++ Seq.fill(12)("warm") ++
      (0 until 40).map(i => s"cold_$i")
    rows.toDF("key")
  }

  test("estimates never under-count (overcount-only), at a collision-heavy width") {
    val cells = CountMin.sketchCells(corpus, $"key", depth = 3, width = 8)
    val est = CountMin.estimates(cells, corpus, $"key", depth = 3, width = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = corpus.groupBy($"key").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, n) =>
      assert(est(k) >= n, s"$k: est ${est(k)} < true $n")
    }
  }

  test("sketch candidates are a superset of the true heavy hitters") {
    val cells = CountMin.sketchCells(corpus, $"key", depth = 3, width = 8)
    val cand = CountMin.estimates(cells, corpus, $"key", depth = 3, width = 8)
      .filter($"est" >= 10).select($"key").as[String].collect().toSet
    assert(cand.contains("hot") && cand.contains("warm"))
  }

  test("heavyHittersExact returns exact counts with no collision survivors") {
    val got = CountMin.heavyHittersExact(corpus, $"key", threshold = 10L,
        depth = 3, width = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("hot" -> 60L, "warm" -> 12L), got.toString)
  }

  test("sketch is invariant to partition layout (mergeable state)") {
    def cellsOf(parts: Int) =
      CountMin.sketchCells(corpus.repartition(parts), $"key", depth = 4, width = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(cellsOf(1) == cellsOf(7))
  }

  test("plan: sketch aggregates via ObjectHashAggregate with a partial stage") {
    val p = CountMin.sketchCells(corpus, $"key", depth = 4, width = 16)
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_countminagg") || p.contains("partial_"), p)
  }

  test("confirm pass prunes with a row-literal estimate filter: no join, no second probe shuffle") {
    // r17 shape: the bounded sketch matrix is collected and the
    // estimate evaluated as a row expression, so the confirm plan is
    // scan → Filter → hash aggregate — no join of any kind and no
    // key-cardinality distinct (the old probe's shuffle)
    val p = CountMin.heavyHittersExact(corpus, $"key", threshold = 10L,
        depth = 3, width = 8)
      .queryExecution.sparkPlan.toString
    assert(!p.contains("Join"), p)
    assert(p.contains("Filter"), p)
  }

  test("mergeCells over any batch split equals the one-pass sketch (incremental maintenance)") {
    val one = CountMin.sketchCells(corpus, $"key", depth = 3, width = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val parts = (0 until 3).map(i =>
      CountMin.sketchCells(
        corpus.filter(pmod(xxhash64($"key"), lit(3)) === i), $"key",
        depth = 3, width = 8))
    val merged = CountMin.mergeCells(parts)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == one)
  }

  test("total mass is conserved per sketch row (each input bumps one counter per row)") {
    val cells = CountMin.sketchCells(corpus, $"key", depth = 3, width = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val n = corpus.count()
    cells.groupBy(_._1).foreach { case (j, cs) =>
      assert(cs.map(_._2).sum == n, s"row $j mass")
    }
  }
}
