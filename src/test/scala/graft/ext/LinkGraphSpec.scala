package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** PageRank over a host graph: hand-computable fixtures, mass
  * conservation, dangling handling, and partition invariance (the
  * properties the q131 oracle gate relies on).
  */
class LinkGraphSpec extends SparkTestBase {

  import spark.implicits._

  test("two-node cycle converges to the uniform distribution") {
    // a <-> b: symmetric, so every iteration keeps rank = 1/2 exactly
    val e = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val r = LinkGraph.pageRank(e, "src", "dst", iters = 5)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(r("a") - 0.5) < 1e-12, s"got ${r("a")}")
    assert(math.abs(r("b") - 0.5) < 1e-12, s"got ${r("b")}")
  }

  test("a pure sink absorbs rank; dangling mass is redistributed, total stays ~1") {
    // star into a sink: a,b,c -> s; s has no out-edges (dangling)
    val e = Seq(("a", "s"), ("b", "s"), ("c", "s")).toDF("src", "dst")
    val out = LinkGraph.pageRank(e, "src", "dst", iters = 10)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(out("s") > out("a"), "sink must out-rank its sources")
    assert(out("a") == out("b") && out("b") == out("c"),
      "symmetric sources must tie exactly")
    val total = out.values.sum
    assert(math.abs(total - 1.0) < 1e-9, s"mass not conserved: $total")
  }

  test("multi-edges collapse: duplicated edge changes nothing") {
    val once = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val duped = once.unionAll(Seq(("a", "b"), ("a", "b")).toDF("src", "dst"))
    val r1 = LinkGraph.pageRank(once, "src", "dst", iters = 3)
      .collect().map(x => (x.getString(0), x.getDouble(1))).sortBy(_._1)
    val r2 = LinkGraph.pageRank(duped, "src", "dst", iters = 3)
      .collect().map(x => (x.getString(0), x.getDouble(1))).sortBy(_._1)
    assert(r1.sameElements(r2))
  }

  test("ranks are bit-identical under input repartitioning") {
    val e = (0L until 400L).map(i =>
      (s"h${i % 23}", s"h${(i * 7 + 3) % 23}")).toDF("src", "dst")
    val a = LinkGraph.pageRank(e, "src", "dst", iters = 3)
      .collect().map(x => (x.getString(0), x.getDouble(1))).sortBy(_._1)
    val b = LinkGraph.pageRank(e.repartition(7), "src", "dst", iters = 3)
      .collect().map(x => (x.getString(0), x.getDouble(1))).sortBy(_._1)
    assert(a.sameElements(b), "partitioning leaked into the ranks")
  }

  test("higher in-degree from high-rank sources means higher rank") {
    // hub h is linked by everyone; spoke nodes only by the chain
    val spokes = (0 until 6).map(i => (s"n$i", "h")) ++
      (0 until 6).map(i => (s"n$i", s"n${(i + 1) % 6}"))
    val out = LinkGraph.pageRank(spokes.toDF("src", "dst"), "src", "dst", iters = 8)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(out("h") > out.filter(_._1 != "h").values.max,
      s"hub must dominate: $out")
  }
}
