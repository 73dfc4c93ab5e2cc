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

  test("trustRank: hosts unreachable from seeds score exactly zero; unlinked seed keeps reset mass") {
    // seed a links to b; c->d is a disconnected spam pair; v is a
    // vetted host with no edges at all
    val e = Seq(("a", "b"), ("c", "d")).toDF("src", "dst")
    val seeds = Seq("a", "v").toDF("host")
    val r = LinkGraph.trustRank(e, "src", "dst", seeds, iters = 6)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("c") == 0.0 && r("d") == 0.0,
      s"unreachable hosts must be exactly 0: $r")
    assert(r("a") > 0.0 && r("b") > 0.0)
    assert(r("v") > 0.0, "unlinked seed must keep its reset mass")
  }

  test("trustRank with every host seeded equals pageRank") {
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")).toDF("src", "dst")
    val seeds = Seq("a", "b", "c").toDF("host")
    val pr = LinkGraph.pageRank(e, "src", "dst", iters = 4)
      .collect().map(x => (x.getString(0), x.getDouble(1))).sortBy(_._1)
    val tr = LinkGraph.trustRank(e, "src", "dst", seeds, iters = 4)
      .collect().map(x => (x.getString(0), x.getDouble(1))).sortBy(_._1)
    // identical reset vector (uniform) -> identical iterates, up to the
    // shared grid: the expression trees differ only in p(v) == 1/N
    pr.zip(tr).foreach { case ((h1, a), (h2, b)) =>
      assert(h1 == h2 && math.abs(a - b) < 1e-12, s"$h1: $a vs $b")
    }
  }

  test("hostEdgesFromHtml extracts absolute-href hosts, skips relative links, dedups") {
    val docs = Seq(
      ("news.example", """<a href="https://blog.example/post/1">x</a>
        <a HREF='http://blog.example/other'>y</a>
        <a href="/local/page">rel</a>
        <a href="https://shop.example:8443/item?id=2#frag">z</a>"""),
      ("blog.example", """no links here""")).toDF("host", "html")
    val e = LinkGraph.hostEdgesFromHtml(docs, col("host"), col("html"))
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(e.toSeq == Seq(
      ("news.example", "blog.example"),
      ("news.example", "shop.example")), e.mkString(", "))
  }

  test("followOnly drops rel=nofollow links, keeps endorsed ones") {
    val docs = Seq(("news.example",
      """<a href="https://endorsed.example/x">good</a>
        |<a rel="nofollow" href="https://sponsored.example/y">ad</a>
        |<a href="https://also.example/z" REL='ugc nofollow'>ugc</a>""".stripMargin))
      .toDF("host", "html")
    val all = LinkGraph.hostEdgesFromHtml(docs, col("host"), col("html"))
      .collect().map(_.getString(1)).sorted
    assert(all.toSeq == Seq("also.example", "endorsed.example", "sponsored.example"))
    val followed = LinkGraph.hostEdgesFromHtml(docs, col("host"), col("html"),
        followOnly = true)
      .collect().map(_.getString(1)).sorted
    assert(followed.toSeq == Seq("endorsed.example"), followed.mkString(","))
  }

  test("pageRankWarm: resuming from the fixed point moves nothing; new hosts get default mass") {
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val cold = LinkGraph.pageRank(e, "src", "dst", iters = 12)
    val warm = LinkGraph.pageRankWarm(e, "src", "dst", cold, iters = 1)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    val fixed = cold.collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    fixed.foreach { case (h, r) =>
      assert(math.abs(warm(h) - r) < 1e-9, s"$h drifted: ${warm(h)} vs $r")
    }
    // grow the graph: a new host d linked from a; warm restart covers it
    val e2 = e.unionAll(Seq(("a", "d")).toDF("src", "dst"))
    val warm2 = LinkGraph.pageRankWarm(e2, "src", "dst", cold, iters = 4)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(warm2.contains("d") && warm2("d") > 0.0)
    assert(math.abs(warm2.values.sum - 1.0) < 1e-6,
      s"renormalized mass must stay ~1: ${warm2.values.sum}")
  }

  test("mutualPairs keeps only reciprocated links; mirrorClusters merges transitively") {
    val e = Seq(
      ("a", "b"), ("b", "a"),       // mirror pair
      ("b", "c"), ("c", "b"),       // chains the cluster to c
      ("x", "a"),                   // one-way in
      ("a", "y")).toDF("src", "dst") // one-way out
    val mp = LinkGraph.mutualPairs(e, "src", "dst")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(mp.toSeq == Seq(("a", "b"), ("b", "c")), mp.mkString(","))
    val cc = LinkGraph.mirrorClusters(e, "src", "dst")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cc == Map("a" -> "a", "b" -> "a", "c" -> "a"), cc.toString)
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

  test("hits: exact alternating-walk counts on a hand-computed triangle") {
    // a→b, a→c, b→c:
    //   iter1: auth b=1, c=2;  hub a=3, b=2, c=0
    //   iter2: auth b=3, c=5;  hub a=8, b=5, c=0
    val e = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
    val out = LinkGraph.hits(e, "src", "dst", iters = 2)
      .collect()
      .map(r => r.getString(0) ->
        (r.getDecimal(1).longValueExact(), r.getDecimal(2).longValueExact()))
      .toMap
    assert(out == Map("a" -> (8L, 0L), "b" -> (5L, 3L), "c" -> (0L, 5L)),
      out.toString)
  }

  test("hits: duplicated edges collapse; one iteration gives degree counts") {
    val once = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val duped = once.unionAll(Seq(("a", "b"), ("a", "b")).toDF("src", "dst"))
    def run(df: org.apache.spark.sql.DataFrame) =
      LinkGraph.hits(df, "src", "dst", iters = 1)
        .collect()
        .map(r => (r.getString(0), r.getDecimal(1).longValueExact(),
          r.getDecimal(2).longValueExact())).sorted.toSeq
    assert(run(once) == run(duped))
    // cycle: every node has in-degree 1 → auth=1; hub = auth of its
    // one target = 1
    assert(run(once) == Seq(("a", 1L, 1L), ("b", 1L, 1L), ("c", 1L, 1L)))
  }

  test("seedDistance: chain depths, maxDepth cutoff, unlinked seed, unreached host") {
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("x", "a")).toDF("src", "dst")
    val seeds = Seq("a", "ghost").toDF("host")
    val out = LinkGraph.seedDistance(e, "src", "dst", seeds, maxDepth = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // d is at depth 3 > maxDepth and x is upstream of the seeds: both absent
    assert(out == Map("a" -> 0L, "ghost" -> 0L, "b" -> 1L, "c" -> 2L),
      out.toString)
  }

  test("depthScreen keeps exactly the docs whose host is within range") {
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val dists = LinkGraph.seedDistance(e, "src", "dst",
      Seq("a").toDF("host"), maxDepth = 3)
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "zzz"))
      .toDF("doc_id", "host")
    val kept = LinkGraph.depthScreen(docs, col("host"), dists, maxDepth = 1)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 2L), kept.toString)
  }
}
