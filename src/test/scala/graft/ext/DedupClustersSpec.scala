package graft.ext

import graft.SparkTestBase

/** Connected-components cluster canonicalization over pair lists. */
class DedupClustersSpec extends SparkTestBase {
  import spark.implicits._

  private def pairs(ps: (Long, Long)*) = ps.toDF("id1", "id2")

  test("transitive chain collapses to one component labeled by its min") {
    // 5-4, 4-3, 3-2, 2-1: a chain needs multiple propagation rounds
    val out = DedupClusters.connectedComponents(pairs(5L -> 4L, 4L -> 3L, 3L -> 2L, 2L -> 1L))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(out == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint components keep separate min labels") {
    val out = DedupClusters.connectedComponents(pairs(10L -> 11L, 12L -> 11L, 20L -> 21L))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(out == Seq(10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("keepCanonical keeps min-id per cluster and passes unpaired docs through") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (9L, "solo")).toDF("doc_id", "text")
    val kept = DedupClusters.keepCanonical(docs, "doc_id", pairs(2L -> 1L, 3L -> 2L))
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 9L))
  }

  test("empty pair list yields empty components; keepCanonical passes all docs") {
    val noPairs = pairs()
    assert(DedupClusters.connectedComponents(noPairs).count() == 0)
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    assert(DedupClusters.keepCanonical(docs, "doc_id", noPairs).count() == 2)
  }

  test("random graphs match a driver-side union-find reference") {
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(50)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }
      // union-find reference
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        .map(id => id -> {
          // min member of the component = min over nodes with same root
          val root = find(id)
          edges.flatMap(e => Seq(e._1, e._2)).distinct
            .filter(find(_) == root).min
        })
      val got = DedupClusters.connectedComponents(edges.toDF("id1", "id2"))
        .orderBy("id").as[(Long, Long)].collect().toSeq
      assert(got == expected, s"seed=$seed")
    }
  }

  test("result is partition-invariant") {
    val p = pairs(1L -> 2L, 3L -> 4L, 2L -> 3L, 7L -> 8L)
    val expected = DedupClusters.connectedComponents(p.repartition(1))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val multi = DedupClusters.connectedComponents(p.repartition(7))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(multi == expected)
    assert(expected == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("leakageSafeSplit: no near-dup pair ever straddles a split; singletons split independently") {
    val docs = (1L to 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // 50 chained pairs → 50 two-doc clusters, plus 100 singleton docs
    val p = pairs((1L to 100L by 2).map(i => i -> (i + 1)): _*)
    val out = DedupClusters.leakageSafeSplit(docs, "doc_id", p,
        Seq("train" -> 204, "val" -> 26, "test" -> 26), salt = "s")
      .select("doc_id", "component", "split")
      .as[(Long, Long, String)].collect()
    assert(out.length == 200)
    val byComp = out.groupBy(_._2)
    // every component lands wholly in one split
    assert(byComp.values.forall(_.map(_._3).distinct.length == 1))
    // paired docs share their pair's min id as component
    assert(out.filter(_._1 <= 100).forall(r => r._2 == (if (r._1 % 2 == 1) r._1 else r._1 - 1)))
    // singletons are their own component
    assert(out.filter(_._1 > 100).forall(r => r._2 == r._1))
    // all three splits are populated at this size
    assert(out.map(_._3).distinct.toSet == Set("train", "val", "test"))
  }
}
