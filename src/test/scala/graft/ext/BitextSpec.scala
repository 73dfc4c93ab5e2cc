package graft.ext

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Margin-based bitext mining (Artetxe & Schwenk 2019): hand-computed
  * ratio margins on exact unit-axis vectors, the mutual-best hub
  * discipline, the short-side guard, and the planted-translation
  * recovery of the q217 gate fixture.
  */
class BitextSpec extends SparkTestBase {
  import spark.implicits._

  private val srcs = Seq(
    (1L, Array(1f, 0f, 0f, 0f)),
    (2L, Array(1f, 0f, 0f, 0f)), // duplicate of s1 — the hub probe
    (3L, Array(0f, 1f, 0f, 0f)))
  private val tgts = Seq(
    (11L, Array(1f, 0f, 0f, 0f)), // exact match for s1/s2
    (12L, Array(3f, 1f, 0f, 0f)), // cos(s1,·)=3/√10, cos(s3,·)=1/√10
    (13L, Array(0f, 1f, 0f, 0f)), // exact match for s3
    (14L, Array(0f, 0f, 1f, 0f)),
    (15L, Array(0f, 0f, 0f, 1f)))

  test("hand-computed margins; hub target mines only its mutual-best source") {
    val mined = EmbeddingSearch.mineBitext(
        srcs.toDF("id", "v"), "id", "v",
        tgts.toDF("id", "v"), "id", "v",
        k = 2, minMargin = 1.0)
      .orderBy($"src_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // s2 -> t11 is dropped: t11's best source tiebreaks to s1 (the
    // mutual-best rule — a hub target cannot be claimed twice)
    assert(mined.map(m => (m._1, m._2)).toSeq == Seq((1L, 11L), (3L, 13L)))
    // margin(s1,t11) = 1 / ((avg2(s1) + avg2(t11)) / 2)
    //   avg2(s1) = (1 + 3/√10)/2, avg2(t11) = (1 + 1)/2 = 1
    val avgS1 = (1.0 + 3.0 / math.sqrt(10.0)) / 2
    val m1 = 1.0 / ((avgS1 + 1.0) / 2)
    assert(math.abs(mined(0)._4 - m1) < 1e-6, s"${mined(0)._4} vs $m1")
    // margin(s3,t13): avg2(s3) = (1 + 1/√10)/2, avg2(t13) = (1+0)/2
    val m3 = 1.0 / (((1.0 + 1.0 / math.sqrt(10.0)) / 2 + 0.5) / 2)
    assert(math.abs(mined(1)._4 - m3) < 1e-6, s"${mined(1)._4} vs $m3")
    // raising the margin floor above m1 drops the weakly-separated
    // pair but keeps the well-separated one
    val strict = EmbeddingSearch.mineBitext(
        srcs.toDF("id", "v"), "id", "v",
        tgts.toDF("id", "v"), "id", "v",
        k = 2, minMargin = 1.1)
      .collect().map(_.getLong(0)).toSeq
    assert(strict == Seq(3L))
  }

  test("a side with fewer than k candidates raises instead of inflating margins") {
    val ex = intercept[Exception] {
      EmbeddingSearch.mineBitext(
        srcs.toDF("id", "v"), "id", "v",
        tgts.take(1).toDF("id", "v"), "id", "v",
        k = 2, minMargin = 1.0).collect()
    }
    assert(ex.getMessage != null)
  }

  test("IVF-candidate composition equals brute force when every cell is probed") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.table(spark, dir, "embeddings")
    val src = emb.filter($"vec_id" % 10 === 0 && $"vec_id" < 2000)
      .select($"vec_id".as("src_id"), $"embedding".as("svec"))
    val maxId = emb.agg(max($"vec_id")).head().getLong(0)
    val planted = src.select(($"src_id" + lit(maxId + 1L)).as("vec_id"),
      transform($"svec",
        (x, i) => when(i === 0, lit(0.0f)).otherwise(x)).as("embedding"))
    val tgt = emb.filter($"vec_id" % 2 === 1)
      .select($"vec_id", $"embedding").unionAll(planted)
    // the corpus-scale candidate source: IVF cells instead of the
    // cross join — with nprobe = nlist every pair survives, so the
    // composed margin output must equal the brute-force face exactly
    // (same fold-ordered cosine, same decimal top-k means)
    val idx = EmbeddingSearch.buildIvfIndex(tgt, "vec_id", "embedding",
      nlist = 8)
    val cand = EmbeddingSearch.ivfProbe(idx, tgt, "vec_id", "embedding",
        src, "src_id", "svec", k = 1 << 20, nprobe = 8)
      .select($"src_id", $"neighbor_id".as("tgt_id"), $"cos")
    val viaIvf = EmbeddingSearch.bitextMarginFromPairs(cand, k = 4,
        minMargin = 1.05)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).sortBy(p => (p._1, p._2))
    val brute = EmbeddingSearch.mineBitext(src, "src_id", "svec",
        tgt, "vec_id", "embedding", k = 4, minMargin = 1.05)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).sortBy(p => (p._1, p._2))
    assert(viaIvf.nonEmpty && viaIvf.toSeq == brute.toSeq)
  }

  test("q217 fixture: every planted translation is recovered, nothing else passes the margin") {
    val dir = "/root/testdata/sf0.001"
    val mined = graft.ExtQueries4.q217.run(spark, dir)
      .select($"src_id", $"tgt_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val embAll = Tables.table(spark, dir, "embeddings")
    val probes = embAll.filter($"vec_id" % 10 === 0).count()
    val maxId = embAll.agg(max($"vec_id")).head().getLong(0)
    assert(mined.length == probes)
    // planted ids are derived above the table's max vec_id, so they
    // can never collide with a genuine odd vec_id at any SF
    assert(mined.forall { case (s, t) => t == maxId + 1L + s },
      "only planted translations clear the 1.05 margin on this corpus")
  }
}
