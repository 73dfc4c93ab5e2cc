package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Snapshot diff semantics + the JL sign projection (both all-integer
  * operators whose gates are q137/q138).
  */
class CorpusDiffSpec extends SparkTestBase {

  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed; unchanged emits nothing") {
    val before = Seq((1L, "same"), (2L, "old"), (3L, "gone")).toDF("doc_id", "text")
    val after = Seq((1L, "same"), (2L, "new"), (4L, "fresh")).toDF("doc_id", "text")
    val d = CorpusDiff.snapshotDiff(before, after, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(2L -> "changed", 3L -> "removed", 4L -> "added"), d.toString)
  }

  test("diffSummary counts every class including unchanged") {
    val before = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("doc_id", "text")
    val after = Seq((1L, "a"), (2L, "B"), (5L, "e")).toDF("doc_id", "text")
    val s = CorpusDiff.diffSummary(before, after, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s == Map("changed" -> 1L, "removed" -> 2L, "added" -> 1L,
      "unchanged" -> 1L), s.toString)
  }

  test("signMatrix is deterministic and roughly balanced") {
    val m1 = VectorQuant.signMatrix(64, 16, "s").flatten.toSeq
    val m2 = VectorQuant.signMatrix(64, 16, "s").flatten.toSeq
    assert(m1 == m2)
    val plus = m1.count(_ == 1)
    assert(plus > 380 && plus < 640, s"badly unbalanced: $plus of 1024")
    assert(VectorQuant.signMatrix(64, 16, "other").flatten.toSeq != m1)
  }

  test("signProject composes with real int8 encoding and preserves neighbor structure") {
    // three tight clusters in 32-dim float space
    val vecs = (0 until 30).map { k =>
      val center = k % 3
      val v = Array.tabulate(32)(i =>
        (if (i % 3 == center) 1.0f else 0.0f) + (k / 3) * 0.001f)
      (k.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val params = VectorQuant.int8Params(vecs, "embedding")
    val coded = vecs.select($"vec_id",
      VectorQuant.int8EncodeExpr(params, $"embedding").as("codes"))
    val signs = VectorQuant.signMatrix(32, 8, "jl")
    val proj = coded.select($"vec_id",
        VectorQuant.signProjectExpr(signs, $"codes").as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def d2(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // same-cluster distances must sit below cross-cluster distances
    val same = for (a <- 0 until 30; b <- a + 1 until 30 if a % 3 == b % 3)
      yield d2(proj(a.toLong), proj(b.toLong))
    val cross = for (a <- 0 until 30; b <- a + 1 until 30 if a % 3 != b % 3)
      yield d2(proj(a.toLong), proj(b.toLong))
    assert(same.max < cross.min,
      s"projection destroyed cluster structure: same.max=${same.max} cross.min=${cross.min}")
  }
}
