package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** SemDeDup cluster-bounded semantic dedup: exact duplicates are
  * dropped with their min-id witness, orthogonal vectors pass through,
  * the threshold is honored, and the verdict is partition-invariant.
  */
class SemDedupSpec extends SparkTestBase {

  import spark.implicits._

  // 8 orthogonal basis directions (dims 8) under ids 0-7, plus exact
  // copies of vectors 0-3 under ids 100-103. cos(basis_i, basis_j) = 0
  // for i != j, so only the planted copies are near anything.
  private def fixture = {
    val basis = (0 until 8).map { i =>
      (i.toLong, Array.tabulate(8)(d => if (d == i) 1.0f else 0.0f))
    }
    val copies = (0 until 4).map { i =>
      (100L + i, Array.tabulate(8)(d => if (d == i) 1.0f else 0.0f))
    }
    (basis ++ copies).toDF("vec_id", "embedding")
  }

  test("exact copies drop with min-id witness; originals and orthogonal vectors survive") {
    val out = SemDedup.semanticDedup(fixture, "vec_id", "embedding",
        nlist = 2, tau = 0.9)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    assert(out.size == 12)
    (0L to 7L).foreach { i =>
      assert(out(i) == (1L, None), s"original $i must be kept, got ${out(i)}")
    }
    (0 until 4).foreach { i =>
      assert(out(100L + i) == (0L, Some(i.toLong)),
        s"copy of $i must be dropped with dup_of=$i, got ${out(100L + i)}")
    }
  }

  test("threshold honored: tau above the pair cosine keeps everything") {
    // cos(copy, original) is exactly 1.0-ish; cos across basis is 0 —
    // with tau impossible to reach, nothing drops
    val out = SemDedup.semanticDedup(fixture, "vec_id", "embedding",
      nlist = 2, tau = 1.5)
    assert(out.filter($"kept" === 0L).count() == 0)
  }

  test("verdict is partition-invariant") {
    val a = SemDedup.semanticDedup(fixture, "vec_id", "embedding",
      nlist = 2, tau = 0.9).orderBy($"id").collect().toSeq
    val b = SemDedup.semanticDedup(fixture.repartition(7), "vec_id", "embedding",
      nlist = 2, tau = 0.9).orderBy($"id").collect().toSeq
    assert(a == b)
  }

  test("near-dup pairs split across cells are missed — the documented method limitation") {
    // two highly-similar vectors steered to different cells: each is
    // closest to a DIFFERENT centroid, their mutual cosine is > tau.
    // SemDeDup (by design) never compares across cells.
    val v = Seq(
      (0L, Array(1.0f, 0.0f, 0.10f, 0f, 0f, 0f, 0f, 0f)), // centroid A
      (1L, Array(0.0f, 1.0f, 0.10f, 0f, 0f, 0f, 0f, 0f)), // centroid B
      (2L, Array(0.6f, 0.4f, 1.00f, 0f, 0f, 0f, 0f, 0f)), // nearer A
      (3L, Array(0.4f, 0.6f, 1.00f, 0f, 0f, 0f, 0f, 0f))  // nearer B
    ).toDF("vec_id", "embedding")
    val out = SemDedup.semanticDedup(v, "vec_id", "embedding", nlist = 2, tau = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    // 2 and 3 are near-dups of each other (cos ≈ 0.96) but land in
    // different cells, so BOTH survive
    assert(out(2L)._1 != out(3L)._1, s"fixture invariant: cells must differ, got $out")
    assert(out(2L)._2 == 1L && out(3L)._2 == 1L)
  }
}
