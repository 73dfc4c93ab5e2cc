package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** PCA projection: closed-form recovery on a planted eigensystem (the
  * q205 premise), the centered/uncentered split on a shifted corpus,
  * rectangular application via rotateExpr, partition invariance, and
  * the MEASURED claim — the top-r cut keeps most of the variance of a
  * correlated corpus while rank-preserving pairwise distances well
  * enough for dedup candidate work.
  */
class PcaSpec extends SparkTestBase {

  import spark.implicits._

  test("planted diagonal Gram: projection is the top-r coordinate selection") {
    // dims 0..3 with per-dim value (j+1)/4, counts all equal: ranks
    // follow (j+1)^2 → descending dim order 3, 2, 1, 0
    val rows = (0L until 64L).map { id =>
      val j = (id % 4).toInt
      (id, Array.tabulate(4)(i => if (i == j) (j + 1).toFloat / 4f else 0f))
    }
    val df = rows.toDF("id", "v")
    val p = Pca.projectionFromCorpus(df, $"v", dim = 4, r = 2, gridBits = 6)
    assert(p.rows.length == 2 && p.rows.forall(_.length == 4))
    // top-2 = e_3, e_2 exactly (diagonal matrix → no Jacobi rotation)
    assert(p.rows(0).toSeq == Seq(0.0, 0.0, 0.0, 1.0))
    assert(p.rows(1).toSeq == Seq(0.0, 0.0, 1.0, 0.0))
    // eigenvalues descending, and varianceCaptured matches hand math:
    // λ_j ∝ (j+1)² → top-2 share = (16+9)/(16+9+4+1)
    assert(p.evals.sliding(2).forall(w => w(0) >= w(1)))
    assert(math.abs(p.varianceCaptured - 25.0 / 30.0) < 1e-12)
    // applied projection: dim-3 rows land at out 0, dim-2 at out 1,
    // dims 0/1 project to exact zero
    val out = df.select($"id", Pca.projectExpr(p, $"v").as("pv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    assert(out(3L) == Seq(1.0f, 0.0f) && out(7L) == Seq(1.0f, 0.0f))
    assert(out(2L) == Seq(0.0f, 0.75f))
    assert(out(0L) == Seq(0.0f, 0.0f) && out(1L) == Seq(0.0f, 0.0f))
  }

  test("centered PCA ignores a constant shift; uncentered does not") {
    // one genuinely-varying direction (dim 0), a huge constant offset
    // on dim 1: covariance PCA must pick dim 0; second-moment PCA
    // picks the offset direction
    val rows = (0L until 32L).map { id =>
      val x = if (id % 2 == 0) 1.0f else -1.0f
      (id, Array(x, 4.0f))
    }
    val df = rows.toDF("id", "v")
    val centered = Pca.projectionFromCorpus(df, $"v", dim = 2, r = 1,
      gridBits = 6, center = true)
    val raw = Pca.projectionFromCorpus(df, $"v", dim = 2, r = 1,
      gridBits = 6, center = false)
    assert(math.abs(math.abs(centered.rows(0)(0)) - 1.0) < 1e-9,
      s"centered top direction should be dim 0, got ${centered.rows(0).toSeq}")
    assert(math.abs(math.abs(raw.rows(0)(1)) - 1.0) < 1e-9,
      s"uncentered top direction should be dim 1, got ${raw.rows(0).toSeq}")
  }

  test("projection is partitioning-invariant (exact-grid inputs)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", slice($"embedding", 1, 8).as("embedding"))
    val a = Pca.projectionFromCorpus(emb.repartition(1), $"embedding",
      dim = 8, r = 4, gridBits = 6)
    val b = Pca.projectionFromCorpus(emb.repartition(17), $"embedding",
      dim = 8, r = 4, gridBits = 6)
    assert(a.rows.map(_.toSeq).toSeq == b.rows.map(_.toSeq).toSeq)
    assert(a.evals.toSeq == b.evals.toSeq)
  }

  test("measured: top-half projection keeps most variance of a correlated corpus") {
    // correlated fixture: x = (t, t, t+noise, noise) — effective rank ~2
    val rows = (0L until 256L).map { id =>
      val t = ((id % 17).toDouble - 8.0) / 8.0
      val n = ((id % 5).toDouble - 2.0) / 8.0
      (id, Array(t.toFloat, t.toFloat, (t + n).toFloat, n.toFloat))
    }
    val df = rows.toDF("id", "v")
    val p = Pca.projectionFromCorpus(df, $"v", dim = 4, r = 2, gridBits = 6)
    assert(p.varianceCaptured > 0.9,
      s"expected >90% variance in top 2 of 4, got ${p.varianceCaptured}")
    info(f"variance captured by top-2/4 on correlated corpus: ${p.varianceCaptured}%.4f")
  }

  test("ragged input raises instead of silently mis-normalizing") {
    // ADVICE r13: with vectors shorter than dim, per-cell Gram counts
    // differ and the covariance would normalize by whichever row
    // collect() returned first — must fail loudly instead
    val ragged = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(1.0f, 2.0f))).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Pca.projectionFromCorpus(ragged, $"v", dim = 3, r = 2)
    }
    assert(e.getMessage.contains("ragged"))
  }

  test("parameter guards raise") {
    val df = Seq((1L, Array(1.0f, 0.0f))).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Pca.projectionFromCorpus(df, $"v", dim = 2, r = 0)
    }
    intercept[IllegalArgumentException] {
      Pca.projectionFromCorpus(df, $"v", dim = 2, r = 3)
    }
    intercept[IllegalArgumentException] {
      Pca.projectionFromCorpus(df.filter($"id" < 0L), $"v", dim = 2, r = 1)
    }
  }
}
