package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA dimensionality REDUCTION for embedding columns — the
  * preprocessing step in front of clustering / brute-force dedup /
  * IVF training that [[Opq]] deliberately is not: OPQ learns a
  * square variance-BALANCING rotation for PQ subspaces, while PCA
  * keeps only the top-r principal directions and drops the rest,
  * shrinking every downstream distance computation (and shuffle) by
  * d/r while keeping most of the variance. SemDedup-style pipelines
  * run exactly this shape: project 768-d sentence embeddings to
  * 64-128 dims, then cluster.
  *
  * Division of labor (the [[Opq.rotationFromCorpus]] contract, all
  * public machinery):
  *  - corpus-proportional part: ONE exact
  *    [[EmbeddingSearch.gramMatrix]] aggregation (dyadic-grid DECIMAL
  *    sums, order-invariant — the q164 discipline), plus, when
  *    centering, one exact per-dimension SUM on the same grid;
  *  - the d×d (co)variance assembly and the [[Opq.jacobiEigen]] solve
  *    are bounded d² driver state with fixed sweeps and a
  *    deterministic sign convention — the projection is a pure
  *    function of the corpus (partitioning-invariant, engine-exact
  *    inputs);
  *  - application is [[Opq.rotateExpr]] with a RECTANGULAR r×d
  *    matrix: a zero-shuffle codegen'd per-row fold, output length r.
  *
  * Centering: `center = true` subtracts the exact-grid mean
  * (covariance PCA — translation-invariant directions); `center =
  * false` uses raw second moments (the OPQ/q164 face — correct for
  * cosine work where vectors are length-normalized and the mean is
  * near zero). The centered moments are assembled driver-side in
  * fixed evaluation order from EXACT decimal sums, so both faces are
  * deterministic.
  *
  * Exactness gate (q205, the q202 planted-eigensystem discipline):
  * on a corpus of single-nonzero vectors the Gram is exactly
  * diagonal, Jacobi provably performs no rotation, and the learned
  * top-r projection is a closed-form coordinate selection the oracle
  * recomputes from residue counts — so the whole learned path (exact
  * Gram → eigen-solve → top-r cut → distributed application) is
  * cross-engine checked; the variance captured on correlated corpora
  * is MEASURED (PcaSpec), not asserted.
  */
object Pca {

  /** Exact per-dimension sums on the 2^-gridBits grid: (i, sx, n)
    * with sx = Σ_rows floor(x_i·2^g)/2^g as DECIMAL(38,12) — the
    * first-moment companion of [[EmbeddingSearch.gramMatrix]]. One
    * posexplode + one hash aggregation on i (d groups, map-side
    * partial combine).
    */
  def dimSums(df: DataFrame, vec: Column, gridBits: Int = 6): DataFrame = {
    require(gridBits >= 1 && gridBits <= 6, "gridBits in [1, 6]")
    val scale = (1L << gridBits).toDouble
    val q = transform(vec, x => floor(x.cast("double") * lit(scale)) / lit(scale))
    df.select(posexplode(q).as(Seq("i", "xi")))
      .groupBy("i")
      .agg(sum(col("xi").cast("decimal(38,12)")).as("sx"),
        count(lit(1)).as("n"))
  }

  /** Learn the top-r projection from the corpus. Returns the r×d
    * matrix of principal ROW vectors ordered by eigenvalue
    * descending (ties: the [[Opq.jacobiEigen]] stable order), with
    * the eigenvalues alongside so callers can report variance
    * captured. Feed `.rows` to [[projectExpr]].
    */
  final case class Projection(rows: Array[Array[Double]],
                              evals: Array[Double]) {
    def varianceCaptured: Double = {
      val tot = evals.map(e => math.max(e, 0.0)).sum
      if (tot <= 0.0) 0.0
      else evals.take(rows.length).map(e => math.max(e, 0.0)).sum / tot
    }
  }

  def projectionFromCorpus(df: DataFrame, vec: Column, dim: Int, r: Int,
                           gridBits: Int = 6,
                           center: Boolean = false): Projection = {
    require(r >= 1 && r <= dim, s"need 1 <= r <= dim; got r=$r dim=$dim")
    val g = EmbeddingSearch.gramMatrix(df, vec, gridBits)
      .select(col("i"), col("j"), col("sxx").cast("double"), col("n"))
      .collect()
    require(g.nonEmpty, "empty corpus: no Gram statistics")
    // every Gram cell must have seen every row: ragged inputs (vectors
    // shorter than dim) give per-cell counts that differ, and the
    // covariance would silently normalize by whichever row collect()
    // returned first (ADVICE r13) — fail loudly instead, matching the
    // i/j < dim guard below
    val ns = g.map(_.getLong(3)).distinct
    require(ns.length == 1,
      s"ragged input: Gram cell counts differ (${ns.sorted.mkString(", ")}) — " +
        s"every vector must carry exactly dim=$dim entries")
    val n = ns.head.toDouble
    val sym = Array.fill(dim, dim)(0.0)
    g.foreach { row =>
      val i = row.getInt(0); val j = row.getInt(1)
      require(i < dim && j < dim,
        s"vector wider than dim=$dim: Gram statistics reach index ${math.max(i, j)}")
      val x = row.getDouble(2) / n
      sym(i)(j) = x; sym(j)(i) = x
    }
    if (center) {
      val mu = Array.fill(dim)(0.0)
      dimSums(df, vec, gridBits)
        .select(col("i"), col("sx").cast("double"))
        .collect()
        .foreach(row => mu(row.getInt(0)) = row.getDouble(1) / n)
      for (i <- 0 until dim; j <- 0 until dim)
        sym(i)(j) -= mu(i) * mu(j)
    }
    val (evals, evecs) = Opq.jacobiEigen(sym)
    Projection(evecs.take(r), evals)
  }

  /** P·x per row — [[Opq.rotateExpr]] with the rectangular top-r
    * matrix: zero shuffle, r·d multiplies per row, output
    * array<float> of length r. The reduced vectors feed the
    * unchanged [[EmbeddingSearch]] / [[VectorQuant]] stack.
    */
  def projectExpr(p: Projection, vec: Column): Column =
    Opq.rotateExpr(p.rows, vec)
}
