package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** OPQ rotation: Jacobi eigensolver correctness, balanced subspace
  * allocation, rotation orthonormality and determinism, the identity
  * no-op (the q191 gate's premise), and the MEASURED claim — rotation
  * cuts PQ reconstruction error on a correlated corpus.
  */
class OpqSpec extends SparkTestBase {

  import spark.implicits._

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select($"vec_id", $"embedding")

  test("jacobiEigen solves a hand-built symmetric matrix") {
    // A = Q diag(5, 2, 1) Qᵀ with a known orthonormal Q
    val q = Array(
      Array(1.0 / math.sqrt(2), 1.0 / math.sqrt(2), 0.0),
      Array(-1.0 / math.sqrt(2), 1.0 / math.sqrt(2), 0.0),
      Array(0.0, 0.0, 1.0))
    val lam = Array(5.0, 2.0, 1.0)
    val a = Array.tabulate(3, 3)((i, j) =>
      (0 until 3).map(k => q(k)(i) * lam(k) * q(k)(j)).sum)
    val (evals, evecs) = Opq.jacobiEigen(a)
    assert(evals.zip(Array(5.0, 2.0, 1.0)).forall {
      case (x, y) => math.abs(x - y) < 1e-12 })
    // eigen equation residual: A v = λ v
    for (k <- 0 until 3; i <- 0 until 3) {
      val av = (0 until 3).map(j => a(i)(j) * evecs(k)(j)).sum
      assert(math.abs(av - evals(k) * evecs(k)(i)) < 1e-10,
        s"residual at k=$k i=$i")
    }
    // orthonormal rows
    for (k <- 0 until 3; l <- 0 until 3) {
      val d = (0 until 3).map(i => evecs(k)(i) * evecs(l)(i)).sum
      assert(math.abs(d - (if (k == l) 1.0 else 0.0)) < 1e-12)
    }
  }

  test("balancedRotation spreads a skewed spectrum across subspaces") {
    val evals = Array(100.0, 90.0, 1.0, 0.9, 0.1, 0.09)
    val evecs = Array.tabulate(6, 6)((k, i) => if (k == i) 1.0 else 0.0)
    val r = Opq.balancedRotation(evals, evecs, m = 3)
    assert(r.length == 6)
    // subspace s = rows 2s, 2s+1: the two dominant directions must
    // land in DIFFERENT subspaces (a contiguous split would pair them)
    def dirOf(row: Array[Double]) = row.indexWhere(_ == 1.0)
    val sub = r.grouped(2).map(_.map(dirOf).toSet).toSeq
    assert(!sub.exists(s => s.contains(0) && s.contains(1)),
      s"dominant directions paired: $sub")
    // every direction appears exactly once (R is a permutation here)
    assert(r.map(dirOf).sorted.toSeq == (0 until 6))
  }

  test("rotationFromCorpus is orthonormal and partition-invariant") {
    val slice = emb.filter($"vec_id" < 200)
    val r1 = Opq.rotationFromCorpus(slice.repartition(1), $"embedding", 64, 8)
    val r2 = Opq.rotationFromCorpus(slice.repartition(7), $"embedding", 64, 8)
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq,
      "rotation must be a pure function of the corpus")
    for (k <- 0 until 64; l <- k until 64) {
      val d = (0 until 64).map(i => r1(k)(i) * r1(l)(i)).sum
      assert(math.abs(d - (if (k == l) 1.0 else 0.0)) < 1e-8,
        s"R rows $k,$l not orthonormal: $d")
    }
  }

  test("identity rotation is an IEEE no-op per element") {
    val r = Opq.identity(64)
    val n = emb.filter($"vec_id" < 100)
      .select($"embedding", Opq.rotateExpr(r, $"embedding").as("rot"))
      .filter(not($"embedding" === $"rot")).count()
    assert(n == 0, "identity rotateExpr must return the input bits")
  }

  test("measured: rotation cuts PQ reconstruction MSE on a variance-imbalanced corpus") {
    // imbalanced fixture: the first raw subspace carries 16× the
    // variance of the rest — the structure real embeddings have
    // (energy concentrated in a few directions). Flat PQ hands that
    // subspace the same ksub centroids as the near-silent ones; the
    // balanced allocation spreads the hot directions across all m
    // subspaces, which is the OPQ paper's core claim.
    val base = emb.filter($"vec_id" < 400)
    val mixed = base.select($"vec_id",
      transform($"embedding", (v, i) =>
        (v.cast("double") *
          when(i < 8, lit(4.0)).otherwise(lit(0.25))).cast("float"))
        .as("embedding"))
    def mseOf(df: org.apache.spark.sql.DataFrame): Double = {
      val book = VectorQuant.pqTrain(df, "vec_id", "embedding",
        m = 8, ksub = 8, iters = 2, dim = 64)
      val cb = VectorQuant.collectBook(book)
      val enc = VectorQuant.pqEncode(df, "vec_id", "embedding", book)
      df.join(enc, df("vec_id") === enc("id"))
        .select(avg(aggregate(
          zip_with($"embedding", VectorQuant.pqDecodeExpr(cb, $"codes"),
            (x, rec) => (x.cast("double") - rec.cast("double")) *
              (x.cast("double") - rec.cast("double"))),
          lit(0.0), (a, b) => a + b)))
        .as[Double].head()
    }
    val flat = mseOf(mixed)
    val r = Opq.rotationFromCorpus(mixed, $"embedding", 64, 8)
    val rotated = mixed.select($"vec_id",
      Opq.rotateExpr(r, $"embedding").as("embedding"))
    val opq = mseOf(rotated)
    info(f"imbalanced corpus: flat PQ mse=$flat%.5f, OPQ-rotated mse=$opq%.5f")
    assert(opq < flat * 0.8,
      s"rotation should cut MSE by >20% on the correlated fixture: flat=$flat opq=$opq")
  }

  test("planted diagonal Gram: learned rotation is exactly the greedy-balance permutation (q202 fixture)") {
    // one vector per id, single nonzero (id%8 -> (id%8+1)/4): the Gram
    // matrix is exactly diagonal, Jacobi performs no rotation, and the
    // learned R must be the permutation the greedy balance picks. The
    // expected landing positions replay the allocation independently
    // with exact BigInt products (the q202 oracle's arithmetic).
    val n = 500
    val df = spark.range(n).select($"id", ($"id" % 8).cast("int").as("j"))
      .select($"id", $"j", transform(sequence(lit(0), lit(7)), i =>
        when(i === $"j", ($"j" + 1).cast("double") / 4.0)
          .otherwise(0.0).cast("float")).as("v"))
    val r = Opq.rotationFromCorpus(df, $"v", dim = 8, m = 2, gridBits = 6)
    // exact permutation rows: one 1.0, seven 0.0
    r.foreach { row =>
      assert(row.count(_ == 1.0) == 1 && row.count(_ == 0.0) == 7)
    }
    // independent greedy replay on exact products of s = 16*lambda
    val counts = Array.tabulate(8)(j => (0 until n).count(_ % 8 == j))
    val s = Array.tabulate(8)(j => BigInt((j + 1) * (j + 1)) * counts(j))
    val ranked = (0 until 8).sortBy(j => (-s(j), j))
    val prod = Array.fill(2)(BigInt(1)); val cnt = Array.fill(2)(0)
    val sixteen = BigInt(16)
    val buckets = Array.fill(2)(List.empty[Int])
    ranked.foreach { j =>
      val b =
        if (cnt(0) >= 4) 1
        else if (cnt(1) >= 4) 0
        else if (prod(0) * sixteen.pow(cnt(1)) <= prod(1) * sixteen.pow(cnt(0))) 0
        else 1
      buckets(b) = j :: buckets(b); prod(b) *= s(j); cnt(b) += 1
    }
    val expectedRows = buckets.flatMap(_.reverse)
    val actualRows = r.map(row => row.indexWhere(_ == 1.0))
    assert(actualRows.toSeq == expectedRows.toSeq,
      s"learned permutation ${actualRows.toSeq} != greedy replay ${expectedRows.toSeq}")
  }
}
