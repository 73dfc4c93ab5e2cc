package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hashed lexical vectors: the exact integer cosine rule against a
  * double-arithmetic reference, the planted near/far pair semantics,
  * unit-norm embeddings feeding the vector stack, the no-kept-grams
  * contract, partition invariance, and guards.
  */
class HashedVecSpec extends SparkTestBase {

  import spark.implicits._

  private val near1 = "alpha bravo charlie delta echo foxtrot golf hotel"
  private val near2 = "alpha bravo charlie delta echo foxtrot golf india"
  private val far = "uniform victor whiskey xray yankee zulu quebec romeo"
  private val trio = Seq((1L, near1), (2L, near2), (3L, far)).toDF("doc_id", "text")

  test("integer rule ≡ double cosine on the planted trio, near flags and far does not") {
    val counts = HashedVec.bucketCounts(trio, $"doc_id", $"text", 16)
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("id1", "id2")
    val out = HashedVec.cosinePairs(pairs, counts, num = 7, den = 10)
      .orderBy($"id1", $"id2").collect()
    out.foreach { r =>
      val dot = r.getAs[Long]("dot").toDouble
      val cos = dot / math.sqrt(r.getAs[Long]("n1sq").toDouble *
        r.getAs[Long]("n2sq").toDouble)
      assert(r.getAs[Boolean]("similar") == (cos >= 0.7),
        s"integer rule disagrees with double cosine at $r (cos=$cos)")
    }
    val byPair = out.map(r => ((r.getLong(0), r.getLong(1)),
      r.getAs[Boolean]("similar"))).toMap
    assert(byPair((1L, 2L)), "near-dup pair must flag")
    assert(!byPair((1L, 3L)), "disjoint-vocabulary pair must not")
  }

  test("embeddings are unit-norm and rank near above far by float cosine") {
    val emb = HashedVec.embeddings(trio, $"doc_id", $"text", 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    emb.values.foreach { v =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-6, s"norm $n")
    }
    def cos(a: Seq[Float], b: Seq[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    assert(cos(emb(1L), emb(2L)) > cos(emb(1L), emb(3L)))
    assert(cos(emb(1L), emb(2L)) > 0.85 && cos(emb(1L), emb(3L)) < 0.5)
  }

  test("embeddings feed the PCA/vector stack (compose smoke)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val emb = HashedVec.embeddings(docs, $"doc_id", $"text", 16)
    val p = Pca.projectionFromCorpus(emb, $"vec", dim = 16, r = 4, gridBits = 6)
    assert(p.rows.length == 4 && p.varianceCaptured > 0.0)
    val reduced = emb.select($"doc_id", Pca.projectExpr(p, $"vec").as("v"))
    assert(reduced.head().getSeq[Float](1).length == 4)
  }

  test("documents with no kept grams produce no count row; such pairs drop") {
    val docs = Seq((1L, near1), (2L, "a b 12 -"), (3L, "")).toDF("doc_id", "text")
    val counts = HashedVec.bucketCounts(docs, $"doc_id", $"text", 16)
    assert(counts.select($"doc_id").as[Long].collect().toSeq == Seq(1L))
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2")
    assert(HashedVec.cosinePairs(pairs, counts, 7, 10).count() == 0L)
  }

  test("counts are partitioning-invariant and n/nsq are consistent") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val a = HashedVec.bucketCounts(corpus.repartition(1), $"doc_id", $"text", 16)
      .orderBy($"doc_id").collect().map(_.toSeq)
    val b = HashedVec.bucketCounts(corpus.repartition(13), $"doc_id", $"text", 16)
      .orderBy($"doc_id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    val chk = HashedVec.bucketCounts(corpus, $"doc_id", $"text", 16)
      .select(
        (aggregate(col("bc"), lit(0L), (x, c) => x + c) === col("n")).as("okN"),
        (aggregate(col("bc"), lit(0L), (x, c) => x + c * c) === col("nsq")).as("okS"))
      .collect()
    assert(chk.forall(r => r.getBoolean(0) && r.getBoolean(1)))
  }

  test("guards raise") {
    intercept[IllegalArgumentException] {
      HashedVec.bucketCounts(trio, $"doc_id", $"text", 1)
    }
    intercept[IllegalArgumentException] {
      HashedVec.bucketCounts(trio, $"doc_id", $"text", 8192)
    }
    intercept[IllegalArgumentException] {
      HashedVec.cosinePairs(Seq((1L, 2L)).toDF("id1", "id2"),
        HashedVec.bucketCounts(trio, $"doc_id", $"text", 16), 3, 2)
    }
  }
}
