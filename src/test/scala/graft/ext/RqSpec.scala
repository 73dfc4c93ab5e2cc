package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Residual (two-stage) quantization: the composed degenerate
  * identity (lossy stage 1 + residual-covering stage 2 reconstructs
  * the ORIGINAL float bits — the q187 gate's contract), the
  * double-precision residual argument, stage-2 codebook element type,
  * and the leakage-safe hard-negative label dedup fix.
  */
class RqSpec extends SparkTestBase {

  import spark.implicits._

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select($"vec_id", $"embedding")

  test("lossy stage 1 + degenerate stage 2: two-stage reconstruction is bit-exact") {
    val slice = emb.filter($"vec_id" < 64)
    val books = VectorQuant.rqTrain(slice, "vec_id", "embedding",
      m = 8, ksub1 = 4, iters1 = 0, ksub2 = 64, iters2 = 0, dim = 64)
    // stage 1 alone must be LOSSY on this slice (ksub=4 over 64
    // vectors) — otherwise the test proves nothing
    val c1 = VectorQuant.collectBook(books.book1)
    val lossy = slice
      .select($"embedding",
        VectorQuant.pqDecodeExpr(c1,
          VectorQuant.pqEncodeExpr(c1, $"embedding")).as("rec1"))
      .filter(not($"embedding" === $"rec1")).count()
    assert(lossy > 0, "fixture error: stage 1 is not lossy")
    // stage-2 codebook must hold doubles (the exactness argument
    // needs float-difference-in-double)
    val t2 = books.book2.codebook.schema("centroid").dataType
    assert(t2 == org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType, containsNull = false) ||
      t2.simpleString == "array<double>", s"stage-2 type was $t2")
    // composed reconstruction: exact
    val c2 = VectorQuant.collectBookD(books.book2)
    val enc = VectorQuant.rqEncode(slice, "vec_id", "embedding", books)
    val mism = slice.join(enc, slice("vec_id") === enc("id"))
      .select($"embedding",
        VectorQuant.rqDecodeExpr(c1, c2, $"codes1", $"codes2").as("rec"))
      .filter(not($"embedding" === $"rec")).count()
    assert(mism == 0, "two-stage degenerate reconstruction must be bit-exact")
  }

  test("two-stage probe under the degenerate composition == exact brute force") {
    val slice = emb.filter($"vec_id" < 64)
    val q = slice.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val books = VectorQuant.rqTrain(slice, "vec_id", "embedding",
      m = 8, ksub1 = 4, iters1 = 0, ksub2 = 64, iters2 = 0, dim = 64)
    val ivf = EmbeddingSearch.buildIvfIndex(slice, "vec_id", "embedding", nlist = 4)
    val ridx = VectorQuant.quantizeIndexRq(ivf, slice, "vec_id", "embedding", books)
    val served = VectorQuant.ivfProbeRq(ridx, q, "qid", "qvec", k = 5, nprobe = 4)
      .as[(Long, Long, Int, Double)].collect().toSet
    val brute = EmbeddingSearch.bruteForceTopK(slice, "vec_id", "embedding",
      q, "qid", "qvec", k = 5)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(served == brute)
  }

  test("retractRq == re-encode of the retained corpus, lossy codebooks included") {
    val slice = emb.filter($"vec_id" < 48)
    // LOSSY both stages — the general case, not the gate's degenerate one
    val books = VectorQuant.rqTrain(slice, "vec_id", "embedding",
      m = 8, ksub1 = 4, iters1 = 1, ksub2 = 4, iters2 = 1, dim = 64)
    val ivf = EmbeddingSearch.buildIvfIndex(slice, "vec_id", "embedding", nlist = 4)
    val full = VectorQuant.quantizeIndexRq(ivf, slice, "vec_id", "embedding", books)
    val deleted = spark.range(16, 32).select($"id".as("vec_id"))
    val retracted = Forget.retractRq(full, deleted)
    // the retained corpus re-encoded under the SAME books and cells
    val retainedCorpus = slice.filter($"vec_id" < 16 || $"vec_id" >= 32)
    val rebuilt = VectorQuant.quantizeIndexRq(
      EmbeddingSearch.IvfIndex(ivf.centroids,
        ivf.assignments.filter($"id" < 16 || $"id" >= 32)),
      retainedCorpus, "vec_id", "embedding", books)
    val a = retracted.assignments.as[(Long, Long, Seq[Int], Seq[Int])]
      .collect().toSet
    val b = rebuilt.assignments.as[(Long, Long, Seq[Int], Seq[Int])]
      .collect().toSet
    assert(a == b && a.nonEmpty, s"retract=${a.size} rebuild=${b.size}")
  }

  test("leakageSafeHardNegatives: duplicate label rows neither fan out candidates nor repeat negative_ids") {
    val corpus = emb.filter($"vec_id" < 40)
    val pairs = corpus.filter($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"),
        ($"vec_id" + 30L).as("pos"))
    val labels = Seq((5L, 100L), (6L, 100L), (7L, 200L)).toDF("id", "comp")
    // the same membership table with every row REPEATED — the shape a
    // per-evidence-pair labels table produces
    val dupLabels = labels.unionAll(labels).unionAll(labels)
    def run(l: org.apache.spark.sql.DataFrame) =
      EmbeddingSearch.leakageSafeHardNegatives(corpus, "vec_id", "embedding",
        pairs, "qid", "qvec", "pos", l, "id", "comp", k = 8)
        .as[(Long, Long, Int, Double)].collect().toSeq.sorted
    val clean = run(labels)
    val dup = run(dupLabels)
    assert(dup == clean, "duplicated label rows changed the mined negatives")
    // no repeated negative per query in either output
    val perQuery = clean.groupBy(_._1).values
    assert(perQuery.forall(g => g.map(_._2).distinct.size == g.size))
  }
}
