package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** PQ / int8 vector compression: the exact-reconstruction degenerate
  * identity (the q100 gate's contract), lossy-path serving shape,
  * exact rerank on top of lossy codes, parquet round-trip, and the
  * int8 grid identity + quantization error bound.
  */
class VectorQuantSpec extends SparkTestBase {

  import spark.implicits._

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select($"vec_id", $"embedding")

  private def queriesOf(df: org.apache.spark.sql.DataFrame, n: Int) =
    df.filter($"vec_id" < n).select($"vec_id".as("qid"), $"embedding".as("qvec"))

  test("degenerate codebook (iters=0, ksub >= distinct): reconstruction is bit-exact, quantized probe == exact probe") {
    val slice = emb.filter($"vec_id" < 100)
    val book = VectorQuant.pqTrain(slice, "vec_id", "embedding",
      m = 8, ksub = 100, iters = 0, dim = 64)
    val enc = VectorQuant.pqEncode(slice, "vec_id", "embedding", book)
    assert(enc.count() == 100)
    val collected = VectorQuant.collectBook(book)
    val mismatches = slice.join(enc, slice("vec_id") === enc("id"))
      .select($"embedding",
        VectorQuant.pqDecodeExpr(collected, $"codes").as("rec"))
      .filter(not($"embedding" === $"rec"))
      .count()
    assert(mismatches == 0, "degenerate reconstruction must be bit-exact")

    val q = queriesOf(slice, 5)
    val ivf = EmbeddingSearch.buildIvfIndex(slice, "vec_id", "embedding", nlist = 4)
    val pq = VectorQuant.quantizeIndex(ivf, slice, "vec_id", "embedding", book)
    val exact = EmbeddingSearch.ivfProbe(ivf, slice, "vec_id", "embedding",
      q, "qid", "qvec", k = 5, nprobe = 4)
      .as[(Long, Long, Int, Double)].collect().toSet
    val quant = VectorQuant.ivfProbePq(pq, q, "qid", "qvec", k = 5, nprobe = 4)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(quant == exact, "quantized probe must be bit-identical under the degenerate codebook")
  }

  test("lossy codebook: full result rows; exact rerank over all candidates recovers brute-force exactly") {
    val slice = emb.filter($"vec_id" < 100)
    val book = VectorQuant.pqTrain(slice, "vec_id", "embedding",
      m = 8, ksub = 16, iters = 2, dim = 64)
    assert(book.codebook.count() <= 8 * 16)
    val ivf = EmbeddingSearch.buildIvfIndex(slice, "vec_id", "embedding", nlist = 4)
    val pq = VectorQuant.quantizeIndex(ivf, slice, "vec_id", "embedding", book)
    val q = queriesOf(slice, 5)
    val approx = VectorQuant.ivfProbePq(pq, q, "qid", "qvec", k = 5, nprobe = 4)
    assert(approx.count() == 25)
    // rerankK = corpus size with every cell probed → survivors are ALL
    // candidates, the exact re-score must reproduce brute force even
    // though the first stage ranked with lossy codes
    val rr = VectorQuant.ivfProbePqRerank(pq, slice, "vec_id", "embedding",
      q, "qid", "qvec", k = 5, rerankK = 100, nprobe = 4)
      .as[(Long, Long, Int, Double)].collect().toSet
    val brute = EmbeddingSearch.bruteForceTopK(slice, "vec_id", "embedding",
      q, "qid", "qvec", k = 5)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(rr == brute)
  }

  test("quantized index round-trips through parquet and serves identically") {
    val slice = emb.filter($"vec_id" < 80)
    val book = VectorQuant.pqTrain(slice, "vec_id", "embedding",
      m = 8, ksub = 8, iters = 1, dim = 64)
    val ivf = EmbeddingSearch.buildIvfIndex(slice, "vec_id", "embedding", nlist = 4)
    val pq = VectorQuant.quantizeIndex(ivf, slice, "vec_id", "embedding", book)
    val dir = java.nio.file.Files.createTempDirectory("pqivf").toString
    VectorQuant.writePqIndex(pq, dir)
    val back = VectorQuant.readPqIndex(spark, dir, m = 8, dsub = 8)
    assert(back.assignments.count() == 80)
    val q = queriesOf(slice, 3)
    val a = VectorQuant.ivfProbePq(pq, q, "qid", "qvec", k = 4, nprobe = 4)
      .as[(Long, Long, Int, Double)].collect().toSet
    val b = VectorQuant.ivfProbePq(back, q, "qid", "qvec", k = 4, nprobe = 4)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(a == b)
  }

  test("hardNegativesIvfPq: degenerate full-probe mining == exact hardNegativesIvf; lossy mining never surfaces self or the positive") {
    val slice = emb.filter($"vec_id" < 100)
    val pairs = slice.filter($"vec_id" < 8)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"),
        ($"vec_id" + 1L).as("pos_id"))
    val ivf = EmbeddingSearch.buildIvfIndex(slice, "vec_id", "embedding", nlist = 4)
    // degenerate: quantized mining must be row-identical to exact mining
    val exactBook = VectorQuant.pqTrain(slice, "vec_id", "embedding",
      m = 8, ksub = 100, iters = 0, dim = 64)
    val exactPq = VectorQuant.quantizeIndex(ivf, slice, "vec_id", "embedding", exactBook)
    val viaPq = VectorQuant.hardNegativesIvfPq(exactPq, pairs, "qid", "qvec",
      "pos_id", k = 4, nprobe = 4).as[(Long, Long, Int, Double)].collect().toSet
    val viaExact = EmbeddingSearch.hardNegativesIvf(ivf, slice, "vec_id", "embedding",
      pairs, "qid", "qvec", "pos_id", k = 4, nprobe = 4)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(viaPq == viaExact && viaPq.nonEmpty)
    // lossy: exclusions still hold below the window
    val lossyBook = VectorQuant.pqTrain(slice, "vec_id", "embedding",
      m = 4, ksub = 8, iters = 2, dim = 64)
    val lossyPq = VectorQuant.quantizeIndex(ivf, slice, "vec_id", "embedding", lossyBook)
    val lossy = VectorQuant.hardNegativesIvfPq(lossyPq, pairs, "qid", "qvec",
      "pos_id", k = 4, nprobe = 4).as[(Long, Long, Int, Double)].collect()
    assert(lossy.nonEmpty)
    assert(!lossy.exists(r => r._2 == r._1 || r._2 == r._1 + 1L),
      "self and positive must be excluded from mined negatives")
  }

  test("pqEncodeExpr: in-row encode is bit-identical to the join+agg encode, degenerate and lossy") {
    val slice = emb.filter($"vec_id" < 100)
    for ((m, ksub, iters) <- Seq((8, 100, 0), (4, 8, 2), (8, 16, 1))) {
      val book = VectorQuant.pqTrain(slice, "vec_id", "embedding",
        m = m, ksub = ksub, iters = iters, dim = 64)
      val viaJoin = VectorQuant.pqEncode(slice, "vec_id", "embedding", book)
        .as[(Long, Seq[Int])].collect().toMap
      val collected = VectorQuant.collectBook(book)
      val viaExpr = slice.select($"vec_id",
          VectorQuant.pqEncodeExpr(collected, $"embedding").as("codes"))
        .as[(Long, Seq[Int])].collect().toMap
      assert(viaExpr == viaJoin && viaExpr.size == 100,
        s"in-row encode diverged at m=$m ksub=$ksub iters=$iters")
    }
  }

  test("int8: grid-aligned values round-trip exactly; arbitrary values obey the quantization error bound") {
    // per-dim min 0 / max 255 planted → scale = 1 → integer values sit
    // exactly ON the int8 grid and must round-trip bit-exactly
    val grid = (Seq((0L, Array.fill(8)(0f)), (1L, Array.fill(8)(255f))) ++
      (2 until 50).map(i => (i.toLong,
        Array.tabulate(8)(d => ((i * 7 + d * 13) % 256).toFloat))))
      .toDF("id", "v")
    val params = VectorQuant.int8Params(grid, "v")
    assert(params.forall { case (lo, sc) => lo == 0.0 && sc == 1.0 })
    val bad = grid.select($"v",
        VectorQuant.int8DecodeExpr(params,
          VectorQuant.int8EncodeExpr(params, $"v")).as("rec"))
      .filter(not($"v" === $"rec")).count()
    assert(bad == 0, "grid-aligned int8 round-trip must be exact")

    // real embeddings: |x − decode(encode(x))| <= scale per dimension
    // (half-step rounding + float cast slack; scale is the hard bound)
    val p = VectorQuant.int8Params(emb, "embedding")
    val sc = typedLit(p.map(_._2))
    val viol = emb.select($"embedding",
        VectorQuant.int8DecodeExpr(p,
          VectorQuant.int8EncodeExpr(p, $"embedding")).as("rec"))
      .select(exists(
        zip_with(
          zip_with($"embedding", $"rec",
            (x, r) => abs(x.cast("double") - r.cast("double"))),
          sc, (err, bound) => err > bound),
        b => b).as("bad"))
      .filter($"bad").count()
    assert(viol == 0, "int8 reconstruction error exceeded one quantization step")
  }

  test("pqTrain pins the codebook as local state; rqEncode reads the corpus through one shared stage-1 cut") {
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val slice = emb.filter($"vec_id" < 64)
    // a raw-plan codebook re-executes its corpus aggregation on every
    // downstream broadcast/collect — the train must return a pinned
    // LocalRelation instead (both the iters=0 init and post-Lloyd)
    val trained = VectorQuant.pqTrain(slice, "vec_id", "embedding",
      m = 8, ksub = 4, iters = 1, dim = 64)
    assert(trained.codebook.queryExecution.optimizedPlan.isInstanceOf[LocalRelation],
      "trained codebook must be pinned local state, not a re-executable plan")
    val books = VectorQuant.rqTrain(slice, "vec_id", "embedding",
      m = 8, ksub1 = 4, iters1 = 0, ksub2 = 64, iters2 = 0, dim = 64)
    assert(books.book1.codebook.queryExecution.optimizedPlan.isInstanceOf[LocalRelation])
    assert(books.book2.codebook.queryExecution.optimizedPlan.isInstanceOf[LocalRelation])
    // rqEncode's output must derive from the one materialized
    // (id, codes1, residual) cut — no second corpus scan in its plan
    val enc = VectorQuant.rqEncode(slice, "vec_id", "embedding", books)
    val corpusScans = enc.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l
    }
    assert(corpusScans.isEmpty,
      s"rqEncode must read the corpus only inside the shared cut; found ${corpusScans.size} scans")
    assert(enc.count() == 64)
  }
}
