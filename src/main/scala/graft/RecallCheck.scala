package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe: measured recall@k-vs-cost curves for the ANN paths
  * (`EmbeddingSearch.lshTopK` over SRP bits, `EmbeddingSearch.ivfTopK`
  * over nlist/nprobe) against `bruteForceTopK` ground truth — the
  * tuning table a user needs before picking bits/nlist/nprobe blind.
  * Results feed the SURVEY §8 decision table (SkewCheck pattern).
  *
  * Corpus: the embeddings fixture (SPARK_GRAFT_SF_DIR, default sf0.1)
  * unioned with deterministic jittered copies (×SPARK_GRAFT_X, default
  * 10) so every query has planted true near neighbors plus background;
  * queries are 50 original vectors.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.RecallCheck"
  */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val x = sys.env.getOrElse("SPARK_GRAFT_X", "10").toInt
    val k = 10

    val base = Tables.table(spark, dir, "embeddings").select($"vec_id", $"embedding")
    // ×x corpus: copy m jitters every component by a hash-derived
    // epsilon in [-1%, 1%] — a planted near-neighbor of its original
    val corpus = (1 until x).foldLeft(base) { (acc, m) =>
      acc.unionAll(base.select(($"vec_id" + lit(1000000L * m)).as("vec_id"),
        transform($"embedding", (v, i) =>
          (v + v * ((pmod(xxhash64($"vec_id" + lit(m), i), lit(2001L)) - 1000L)
            .cast("double") / 100000.0)).cast("float")).as("embedding")))
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCorpus = corpus.count()
    val queries = base.filter($"vec_id" < 50)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    queries.count()
    println(s"[recall] corpus=$nCorpus queries=50 k=$k dim=64")

    val tTruth0 = System.nanoTime()
    val truth = ext.EmbeddingSearch.bruteForceTopK(corpus, "vec_id", "embedding",
        queries, "qid", "qvec", k = k)
      .select(col("qid"), col("neighbor_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val truthN = truth.count()
    println(f"[recall] truth rows=$truthN (brute force, ${(System.nanoTime() - tTruth0) / 1e9}%.2f s)")

    def measure(label: String)(f: => DataFrame): Unit = {
      // rep1 includes codegen; rep2 is the steady-state number
      var out: DataFrame = null
      var dt = 0.0
      for (rep <- 1 to 2) {
        val t0 = System.nanoTime()
        out = f
        out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
        dt = (System.nanoTime() - t0) / 1e9
        if (rep == 1) out.unpersist()
      }
      val truthHits = truth.join(out.select(col("qid"), col("neighbor_id")),
        Seq("qid", "neighbor_id"), "left_semi").count()
      val recall = truthHits.toDouble / truthN
      val rows = out.count()
      println(f"[recall] $label%-28s recall@$k=${recall * 100}%5.1f%%  t=$dt%6.2f s  rows=$rows")
      out.unpersist()
    }

    for (bits <- Seq(4, 6, 8, 10, 12))
      measure(s"lshTopK bits=$bits") {
        ext.EmbeddingSearch.lshTopK(corpus, "vec_id", "embedding",
          queries, "qid", "qvec", k = k, bits = bits)
      }

    // OR-amplified SRP banding: same per-band selectivity as the
    // single-band rows above, recall lifted by any-band agreement —
    // the measurement behind the "bands lift the single-band plateau"
    // claim in EmbeddingSearch.lshTopK's doc
    for ((bits, bands) <- Seq((8, 2), (8, 4), (8, 6), (10, 4), (12, 4),
        (4, 8), (5, 8), (6, 8), (4, 12)))
      measure(s"lshTopK bits=$bits bands=$bands") {
        ext.EmbeddingSearch.lshTopK(corpus, "vec_id", "embedding",
          queries, "qid", "qvec", k = k, bits = bits, bands = bands)
      }

    for ((nlist, nprobe) <- Seq((16, 1), (16, 4), (16, 8), (16, 16),
        (64, 1), (64, 4), (64, 16), (64, 64)))
      measure(s"ivfTopK nlist=$nlist nprobe=$nprobe") {
        ext.EmbeddingSearch.ivfTopK(corpus, "vec_id", "embedding",
          queries, "qid", "qvec", k = k, nlist = nlist, nprobe = nprobe)
      }

    // persistent-index probes: build once (timed separately), then
    // measure the PER-BATCH probe cost against the prebuilt index —
    // the daily-ingest number ivfTopK's all-in time conflates
    for ((nlist, nprobe) <- Seq((16, 4), (64, 4), (64, 16))) {
      val tBuild0 = System.nanoTime()
      val idx = ext.EmbeddingSearch.buildIvfIndex(corpus, "vec_id", "embedding", nlist)
      val pinnedC = idx.centroids.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val pinnedA = idx.assignments.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pinnedC.count(); pinnedA.count()
      val tBuild = (System.nanoTime() - tBuild0) / 1e9
      val pinned = ext.EmbeddingSearch.IvfIndex(pinnedC, pinnedA)
      measure(f"ivfProbe nlist=$nlist np=$nprobe (build $tBuild%.1f s)") {
        ext.EmbeddingSearch.ivfProbe(pinned, corpus, "vec_id", "embedding",
          queries, "qid", "qvec", k = k, nprobe = nprobe)
      }
      pinnedC.unpersist(); pinnedA.unpersist()
    }

    // PQ-compressed serving state: recall vs compression at fixed
    // probe cost (nlist=64, nprobe=16). Codebooks train on a
    // deterministic 1-in-7 corpus sample (PQ converges on thousands of
    // points — the 100 TB training recipe in VectorQuant's doc);
    // encoding is the only full pass. "B/vec" is the logical serving
    // payload: m one-byte codes (ksub <= 256) vs dim·4 = 256 float
    // bytes. The rerank rows re-score the PQ survivors against full
    // vectors — the standard ADC-then-rerank operating point.
    {
      val dim = 64
      val idx = ext.EmbeddingSearch.buildIvfIndex(corpus, "vec_id", "embedding", 64)
      val sample = corpus.filter($"vec_id" % 7 === 0)
      for ((m, ksub) <- Seq((8, 256), (8, 64), (8, 16), (16, 256), (16, 16))) {
        val tTrain0 = System.nanoTime()
        val book = ext.VectorQuant.pqTrain(sample, "vec_id", "embedding",
          m, ksub, iters = 2, dim = dim)
        val pq = ext.VectorQuant.quantizeIndex(idx, corpus, "vec_id", "embedding", book)
        val pinnedA = pq.assignments
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        pinnedA.count()
        val tTrain = (System.nanoTime() - tTrain0) / 1e9
        val pinned = pq.copy(assignments = pinnedA)
        measure(f"pqProbe m=$m ksub=$ksub ($m B/vec, build $tTrain%.1f s)") {
          ext.VectorQuant.ivfProbePq(pinned, queries, "qid", "qvec",
            k = k, nprobe = 16)
        }
        measure(f"pqProbe+rerank m=$m ksub=$ksub (top-${3 * k} exact)") {
          ext.VectorQuant.ivfProbePqRerank(pinned, corpus, "vec_id", "embedding",
            queries, "qid", "qvec", k = k, rerankK = 3 * k, nprobe = 16)
        }
        pinnedA.unpersist()
      }
      // residual refinement at a FIXED code budget: 16 ksub=16 codes
      // per vector either as one 16-subspace PQ (the m=16/ksub=16 row
      // above) or as 8 coarse + 8 residual subspaces (RQ). The
      // residual stage spends its half of the budget on the CODING
      // ERROR of the first half instead of on narrower slices of the
      // raw signal, so recall at equal bytes should improve — measured
      // here, asserted nowhere (the q187 gate pins exactness only).
      {
        val tTrain0 = System.nanoTime()
        val books = ext.VectorQuant.rqTrain(sample, "vec_id", "embedding",
          m = 8, ksub1 = 16, iters1 = 2, ksub2 = 16, iters2 = 2, dim = dim)
        val rq = ext.VectorQuant.quantizeIndexRq(idx, corpus, "vec_id", "embedding", books)
        val pinnedA = rq.assignments
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        pinnedA.count()
        val tTrain = (System.nanoTime() - tTrain0) / 1e9
        measure(f"rqProbe 8+8 ksub=16 (16 codes, build $tTrain%.1f s)") {
          ext.VectorQuant.ivfProbeRq(rq.copy(assignments = pinnedA),
            queries, "qid", "qvec", k = k, nprobe = 16)
        }
        // coding-precision face: mean squared reconstruction error at
        // the SAME 16-code budget. Probe recall on this fixture is
        // routing-bound (every PQ row above reads the same number —
        // the lost neighbors die at cell routing, not at ADC
        // precision), so the residual stage's refinement is only
        // visible in the reconstruction error itself.
        def mseOf(label: String, rec: DataFrame): Unit = {
          val v = rec.select(avg(aggregate(
            zip_with(col("embedding"), col("rec"), (x, r) =>
              (x.cast("double") - r.cast("double")) *
                (x.cast("double") - r.cast("double"))),
            lit(0.0), (a, b) => a + b))).as[Double].head()
          println(f"[recall] $label%-28s mse=$v%.6f")
        }
        def pqMse(label: String, m: Int, ksub: Int): Unit = {
          val b = ext.VectorQuant.pqTrain(sample, "vec_id", "embedding",
            m, ksub, iters = 2, dim = dim)
          val cb = ext.VectorQuant.collectBook(b)
          val enc = ext.VectorQuant.pqEncode(corpus, "vec_id", "embedding", b)
          mseOf(label,
            corpus.join(enc, corpus("vec_id") === enc("id"))
              .select($"embedding",
                ext.VectorQuant.pqDecodeExpr(cb, $"codes").as("rec")))
        }
        // fixed m = 8: the residual stage refines what the SAME
        // subspace split truncates — the comparison for a pipeline at
        // its dsub floor. Fixed 16 codes (m=16 row): on this
        // hash-noise fixture residuals are isotropic, so RQ ≈ a finer
        // flat split; structured real embeddings are where the
        // coarse-then-refine layout pulls ahead.
        pqMse("mse pq m=8 ksub=16 (8 codes)", 8, 16)
        pqMse("mse pq m=16 ksub=16", 16, 16)
        val cr1 = ext.VectorQuant.collectBook(books.book1)
        val cr2 = ext.VectorQuant.collectBookD(books.book2)
        mseOf("mse rq 8+8 ksub=16",
          corpus.join(pinnedA.select($"id", $"codes1", $"codes2"),
              corpus("vec_id") === col("id"))
            .select($"embedding", ext.VectorQuant.rqDecodeExpr(
              cr1, cr2, $"codes1", $"codes2").as("rec")))
        pinnedA.unpersist()
      }
      // OPQ rotation value on a variance-imbalanced corpus (the
      // structure real embeddings have): flat PQ vs the same PQ after
      // the exact-Gram → Jacobi → balanced-allocation rotation, same
      // m/ksub. Identity-rotation exactness is gated (q191); the
      // LEARNED rotation is measured here.
      {
        val skewed = corpus.select($"vec_id",
          transform($"embedding", (v, i) =>
            (v.cast("double") *
              when(i < 8, lit(4.0)).otherwise(lit(0.25))).cast("float"))
            .as("embedding"))
        def mseSkew(label: String, df: DataFrame): Unit = {
          val b = ext.VectorQuant.pqTrain(df.filter($"vec_id" % 7 === 0),
            "vec_id", "embedding", 8, 16, iters = 2, dim = dim)
          val cb = ext.VectorQuant.collectBook(b)
          val enc = ext.VectorQuant.pqEncode(df, "vec_id", "embedding", b)
          val v = df.join(enc, df("vec_id") === enc("id"))
            .select($"embedding",
              ext.VectorQuant.pqDecodeExpr(cb, $"codes").as("rec"))
            .select(avg(aggregate(
              zip_with(col("embedding"), col("rec"), (x, r) =>
                (x.cast("double") - r.cast("double")) *
                  (x.cast("double") - r.cast("double"))),
              lit(0.0), (a, b) => a + b))).as[Double].head()
          println(f"[recall] $label%-28s mse=$v%.6f")
        }
        mseSkew("mse flat-pq (imbalanced)", skewed)
        val rot = ext.Opq.rotationFromCorpus(
          skewed.filter($"vec_id" % 7 === 0), $"embedding", dim, 8)
        mseSkew("mse opq-pq (imbalanced)", skewed.select($"vec_id",
          ext.Opq.rotateExpr(rot, $"embedding").as("embedding")))
      }
      // int8 scalar quantization: the 4× point — decode is a pure
      // per-row expression, so the probe is the same brute kernel over
      // reconstructed vectors
      val p = ext.VectorQuant.int8Params(corpus, "embedding")
      val coded = corpus.select($"vec_id",
          ext.VectorQuant.int8EncodeExpr(p, $"embedding").as("codes"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      coded.count()
      measure("int8 bruteForce (64 B/vec)") {
        ext.EmbeddingSearch.bruteForceTopK(
          coded.select($"vec_id",
            ext.VectorQuant.int8DecodeExpr(p, $"codes").as("embedding")),
          "vec_id", "embedding", queries, "qid", "qvec", k = k)
      }
      coded.unpersist()
    }

    // index-maintenance drift: day-0 index built on the ORIGINAL 10%
    // slice, then extended with the 9× jittered batches against the
    // stale centroids (the extendIvfIndex accretion path). The advice
    // row's skew quantifies the drift; the advised refined rebuild
    // should restore recall toward the fresh-build number at equal
    // probe cost — the measurement behind ivfRebuildAdvice's cadence.
    {
      val idx0 = ext.EmbeddingSearch.buildIvfIndex(base, "vec_id", "embedding", nlist = 16)
      val drifted = ext.EmbeddingSearch.extendIvfIndex(idx0,
        corpus.filter($"vec_id" >= 1000000L), "vec_id", "embedding")
      def advice(label: String, ix: ext.EmbeddingSearch.IvfIndex): Unit = {
        val r = ext.EmbeddingSearch.ivfRebuildAdvice(ix).collect().head
        println(f"[recall] ivfAdvice $label%-10s skew=${r.getAs[Double]("skew")}%5.2f " +
          f"empty=${r.getAs[Long]("n_empty")} max=${r.getAs[Long]("max_cell")} " +
          f"rebuild=${r.getAs[Boolean]("rebuild")}")
      }
      advice("drifted", drifted)
      measure("ivfProbe drifted np=4") {
        ext.EmbeddingSearch.ivfProbe(drifted, corpus, "vec_id", "embedding",
          queries, "qid", "qvec", k = k, nprobe = 4)
      }
      // the advice-loop repair: warm Lloyd refinement seeded from the
      // DRIFTED centroids (rebuildIvfIndex), not a cold re-build
      val rebuilt = ext.EmbeddingSearch.rebuildIvfIndex(drifted, corpus,
        "vec_id", "embedding", refineIters = 1)
      advice("rebuilt", rebuilt)
      measure("ivfProbe rebuilt np=4") {
        ext.EmbeddingSearch.ivfProbe(rebuilt, corpus, "vec_id", "embedding",
          queries, "qid", "qvec", k = k, nprobe = 4)
      }
    }

    // corpus-scale hard-negative mining: |Q| = THE WHOLE CORPUS (every
    // vector mines its own negatives, positive = a planted jitter copy
    // where one exists, else itself+1) — the regime where the brute
    // |Q|·|C| path is off the table. Negatives-recall = fraction of
    // brute-force negatives the IVF path reproduces, on a 2k-query
    // sample of the corpus-sized run (the truth side is quadratic; the
    // MINING side runs at full |Q| so the measured time is the real
    // corpus-scale cost).
    {
      val allPairs = corpus.select($"vec_id".as("qid"), $"embedding".as("qvec"),
        (when($"vec_id" < 1000000L, $"vec_id" + 1000000L)
          .otherwise($"vec_id" - 1000000L)).as("pos_id"))
      val nQ = allPairs.count()
      val kNeg = 5
      for ((nlist, nprobe) <- Seq((64, 4), (64, 16))) {
        val idx = ext.EmbeddingSearch.buildIvfIndex(corpus, "vec_id", "embedding", nlist)
        val t0 = System.nanoTime()
        val mined = ext.EmbeddingSearch.hardNegativesIvf(idx, corpus, "vec_id", "embedding",
            allPairs, "qid", "qvec", "pos_id", k = kNeg, nprobe = nprobe)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nMined = mined.count()
        val dt = (System.nanoTime() - t0) / 1e9
        val sample = allPairs.filter($"qid" % 37 === 0).limit(2000)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nSample = sample.count()
        val bruteSample = ext.EmbeddingSearch.hardNegatives(corpus, "vec_id", "embedding",
            sample, "qid", "qvec", "pos_id", k = kNeg)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nBrute = bruteSample.count()
        val hit = bruteSample.join(mined.select($"qid", $"negative_id"),
          Seq("qid", "negative_id"), "left_semi").count()
        println(f"[recall] hardNegIvf nlist=$nlist np=$nprobe |Q|=$nQ " +
          f"negRecall=${hit * 100.0 / nBrute}%5.1f%% (on $nSample sampled queries) " +
          f"t=$dt%6.2f s rows=$nMined")
        bruteSample.unpersist(); sample.unpersist(); mined.unpersist()
      }
    }

    // semantic-decontamination catch rate: the jittered copies of the
    // 50 "eval" vectors ARE the planted contamination (cos ≈ 0.9998);
    // how many does the SRP-bucketed screen catch vs the exact one?
    val tau = 0.99
    val evalSet = queries.select($"qid".as("eval_id"), $"qvec".as("evec"))
    val exactT0 = System.nanoTime()
    val exact = ext.Decontaminate.byEmbedding(corpus, "vec_id", "embedding",
        evalSet, "eval_id", "evec", tau)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nExact = exact.count()
    println(f"[recall] decontam exact tau=$tau flagged=$nExact " +
      f"(${(System.nanoTime() - exactT0) / 1e9}%.2f s)")
    for (bits <- Seq(4, 8, 12, 16)) {
      var dt = 0.0
      var caught = 0L
      for (rep <- 1 to 2) {
        val t0 = System.nanoTime()
        val lsh = ext.Decontaminate.byEmbeddingLsh(corpus, "vec_id", "embedding",
          evalSet, "eval_id", "evec", tau, bits = bits)
        caught = lsh.join(exact, Seq("vec_id"), "left_semi").count()
        dt = (System.nanoTime() - t0) / 1e9
      }
      println(f"[recall] decontamLsh bits=$bits%-2d catch=${caught * 100.0 / nExact}%5.1f%%  t=$dt%6.2f s")
    }
    // banded screens: same plane budgets as the single-band rows
    // above, OR-amplified — the operating points a leakage-sensitive
    // pipeline should run
    for ((bits, bands) <- Seq((4, 4), (8, 4), (4, 8), (8, 2))) {
      var dt = 0.0
      var caught = 0L
      for (rep <- 1 to 2) {
        val t0 = System.nanoTime()
        val lsh = ext.Decontaminate.byEmbeddingLsh(corpus, "vec_id", "embedding",
          evalSet, "eval_id", "evec", tau, bits = bits, bands = bands)
        caught = lsh.join(exact, Seq("vec_id"), "left_semi").count()
        dt = (System.nanoTime() - t0) / 1e9
      }
      println(f"[recall] decontamLsh bits=$bits%-2d bands=$bands catch=${caught * 100.0 / nExact}%5.1f%%  t=$dt%6.2f s")
    }

    spark.stop()
  }
}
