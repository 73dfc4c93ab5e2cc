package graft.ext

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.functions._

/** Hashed bag-of-ngrams linear classifier — the fastText/CCNet-class
  * quality model: a logistic regression over HASHED word n-gram
  * features, the standard recipe for "train a quality classifier on
  * a few labeled documents, score the corpus" where the signal lives
  * in VOCABULARY, not in the engineered surface statistics
  * [[QualityModel]] uses (CCNet trains exactly this shape against
  * Wikipedia; FineWeb-Edu's filter is its descendant).
  *
  * The hashing trick makes the feature space fixed-size with no vocab
  * table: gram → bucket via the PORTABLE 32-bit md5 Horner hash
  * ([[MinHashLsh.portableHash32]] mod D) — no engine-private hash
  * constants, so an external system (or the DuckDB oracle, gate q188)
  * reproduces the features from the text alone. Features are
  * L1-normalized bucket counts x_j = n_j / Σn (the fastText mean).
  *
  * Determinism discipline (the [[QualityTrain]] recipe, long-format):
  * the per-(doc, bucket) margin terms w_j·x_j quantize to
  * DECIMAL(38,12) before the per-document sum, and the gradient terms
  * (σ(z)−y)·x_j to DECIMAL(38,6) before the per-bucket sum — decimal
  * addition is exact and order-invariant, so the fit is
  * partition-invariant and cross-engine reproducible; fixed `iters`,
  * never a convergence test.
  *
  * Scale shape: the text scan runs ONCE (features persist as a
  * releasable cut of (doc, bucket, x) rows); each gradient pass is
  * two hash aggregations of that narrow frame (one per-doc, one
  * per-bucket, both map-side combined). Weights are D+1 doubles of
  * driver state — at the gate's D=16 trivially, and the long format
  * is exactly what scales past literal-size: at D = 2²¹ (fastText's
  * default) the weights become a broadcast TABLE and nothing else
  * changes, where a wide-column design ([[QualityTrain]]'s 6 fixed
  * features) would need a 2-million-column schema.
  */
object HashedNgram {

  /** Long-format hashed features: (doc_id, bucket, x) — word unigrams
    * and adjacent bigrams over the kept-token sequence (the
    * [[Keywords.termFrequency]] grammar: lowercased whitespace
    * tokens matching `^[a-z]{3,}$`), bucket =
    * portableHash32(gram) mod D, x = bucket count / total gram count.
    * Documents with no kept tokens produce no rows (their margin is
    * the intercept alone).
    */
  def features(df: DataFrame, id: Column, text: Column, d: Int): DataFrame = {
    require(d >= 2 && d <= (1 << 21), s"d in [2, 2^21], got $d")
    val kt = filter(split(lower(trim(text)), "\\s+"),
      t => t.rlike("^[a-z]{3,}$"))
    val bigrams = zip_with(
      slice(kt, lit(1), greatest(size(kt) - 1, lit(0))),
      slice(kt, lit(2), greatest(size(kt) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    val bk = df.select(id.as("doc_id"),
        explode(concat(kt, bigrams)).as("__g"))
      .select(col("doc_id"),
        pmod(MinHashLsh.portableHash32(col("__g")), lit(d.toLong)).as("bucket"))
    // per-doc total as a WINDOW over the (doc, bucket) counts, not a
    // second groupBy + join: the join formulation duplicated the
    // explode subtree (text tokenized TWICE — the dominant cost at
    // blowup scale) and re-exchanged the counts for the join; this
    // scans once, exchanges twice (gram→(doc,bucket), counts→doc),
    // and leaves the output hash-partitioned by doc_id — exactly what
    // fit's per-iteration doc_id aggregations/joins want. x is an
    // exact integer ratio either way (identical results).
    val wDoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    bk.groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("__c"))
      .select(col("doc_id"), col("bucket"),
        (col("__c").cast("double") /
          sum(col("__c")).over(wDoc).cast("double")).as("x"))
  }

  /** Fit the D+1 weights by `iters` deterministic batch-gradient
    * steps. Returns (bucket, weight) rows: bucket −1 is the
    * intercept, then buckets 0..D−1 (zero-gradient buckets keep
    * weight 0) — exactly what [[score]] consumes.
    */
  def fit(df: DataFrame, id: Column, text: Column, label: Column,
          d: Int = 16, iters: Int = 2, lr: Double = 0.5): Seq[(Long, Double)] = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(lr > 0, s"lr must be positive, got $lr")
    val spark = df.sparkSession
    import spark.implicits._
    // spread the labeled frame before the gram explode (single-file
    // local scans serialize the md5-hash map stage onto one core —
    // no-op on an already-parallel input); downstream sums are all
    // decimal-grid / exact-integer, so partitioning cannot move bits
    val dfS = GraftBridge.spreadForMapWork(df.toDF(), id)
    // keepPartitioning: both cuts come out hash-partitioned by doc_id
    // (features naturally, labels via the explicit repartition), so
    // each iteration's margin groupBy(doc_id), the labels⋈margins
    // join, and the gradient join back onto the features plan NO new
    // corpus-proportional Exchange — the per-iteration shuffles were
    // the dominant term of the ×100 tier reading
    val fCut = GraftBridge.persistCutFrame(features(dfS, id, text, d),
      eager = true, keepPartitioning = true)
    val lCut = GraftBridge.persistCutFrame(
      dfS.select(id.as("doc_id"), label.cast("double").as("__y"))
        .repartition(col("doc_id")), eager = true, keepPartitioning = true)
    try {
      val n = lCut.df.count()
      require(n > 0, "cannot fit on an empty labeled frame")
      // a null label would silently skip gradient terms while n still
      // counts the row — fail loudly (the QualityTrain discipline)
      val nBad = lCut.df.filter(col("__y").isNull).count()
      require(nBad == 0,
        s"labeled frame has $nBad rows with null label — drop or impute before fit")
      val w = Array.fill(d)(0.0)
      var w0 = 0.0
      for (_ <- 1 to iters) {
        val wdf = w.zipWithIndex
          .map { case (v, j) => (j.toLong, v) }.toSeq.toDF("bucket", "__wt")
        val zs = fCut.df.join(broadcast(wdf), "bucket")
          .groupBy(col("doc_id"))
          .agg(sum((col("x") * col("__wt")).cast("decimal(38,12)")).as("__zs"))
        val pd = lCut.df.join(zs, Seq("doc_id"), "left")
          .select(col("doc_id"), col("__y"),
            (lit(1.0) / (lit(1.0) + exp(-(lit(w0) +
              coalesce(col("__zs").cast("double"), lit(0.0)))))).as("__p"))
        val pCut = GraftBridge.persistCutFrame(pd, eager = true,
          keepPartitioning = true)
        try {
          val gi = pCut.df
            .agg(sum((col("__p") - col("__y")).cast("decimal(38,6)")))
            .head().getDecimal(0)
          val gb = pCut.df.join(fCut.df, "doc_id")
            .groupBy(col("bucket"))
            .agg(sum(((col("__p") - col("__y")) * col("x"))
              .cast("decimal(38,6)")).as("__g"))
            .collect()
            .map(r => r.getLong(0) -> r.getDecimal(1).doubleValue()).toMap
          w0 -= lr * (gi.doubleValue() / n)
          for (j <- 0 until d)
            w(j) -= lr * (gb.getOrElse(j.toLong, 0.0) / n)
        } finally pCut.release()
      }
      (-1L, w0) +: w.zipWithIndex.map { case (v, j) => (j.toLong, v) }.toSeq
    } finally { fCut.release(); lCut.release() }
  }

  /** [[fit]] with the weights kept DISTRIBUTED through training —
    * no per-iteration collect, so D = 2²¹ (fastText's default) costs
    * what D = 16 costs plus a bigger join side; only the FINAL model
    * table is pinned for return (D rows of (long, double) — single-
    * digit MBs even at 2²¹; persist it to parquet as the serving
    * state). Each iteration:
    * margin sums via a features⋈weights join, sigmoid against the
    * one-row intercept frame (broadcast), per-bucket and global
    * gradient aggregations, and a pure-join weight update; the new
    * weight table persists as a releasable cut and the previous one
    * releases (the [[VectorQuant.pqTrain]] round discipline). Every
    * expression tree matches [[fit]] term for term — decimal-grid
    * margin and gradient sums, the identical IEEE step — so the two
    * paths produce BIT-IDENTICAL weights (pinned in HashedNgramSpec);
    * use [[fit]] when D is literal-sized, this when it is not.
    *
    * Returns the (bucket, weight) frame — intercept at bucket −1 —
    * ready to persist to parquet as model state.
    */
  def fitDistributed(df: DataFrame, id: Column, text: Column, label: Column,
                     d: Int = 16, iters: Int = 2, lr: Double = 0.5): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(lr > 0, s"lr must be positive, got $lr")
    val spark = df.sparkSession
    // same spread + doc_id-partitioned cut discipline as [[fit]]
    val dfS = GraftBridge.spreadForMapWork(df.toDF(), id)
    val fCut = GraftBridge.persistCutFrame(features(dfS, id, text, d),
      eager = true, keepPartitioning = true)
    val lCut = GraftBridge.persistCutFrame(
      dfS.select(id.as("doc_id"), label.cast("double").as("__y"))
        .repartition(col("doc_id")), eager = true, keepPartitioning = true)
    var wCut: Option[GraftBridge.CutFrame] = None
    try {
      val n = lCut.df.count()
      require(n > 0, "cannot fit on an empty labeled frame")
      val nBad = lCut.df.filter(col("__y").isNull).count()
      require(nBad == 0,
        s"labeled frame has $nBad rows with null label — drop or impute before fit")
      // weights state: D bucket rows + a one-row intercept frame,
      // both distributed
      var weights: DataFrame = spark.range(d)
        .select(col("id").as("bucket"), lit(0.0).as("__wt"))
      var intercept: DataFrame = spark.range(1).select(lit(0.0).as("__w0"))
      for (_ <- 1 to iters) {
        val zs = fCut.df.join(weights, "bucket")
          .groupBy(col("doc_id"))
          .agg(sum((col("x") * col("__wt")).cast("decimal(38,12)")).as("__zs"))
        val pd = lCut.df.join(zs, Seq("doc_id"), "left")
          .crossJoin(broadcast(intercept))
          .select(col("doc_id"), col("__y"),
            (lit(1.0) / (lit(1.0) + exp(-(col("__w0") +
              coalesce(col("__zs").cast("double"), lit(0.0)))))).as("__p"))
        val pCut = GraftBridge.persistCutFrame(pd, eager = true,
          keepPartitioning = true)
        try {
          val gb = pCut.df.join(fCut.df, "doc_id")
            .groupBy(col("bucket"))
            .agg(sum(((col("__p") - col("__y")) * col("x"))
              .cast("decimal(38,6)")).as("__g"))
          val gi = pCut.df
            .agg(sum((col("__p") - col("__y")).cast("decimal(38,6)")).as("__g"))
          val nextW = weights.join(gb, Seq("bucket"), "left")
            .select(col("bucket"),
              (col("__wt") - lit(lr) *
                (coalesce(col("__g").cast("double"), lit(0.0)) / lit(n.toDouble)))
                .as("__wt"))
          val nextI = intercept.crossJoin(broadcast(gi))
            .select((col("__w0") - lit(lr) *
              (col("__g").cast("double") / lit(n.toDouble))).as("__w0"))
          // one cut holds BOTH frames for the round (union-tagged), so
          // the previous round's lineage is truncated before release
          val tagged = nextW.select(col("bucket"), col("__wt"))
            .unionByName(nextI.select(lit(-1L).as("bucket"), col("__w0").as("__wt")))
          val cut = GraftBridge.persistCutFrame(tagged, eager = true)
          wCut.foreach(_.release())
          wCut = Some(cut)
          weights = cut.df.filter(col("bucket") >= 0L)
          intercept = cut.df.filter(col("bucket") === -1L)
            .select(col("__wt").as("__w0"))
        } finally pCut.release()
      }
      wCut match {
        case Some(cut) =>
          // pin the final table so the caller outlives the cut
          val rows = cut.df.orderBy(col("bucket")).collect()
          val out = spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](
              java.util.Arrays.asList(rows: _*)), cut.df.schema)
          out.select(col("bucket"), col("__wt").as("weight"))
        case None => // iters >= 1 guarantees a cut; unreachable
          spark.range(0).select(col("id").as("bucket"), lit(0.0).as("weight"))
      }
    } finally {
      fCut.release(); lCut.release(); wCut.foreach(_.release())
    }
  }

  /** Persist / reload fitted weights as parquet model state. Longs
    * and doubles round-trip parquet exactly, so scoring through the
    * reloaded state is bit-identical (pinned in HashedNgramSpec).
    */
  def writeWeights(weights: Seq[(Long, Double)], spark: org.apache.spark.sql.SparkSession,
                   dir: String): Unit = {
    import spark.implicits._
    weights.toDF("bucket", "weight").write.mode("overwrite").parquet(dir)
  }

  def readWeights(spark: org.apache.spark.sql.SparkSession,
                  dir: String): Seq[(Long, Double)] = {
    import spark.implicits._
    spark.read.parquet(dir).select($"bucket", $"weight")
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
  }

  /** Score documents with fitted weights: (doc_id, score) where
    * score = σ(w0 + Σ w_j·x_j) through the identical expression tree
    * the trainer used — training-time predictions and serving-time
    * scores are the same IEEE arithmetic.
    */
  def score(df: DataFrame, id: Column, text: Column,
            weights: Seq[(Long, Double)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val w0 = weights.find(_._1 == -1L)
      .getOrElse(throw new IllegalArgumentException(
        "weights must carry the intercept row (bucket = -1)"))._2
    // The hash modulus D is structural model state, not a row count
    // (ADVICE r12): fit/fitDistributed emit dense 0..D-1 rows, so D =
    // max bucket + 1 — and any GAP in the bucket ids (zero-weight rows
    // dropped in persistence, or a sparse cut at the documented
    // D = 2^21 scale) would silently change the modulus and mis-bucket
    // every gram. Fail loudly instead of inferring from a corrupted
    // table.
    val buckets = weights.map(_._1).filter(_ >= 0L).sorted
    require(buckets.size >= 2, s"weights must carry >= 2 bucket rows, got ${buckets.size}")
    val d = (buckets.last + 1).toInt
    require(buckets == (0L until d.toLong),
      s"weights must carry a DENSE bucket range 0..${d - 1}: " +
        s"got ${buckets.size} rows (gaps change the hash modulus; " +
        "persist zero-weight rows rather than dropping them)")
    val wdf = weights.filter(_._1 >= 0L).toDF("bucket", "__wt")
    val zs = features(df, id, text, d).join(broadcast(wdf), "bucket")
      .groupBy(col("doc_id"))
      .agg(sum((col("x") * col("__wt")).cast("decimal(38,12)")).as("__zs"))
    df.select(id.as("doc_id"))
      .join(zs, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (lit(1.0) / (lit(1.0) + exp(-(lit(w0) +
          coalesce(col("__zs").cast("double"), lit(0.0)))))).as("score"))
  }
}
