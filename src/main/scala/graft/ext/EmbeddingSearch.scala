package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * `bruteForceTopK` is the exact baseline: broadcast the (small) query
  * set against the corpus, codegen'd dot product via zip_with/aggregate
  * (a strict left fold — deterministic IEEE summation order, which is
  * what makes the DuckDB oracle bit-exact), per-query top-k via
  * row_number. Cost: |Q|·|C| — right for reranking and small query
  * batches.
  *
  * `lshTopK` is the scale path: b-bit signed-random-projection (SimHash
  * for vectors) bucketing. Hyperplanes are pseudo-random but
  * DETERMINISTIC (seeded by xxhash64 of (plane, dim)), so signatures are
  * reproducible across runs and clusters. Candidates = same bucket;
  * exact cosine rerank inside the bucket. Linear shuffle, tunable
  * recall via bits/bands.
  */
object EmbeddingSearch {

  /** Ordered left-fold dot product over float vectors — the native
    * codegen'd expression (graft.functions.VecDot); bit-identical to
    * the aggregate(zip_with(...)) formulation and to a sequential
    * oracle, without the interpreted higher-order-function overhead.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VecDot(a, b)

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact cosine top-k neighbors for each query vector.
    *
    * @param corpus  (id, vec) — the full corpus
    * @param queries (qid, qvec) — small; broadcast
    */
  def bruteForceTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
                     queries: DataFrame, queryId: String, queryVec: String,
                     k: Int, excludeSelf: Boolean = true): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .withColumn("cos", cosine(col(queryVec), col(corpusVec)))
    val filtered = if (excludeSelf) joined.filter(col(queryId) =!= col(corpusId)) else joined
    val w = Window.partitionBy(queryId)
      .orderBy(col("cos").desc, col(corpusId).asc)
    filtered
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col(corpusId).as("neighbor_id"), col("rank"), col("cos"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d):
    * xxhash64 mapped to a centered double in [-0.5, 0.5).
    */
  private def planeComponent(p: Int, d: Column): Column =
    (pmod(xxhash64(lit(p), d), lit(1000000L)).cast("double") / 1000000.0) - 0.5

  /** b-bit signed-projection signature of a vector (bit i = sign of the
    * dot product with pseudo-random plane i), as a long.
    */
  def srpSignature(vec: Column, bits: Int): Column = {
    require(bits <= 62, "signature packed into a long")
    val sig = (0 until bits).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    sig.reduce((a, b) => a + b)
  }

  /** IVF (inverted-file) approximate top-k: partition the corpus into
    * `nlist` cells around coarse centroids, probe the `nprobe` cells
    * closest to each query, exact-rerank inside the probed cells.
    *
    * Centroids here are the `nlist` lowest-id corpus vectors —
    * deterministic and adequate for a randomized corpus; a production
    * build swaps in sampled k-means centroids without touching the
    * plan shape. Cost: one corpus×nlist assignment pass (linear, nlist
    * constant, broadcast centroids) + rerank over probed cells only.
    * With nprobe == nlist this degrades gracefully to exact brute
    * force (pinned by the spec).
    */
  def ivfTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
              queries: DataFrame, queryId: String, queryVec: String,
              k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val cents = corpus.orderBy(col(corpusId)).limit(nlist)
      .select(col(corpusId).as("__cid"), col(corpusVec).as("__cvec"))

    // cell assignment: nearest centroid per corpus vector
    val wAssign = Window.partitionBy(corpusId)
      .orderBy(col("__ccos").desc, col("__cid").asc)
    val assigned = corpus.crossJoin(broadcast(cents))
      .withColumn("__ccos", cosine(col(corpusVec), col("__cvec")))
      .withColumn("__rn", row_number().over(wAssign))
      .filter(col("__rn") === 1)
      .select(col(corpusId), col(corpusVec), col("__cid"))

    // probe list: nprobe nearest centroids per query
    val wProbe = Window.partitionBy(queryId)
      .orderBy(col("__ccos").desc, col("__cid").asc)
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("__ccos", cosine(col(queryVec), col("__cvec")))
      .withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= nprobe)
      .select(col(queryId), col(queryVec), col("__cid"))

    // exact rerank within probed cells
    val cand = assigned.join(broadcast(probes), Seq("__cid"))
      .filter(col(queryId) =!= col(corpusId))
      .withColumn("cos", cosine(col(queryVec), col(corpusVec)))
    val w = Window.partitionBy(queryId).orderBy(col("cos").desc, col(corpusId).asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col(corpusId).as("neighbor_id"), col("rank"), col("cos"))
  }

  /** Approximate top-k: bucket corpus and queries by SRP signature,
    * exact-rerank within buckets. Vectors whose bucket lacks k
    * neighbors return fewer (recall/cost tradeoff; lower `bits` for
    * higher recall).
    */
  def lshTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
              queries: DataFrame, queryId: String, queryVec: String,
              k: Int, bits: Int = 8): DataFrame = {
    val c = corpus.withColumn("__sig", srpSignature(col(corpusVec), bits))
    val q = queries.withColumn("__sig", srpSignature(col(queryVec), bits))
    val cand = c.join(broadcast(q), Seq("__sig"))
      .filter(col(queryId) =!= col(corpusId))
      .withColumn("cos", cosine(col(queryVec), col(corpusVec)))
    val w = Window.partitionBy(queryId).orderBy(col("cos").desc, col(corpusId).asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col(corpusId).as("neighbor_id"), col("rank"), col("cos"))
  }
}
