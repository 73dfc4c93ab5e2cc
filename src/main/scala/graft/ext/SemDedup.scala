package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): cluster the corpus embeddings around coarse
  * centroids, then drop documents that sit within cosine `tau` of
  * another document IN THE SAME CLUSTER — the clusters exist precisely
  * to bound the pairwise comparison, which is the paper's whole trick
  * (within-cluster quadratic ≪ corpus quadratic).
  *
  * Deterministic keeper rule: a vector is DROPPED iff some LOWER-id
  * member of its cluster is within `tau` of it; its `dup_of` reports
  * the smallest such witness. This is a documented delta from the
  * paper's greedy per-cluster sweep (whose survivor set depends on
  * visit order): min-id witness semantics are order-free, so the kept
  * set is reproducible across partitionings and engines — the same
  * determinism trade [[ExactDedup]] and [[DedupClusters]] make. A
  * near-dup pair that straddles a cluster boundary is NOT dropped —
  * inherent to the method (the paper accepts the same misses); raise
  * coverage with fewer/larger cells or catch stragglers with the
  * banded [[MinHashLsh]]/[[SimHash]] passes.
  *
  * Scale shape: centroid assignment is one broadcast pass
  * ([[EmbeddingSearch.buildIvfIndex]] — nlist lowest-id vectors at
  * refineIters = 0, deterministic Lloyd rounds otherwise); the
  * pairwise stage shuffles once on cell id and compares within cells
  * only. Sizing nlist ∝ corpus/√pairs-budget keeps per-cell work flat;
  * the cosines reuse the strict left-fold [[EmbeddingSearch.dot]]
  * kernel, so every cosine is bit-identical to the brute-force oracle.
  */
object SemDedup {

  /** Per-vector verdict: (id, cell, dup_of, kept) — `dup_of` the
    * minimum same-cell id within `tau` (null when kept = 1), `kept`
    * as 0/1 long.
    */
  def semanticDedup(corpus: DataFrame, id: String, vec: String,
                    nlist: Int, tau: Double,
                    refineIters: Int = 0): DataFrame = {
    val idx = EmbeddingSearch.buildIvfIndex(corpus, id, vec, nlist, refineIters)
    val members = idx.assignments
      .join(corpus.select(col(id).as("id"), col(vec).as("__v")), Seq("id"))
    val a = members.select(col("cell"), col("id").as("__aid"), col("__v").as("__av"))
    val b = members.select(col("cell"), col("id").as("__bid"), col("__v").as("__bv"))
    // one shuffle on cell; only lower-id × higher-id pairs survive
    val witnesses = a.join(b, Seq("cell"))
      .filter(col("__aid") < col("__bid"))
      .withColumn("__cos", EmbeddingSearch.cosine(col("__av"), col("__bv")))
      .filter(col("__cos") >= lit(tau))
      .groupBy(col("__bid")).agg(min(col("__aid")).as("dup_of"))
    idx.assignments
      .join(witnesses.withColumnRenamed("__bid", "id"), Seq("id"), "left")
      .select(col("id"), col("cell"), col("dup_of"),
        when(col("dup_of").isNull, 1L).otherwise(0L).as("kept"))
  }
}
