package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Set algebra over KMV distinct sketches — union, intersection, and
  * difference CARDINALITY estimates computed purely from persisted
  * sketch state (the theta-sketch pattern, Dasgupta et al. /
  * Beyer et al. 2007), never from a corpus re-read. The sketches are
  * [[graft.functions.KmvSketchAgg]] outputs: sorted ascending arrays
  * of the ≤ k smallest distinct 32-bit portable hashes per group.
  *
  * Why this matters at 100 TB: "how many users did A and B share last
  * week" over two snapshot partitions is a full shuffle of both sides
  * when answered exactly, but pure ≤ k-element array arithmetic when
  * answered from per-partition sketch state — the sketches are the
  * only thing that moves, and they were already persisted for the
  * distinct-count use case (q50).
  *
  * Estimator, deterministic given the hash (the KMV rule, same
  * convention as q50's `(k-1)·M/kth`):
  *
  *   - u        = k smallest of the deduped concatenation of the two
  *                minima arrays — exactly the KMV sketch of A ∪ B
  *   - est(A∪B) = |u| if |u| < k (EXACT: a union sketch shorter than
  *                k holds every hash of both sides) else (k-1)·M/θ,
  *                θ = u's kth value
  *   - est(A∩B) = exact |a ∩ b| in the exact regime, else
  *                ρ·est(A∪B)/k where ρ = |{h ∈ a ∩ b : h ≤ θ}| —
  *                the survivors are a uniform k-sample of A ∪ B, so
  *                the sample intersection fraction scales the union
  *                estimate. Membership is decidable from state alone:
  *                h ≤ θ ≤ kth(b), so h ∈ B ⇒ h ∈ b.
  *   - est(A∖B) = same with the sample difference |{h ∈ a ∖ b :
  *                h ≤ θ}| — and ρ∩ + ρ∖ab + ρ∖ba = k, so the three
  *                estimates sum to the union estimate by construction
  *                (inclusion–exclusion consistency is exact, not
  *                approximate).
  *
  * All arithmetic is a fixed IEEE expression tree mirrored verbatim
  * in the oracle SQL (gate q147 pins both regimes: k=12 estimator,
  * k=256 exact). The per-group lambda filters run over ≤ k-element
  * arrays — interpreted, but on sketch-sized state, not corpus rows.
  */
object KmvSetOps {

  /** Hash-space size for [[MinHashLsh.portableHash32]] values. */
  val hashSpace: Double = 4294967296.0

  /** KMV sketch of the union: k smallest of the deduped merge. */
  def unionMins(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** The q50 estimator over any minima array. */
  def estimate(mins: Column, k: Int): Column =
    when(size(mins) < k, size(mins).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(hashSpace) /
        element_at(mins, k).cast("double"))

  private def theta(u: Column, k: Int): Column = element_at(u, k)

  /** Union-cardinality estimate from two sketches. */
  def unionEstimate(a: Column, b: Column, k: Int): Column =
    estimate(unionMins(a, b, k), k)

  /** Intersection-cardinality estimate from two sketches. */
  def intersectEstimate(a: Column, b: Column, k: Int): Column = {
    val u = unionMins(a, b, k)
    when(size(u) < k, size(array_intersect(a, b)).cast("double"))
      .otherwise(
        size(filter(array_intersect(a, b), h => h <= theta(u, k)))
          .cast("double") * estimate(u, k) / lit(k.toDouble))
  }

  /** Difference-cardinality estimate est(A ∖ B) from two sketches. */
  def differenceEstimate(a: Column, b: Column, k: Int): Column = {
    val u = unionMins(a, b, k)
    when(size(u) < k, size(array_except(a, b)).cast("double"))
      .otherwise(
        size(filter(array_except(a, b), h => h <= theta(u, k)))
          .cast("double") * estimate(u, k) / lit(k.toDouble))
  }
}
