package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate cluster canonicalization: connected components over
  * a candidate-pair list, then one keeper per component.
  *
  * LSH families (MinHashLsh / SimHash / EmbeddingSearch) emit PAIRS;
  * an actual dedup pass must then group transitively-linked documents
  * (A~B, B~C ⇒ {A,B,C} is one duplicate cluster) and keep one
  * canonical member. The reference's dedup is key-equality only
  * (`load_hhs.py:96-137`) — transitive closure is the extension a
  * near-dup pipeline needs.
  *
  * Algorithm: iterative min-label propagation (the Pregel formulation
  * of connected components). Labels start as each node's own id; each
  * round every node takes the min of its label and its neighbors'
  * labels; fixpoint = components labeled by their min member id.
  *
  * Scale design:
  *   - Each round is ONE shuffle (edge⋈label join + grouped min) over
  *     the PAIR list — near-dup pair sets are orders of magnitude
  *     smaller than the corpus (candidate-proportional by LSH design).
  *   - Rounds needed = max component diameter. Duplicate clusters are
  *     dense (most pairs within a cluster survive the similarity
  *     threshold), so diameters are small; `maxIter` caps pathology.
  *   - The per-round driver convergence check is one scalar count —
  *     a Pregel-style control-flow read, not a data collect; lineage
  *     is cut with localCheckpoint each round so plans don't grow
  *     exponentially across iterations.
  *   - Labels converge deterministically (min is order-insensitive),
  *     so results are partition-invariant and oracle-checkable.
  */
object DedupClusters {

  /** Connected components of the undirected graph given by a pair
    * list. Input: columns `id1`, `id2` (one row per candidate pair).
    * Output: (id, component) for every node appearing in any pair,
    * where `component` is the smallest id in the node's component.
    *
    * Retention note: each round's eager localCheckpoint blocks live
    * until the session ends (Dataset.unpersist is a no-op on
    * checkpoint blocks — see ScaleCheck). Total retention is bounded
    * by rounds × |nodes-in-pairs| rows, small by construction since
    * pair lists are LSH-candidate-proportional; long-lived sessions
    * clearing aggressively should run this in a fresh session.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // no distinct() on edges: duplicate pairs only feed extra rows into
    // the min-aggregation (harmless), and the dedup would cost a
    // shuffle of the whole pair list up front
    val edges = pairs.select(col("id1").as("a"), col("id2").as("b"))
      .unionAll(pairs.select(col("id2").as("a"), col("id1").as("b")))
      .localCheckpoint(true) // reused every round — don't re-derive the pairs
    // round 0 fused into initialization: each node starts at
    // min(id, min neighbor) — one grouped min, no join, saves a round
    var labels = edges
      .groupBy(col("a").as("id"))
      .agg(min(least(col("a"), col("b"))).as("component"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // candidate label for each node: min over its neighbors' labels
      val viaNeighbors = edges
        .join(labels, edges("a") === labels("id"))
        .select(col("b").as("id"), col("component"))
      val next = labels.unionAll(viaNeighbors)
        .groupBy(col("id"))
        .agg(min(col("component")).as("component"))
        .localCheckpoint(true)
      // Pregel-style convergence read: one scalar, not a data collect
      val changed = next.join(labels.withColumnRenamed("component", "prev"), "id")
        .filter(col("component") =!= col("prev"))
        .count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels
  }

  /** Leakage-safe train/val/test split: assign every document to a
    * split by the HASH OF ITS NEAR-DUP COMPONENT, not its own id — so
    * two near-duplicate documents can never land on opposite sides of
    * a train/test boundary (the classic eval-leakage failure: the
    * test doc's near-copy was trained on). Documents in no pair are
    * their own singleton component and split independently.
    *
    * Composition: [[connectedComponents]] over the candidate-pair
    * list (LSH-proportional, not corpus-proportional), left-joined
    * back, then [[Sampling.hashSplit]] on the component id —
    * deterministic, per-component stable, engine-portable (md5).
    * Output: input columns + `component` + `split`.
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
                       cuts: Seq[(String, Int)], salt: String = ""): DataFrame = {
    val comp = connectedComponents(pairs)
    docs.join(comp, docs(idCol) === comp("id"), "left")
      .withColumn("component", coalesce(col("component"), docs(idCol)))
      .drop("id")
      .withColumn("split", Sampling.hashSplit(col("component"), cuts, salt))
  }

  /** Canonical corpus after near-dup clustering: for each component
    * keep the minimum-id member; documents in no pair pass through.
    * `pairs` must carry id1/id2 drawn from `id`'s value space.
    */
  def keepCanonical(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comp = connectedComponents(pairs)
    val losers = comp.filter(col("id") =!= col("component"))
      .select(col("id").as("__loser"))
    // no broadcast hint: on a duplicate-heavy corpus the loser set is
    // corpus-proportional — let AQE pick broadcast when it measures small
    docs.join(losers, docs(idCol) === col("__loser"), "left_anti")
  }
}
