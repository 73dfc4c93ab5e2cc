package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deletion / takedown propagation — the missing half of the
  * incremental-ingest family. `ExactDedup.incremental` /
  * `MinHashLsh.incrementalNearDup` / `DedupClusters.incrementalComponents`
  * fold ADDITIONS into persisted derived state without re-reading the
  * corpus; this object cascades REMOVALS (takedown and opt-out requests,
  * routine at 100 TB) through the same state tables, with the same
  * identity discipline: retract-then-query must equal
  * rebuild-from-scratch on the retained corpus.
  *
  * Reference scope note: the reference handles row-level deletes only in
  * its CDC ingest (`load_hhs.py` upserts); cascading deletion through
  * derived dedup/index state is the extension a curation pipeline needs
  * once it persists that state at all.
  *
  * The cascade covers every derived state this engine persists:
  *
  *   - corpus rows               → [[retainDocs]] (anti-join)
  *   - exact-dedup digest state  → [[digestCounts]] + [[retractDigests]]
  *     (counted state: a digest survives while ANY retained row still
  *     carries it — the DISTINCT digest table of `ExactDedup.digestTable`
  *     cannot answer that without a rescan, so the retractable form
  *     carries multiplicities; `toDigestTable` recovers the distinct
  *     form for `DocStream.admitNew` / `ExactDedup.incremental`)
  *   - MinHash signature state   → [[retractSignatures]] (anti-join on id
  *     — signatures are per-document, no cross-row dependency)
  *   - CC component labels       → [[retractComponents]] (the hard case:
  *     deleting a BRIDGE document splits its component, deleting the
  *     minimum-id member changes the component's canonical label —
  *     neither is derivable from the label table alone, so affected
  *     components re-label over the surviving candidate-PAIR list,
  *     which the caller retains alongside the labels; unaffected
  *     components pass through untouched)
  *   - IVF index state           → [[retractIvf]] (assignments anti-join;
  *     centroids are retained layout, watched by `ivfRebuildAdvice`)
  *   - lexical index state       → [[retractLexIndex]] (affected tokens
  *     located from the delete batch's own text; every other posting
  *     row passes through untouched; df recomputed, not decremented —
  *     replay-safe)
  *   - Bloom file-skipping index → [[retractFileBlooms]] (the bitsets
  *     are non-retractable, but the file partitioning makes the
  *     rebuild FILE-LOCAL: only files that lost a row rebuild, from
  *     their own retained rows; the rest pass through untouched)
  *
  * NON-RETRACTABLE state — the takedown runbook's rebuild column.
  * Three sketch families deliberately have NO retract path, because
  * bounded-state deletion is information-theoretically impossible for
  * them; each has a cheap rebuild source that never re-reads corpus
  * text:
  *
  *   - Bloom screens ([[Bloom]]): bits are shared across insertions —
  *     clearing a deleted item's bits would also delete every item
  *     that hashed onto them. Rebuild from the retracted DIGEST state
  *     ([[retractDigests]] output) — digest-proportional.
  *   - KMV distinct sketches ([[graft.functions.KmvSketchAgg]]): the
  *     k minimum hashes discard everything above the k-th minimum, so
  *     the sketch cannot know what should replace a deleted minimum.
  *     Rebuild by re-running the aggregate over the retained rows (one
  *     grouped pass; the values hashed are keys, not text).
  *   - Mergeable quantile sketches
  *     ([[graft.functions.QuantileSketchAgg]]): compaction merges
  *     neighbor ranks irreversibly — a deleted value's rank weight
  *     cannot be un-merged. Rebuild from retained rows, same shape.
  *
  *   Both sketch rebuilds are pinned retract-equivalent in ForgetSpec
  *   (rebuild-over-retained ≡ sketch of the corpus that never held
  *   the deleted rows).
  *
  * DERIVED-ONLY state (no retraction needed): [[LinkGraph]] rank
  * tables (PageRank/TrustRank) are pure functions of the edge list
  * with no per-document residue — a takedown drops the retracted
  * documents' edges and recomputes, edge-proportional with a fixed
  * iteration count, warm-startable from the pre-takedown scores via
  * [[LinkGraph.pageRankWarm]]. Nothing a deleted document contributed
  * survives the recompute, so there is no retract/rebuild distinction
  * to pin.
  *
  * Scale design: every path is join-shaped over STATE tables (digests,
  * signatures, labels, pairs — all corpus-row-proportional at worst,
  * LSH-candidate-proportional for pairs) plus the delete-id set, which
  * is broadcast-sized in any real takedown batch. No path re-reads or
  * re-shingles corpus text; [[retractComponents]] runs star contraction
  * only over the pairs of components that actually lost a member.
  */
object Forget {

  /** Distinct single-column delete frame under a reserved name. */
  private def deleteSet(deletedIds: DataFrame): DataFrame = {
    require(deletedIds.columns.length == 1,
      s"delete-id frame must have exactly one column, got [${deletedIds.columns.mkString(", ")}]")
    deletedIds.select(col(deletedIds.columns.head).as("__del")).distinct()
  }

  /** The retained corpus: rows of `docs` whose id is not in the delete
    * set. One anti-join; no broadcast hint — AQE broadcasts the delete
    * side when it measures small (it always is), and a pathological
    * mass-deletion still executes as a shuffle join.
    */
  def retainDocs(docs: DataFrame, idCol: String, deletedIds: DataFrame): DataFrame =
    docs.join(deleteSet(deletedIds), docs(idCol) === col("__del"), "left_anti")

  /** Retractable exact-dedup state: one row per distinct content digest
    * with its multiplicity — `(digest, n)`. [[ExactDedup.digestTable]]'s
    * distinct form plus the refcount that makes deletion decidable
    * without a corpus rescan: a digest leaves the state exactly when its
    * count reaches zero.
    */
  def digestCounts(df: DataFrame, content: Column): DataFrame =
    df.groupBy(ExactDedup.contentDigest(content).as("digest"))
      .agg(count(lit(1)).as("n"))

  /** Cascade a deletion through counted digest state: subtract the
    * deleted rows' digest multiplicities, drop digests whose count hits
    * zero. Identity (gate q96):
    *
    *   retractDigests(digestCounts(corpus), deletedRows)
    *     ≡ digestCounts(corpus ∖ deletedRows)
    *
    * `deletedDocs` must be the deleted ROWS (with their content column)
    * — the digest state stores no ids, so the content is what locates
    * the rows' digests. A takedown pipeline has those rows by
    * construction (they are what it is deleting). Digests in the delete
    * batch but absent from the state are ignored — so replaying a
    * takedown whose digests already LEFT the state is a no-op. Note
    * the contract is apply-each-batch-ONCE, like any counted ledger:
    * replaying a batch while retained copies of the same content still
    * hold the digest's count above zero would subtract again (the
    * state carries counts, not row identities, so it cannot tell a
    * replay from a second takedown of another copy).
    *
    * Shape: one aggregation over the (small) delete batch, one
    * digest-keyed left join against the state — digests shuffle, text
    * never does.
    */
  def retractDigests(state: DataFrame, deletedDocs: DataFrame,
                     content: Column): DataFrame = {
    val delCounts = digestCounts(deletedDocs, content)
      .select(col("digest"), col("n").as("__dn"))
    state.join(delCounts, Seq("digest"), "left")
      .select(col("digest"), (col("n") - coalesce(col("__dn"), lit(0L))).as("n"))
      .filter(col("n") > 0)
  }

  /** The distinct digest-table view of counted state — what
    * [[ExactDedup.incremental]] and `DocStream.admitNew` consume.
    */
  def toDigestTable(state: DataFrame): DataFrame =
    state.select(col("digest"))

  /** Cascade a deletion through per-document signature state
    * ([[MinHashLsh.portableSignatures]] schema `(id, m0..)` — or any
    * state keyed one-row-per-document by `idCol`): drop the deleted
    * rows. Signatures carry no cross-row dependency, so the anti-join
    * IS the full cascade; `incrementalNearDup` against the retracted
    * state can never again surface a deleted document.
    */
  def retractSignatures(sigState: DataFrame, idCol: String,
                        deletedIds: DataFrame): DataFrame =
    sigState.join(deleteSet(deletedIds), sigState(idCol) === col("__del"), "left_anti")

  /** Cascade a deletion through stored component labels. The label
    * table ([[DedupClusters.connectedComponents]] output `(id,
    * component)`) is a star subgraph rooted at each component's
    * minimum id — deleting a member invalidates it two ways the table
    * itself cannot repair:
    *
    *   - the deleted doc was the ROOT: survivors need the new minimum
    *     as their canonical label;
    *   - the deleted doc was a BRIDGE: the component falls apart into
    *     pieces only the original pair list can distinguish (the star
    *     edges all run through the root, erasing which members were
    *     connected via whom).
    *
    * So retraction re-labels AFFECTED components (those that lost at
    * least one member) over the surviving pair list, and passes every
    * untouched component through as-is. Identity (gate q95): equal to
    * `connectedComponents` over the pairs with both endpoints retained,
    * with retained pair-nodes that lost all their pairs surviving as
    * singletons (component = own id).
    *
    * @param prevLabels (id, component) — stored labels
    * @param pairs      (id1, id2) — the candidate-pair list the labels
    *                   were built from (LSH-proportional; the state a
    *                   near-dup pipeline already persists to support
    *                   incremental folds)
    * @param deletedIds one-column delete-id frame
    *
    * Scale: affected components are located with two semi-joins against
    * the (broadcast-sized) delete set; star contraction runs ONLY over
    * pairs of affected components — a takedown batch touching c
    * components costs O(pairs within those c components), not
    * O(|pairs|), and the untouched-label passthrough is join-free after
    * the one anti-join on component id.
    */
  def retractComponents(prevLabels: DataFrame, pairs: DataFrame,
                        deletedIds: DataFrame): DataFrame = {
    val del = deleteSet(deletedIds)
    // components that lost >= 1 member
    val affected = prevLabels
      .join(del, prevLabels("id") === col("__del"), "left_semi")
      .select(col("component").as("__ac")).distinct()
    val untouched = prevLabels
      .join(affected, prevLabels("component") === col("__ac"), "left_anti")
    // surviving members of affected components — every one must appear
    // in the output (as a singleton if its last pair died with the
    // deleted doc), hence the self-pair union below
    val survivors = prevLabels
      .join(affected, prevLabels("component") === col("__ac"), "left_semi")
      .join(del, prevLabels("id") === col("__del"), "left_anti")
      .select(col("id"))
    // pairs with both endpoints alive, restricted to affected
    // components (pairs never cross components, so one endpoint's
    // membership decides)
    val livePairs = pairs
      .join(del, pairs("id1") === col("__del"), "left_anti")
      .join(del, pairs("id2") === col("__del"), "left_anti")
      .join(survivors.select(col("id").as("__s")), col("id1") === col("__s"), "left_semi")
    val relabeled = DedupClusters.connectedComponents(
      livePairs.select(col("id1"), col("id2"))
        .unionAll(survivors.select(col("id").as("id1"), col("id").as("id2"))))
    untouched.unionByName(relabeled)
  }

  /** Cascade a deletion through a stored packed-sequence layout
    * ([[Packing.packByBudget]] output persisted as the training-batch
    * manifest): removing a document shifts positions, prefix sums, and
    * bin boundaries for every document BEHIND it in its md5 bucket's
    * order — but ONLY within that bucket (the layout is
    * bucket-partitioned by construction, 256 independent orders). So
    * retraction repacks exactly the buckets that lost a document and
    * passes the other ~255/256 of the manifest through untouched.
    * Identity (gate q98): ≡ packByBudget over the retained corpus with
    * the same budget/salt, bit for bit.
    *
    * @param stored     persisted packByBudget output
    *                   (doc_id, bucket, pack_pos, cum_tokens, bin_id)
    * @param docs       the current corpus (token counts re-derivable;
    *                   only affected-bucket rows are touched)
    * @param idCol      document id column in `docs`
    * @param tokCol     token-count column in `docs`
    * @param budget     the SAME budget the stored layout used
    * @param salt       the SAME salt the stored layout used
    */
  def retractPacking(stored: DataFrame, docs: DataFrame, idCol: String,
                     tokCol: String, deletedIds: DataFrame,
                     budget: Long, salt: String = ""): DataFrame = {
    val del = deleteSet(deletedIds)
    val affected = stored.join(del, stored("doc_id") === col("__del"), "left_semi")
      .select(col("bucket")).distinct()
    val untouched = stored.join(affected, Seq("bucket"), "left_anti")
    // retained docs of affected buckets only. The affected-doc set
    // comes from STORED (which already maps doc_id → bucket) — no
    // per-row bucket hash over the full corpus; only the candidate
    // rows (≈ |affected buckets| / 256 of the corpus) re-enter
    // packByBudget, which recomputes their identical bucket
    // assignment, and bucket independence makes the partial repack
    // equal the same buckets of a full repack.
    val affectedIds = stored
      .join(affected, Seq("bucket"), "left_semi")
      .join(del, col("doc_id") === col("__del"), "left_anti")
      .select(col("doc_id").as("__aid"))
    val candidates = docs.join(affectedIds, docs(idCol) === col("__aid"), "left_semi")
    val repacked = Packing.packByBudget(candidates, col(idCol), col(tokCol),
      budget, salt)
    // the using-join floats "bucket" to the front of untouched — put
    // the packByBudget column order back (the manifest contract)
    untouched.unionByName(repacked)
      .select("doc_id", "bucket", "pack_pos", "cum_tokens", "bin_id")
  }

  /** Cascade a deletion through IVF index state: deleted documents
    * leave the assignment table; the centroid layout is RETAINED (it is
    * the probe contract — queries routed before and after the takedown
    * see the same cells). A mass deletion that unbalances or empties
    * cells surfaces through [[EmbeddingSearch.ivfRebuildAdvice]] exactly
    * like ingest drift does, and [[EmbeddingSearch.rebuildIvfIndex]] is
    * the repair.
    */
  def retractIvf(index: EmbeddingSearch.IvfIndex,
                 deletedIds: DataFrame): EmbeddingSearch.IvfIndex =
    EmbeddingSearch.IvfIndex(index.centroids,
      index.assignments.join(deleteSet(deletedIds),
        index.assignments("id") === col("__del"), "left_anti"))

  /** Cascade a deletion through PQ-quantized IVF serving state
    * ([[VectorQuant.PqIvfIndex]]): deleted documents leave the
    * (id, cell, codes) assignment table — one anti-join, the
    * [[retractIvf]] shape. The centroid layout is retained (the probe
    * contract) and so is the CODEBOOK: like centroids it is bounded
    * aggregate state — m·ksub mean sub-vectors, not per-document
    * rows — so deletion semantics mirror the centroid contract, not
    * the digest-ledger one. A deletion heavy enough to drift the
    * distribution the codebook was trained on degrades RECALL, not
    * correctness (ADC distances stay well-defined; the rerank variant
    * re-scores against retained full vectors), surfaces through the
    * same [[EmbeddingSearch.ivfRebuildAdvice]] telemetry, and the
    * repair is retraining on the retained corpus
    * ([[VectorQuant.pqTrain]] + [[VectorQuant.quantizeIndex]]).
    * Retract ≡ filtered-rebuild for probes is pinned exactly at the
    * degenerate codebook by the q105 oracle gate, and for lossy
    * codebooks by ForgetSpec.
    */
  def retractPq(index: VectorQuant.PqIvfIndex,
                deletedIds: DataFrame): VectorQuant.PqIvfIndex =
    VectorQuant.PqIvfIndex(index.centroids,
      index.assignments.join(deleteSet(deletedIds),
        index.assignments("id") === col("__del"), "left_anti"),
      index.book)

  /** [[retractPq]] for the RESIDUAL-quantized index
    * ([[VectorQuant.RqIvfIndex]]): the (id, cell, codes1, codes2)
    * assignment table loses the deleted rows in one anti-join; both
    * codebooks are bounded aggregate state and stay, under exactly
    * the [[retractPq]] codebook contract (drift degrades recall, not
    * correctness; repair is [[VectorQuant.rqTrain]] on the retained
    * corpus). Retract ≡ filtered-rebuild for probes is pinned at the
    * composed degenerate point by the q190 oracle gate.
    */
  def retractRq(index: VectorQuant.RqIvfIndex,
                deletedIds: DataFrame): VectorQuant.RqIvfIndex =
    VectorQuant.RqIvfIndex(index.centroids,
      index.assignments.join(deleteSet(deletedIds),
        index.assignments("id") === col("__del"), "left_anti"),
      index.books)

  /** Cascade a deletion through a materialized positional index
    * ([[Bm25.termPositions]] schema `(doc_id, token, pos)`): positions
    * are per-document rows with no cross-row dependency, so the
    * anti-join IS the full cascade — the [[retractSignatures]] shape.
    * A [[Bm25.phraseProbe]] against the retracted state can never
    * again match a deleted document.
    */
  def retractPositions(positions: DataFrame,
                       deletedIds: DataFrame): DataFrame =
    positions.join(deleteSet(deletedIds),
      positions("doc_id") === col("__del"), "left_anti")

  /** Cascade a deletion through per-group transfer manifests
    * ([[Sharding.manifest]] schema `(group, n_rows, total_weight,
    * digest)`): every manifest component is an EXACT sum — row
    * counts, DECIMAL weight totals, DECIMAL md5-Horner digest sums —
    * and sums subtract, so the takedown needs only the deleted ROWS
    * (id-bearing group + content + weight), never a re-read of the
    * retained corpus. Groups emptied by the deletion drop out.
    * Identity (the q162 gate): retract ≡ rebuild-from-survivors,
    * digest included, bit-for-bit.
    */
  def retractManifest(manifest: DataFrame, deletedRows: DataFrame,
                      group: Column, content: Column,
                      weight: Column): DataFrame = {
    val zero = lit(0).cast("decimal(38,0)")
    val del = Sharding.manifest(deletedRows, group, content, weight)
      .select(col("group"), col("n_rows").as("__dn"),
        col("total_weight").as("__dw"), col("digest").as("__dd"))
    manifest.join(del, Seq("group"), "left")
      .select(col("group"),
        (col("n_rows") - coalesce(col("__dn"), lit(0L))).as("n_rows"),
        (col("total_weight") - coalesce(col("__dw"), zero)).as("total_weight"),
        (col("digest") - coalesce(col("__dd"), zero)).as("digest"))
      .filter(col("n_rows") > 0)
  }

  /** Cascade a deletion through the materialized lexical index
    * ([[Bm25.LexIndex]]). Unlike the sketches, postings state is
    * EXACT, so the takedown runbook column here is retract, not
    * rebuild. `deletedDocs` must be the deleted ROWS with their id
    * AND text — the [[retractDigests]] contract: a takedown pipeline
    * has the rows it is deleting, and their text is what locates the
    * affected tokens WITHOUT scanning the postings state.
    *
    * Shape, per the [[retractComponents]] passthrough discipline:
    * the delete batch tokenizes (small), its token set is the
    * affected-token list; every other token's postings row passes
    * through UNTOUCHED via one anti-join on token — its array bytes
    * are never read. Affected tokens (at most delete-batch-vocabulary
    * many) explode, anti-join the delete ids, and regroup under the
    * same `sort_array(collect_list)` as [[Bm25.buildIndex]]; df is
    * RECOMPUTED as the filtered posting count (not decremented), so
    * replaying a takedown batch is a no-op — retraction is
    * row-identity-based, unlike the counted digest ledger. Tokens
    * whose last posting leaves drop from the state. The row ledger
    * anti-joins, and the two scalars subtract the ledger rows the
    * delete set actually hits (replay-safe for the same reason).
    *
    * Identity (gate q145 shares q142's oracle verbatim; full state
    * equality incl. scalars in ForgetSpec):
    *
    *   retractLexIndex(buildIndex(corpus), deletedRows)
    *     ≡ buildIndex(corpus ∖ deletedRows)
    */
  def retractLexIndex(index: Bm25.LexIndex, deletedDocs: DataFrame,
                      id: Column, text: Column): Bm25.LexIndex = {
    val delTf = Keywords.termFrequency(deletedDocs, id, text)
    val affectedTokens = delTf.select(col("token")).distinct()
    val delIds = deleteSet(deletedDocs.select(id.as("__id")))

    val untouched = index.postings
      .join(affectedTokens, Seq("token"), "left_anti")
    val refiltered = index.postings
      .join(affectedTokens, Seq("token"), "left_semi")
      .select(col("token"), explode(col("postings")).as("__p"))
      .join(delIds, col("__p.doc_id") === col("__del"), "left_anti")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"),
        sort_array(collect_list(col("__p"))).as("postings"))

    val hit = index.docLens
      .join(delIds, index.docLens("doc_id") === col("__del"), "left_semi")
      .agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("t"))
      .collect()(0)
    Bm25.LexIndex(
      untouched.unionByName(refiltered),
      index.docLens.join(delIds,
        index.docLens("doc_id") === col("__del"), "left_anti"),
      index.nDocs - hit.getLong(0), index.totalTokens - hit.getLong(1))
  }

  /** Cascade a deletion through the per-file Bloom skipping index
    * ([[Bloom.fileBlooms]]). A Bloom bitset itself is non-retractable
    * (shared bits — see the runbook above), but the FILE partitioning
    * makes the rebuild file-local: only files that actually lost a
    * row rebuild, from their OWN retained rows (at real scale a
    * partition-pruned scan of just those files); every other file's
    * bloom row passes through untouched via one anti-join — the
    * [[retractComponents]] passthrough discipline applied to the
    * rebuild column of the runbook. Files whose every row was deleted
    * drop from the index (fileBlooms emits no row for an empty file).
    *
    * `retainedRows` is the post-[[retainDocs]] corpus; the semi-join
    * restricts its scan to affected files before any hashing.
    * Identity (pinned in BloomSpec, serving face gated by q172):
    *
    *   retractFileBlooms(fileBlooms(corpus), retained, deleted)
    *     ≡ fileBlooms(retained)
    */
  def retractFileBlooms(blooms: DataFrame, retainedRows: DataFrame,
                        deletedRows: DataFrame, file: Column, key: Column,
                        k: Int, words: Int): DataFrame = {
    val affected = deletedRows.select(file.as("file")).distinct()
    val untouched = blooms.join(affected, Seq("file"), "left_anti")
    val rebuilt = Bloom.fileBlooms(
      retainedRows.withColumn("__f", file)
        .join(affected, col("__f") === affected("file"), "left_semi")
        .drop("__f"),
      file, key, k, words)
    untouched.unionByName(rebuilt)
  }
}
