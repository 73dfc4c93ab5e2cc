package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-growth statistics — the measurement face behind "is this
  * crawl still adding new language?": the vocabulary-growth curve
  * (Heaps' law — V(N) ≈ K·N^β, β ≈ 0.5 for natural text) sampled at
  * doc-id checkpoints. A slice whose curve has gone flat is
  * re-crawling what the corpus already holds; a curve that grows
  * LINEARLY is a gibberish/identifier firehose (every token fresh) —
  * both ends are actionable admission signals, and the statistic
  * needs no model, no float, no sampling.
  *
  * Scale shape (the 100 TB question): the naive face — a running
  * distinct-count over an ordered scan — is inherently sequential.
  * This one is not: "token is IN the vocabulary at checkpoint c" ≡
  * "min(doc_id holding it) ≤ c", so ONE grouped min over the token
  * table (md5-digest keys — token TEXT never shuffles; map-side
  * partial min absorbs hot tokens) turns every checkpoint into a
  * conditional COUNT over the d first-occurrence rows, and the
  * cumulative token/doc totals are conditional sums over per-doc
  * counts (one row per doc). All k checkpoints land in ONE
  * aggregation pass each — no per-checkpoint scan, no ordered
  * anything; k is a handful of rows of output.
  *
  * Exactness: integer counts only; checkpoints are doc_id thresholds
  * (deterministic under any partitioning). Gate q206 hash-matches
  * the whole curve cross-engine; the oracle keys raw token strings
  * where Spark keys md5 digests — count equality IS the
  * digest-discipline pin (the q20/q182 rule).
  */
object CorpusStats {

  /** The growth curve: one row per checkpoint c —
    * (checkpoint, n_docs, n_tokens, n_vocab) over the documents with
    * doc_id ≤ c. Tokens are lowercased whitespace words (the corpus
    * tokenizer convention shared with [[UnigramLm]]/[[TokenizerEval]]).
    */
  def vocabGrowth(df: DataFrame, id: Column, text: Column,
                  checkpoints: Seq[Long]): DataFrame =
    growthFromLedger(vocabLedger(df, id, text), checkpoints)

  /** Per-GROUP growth curves — the multilingual question the global
    * curve cannot answer ("is the Tamil slice saturating while English
    * still grows?"): one row per (group, checkpoint), vocabulary
    * counted within the group (a token alive in two languages counts
    * in each — per-group vocabulary is the semantics a per-language
    * admission decision needs). Same shape as [[vocabGrowth]] with the
    * group key threaded through: the first-occurrence min groups by
    * (group, digest), the conditional checkpoint counts group by
    * group — still no ordered scan, and the final join is
    * group-cardinality.
    */
  def vocabGrowthByGroup(df: DataFrame, id: Column, text: Column,
                         group: Column, checkpoints: Seq[Long]): DataFrame = {
    require(checkpoints.nonEmpty, "need at least one checkpoint")
    require(checkpoints.distinct.size == checkpoints.size,
      "checkpoints must be distinct")
    val toks = df.select(group.as("grp"), id.as("__doc"),
        explode(split(lower(trim(text)), "\\s+")).as("__w"))
      .filter(length(col("__w")) > 0)
      .select(col("grp"), col("__doc"), md5(col("__w")).as("__k"))
    val firstSeen = toks.groupBy("grp", "__k").agg(min("__doc").as("__first"))
    val perDoc = toks.groupBy("grp", "__doc").agg(count(lit(1)).as("__n"))
    val docs = df.select(group.as("grp"), id.as("__doc"))
      .join(perDoc, Seq("grp", "__doc"), "left")
      .select(col("grp"), col("__doc"), coalesce(col("__n"), lit(0L)).as("__n"))
    val sorted = checkpoints.sorted
    val vCols = sorted.map(c =>
      sum(when(col("__first") <= c, 1L).otherwise(0L)).as(s"__v_$c"))
    val vocabAgg = firstSeen.groupBy("grp").agg(vCols.head, vCols.tail: _*)
    val dCols = sorted.flatMap(c => Seq(
      sum(when(col("__doc") <= c, 1L).otherwise(0L)).as(s"__d_$c"),
      sum(when(col("__doc") <= c, col("__n")).otherwise(0L)).as(s"__t_$c")))
    val docAgg = docs.groupBy("grp").agg(dCols.head, dCols.tail: _*)
    val rows = sorted.map { c =>
      struct(lit(c).as("checkpoint"), col(s"__d_$c").as("n_docs"),
        col(s"__t_$c").as("n_tokens"),
        coalesce(col(s"__v_$c"), lit(0L)).as("n_vocab"))
    }
    docAgg.join(vocabAgg, Seq("grp"), "left")
      .select(col("grp"), explode(array(rows: _*)).as("r"))
      .select(col("grp"), col("r.checkpoint"), col("r.n_docs"),
        col("r.n_tokens"), col("r.n_vocab"))
  }

  /** The growth curve's maintainable state — the corpus-scale inputs
    * of [[vocabGrowth]] kept as two ledger tables so a new crawl batch
    * folds in O(delta), never a corpus re-read:
    *  - `tokens` (k, first_doc): md5 token digest → min doc_id holding
    *    it (merge = grouped MIN — associative, order-invariant);
    *  - `docs` (doc, n): per-document token count.
    * Retraction is deliberately NOT offered: first-occurrence is not
    * maintainable under deletion from (k, min) state — removing the
    * first holder needs the full (k, doc) pair set to find the next
    * one. The admission-only contract is the honest one (the curve is
    * a crawl-progress statistic; crawls append).
    */
  final case class VocabLedger(tokens: DataFrame, docs: DataFrame)

  def vocabLedger(df: DataFrame, id: Column, text: Column): VocabLedger = {
    val toks = df.select(id.as("__doc"),
        explode(split(lower(trim(text)), "\\s+")).as("__w"))
      .filter(length(col("__w")) > 0)
      .select(col("__doc"), md5(col("__w")).as("__k"))
    val tokens = toks.groupBy("__k").agg(min("__doc").as("__first"))
    val perDoc = toks.groupBy("__doc").agg(count(lit(1)).as("__n"))
    val docs = df.select(id.as("__doc")).join(perDoc, Seq("__doc"), "left")
      .select(col("__doc"), coalesce(col("__n"), lit(0L)).as("__n"))
    VocabLedger(tokens, docs)
  }

  /** Fold a new batch into the ledger. Desync raise (the counted-
    * ledger discipline): a batch re-admitting an ALREADY-LEDGERED
    * doc_id would double-count tokens silently — the overlap raises
    * instead. The guard is FOLDED INTO the docs-merge aggregation
    * (VERDICT r13 item 8): the merged per-doc table groups by doc_id
    * anyway, so a doc_id seen twice raises inside that one
    * aggregation — admission schedules ZERO extra jobs (the old
    * semi-join `limit(1).count()` probe was one more action per batch
    * on the ingest path). The raise fires when the merged ledger is
    * first computed — before any reader can consume a double-counted
    * row, the same lazy discipline as [[UnigramLm.retractWordCounts]].
    */
  def admitVocab(state: VocabLedger, batch: DataFrame,
                 id: Column, text: Column): VocabLedger = {
    val delta = vocabLedger(batch, id, text)
    val mergedDocs = state.docs.unionByName(delta.docs)
      .groupBy("__doc")
      .agg(sum("__n").as("__sum"), count(lit(1)).as("__c"))
      .select(col("__doc"),
        when(col("__c") > 1L, raise_error(concat(
          lit("admitVocab: batch re-admits already-ledgered doc id "),
          col("__doc"), lit(" (desync)"))))
          .otherwise(col("__sum")).as("__n"))
    VocabLedger(
      state.tokens.unionByName(delta.tokens)
        .groupBy("__k").agg(min("__first").as("__first")),
      mergedDocs)
  }

  /** The curve from ledger state — must equal [[vocabGrowth]] on the
    * union of everything admitted (merge ≡ rebuild, gate q208).
    */
  def growthFromLedger(state: VocabLedger,
                       checkpoints: Seq[Long]): DataFrame = {
    require(checkpoints.nonEmpty, "need at least one checkpoint")
    require(checkpoints.distinct.size == checkpoints.size,
      "checkpoints must be distinct")
    val sorted = checkpoints.sorted
    val vCols = sorted.map(c =>
      sum(when(col("__first") <= c, 1L).otherwise(0L)).as(s"__v_$c"))
    val vocabAgg = state.tokens.agg(vCols.head, vCols.tail: _*)
    val dCols = sorted.flatMap(c => Seq(
      sum(when(col("__doc") <= c, 1L).otherwise(0L)).as(s"__d_$c"),
      sum(when(col("__doc") <= c, col("__n")).otherwise(0L)).as(s"__t_$c")))
    val docAgg = state.docs.agg(dCols.head, dCols.tail: _*)
    val rows = sorted.map { c =>
      struct(lit(c).as("checkpoint"), col(s"__d_$c").as("n_docs"),
        col(s"__t_$c").as("n_tokens"), col(s"__v_$c").as("n_vocab"))
    }
    docAgg.crossJoin(vocabAgg)
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.checkpoint"), col("r.n_docs"),
        col("r.n_tokens"), col("r.n_vocab"))
  }
}
