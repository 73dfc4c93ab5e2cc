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
                  checkpoints: Seq[Long]): DataFrame = {
    require(checkpoints.nonEmpty, "need at least one checkpoint")
    require(checkpoints.distinct.size == checkpoints.size,
      "checkpoints must be distinct")
    val toks = df.select(id.as("__doc"),
        explode(split(lower(trim(text)), "\\s+")).as("__w"))
      .filter(length(col("__w")) > 0)
      .select(col("__doc"), md5(col("__w")).as("__k"))

    // d rows: when did each distinct token first appear?
    val firstSeen = toks.groupBy("__k").agg(min("__doc").as("__first"))
    // one row per doc: its token count (docs with zero tokens still
    // count as docs via the base frame below)
    val perDoc = toks.groupBy("__doc").agg(count(lit(1)).as("__n"))
    val docs = df.select(id.as("__doc")).join(perDoc, Seq("__doc"), "left")
      .select(col("__doc"), coalesce(col("__n"), lit(0L)).as("__n"))

    val sorted = checkpoints.sorted
    val vCols = sorted.map(c =>
      sum(when(col("__first") <= c, 1L).otherwise(0L)).as(s"__v_$c"))
    val vocabAgg = firstSeen.agg(vCols.head, vCols.tail: _*)
    val dCols = sorted.flatMap(c => Seq(
      sum(when(col("__doc") <= c, 1L).otherwise(0L)).as(s"__d_$c"),
      sum(when(col("__doc") <= c, col("__n")).otherwise(0L)).as(s"__t_$c")))
    val docAgg = docs.agg(dCols.head, dCols.tail: _*)

    // both aggregates are single rows; the cross join is 1×1
    val joined = docAgg.crossJoin(vocabAgg)
    val rows = sorted.map { c =>
      struct(lit(c).as("checkpoint"), col(s"__d_$c").as("n_docs"),
        col(s"__t_$c").as("n_tokens"), col(s"__v_$c").as("n_vocab"))
    }
    joined.select(explode(array(rows: _*)).as("r"))
      .select(col("r.checkpoint"), col("r.n_docs"),
        col("r.n_tokens"), col("r.n_vocab"))
  }
}
