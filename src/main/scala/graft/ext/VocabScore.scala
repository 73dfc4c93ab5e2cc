package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vocabulary-coverage quality scoring: for each document, the
  * fraction of its tokens that fall inside the corpus-wide top-N
  * vocabulary — the cheap LM-free stand-in for perplexity filtering
  * (gibberish, lists of codes, non-prose junk score low; ordinary
  * prose scores high). A full n-gram-LM logprob score would add ln()
  * arithmetic whose last-ulp behavior differs cross-engine (the
  * Keywords/tf-idf lesson); coverage is exact integer counting + one
  * IEEE division, so the operator is oracle-checkable end to end.
  *
  * Scale shape: everything runs over the (doc, token, count) frame —
  * one explode + one (id, token)-keyed aggregate (map-side partials
  * absorb within-doc repeats). Vocab selection is a token-keyed
  * re-aggregate of THAT frame (far smaller than raw tokens) +
  * TakeOrderedAndProject with a deterministic count-desc/token-asc
  * boundary; coverage is a broadcast-vocab probe + per-doc sum.
  *
  * Honest cost note: [[coverage]] derives vocab and coverage from the
  * same unmaterialized frame, so the tokenize+count subtree executes
  * TWICE (Spark recomputes shared lazy subtrees). At gate scale
  * that's fine; at ingest scale compute the vocabulary ONCE with
  * [[topVocabulary]], persist it (it's ≤ topN rows), and score with
  * [[coverageWithVocab]] — single corpus pass, and the same stored
  * vocabulary then scores every future batch consistently (scoring
  * drift across batches is usually a bug, not a feature).
  *
  * Documents with zero tokens (empty/whitespace text) yield no row —
  * filter them beforehand or treat absence as minimum quality.
  */
object VocabScore {

  /** (doc, token, count) — one explode + one keyed aggregate. */
  private def docTokenCounts(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("__id"),
        explode(split(trim(lower(text)), "\\s+")).as("__tok"))
      .filter(col("__tok") =!= "")
      .groupBy(col("__id"), col("__tok"))
      .agg(count(lit(1)).as("__c"))

  /** The corpus top-N vocabulary as a one-column frame (`__v`), ranked
    * by total count descending with the lexicographic tie-break —
    * deterministic at the N boundary. ≤ topN rows: persist and reuse.
    */
  def topVocabulary(docs: DataFrame, id: Column, text: Column, topN: Int): DataFrame = {
    require(topN >= 1, s"topN >= 1 required, got $topN")
    docTokenCounts(docs, id, text)
      .groupBy(col("__tok")).agg(sum(col("__c")).as("__t"))
      .orderBy(col("__t").desc, col("__tok").asc)
      .limit(topN)
      .select(col("__tok").as("__v"))
  }

  /** Coverage against a PRECOMPUTED vocabulary (from [[topVocabulary]],
    * usually read back from parquet) — single corpus pass.
    */
  def coverageWithVocab(docs: DataFrame, id: Column, text: Column,
                        vocab: DataFrame): DataFrame =
    docTokenCounts(docs, id, text)
      .join(broadcast(vocab), col("__tok") === col("__v"), "left")
      .groupBy(col("__id"))
      .agg(sum(col("__c")).as("n_tokens"),
        sum(when(col("__v").isNotNull, col("__c")).otherwise(0L)).as("n_in_vocab"))
      .select(col("__id").as("id"), col("n_tokens"), col("n_in_vocab"),
        (col("n_in_vocab").cast("double") / col("n_tokens").cast("double"))
          .as("coverage"))

  /** Self-contained form: vocabulary from the same corpus being scored
    * (two tokenize passes — see the cost note above).
    */
  def coverage(docs: DataFrame, id: Column, text: Column, topN: Int = 1000): DataFrame =
    coverageWithVocab(docs, id, text, topVocabulary(docs, id, text, topN))
}
