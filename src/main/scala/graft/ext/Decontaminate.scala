package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.NGrams

/** Benchmark decontamination: remove (or flag) training documents that
  * share any word n-gram with an evaluation corpus.
  *
  * This is the standard pre-training hygiene pass (cf. GPT-3 appendix C
  * / PaLM §6-style 13-gram overlap): a training document is
  * "contaminated" if any of its word n-grams also occurs in any eval
  * document. No analogue exists in the reference (its dedup family —
  * `load_hhs.py:96-137` — is key-equality within one corpus); this is
  * the cross-corpus membership variant a training-data pipeline needs.
  *
  * Scale design (100 TB corpus, MB-scale eval suite):
  *   - The eval side is tiny by construction (benchmarks are thousands
  *     of documents, not billions). Its DISTINCT gram keys are
  *     broadcast, so the training corpus is scanned once with NO
  *     shuffle of training grams — the contamination check is a
  *     map-side broadcast hash semi-join.
  *   - Gram keys travel as 64-bit md5 prefixes (16 hex chars), not
  *     gram text: the broadcast table and the hash probes carry 16
  *     bytes per gram regardless of n. md5 (not xxhash64) keeps the
  *     key engine-portable, so the whole operator is oracle-checkable.
  *   - Shingling runs through the codegen'd [[NGrams]] expression
  *     (distinct n-grams per document in one pass), not interpreted
  *     higher-order functions.
  */
object Decontaminate {

  /** 64-bit-equivalent portable gram key: first 16 hex chars of md5. */
  private def gramKey(g: Column): Column = substring(md5(g.cast("binary")), 1, 16)

  /** Distinct broadcast-ready gram keys of the eval corpus. */
  private def evalGramKeys(evalDocs: DataFrame, text: Column, n: Int): DataFrame =
    evalDocs
      .select(explode(NGrams.wordNGrams(text, n)).as("__g"))
      .select(gramKey(col("__g")).as("__gk"))
      .distinct()

  /** One row per contaminated training document:
    * (doc_id, shared_grams) where shared_grams counts the DISTINCT
    * word n-grams the document shares with the eval corpus.
    */
  def contamination(train: DataFrame, evalDocs: DataFrame,
                    id: Column, text: Column, n: Int): DataFrame = {
    // NGrams.wordNGrams is distinct-per-document, so after the
    // broadcast semi-join a plain count() is the distinct shared count
    train
      .select(id.as("doc_id"), explode(NGrams.wordNGrams(text, n)).as("__g"))
      .select(col("doc_id"), gramKey(col("__g")).as("__gk"))
      .join(broadcast(evalGramKeys(evalDocs, text, n)), "__gk")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("shared_grams"))
  }

  /** The decontaminated training corpus: every row of `train` whose
    * document shares no word n-gram with the eval corpus. Broadcast
    * anti-join — single scan of the training side.
    */
  def decontaminate(train: DataFrame, evalDocs: DataFrame,
                    id: Column, text: Column, n: Int): DataFrame = {
    val contaminated = contamination(train, evalDocs, id, text, n)
      .select(col("doc_id").as("__cid"))
    // broadcast assumes realistic contamination rates (well under 1%
    // of a web corpus overlaps a benchmark suite at n >= 8); for a
    // pathological corpus drop the hint and let AQE decide
    train.join(broadcast(contaminated), id === col("__cid"), "left_anti")
  }
}
