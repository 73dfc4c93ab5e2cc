package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repeated-SPAN removal — exact substring deduplication in the style
  * of "Deduplicating Training Data Makes Language Models Better"
  * (Lee et al., 2021): delete from every document any span of `n` or
  * more consecutive tokens that occurs at least `minCount` times
  * across the whole corpus (including repeats inside one document).
  *
  * This is the REWRITING complement of [[Boilerplate]] (which only
  * MINES frequent grams) and of document-level dedup ([[ExactDedup]] /
  * [[MinHashLsh]], which drop whole rows): license footers, navigation
  * chrome and copy-pasted paragraphs are cut out of otherwise-unique
  * documents, which document-level dedup can never do. Spans longer
  * than `n` are handled for free: every length-`n` window inside a
  * longer duplicated span is itself duplicated, so the union of
  * flagged windows covers the full span.
  *
  * Scale shape (the 100 TB question):
  *   - gram occurrences explode to one row per token position, but the
  *     shuffle key is a fixed-width md5 of the gram — gram TEXT never
  *     shuffles, so shuffle bytes are O(corpus tokens · 32 B)
  *     regardless of `n`.
  *   - ONE grouped count on the gram key; partial aggregation absorbs
  *     the hottest (= most duplicated) grams map-side, so boilerplate
  *     keys do not skew the shuffle.
  *   - flagged occurrences shuffle once more on doc_id (sorted start
  *     list per document — bounded by the document's own token count).
  *   - span masking is a per-row array expression — the native
  *     codegen'd [[graft.functions.SpanMask]] two-pointer sweep,
  *     O(len + |starts|) per row with NO shuffle. Even a document
  *     that is pure boilerplate (every position flagged) costs one
  *     linear pass, so corpus inflation stress stays
  *     input-proportional (ScaleCheck, SURVEY §8).
  *
  * Determinism: md5 keys and integer arithmetic only — bit-identical
  * on any engine, partitioning-invariant (oracle-checkable end to
  * end, q68).
  */
object SpanDedup {

  /** One row per input document:
    * (doc_id, clean_text, n_kept, n_removed) — `clean_text` is the
    * document with every corpus-duplicated n-token span deleted
    * (surviving tokens re-joined with single spaces; whitespace
    * normalization is the documented price of token-level rewriting),
    * `n_kept`/`n_removed` count surviving/deleted tokens.
    */
  def cleanRepeatedSpans(df: DataFrame, id: Column, text: Column,
                         n: Int, minCount: Long = 2L): DataFrame = {
    require(n >= 1 && minCount >= 2, s"need n >= 1, minCount >= 2; got n=$n minCount=$minCount")
    // spread before the per-position gram explode + md5 (runs TWICE —
    // the count branch and the starts branch both plan the occ
    // subtree): a single-row-group local scan serializes both passes
    // on one core; no-op on multi-split inputs. Counts and sorted
    // start lists are order-invariant.
    val dfS = org.apache.spark.sql.GraftBridge.spreadForMapWork(df.toDF(), id)
    val base = dfS.select(id.as("doc_id"), split(trim(text), "\\s+").as("__t"))
      .withColumn("__len", size(col("__t")))

    // one row per n-gram occurrence; key = md5(gram), never gram text.
    // sequence(1, len-n+1) only under len >= n — Spark's sequence
    // DESCENDS when stop < start, so the guard is load-bearing.
    val occ = base
      .filter(col("__len") >= n)
      .select(col("doc_id"),
        explode(sequence(lit(1), col("__len") - lit(n - 1))).as("__s"),
        col("__t"))
      .select(col("doc_id"), col("__s"),
        md5(concat_ws(" ", slice(col("__t"), col("__s"), lit(n)))
          .cast("binary")).as("__g"))

    // corpus-wide occurrence count (multiplicity, not document
    // frequency: a doc repeating its own span twice is also cut)
    val hot = occ.groupBy(col("__g"))
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minCount)
      .select(col("__g"))

    val starts = occ.join(hot, "__g")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("__s"))).as("__starts"))

    val st = coalesce(col("__starts"), array().cast("array<int>"))
    // keep token at 1-based position p iff no flagged window covers it
    val kept = graft.functions.SpanMask(col("__t"), st, n)
    base.join(starts, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        concat_ws(" ", kept).as("clean_text"),
        size(kept).cast("long").as("n_kept"),
        (col("__len") - size(kept)).cast("long").as("n_removed"))
  }
}
