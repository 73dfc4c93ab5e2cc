package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{BpeUtil, ByteBpeUtil, MergeTable}

/** BPE vocabulary induction — learn the merge table FROM the corpus
  * (Sennrich et al. 2016 training), closing the loop with
  * [[graft.functions.Bpe]]: `learnMerges` produces a
  * [[graft.functions.MergeTable]] that the codegen'd
  * `Bpe.count(col, table)` / `Bpe.tokens(col, table)` expressions
  * apply distributed, no recompile.
  *
  * Scale shape: the CORPUS is touched exactly once — one pre-tokenize
  * + grouped count (partial agg absorbs Zipf head words map-side),
  * capped at the `maxWords` most frequent pre-tokens. Everything
  * after operates on that VOCABULARY-BOUNDED table (≤ maxWords rows,
  * like collecting k-means centroids or broadcasting a dimension):
  * the canonical training loop — count adjacent symbol pairs weighted
  * by word frequency, merge the argmax, repeat — runs over it on the
  * driver. A 100 TB corpus and a 1 GB corpus produce the same-sized
  * driver state; corpus scale only affects the one distributed count.
  * The frequency cap is also statistically sound: BPE merge decisions
  * are driven by the frequency HEAD, and rank-r merge counts decay
  * Zipf-fast — the tail words a cap drops cannot overturn an argmax.
  *
  * Determinism: word counts are exact; the argmax tie-break is
  * (count desc, pair lexicographic), so the learned table is a pure
  * function of the corpus — independent of partitioning, collection
  * order, and cluster layout.
  */
object BpeTrain {

  /** Learn `numMerges` merges from `text`. Stops early when no
    * adjacent pair occurs at least `minCount` times (nothing left to
    * compress). The returned table satisfies the composite-after-
    * creator invariant by construction (symbols are created strictly
    * in learned order), so rank-order exhaustive application — what
    * [[graft.functions.MergeTable.encodeWord]] runs — is exactly the
    * canonical min-rank encoder for it.
    */
  def learnMerges(df: DataFrame, text: Column, numMerges: Int,
                  maxWords: Int = 1 << 16, minCount: Long = 2L): MergeTable = {
    require(numMerges >= 0 && maxWords >= 1 && minCount >= 1)
    learnFromWordCounts(
      collectWordCounts(df, text, BpeUtil.PreTokenPattern, maxWords),
      numMerges, minCount)
  }

  /** Byte-level vocabulary induction ([[graft.functions.ByteBpe]]'s
    * trainer): Unicode pre-tokenizer, each pre-token mapped to its
    * UTF-8 byte-symbol string, then the IDENTICAL driver loop — the
    * 256-symbol base alphabet means the learned table is OOV-free on
    * any input and rebuilds multibyte codepoints before words
    * (ByteBpeSpec pins that the first merges learned from a Greek
    * corpus are exactly the planted codepoints' byte pairs). The
    * returned table operates in byte-symbol space: apply it via
    * [[graft.functions.ByteBpe.count]].
    */
  def learnMergesBytes(df: DataFrame, text: Column, numMerges: Int,
                       maxWords: Int = 1 << 16, minCount: Long = 2L): MergeTable = {
    require(numMerges >= 0 && maxWords >= 1 && minCount >= 1)
    learnFromWordCounts(
      collectWordCounts(df, text, ByteBpeUtil.PreTokenPattern, maxWords)
        .map { case (w, f) => (ByteBpeUtil.mapWord(w), f) },
      numMerges, minCount)
  }

  /** The single corpus-scale pass: distinct pre-token frequencies,
    * frequency-capped (deterministic tie-break on the word).
    */
  private def collectWordCounts(df: DataFrame, text: Column,
                                pattern: String, maxWords: Int): Array[(String, Long)] =
    df.select(explode(regexp_extract_all(text,
        lit(pattern), lit(0))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

  /** The vocabulary-bounded driver loop, shared by the char-level and
    * byte-level faces (the symbol alphabet is whatever the word
    * strings are made of).
    */
  private def learnFromWordCounts(wordCounts: Array[(String, Long)],
                                  numMerges: Int, minCount: Long): MergeTable = {
    // vocabulary-bounded training state: symbol sequence per word
    val syms: Array[Array[String]] = wordCounts.map { case (w, _) =>
      val cps = w.codePointCount(0, w.length)
      val a = new Array[String](cps)
      var cu = 0
      var i = 0
      while (i < cps) {
        val next = w.offsetByCodePoints(cu, 1)
        a(i) = w.substring(cu, next)
        cu = next
        i += 1
      }
      a
    }
    val freq = wordCounts.map(_._2)

    val learned = IndexedSeq.newBuilder[(String, String)]
    var it = 0
    var exhausted = false
    while (it < numMerges && !exhausted) {
      // adjacent-pair frequencies (every occurrence, weighted by the
      // word's corpus frequency — the canonical training count)
      val pairCounts = new scala.collection.mutable.HashMap[(String, String), Long]()
      var wi = 0
      while (wi < syms.length) {
        val s = syms(wi)
        val f = freq(wi)
        var i = 0
        while (i < s.length - 1) {
          val k = (s(i), s(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + f)
          i += 1
        }
        wi += 1
      }
      val best = pairCounts.filter(_._2 >= minCount)
      if (best.isEmpty) exhausted = true
      else {
        // deterministic argmax: count desc, then pair lexicographic
        val ((a, b), _) = best.minBy { case ((x, y), c) => (-c, x, y) }
        learned += ((a, b))
        val ab = a + b
        wi = 0
        while (wi < syms.length) {
          val s = syms(wi)
          // left-to-right non-overlapping replace (same pass the
          // encoder applies, so training state and inference agree)
          var has = false
          var i = 0
          while (i < s.length - 1 && !has) {
            has = s(i) == a && s(i + 1) == b; i += 1
          }
          if (has) {
            val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
            var r = 0
            while (r < s.length) {
              if (r + 1 < s.length && s(r) == a && s(r + 1) == b) {
                out += ab; r += 2
              } else { out += s(r); r += 1 }
            }
            syms(wi) = out.toArray
          }
          wi += 1
        }
        it += 1
      }
    }
    MergeTable(learned.result())
  }
}
