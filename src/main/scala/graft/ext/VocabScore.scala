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
  * Scale shape:
  *   - token counts: one explode + one token-keyed aggregate (partial
  *     agg absorbs hot tokens — stopwords ARE the hot case);
  *   - top-N: TakeOrderedAndProject over the token counts (count
  *     desc, token asc — a deterministic total order, no global sort
  *     of the corpus); N is constant, so the vocab broadcasts;
  *   - coverage: broadcast semi-probe of the exploded tokens, one
  *     per-doc aggregate. Nothing corpus-proportional shuffles except
  *     the per-doc count itself.
  *
  * Documents with zero tokens (empty/whitespace text) yield no row —
  * filter them beforehand or treat absence as minimum quality.
  */
object VocabScore {

  def coverage(docs: DataFrame, id: Column, text: Column, topN: Int = 1000): DataFrame = {
    require(topN >= 1, s"topN >= 1 required, got $topN")
    val toks = docs.select(id.as("__id"),
        explode(split(trim(lower(text)), "\\s+")).as("__tok"))
      .filter(col("__tok") =!= "")
    val vocab = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__tok").asc)
      .limit(topN)
      .select(col("__tok").as("__v"))
    toks.join(broadcast(vocab), col("__tok") === col("__v"), "left")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__v").isNotNull, 1L).otherwise(0L)).as("n_in_vocab"))
      .select(col("__id").as("id"), col("n_tokens"), col("n_in_vocab"),
        (col("n_in_vocab").cast("double") / col("n_tokens").cast("double"))
          .as("coverage"))
  }
}
