package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance weighting (Xie et al.
  * 2023, arXiv:2302.03169): score every candidate document under TWO
  * n-gram LMs — one trained on the target domain, one on the raw
  * corpus — and keep the documents the target model prefers most.
  * The standard recipe for "make the crawl look like the reference
  * corpus" mixture construction.
  *
  * Oracle-exact by composition: both scores are the gated rational
  * Jelinek–Mercer face ([[NgramLm.scoreDocsInterpolated]] — bit-exact
  * cross-engine), and the importance weight is ONE further IEEE
  * division of those two already-identical doubles (raw JM scores are
  * strictly positive — the unigram back-off term floors them — so the
  * ratio is total). This is a documented delta from the paper, which
  * works in log-space with hashed features and Gumbel-noise
  * resampling: the ratio here is the same importance signal without
  * the ln() (not bit-stable cross-engine, the [[Keywords.tfIdfLog]]
  * precedent) and the selection is deterministic top-fraction rather
  * than noised sampling — swap in [[Sampling]]'s hash-seeded
  * temperature machinery where sampling-proper is wanted.
  *
  * Scale shape: two scoring passes (each: one explode + model joins +
  * keyed agg — the q101/q103 plan), one id-keyed join of the two
  * per-document score tables, and the exact-rank selection face's one
  * global sort (same class as [[NgramLm.perplexityBuckets]]; at
  * corpus scale cut by [[QualityFilter.quantileBandSketch]] threshold
  * instead, identical semantics minus rank-exactness).
  */
object Dsir {

  /** (doc_id, score_target, score_raw, weight) for every candidate
    * with at least one bigram; weight = score_target / score_raw,
    * > 1 ⇔ the target model predicts the document better than the
    * raw model does.
    */
  def importanceWeights(docs: DataFrame, id: Column, text: Column,
                        target: NgramLm.NgramModel,
                        raw: NgramLm.NgramModel): DataFrame = {
    val st = NgramLm.scoreDocsInterpolated(docs, id, text, target)
      .select(col("doc_id"), col("lm_score").as("score_target"))
    val sr = NgramLm.scoreDocsInterpolated(docs, id, text, raw)
      .select(col("doc_id"), col("lm_score").as("score_raw"))
    st.join(sr, Seq("doc_id"))
      .withColumn("weight", col("score_target") / col("score_raw"))
  }

  /** Deterministic top-fraction selection: keep the `num`/`den`
    * best-weighted documents (ties on weight break on id; the cut is
    * INTEGER rank arithmetic — rank·den ≤ n·num — so the boundary is
    * exact). Returns the input with a 0/1 `selected` column.
    */
  def selectTopFraction(weighted: DataFrame, id: Column, weight: Column,
                        num: Int, den: Int): DataFrame = {
    require(num >= 0 && den > 0, s"need a proper fraction, got $num/$den")
    val w = Window.orderBy(weight.desc, id.asc)
    weighted
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("selected",
        (col("__rn") * den <= col("__n") * num).cast("long"))
      .drop("__rn", "__n")
  }
}
