package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Supervised quality scoring: a deterministic LINEAR model over the
  * engine's text statistics — the trained-classifier complement of the
  * hand-tuned [[TextAnalysis.qualityScore]] heuristic and the
  * distribution-relative [[VocabScore]] coverage (C4/fastText-style
  * quality classifiers reduce to exactly this shape at serving time:
  * featurize, dot with a weight vector, threshold).
  *
  * The model WEIGHTS are data, not code: callers pass the
  * (feature, weight) table their training produced; [[defaultWeights]]
  * is a checked-in reference instance over the five features below.
  * Scoring is one codegen'd arithmetic tree per row — no UDF, no
  * shuffle, column-pruned to `text` — and the feature definitions
  * reuse the oracle-mirrored counting expressions (q21/q22), so the
  * whole scorer is hash-gated cross-engine (q93), not just unit-
  * tested. The dot is a FIXED left-to-right sum (w0 + w1·f1 + …), so
  * IEEE evaluation order is identical in any engine mirroring the
  * expression.
  *
  * Features (all pure per-row arithmetic over one text column):
  *   stopword_ratio = english stopword hits / max(tokens, 1)
  *   digit_ratio    = digit chars / max(chars, 1)
  *   space_ratio    = space chars / max(chars, 1)
  *   mean_token_len = chars / max(tokens, 1)
  *   len_norm       = least(tokens / 100, 1)
  */
object QualityModel {

  /** Feature order is the CONTRACT: weights bind positionally (after
    * the leading intercept row) and the dot folds in this order.
    */
  val featureNames: Seq[String] =
    Seq("stopword_ratio", "digit_ratio", "space_ratio", "mean_token_len", "len_norm")

  /** Checked-in reference weights (intercept first, then
    * [[featureNames]] order): favors stopword-dense, digit-light,
    * normally-spaced prose of non-trivial length — the C4-style
    * signal directions — with magnitudes chosen so the fixture splits
    * on the 0 threshold.
    */
  val defaultWeights: Seq[(String, Double)] = Seq(
    "intercept" -> -1.6,
    "stopword_ratio" -> 4.0,
    "digit_ratio" -> -3.0,
    "space_ratio" -> 1.5,
    "mean_token_len" -> 0.05,
    "len_norm" -> 1.0)

  /** The feature columns, [[featureNames]] order, all double. */
  def features(text: Column): Seq[Column] = {
    val nTok = greatest(TextAnalysis.tokenCount(text), lit(1)).cast("double")
    val nChar = greatest(TextAnalysis.charCount(text), lit(1)).cast("double")
    Seq(
      TextAnalysis.stopwordCount(text, TextAnalysis.langWords.head._2)
        .cast("double") / nTok,
      TextAnalysis.digitCount(text).cast("double") / nChar,
      TextAnalysis.spaceCount(text).cast("double") / nChar,
      nChar / nTok,
      least(TextAnalysis.tokenCount(text).cast("double") / lit(100.0), lit(1.0)))
  }

  /** Linear score: intercept + Σ wᵢ·fᵢ, folded LEFT TO RIGHT over the
    * feature order — one codegen'd expression.
    */
  def score(text: Column, weights: Seq[(String, Double)] = defaultWeights): Column = {
    require(weights.length == featureNames.length + 1,
      s"expected ${featureNames.length + 1} weights (intercept first), got ${weights.length}")
    require(weights.head._1 == "intercept", "first weight row must be the intercept")
    require(weights.tail.map(_._1) == featureNames,
      s"weight names must match feature order $featureNames, got ${weights.tail.map(_._1)}")
    features(text).zip(weights.tail).foldLeft(lit(weights.head._2)) {
      case (acc, (f, (_, w))) => acc + lit(w) * f
    }
  }

  /** Input rows + `quality_score` + boolean `keep` (score ≥ threshold).
    * One column-pruned scan, no shuffle — the filter a 100 TB curation
    * pass puts directly after ingest.
    */
  def classify(df: DataFrame, text: Column, threshold: Double = 0.0,
               weights: Seq[(String, Double)] = defaultWeights): DataFrame = {
    val s = score(text, weights)
    df.withColumn("quality_score", s)
      .withColumn("keep", s >= lit(threshold))
  }
}
