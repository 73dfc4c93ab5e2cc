package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.NGrams

/** Cross-document boilerplate mining: word n-grams that occur in at
  * least `minDf` DISTINCT documents. License footers, navigation
  * chrome and template headers show up as n-grams with document
  * frequency orders of magnitude above content text — the mined list
  * feeds removal/filter passes (cf. the repetition and quality
  * filters in [[TextAnalysis]], which are per-document; this is the
  * corpus-wide complement).
  *
  * Scale shape: [[NGrams.wordNGrams]] (codegen'd, distinct grams per
  * document in one pass) → explode → ONE grouped count. Because the
  * per-document gram list is distinct by construction, `count(*)` IS
  * the document frequency — no count-distinct expansion. Partial
  * aggregation absorbs the heavy hitters map-side, so boilerplate
  * grams (by definition the hottest keys) do not skew the shuffle.
  */
object Boilerplate {

  /** (gram, n_docs) for every word n-gram with document frequency
    * ≥ `minDf`.
    */
  def frequentGrams(df: DataFrame, id: Column, text: Column,
                    n: Int, minDf: Long): DataFrame =
    df.select(id.as("__id"), explode(NGrams.wordNGrams(text, n)).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDf)
}
