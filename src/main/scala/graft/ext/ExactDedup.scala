package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact (full-content) deduplication for document corpora.
  *
  * Spark shape: one hash-aggregate on the content key, keeping the
  * smallest id per group (deterministic winner, unlike dropDuplicates).
  *
  * Scale notes (100 TB): grouping by raw text shuffles the full text.
  * `byContentHash` groups on sha2-256 of the content instead — the
  * shuffle then carries 32 bytes + id per row, and collision probability
  * (~2^-128) is below hardware error rates. Use `byContent` when the
  * oracle must be able to reproduce the grouping in ANSI SQL.
  */
object ExactDedup {

  /** Keeper id + multiplicity per distinct content value. */
  def byContent(df: DataFrame, content: Column, id: Column): DataFrame =
    df.groupBy(content.as("__content"))
      .agg(min(id).as("keeper_id"), count(lit(1)).as("n_copies"))
      .drop("__content")
      .select(col("keeper_id"), col("n_copies"))

  /** Same, but shuffles a 256-bit digest instead of the content. */
  def byContentHash(df: DataFrame, content: Column, id: Column): DataFrame =
    df.groupBy(sha2(content.cast("string"), 256).as("__h"))
      .agg(min(id).as("keeper_id"), count(lit(1)).as("n_copies"))
      .select(col("keeper_id"), col("n_copies"))

  /** The deduplicated corpus itself: one row per distinct content, the
    * row with the smallest id wins (left_semi back-join keeps all
    * original columns without shuffling them through the aggregate).
    */
  def dedupedCorpus(df: DataFrame, content: Column, id: Column,
                    idName: String): DataFrame = {
    val keepers = byContentHash(df, content, id)
      .select(col("keeper_id").as(idName))
    df.join(keepers, Seq(idName), "left_semi")
  }
}
