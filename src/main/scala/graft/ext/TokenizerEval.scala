package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tokenizer evaluation — the measurement face that closes the
  * tokenizer loop (train: [[BpeTrain]]/[[UnigramLm]]; apply:
  * [[graft.functions.Bpe]]/[[UnigramLm.encode]]; THIS: how good is
  * the vocabulary on a given corpus slice). The standard corpus-level
  * statistics a tokenizer decision is made on:
  *
  *  - FERTILITY — pieces per word (lower = fewer tokens per document
  *    = cheaper training/inference for the same text);
  *  - chars per piece — the compression view of the same ratio;
  *  - fallback fraction — words outside the vocabulary's serving
  *    table (segmented at codepoint granularity), the coverage
  *    signal: a vocab trained on one source can look great on its own
  *    slice and fall apart on another, which is exactly what the
  *    per-group breakdown surfaces.
  *
  * Shape: tokenize → ONE broadcast join against the (word, n_pieces)
  * serving table → one grouped integer aggregation per group; the
  * two ratios are single IEEE divisions mirrored in the oracle (gate
  * q192). Group by source/language/snapshot — anything low-cardinality.
  */
object TokenizerEval {

  /** Per-group tokenizer statistics over a (word, n_pieces) serving
    * table ([[UnigramLm.encodeTable]] output, or any table with that
    * schema). Off-table words fall back to codepoint segmentation and
    * are counted in `n_fallback`. Output: (group, n_words, n_pieces,
    * n_fallback, n_chars, fertility, chars_per_piece) — the ratios
    * NULL on an empty denominator rather than dividing by zero.
    */
  def fertility(docs: DataFrame, group: Column, text: Column,
                table: DataFrame): DataFrame = {
    val toks = docs.select(group.as("grp"),
      explode(split(lower(trim(text)), "\\s+")).as("word"))
    toks.join(broadcast(table.select(col("word"), col("n_pieces").as("__np"))),
        Seq("word"), "left")
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("__np").cast("long"), length(col("word")).cast("long")))
          .as("n_pieces"),
        sum(when(col("__np").isNull, lit(1L)).otherwise(lit(0L)))
          .as("n_fallback"),
        sum(length(col("word")).cast("long")).as("n_chars"))
      .select(col("grp"), col("n_words"), col("n_pieces"),
        col("n_fallback"), col("n_chars"),
        when(col("n_words") > 0L,
          col("n_pieces").cast("double") / col("n_words").cast("double"))
          .as("fertility"),
        when(col("n_pieces") > 0L,
          col("n_chars").cast("double") / col("n_pieces").cast("double"))
          .as("chars_per_piece"))
  }
}
