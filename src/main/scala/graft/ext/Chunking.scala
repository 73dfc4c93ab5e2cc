package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Overlapping token-window chunking — the RAG / context-packing
  * primitive: split each document into windows of `size` whitespace
  * tokens starting every `stride` tokens (overlap = size - stride).
  *
  * The reference has no chunking surface; a training/retrieval
  * pipeline needs it for embedding indexing and long-document
  * truncation. Contrast with [[Packing]] (greedy packing of WHOLE
  * documents into token budgets): chunking SPLITS one document into
  * deterministic windows.
  *
  * Scale shape: one projection + one explode — narrow, no shuffle, no
  * window functions, no per-row state; chunk boundaries depend only on
  * the row itself, so the operator is embarrassingly parallel and
  * partition-count invariant. `sequence`/`slice`/`concat_ws` are
  * ordinary codegen'd expressions (not interpreted lambda HOFs).
  *
  * Start positions run on the stride grid `1 + k·stride` but STOP at
  * the first grid position whose window reaches the document end
  * (`ceil(max(len-width,0)/stride)` steps): a shorter final stride
  * emits the covering tail window, and no window strictly contained in
  * its predecessor is ever emitted (len=100, width=40, stride=30 emits
  * starts 1/31/61 — not 91, whose 10 tokens the window at 61 already
  * covers; duplicate tails would inflate a RAG/embedding index). A
  * document always emits ≥ 1 chunk, including empty/short ones.
  */
object Chunking {

  /** (doc_id, chunk_id, chunk, n_tokens) — chunk_id is 0-based in
    * document order; n_tokens counts the tokens actually in the
    * (possibly short tail) window.
    */
  def tokenChunks(df: DataFrame, id: Column, text: Column,
                  width: Int, stride: Int): DataFrame = {
    require(width >= 1 && stride >= 1 && stride <= width,
      s"need 1 <= stride <= width, got width=$width stride=$stride")
    val toks = split(trim(text), "\\s+")
    // last needed start: smallest grid point covering the document end
    // (non-negative numerator keeps floor == truncating int division)
    val lastStart = (floor((greatest(size(col("__t")) - width, lit(0))
      + lit(stride - 1)) / stride) * stride + 1).cast("int")
    df.select(id.as("doc_id"), toks.as("__t"))
      .select(col("doc_id"), col("__t"),
        explode(sequence(lit(1), lastStart, lit(stride))).as("__s"))
      .select(
        col("doc_id"),
        ((col("__s") - 1) / stride).cast("long").as("chunk_id"),
        concat_ws(" ", slice(col("__t"), col("__s"), lit(width))).as("chunk"),
        least(lit(width), size(col("__t")) - col("__s") + 1).cast("long")
          .as("n_tokens"))
  }

  /** Re-base chunk cost in REAL tokenizer tokens: append `n_bpe`
    * (merge-loop BPE count of the chunk text, [[graft.functions.Bpe]])
    * so downstream RAG / packing budgets are denominated in the unit
    * that matters; whitespace `n_tokens` stays as window geometry.
    * Still narrow — one more codegen'd projection, no shuffle.
    */
  def withBpeCost(chunks: DataFrame): DataFrame =
    chunks.withColumn("n_bpe", graft.functions.Bpe.count(col("chunk")))

  /** Chunk in REAL tokenizer units: windows of `width` BPE tokens every
    * `stride` BPE tokens over the document's full token sequence
    * ([[graft.functions.Bpe.tokens]]) — the shape a context-window
    * budget actually constrains, where [[tokenChunks]]'s whitespace
    * windows only approximate it (fertility drift puts a "40-token"
    * whitespace window anywhere from 40 to 80 real tokens).
    *
    * `chunk` is the space-joined TOKEN STREAM (pre-tokenization drops
    * the original whitespace, so source text is not reconstructible —
    * training and embedding consumers feed token streams anyway);
    * `n_tokens` counts real tokens, so every chunk is exactly `width`
    * except a shorter covering tail. Same stride-grid / no-contained-
    * tail rules as [[tokenChunks]]; a document always emits ≥ 1 chunk
    * (empty text → one empty chunk). Same narrow shape: one codegen'd
    * tokenize per row + explode, no shuffle.
    */
  def bpeTokenChunks(df: DataFrame, id: Column, text: Column,
                     width: Int, stride: Int): DataFrame = {
    require(width >= 1 && stride >= 1 && stride <= width,
      s"need 1 <= stride <= width, got width=$width stride=$stride")
    val lastStart = (floor((greatest(size(col("__t")) - width, lit(0))
      + lit(stride - 1)) / stride) * stride + 1).cast("int")
    df.select(id.as("doc_id"), graft.functions.Bpe.tokens(text).as("__t"))
      .select(col("doc_id"), col("__t"),
        explode(sequence(lit(1), lastStart, lit(stride))).as("__s"))
      .select(
        col("doc_id"),
        ((col("__s") - 1) / stride).cast("long").as("chunk_id"),
        concat_ws(" ", slice(col("__t"), col("__s"), lit(width))).as("chunk"),
        greatest(least(lit(width), size(col("__t")) - col("__s") + 1), lit(0))
          .cast("long").as("n_tokens"))
  }
}
