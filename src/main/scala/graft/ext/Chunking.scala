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
  * Every start position `1 + k·stride ≤ len` emits a chunk, so tails
  * shorter than `size` are kept (the last window of a document must
  * not be silently dropped) and a document always emits ≥ 1 chunk.
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
    df.select(id.as("doc_id"), toks.as("__t"))
      .select(col("doc_id"), col("__t"),
        explode(sequence(lit(1), greatest(size(col("__t")), lit(1)),
          lit(stride))).as("__s"))
      .select(
        col("doc_id"),
        ((col("__s") - 1) / stride).cast("long").as("chunk_id"),
        concat_ws(" ", slice(col("__t"), col("__s"), lit(width))).as("chunk"),
        least(lit(width), size(col("__t")) - col("__s") + 1).cast("long")
          .as("n_tokens"))
  }
}
