package graft.ext

import java.util.zip.Deflater

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Compression-ratio quality signal: how small a document's UTF-8
  * bytes deflate is a cheap, language-agnostic repetitiveness measure
  * — boilerplate, keyword stuffing, and template spam compress far
  * better than natural prose, which is why deflate ratio appears as a
  * screening feature in web-curation pipelines alongside the Gopher
  * rules ([[QualityFilter]]) and the n-gram repetition stats
  * ([[TextAnalysis.repetitionStats]]). Unlike those, the signal needs
  * no tokenizer and catches repetition at EVERY granularity at once
  * (character, word, phrase, paragraph) within the deflate window.
  *
  * Imperative codec work → mapPartitions (the [[Multimodal]] /
  * [[Warc]] judgment call), ONE `Deflater` instance reused across the
  * partition (reset per row — allocation-free steady state). Output is
  * deterministic for a given JDK deflate implementation and pinned
  * level, and partition-layout-invariant (each row compresses alone);
  * it is NOT oracle-mirrorable cross-engine (DuckDB exposes no
  * deflate), so the gate is rows-only and the semantics are pinned in
  * CompressionSignalSpec instead: planted templates/repeats compress
  * below the threshold, prose-like text above, ratios invariant to
  * repartitioning.
  *
  * 100 TB shape: zero shuffles — a narrow per-row pass that rides the
  * ingest scan; compose `ratio` with the other admission screens.
  */
object CompressionSignal {

  final case class DocBytes(id: Long, text: String)
  final case class Ratioed(id: Long, n_raw: Long, n_gz: Long)

  implicit private val inEnc: Encoder[DocBytes] = Encoders.product[DocBytes]
  implicit private val outEnc: Encoder[Ratioed] = Encoders.product[Ratioed]

  /** Deflated size of one byte string at the pinned level. */
  private[ext] def deflatedSize(bytes: Array[Byte], deflater: Deflater): Long = {
    deflater.reset()
    deflater.setInput(bytes)
    deflater.finish()
    val buf = new Array[Byte](8 * 1024)
    var total = 0L
    while (!deflater.finished()) total += deflater.deflate(buf)
    total
  }

  /** Per-document raw and deflated byte counts. `ratio` downstream is
    * the caller's division (kept as two exact longs here so thresholds
    * stay integer-comparable: flag when n_gz * k < n_raw).
    */
  def sizes(df: DataFrame, id: Column, text: Column,
            level: Int = Deflater.DEFAULT_COMPRESSION): DataFrame =
    df.select(id.cast("long").as("id"), text.as("text")).as[DocBytes]
      .mapPartitions { it =>
        val d = new Deflater(level)
        it.map { r =>
          val bytes = r.text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          Ratioed(r.id, bytes.length.toLong, deflatedSize(bytes, d))
        }
      }
      .toDF()

  /** Screening face: documents flagged when they compress more than
    * `k`-fold (n_gz * k < n_raw) — the repetitive-content reject.
    */
  def flagged(df: DataFrame, id: Column, text: Column, k: Int = 4): DataFrame =
    sizes(df, id, text)
      .select(col("id"), col("n_raw"), col("n_gz"),
              (col("n_gz") * k < col("n_raw")).as("too_compressible"))
}
