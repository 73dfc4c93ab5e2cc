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

  /** Block-level tags whose boundaries delimit DOM-density segments. */
  private val BlockTagRegex =
    "(?is)</?(p|div|td|th|h[1-6]|li|ul|ol|table|tr|section|article|header|footer|nav|aside|blockquote|br)\\b[^>]*>"

  /** DOM-density text extraction (the Arc90-readability / jusText
    * family): split the page at BLOCK-level tag boundaries, score each
    * segment by LINK DENSITY (characters inside <a> anchors vs total
    * segment characters), and keep only long-enough low-link segments.
    * Navigation bars, footers, and related-links chrome are short
    * runs of almost-pure anchor text; article prose is long runs of
    * mostly plain text — the density split is what separates them on
    * real pages where the flat regex strip ([[TextAnalysis.htmlToText]],
    * gate q59) keeps nav and footer verbatim.
    *
    * Rule, exact-arithmetic so the oracle mirrors it (gate q189):
    * a segment is KEPT iff its whitespace-squeezed tag-stripped text
    * has ≥ `minChars` characters AND 3·link_chars ≤ text_chars (link
    * density ≤ 1/3, the integer form — no float ratio anywhere).
    * Output columns: (doc_id, n_segments [nonblank], n_kept,
    * extracted [kept texts joined by newline]).
    *
    * Scale shape: one per-row expression tree — split, per-segment
    * regex strips, integer length arithmetic — zero shuffle,
    * whole-stage codegen; rides along any scan like the q125 redact
    * family. Regex grammar stays in the Java∩RE2 subset
    * ((?is), \b, [^>]*, non-greedy .*?) so both engines parse
    * identically.
    */
  def densityStats(docs: DataFrame, id: Column, html: Column,
                   minChars: Int = 20): DataFrame = {
    require(minChars >= 1, s"minChars must be >= 1, got $minChars")
    val noBlocks = regexp_replace(html,
      "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    def squeeze(c: Column): Column =
      trim(regexp_replace(regexp_replace(c, "(?s)<[^>]+>", " "), "\\s+", " "))
    val segs = split(noBlocks, BlockTagRegex)
    val info = transform(segs, s => {
      val txt = squeeze(s)
      val linkLen = aggregate(
        transform(regexp_extract_all(s, lit("(?is)<a\\b[^>]*>(.*?)</a>"), lit(1)),
          a => length(squeeze(a))),
        lit(0), (acc, x) => acc + x)
      struct(txt.as("txt"), length(txt).as("len"), linkLen.as("lk"))
    })
    val nonblank = filter(info, s => s.getField("len") > 0)
    val kept = filter(nonblank, s =>
      s.getField("len") >= minChars &&
        s.getField("lk") * 3 <= s.getField("len"))
    docs.select(id.as("doc_id"),
      size(nonblank).cast("long").as("n_segments"),
      size(kept).cast("long").as("n_kept"),
      array_join(transform(kept, s => s.getField("txt")), "\n").as("extracted"))
  }

  /** HOST-scoped template statistics: per document, how many of its
    * sentences are shared by ≥ `minDf` documents of the SAME host.
    * Site templates (navigation, footers, cookie banners) repeat
    * within a host but differ across hosts, so the host partition is
    * what separates template mass from genuinely common prose — the
    * corpus-wide common-sentence signal (gate q130) can't tell a
    * license footer from a popular quotation; this face can.
    * Downstream, a high n_common/n_sents fraction routes the document
    * to template-stripping or drops it.
    *
    * Sentences are [[TextAnalysis.sentences]] segments, DISTINCT per
    * document (a footer repeated twice in one doc counts once toward
    * its own host-df, the q130 rule). Documents with zero sentences
    * are absent from the output.
    *
    * Scale shape: explode → distinct → one (host, digest) count →
    * join back on (host, digest) — every shuffle carries the 32-char
    * md5 digest, never sentence text (the q86/q130 discipline), and
    * per-host sentence cardinality bounds the join's key groups.
    */
  def hostTemplateStats(docs: DataFrame, id: Column, host: Column,
                        text: Column, minDf: Long = 2L): DataFrame = {
    require(minDf >= 2L, s"minDf must be >= 2 (df 1 is every sentence), got $minDf")
    val sent = docs.select(id.as("doc_id"), host.as("__host"),
        explode(TextAnalysis.sentences(text)).as("__s"))
      .select(col("doc_id"), col("__host"),
        md5(col("__s").cast("binary")).as("__d"))
      .distinct()
    val dfc = sent.groupBy(col("__host"), col("__d"))
      .agg(count(lit(1)).as("__df"))
    sent.join(dfc, Seq("__host", "__d"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sents"),
        sum(when(col("__df") >= minDf, lit(1L)).otherwise(lit(0L)))
          .as("n_common"))
  }
}
