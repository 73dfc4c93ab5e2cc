package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Paragraph-level exact dedup: every paragraph whose exact content
  * occurs in ≥ `minDf` DISTINCT documents corpus-wide is removed from
  * EVERY document — the C4/RefinedWeb "drop duplicated lines/
  * paragraphs" curation step, sitting between document-level dedup
  * (ExactDedup — whole doc must match) and span-level dedup
  * (SpanDedup — any n-token window). Boilerplate that LSH can't see
  * (navigation blocks, subscribe footers, cookie banners pasted
  * across sites) is exactly paragraph-shaped.
  *
  * Scale shape (the SpanDedup discipline at coarser granularity):
  *   - one projection + posexplode — no shuffle to split paragraphs;
  *   - the df count groups by md5 DIGEST, so the shuffle carries 16-B
  *     keys, never paragraph text, and map-side partial aggregation
  *     absorbs hot paragraphs (the boilerplate case IS the hot case);
  *   - hot-digest set joins back LEFT_ANTI on the digest (AQE
  *     broadcasts it when small — the usual case: boilerplate
  *     vocabulary ≪ corpus);
  *   - reassembly is one groupBy(id) with an order-restoring
  *     array_sort — the only corpus-proportional shuffle, carrying
  *     each doc's surviving paragraphs once.
  *
  * Determinism: pure function of the corpus multiset; empty/blank
  * paragraphs are never "hot" (structure is preserved, not invented);
  * every input doc appears in the output (clean_text = '' when all
  * its paragraphs were duplicated — the planted whole-doc-copy case).
  *
  * Output: (id, clean_text, n_kept, n_removed).
  */
object ParagraphDedup {

  def dedupParagraphs(docs: DataFrame, id: Column, text: Column,
                      minDf: Int = 2, sep: String = "\n\n"): DataFrame = {
    require(minDf >= 2, s"minDf >= 2 required, got $minDf")
    val parts = docs.select(id.as("__id"),
        posexplode(split(text, java.util.regex.Pattern.quote(sep)))
          .as(Seq("__pos", "__para")))
      .withColumn("__d", md5(col("__para").cast("binary")))
    val hot = parts
      .filter(trim(col("__para")) =!= "")
      .groupBy(col("__d"))
      .agg(countDistinct(col("__id")).as("__df"))
      .filter(col("__df") >= minDf)
      .select(col("__d"))
    val kept = parts.join(hot, Seq("__d"), "left_anti")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_kept"),
        array_sort(collect_list(struct(col("__pos"), col("__para")))).as("__pp"))
      .select(col("__id"), col("n_kept"),
        concat_ws(sep, transform(col("__pp"), s => s.getField("__para"))).as("clean_text"))
    // every doc survives; all-paragraphs-removed docs get empty text
    val totals = parts.groupBy(col("__id")).agg(count(lit(1)).as("__total"))
    totals.join(kept, Seq("__id"), "left")
      .select(col("__id").as("id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__total") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }
}
