package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML head-metadata extraction — the crawl front door's routing
  * fields, read BEFORE any body processing: a curation pass drops
  * `noindex` pages, collapses duplicates onto their canonical URL,
  * routes by declared language, and keys quality priors on
  * title/description presence (cf. [[Boilerplate]] for body-side
  * structure and [[TextAnalysis.htmlToText]] for body text — this is
  * the HEAD side those deliberately skip).
  *
  * Deliberately PURE-EXPRESSION: every field is a codegen'd
  * `regexp_extract`/`rlike` over the html column — no UDF, no
  * mapPartitions — so extraction inlines into whole-stage codegen
  * with whatever scan/filter surrounds it and the plan stays one
  * stage. Absent optional fields are NULL (via nullif on the empty
  * match), not empty strings, so downstream presence checks are
  * null-semantics-clean.
  *
  * Patterns are first-match and accept BOTH attribute orders
  * (name-then-content and content-then-name) as a two-pattern
  * coalesce, name-first winning when both match. r15 ADVICE: the
  * old name-first-only form read a reversed-attribute head as
  * absent, and for the `noindex` routing screen a false-absent
  * ADMITS a page the crawl said to drop — the one field where the
  * "conservative" failure wasn't conservative.
  */
object HtmlMeta {

  /** `<title>` text, whitespace-trimmed; NULL when absent. */
  def title(html: Column): Column =
    nullif(regexp_extract(html, "(?is)<title[^>]*>\\s*(.*?)\\s*</title>", 1), lit(""))

  /** `<meta name="X" content="...">` content, either attribute
    * order; NULL when absent.
    */
  def metaContent(html: Column, name: String): Column =
    coalesce(
      nullif(regexp_extract(html,
        s"""(?is)<meta\\s+name=["']$name["']\\s+content=["']([^"']*)["']""", 1),
        lit("")),
      nullif(regexp_extract(html,
        s"""(?is)<meta\\s+content=["']([^"']*)["']\\s+name=["']$name["']""", 1),
        lit("")))

  /** `<meta property="og:X" content="...">` content, either
    * attribute order; NULL when absent.
    */
  def ogContent(html: Column, prop: String): Column =
    coalesce(
      nullif(regexp_extract(html,
        s"""(?is)<meta\\s+property=["']og:$prop["']\\s+content=["']([^"']*)["']""", 1),
        lit("")),
      nullif(regexp_extract(html,
        s"""(?is)<meta\\s+content=["']([^"']*)["']\\s+property=["']og:$prop["']""", 1),
        lit("")))

  /** `<link rel="canonical" href="...">`; NULL when absent. */
  def canonical(html: Column): Column =
    nullif(regexp_extract(html,
      """(?is)<link\s+rel=["']canonical["']\s+href=["']([^"']*)["']""", 1),
      lit(""))

  /** The `<html lang="...">` declaration; NULL when absent. */
  def htmlLang(html: Column): Column =
    nullif(regexp_extract(html,
      """(?is)<html[^>]*\slang=["']([A-Za-z0-9-]*)["']""", 1), lit(""))

  /** True iff a robots meta directive contains `noindex`, either
    * attribute order.
    */
  def noindex(html: Column): Column =
    html.rlike("""(?is)<meta\s+name=["']robots["']\s+content=["'][^"']*noindex""") ||
      html.rlike("""(?is)<meta\s+content=["'][^"']*noindex[^"']*["']\s+name=["']robots["']""")

  /** The routing frame: one row per document with every head field —
    * a single codegen'd projection over the html column.
    */
  def headMeta(df: DataFrame, id: Column, html: Column): DataFrame =
    df.select(id.as("doc_id"),
      title(html).as("title"),
      metaContent(html, "description").as("description"),
      canonical(html).as("canonical"),
      htmlLang(html).as("lang"),
      noindex(html).as("noindex"),
      ogContent(html, "title").isNotNull.as("has_og"))
}
