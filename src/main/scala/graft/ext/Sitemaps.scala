package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sitemap parsing and crawl discovery — the other half of the crawl
  * front door's per-host protocol surface ([[Robots]] answers "may I
  * fetch this", sitemaps answer "what exists to fetch"). The sitemap
  * format (sitemaps.org) is deliberately flat XML: `<url>` blocks
  * holding `<loc>` and optional `<lastmod>`, or `<sitemap>` blocks in
  * an index file pointing at child sitemaps. The parse is anchored
  * regex over block splits — the [[UrlOps]] discipline: no XML
  * library, every step portable column arithmetic inside whole-stage
  * codegen, mirrorable verbatim in oracle SQL. Namespaced or
  * attribute-bearing tags (`<urlset xmlns=…>`, `<url changefreq=…>`)
  * don't disturb it because only the `<loc>`/`<lastmod>` leaf tags
  * are matched. CDATA-wrapped locs are out of scope (vanishingly rare
  * in real sitemaps; a fetch layer can unwrap before parse).
  *
  * Discovery composes with the dedup front door: the anti-join of
  * parsed locs against the known-URL set is the fetch frontier, and
  * `lastmod` against the last-fetch ledger is the refetch set.
  */
object Sitemaps {

  /** Split on the close tag, then scope each block to the text from
    * its OPEN tag on — so a `<loc>` outside any `<url>`/`<sitemap>`
    * element (an index file fed to the entry parser, or vice versa)
    * extracts nothing. `[\\s>]` after the tag name keeps `<urlset`
    * from matching `<url` and `<sitemapindex` from matching
    * `<sitemap`.
    */
  private def blocks(df: DataFrame, host: Column, xml: Column,
                     tag: String): DataFrame =
    df.select(host.as("host"), explode(split(xml, s"</$tag>")).as("__seg"))
      .select(col("host"),
        regexp_extract(col("__seg"), s"(?s)<$tag[\\s>].*", 0).as("__blk"))

  private val locOf = trim(regexp_extract(col("__blk"), "<loc>([^<]*)</loc>", 1))

  /** One row per `<url>` entry: (host, loc, lastmod) — lastmod NULL
    * when the tag is absent. Blocks without a loc (the tail after the
    * last entry, index-file noise) drop.
    */
  def urlEntries(df: DataFrame, host: Column, xml: Column): DataFrame =
    blocks(df, host, xml, "url")
      .select(col("host"), locOf.as("loc"),
        trim(regexp_extract(col("__blk"), "<lastmod>([^<]*)</lastmod>", 1))
          .as("__lm"))
      .filter(col("loc") =!= "")
      .withColumn("lastmod",
        when(col("__lm") === "", lit(null).cast("string"))
          .otherwise(col("__lm")))
      .drop("__lm")

  /** One row per child sitemap in an INDEX file: (host, loc). */
  def sitemapRefs(df: DataFrame, host: Column, xml: Column): DataFrame =
    blocks(df, host, xml, "sitemap")
      .select(col("host"), locOf.as("loc"))
      .filter(col("loc") =!= "")

  /** The fetch frontier: parsed entries whose loc is not in the known
    * URL set. One anti-join on the URL string — AQE broadcasts the
    * smaller side; at crawl scale the known set is the big side and
    * the entries shuffle, which is the right direction (sitemaps are
    * bounded at 50k entries per file by the protocol).
    */
  def frontier(entries: DataFrame, known: DataFrame,
               knownUrl: Column): DataFrame =
    entries.join(known.select(knownUrl.as("__known")),
      col("loc") === col("__known"), "left_anti")
}
