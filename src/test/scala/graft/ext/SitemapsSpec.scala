package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Sitemap parse + frontier semantics on hand-built fixtures. */
class SitemapsSpec extends SparkTestBase {
  import spark.implicits._

  test("urlEntries: loc/lastmod pairing, optional lastmod, attributes and namespaces ignored") {
    val sm = Seq(("a.com",
      """<?xml version="1.0"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc> https://a.com/1 </loc><lastmod>2024-01-02</lastmod></url>
        |<url><loc>https://a.com/2</loc></url>
        |<url changefreq="daily"><lastmod>2024-03-01</lastmod><loc>https://a.com/3</loc></url>
        |</urlset>""".stripMargin)).toDF("host", "xml")
    val e = Sitemaps.urlEntries(sm, $"host", $"xml")
      .collect().map(r => (r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2))).sortBy(_._1).toSeq
    assert(e == Seq(
      ("https://a.com/1", "2024-01-02"),
      ("https://a.com/2", null),
      ("https://a.com/3", "2024-03-01")), e.toString)
  }

  test("sitemapRefs reads index files; urlEntries ignores them") {
    val idx = Seq(("a.com",
      """<sitemapindex>
        |<sitemap><loc>https://a.com/sitemap1.xml</loc><lastmod>2024-01-01</lastmod></sitemap>
        |<sitemap><loc>https://a.com/sitemap2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin)).toDF("host", "xml")
    val refs = Sitemaps.sitemapRefs(idx, $"host", $"xml")
      .select($"loc").as[String].collect().sorted.toSeq
    assert(refs == Seq("https://a.com/sitemap1.xml", "https://a.com/sitemap2.xml"))
    assert(Sitemaps.urlEntries(idx, $"host", $"xml").count() == 0,
      "an index file has no <url> entries")
  }

  test("frontier is the anti-join against the known set") {
    val sm = Seq(("a.com",
      "<urlset><url><loc>https://a.com/old</loc></url>" +
        "<url><loc>https://a.com/new</loc></url></urlset>")).toDF("host", "xml")
    val known = Seq("https://a.com/old").toDF("url")
    val f = Sitemaps.frontier(
        Sitemaps.urlEntries(sm, $"host", $"xml"), known, $"url")
      .select($"loc").as[String].collect().toSeq
    assert(f == Seq("https://a.com/new"))
  }
}
