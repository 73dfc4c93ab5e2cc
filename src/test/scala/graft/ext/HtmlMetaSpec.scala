package graft.ext

import graft.SparkTestBase

/** Pins the head-metadata extractor's field semantics: trimmed
  * titles, NULL (not empty) absents, both meta attribute orders
  * (r15 ADVICE: a reversed-order `noindex` read as absent ADMITS a
  * page the crawl said to drop), noindex detection inside a longer
  * directive, and case-insensitivity.
  */
class HtmlMetaSpec extends SparkTestBase {

  import spark.implicits._

  private def row(html: String) =
    HtmlMeta.headMeta(Seq((1L, html)).toDF("id", "h"), $"id", $"h")
      .collect().head

  test("full head extracts every field; title is trimmed") {
    val r = row("""<html lang="fr-CA"><head><TITLE>  Le Doc  </TITLE>""" +
      """<meta name="description" content="une page">""" +
      """<link rel="canonical" href="https://ex.com/a">""" +
      """<meta name="robots" content="max-snippet:-1, noindex">""" +
      """<meta property="og:title" content="og"></head><body>x</body></html>""")
    assert(r.getString(1) == "Le Doc")
    assert(r.getString(2) == "une page")
    assert(r.getString(3) == "https://ex.com/a")
    assert(r.getString(4) == "fr-CA")
    assert(r.getBoolean(5) && r.getBoolean(6))
  }

  test("absent fields are NULL, not empty; plain pages are not noindex") {
    val r = row("<html><head></head><body>plain</body></html>")
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
    assert(!r.getBoolean(5) && !r.getBoolean(6))
  }

  test("reversed meta attribute order extracts identically; name-first wins when both match") {
    val r = row("""<html><head>""" +
      """<meta content="swapped" name="description">""" +
      """<meta content="noindex" name="robots">""" +
      """<meta content="og-rev" property="og:title">""" +
      """<link href="https://ex.com/b" rel="canonical"></head></html>""")
    assert(r.getString(2) == "swapped")
    assert(r.getBoolean(5)) // reversed noindex MUST drop the page
    assert(r.getBoolean(6))
    // link rel/href stays order-strict (out of the r15 ADVICE scope):
    // a reversed canonical is a dedup-collapse miss, not an admission
    assert(r.isNullAt(3))
    // both orders present: the name-first (dominant) form wins
    val both = row("""<html><head>""" +
      """<meta name="description" content="primary">""" +
      """<meta content="secondary" name="description"></head></html>""")
    assert(both.getString(2) == "primary")
  }

  test("first title wins; body text cannot inject head fields") {
    val r = row("<html><head><title>real</title></head>" +
      "<body><title>fake</title></body></html>")
    assert(r.getString(1) == "real")
  }
}
