package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkTestBase {

  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlOps.normalized($"u")).as[String].collect().toSeq

  test("normalized: case, default ports, fragments, utm params") {
    assert(norm(
      "HTTPS://WWW.Example.COM/Path/X?a=1#frag",
      "http://site.org:80/",
      "https://site.org:443/x",
      "http://site.org:8080/x",
      "https://h.io",
      "https://h.io/p?utm_source=ads&ref=a",
      "https://h.io/p?ref=b&utm_c=z",
      "https://h.io/p?utm_only=1"
    ) == Seq(
      "https://www.example.com/Path/X?a=1",
      "http://site.org/",
      "https://site.org/x",
      "http://site.org:8080/x",
      "https://h.io/",
      "https://h.io/p?ref=a",
      "https://h.io/p?ref=b",
      "https://h.io/p"))
  }

  test("components: host, port, path, query, registered domain") {
    val df = Seq("http://A.b.Example.org:9090/deep/path?q=1&r=2#z").toDF("u")
    val r = df.select(
      UrlOps.scheme($"u"), UrlOps.host($"u"), UrlOps.portStr($"u"),
      UrlOps.path($"u"), UrlOps.query($"u"), UrlOps.registeredDomain($"u"))
      .as[(String, String, String, String, String, String)].head()
    assert(r == (("http", "a.b.example.org", "9090", "/deep/path", "q=1&r=2", "example.org")))
  }
}
