package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** End-to-end web-curation composition: raw crawled HTML → host edge
  * list → TrustRank → document screen, plus the anchor-text topical
  * signal and the streaming face of the same screen. Each stage is
  * oracle- or unit-pinned on its own (q131/q133, LinkGraphSpec,
  * StreamingSpec); this spec pins that they COMPOSE — column
  * contracts line up and the verdicts are the ones a curation run
  * needs.
  */
class WebGraphPipelineSpec extends SparkTestBase {

  import spark.implicits._

  // two legitimate hosts (good links news), a two-host spam farm
  // linking only to itself, and a doc on an unknown host nobody links
  private def crawl = Seq(
    (1L, "good.example",
      """<p>portal</p><a href="https://news.example/a">daily news report</a>
        |<a href="https://news.example/b">news archive</a>""".stripMargin),
    (2L, "news.example",
      """<a href="https://good.example/">back to portal</a>"""),
    (3L, "spam-a.example",
      """<a href="https://spam-b.example/buy">cheap pills</a>"""),
    (4L, "spam-b.example",
      """<a href="https://spam-a.example/win">cheap pills</a>"""),
    (5L, "lonely.example", "<p>no links at all</p>"))
    .toDF("doc_id", "host", "html")

  test("HTML -> edges -> trustRank -> screen: spam farm and unlinked host fail, linked cluster passes") {
    val edges = LinkGraph.hostEdgesFromHtml(crawl, $"host", $"html")
    val seeds = Seq("good.example").toDF("host")
    val scores = LinkGraph.trustRank(edges, "src", "dst", seeds, iters = 6)
    val screened = graft.streaming.DocStream.trustScreened(
        crawl.select($"doc_id", $"host"), $"host", scores, floor = 0.0)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(screened(1L) && screened(2L), s"linked cluster must pass: $screened")
    assert(!screened(3L) && !screened(4L), s"spam farm must fail: $screened")
    assert(!screened(5L), s"unknown host defaults to distrust: $screened")
  }

  test("anchor terms describe the TARGET host, counted per link") {
    val terms = LinkGraph.anchorTexts(crawl, $"html")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(terms(("news.example", "news")) == 2L, terms.toString)
    assert(terms(("news.example", "daily")) == 1L)
    assert(terms(("good.example", "portal")) == 1L)
    assert(terms(("spam-b.example", "pills")) == 1L)
    assert(!terms.keySet.exists(_._1 == "lonely.example"))
  }

  test("streaming trust screen equals the batch screen row for row") {
    val dir = java.nio.file.Files.createTempDirectory("webgraph").toString
    val docs = crawl.select($"doc_id", $"host")
    docs.write.parquet(s"$dir/in")
    val edges = LinkGraph.hostEdgesFromHtml(crawl, $"host", $"html")
    val seeds = Seq("good.example").toDF("host")
    // scores persisted then re-read: the state-table shape the
    // streaming screen joins against in production
    LinkGraph.trustRank(edges, "src", "dst", seeds, iters = 6)
      .write.parquet(s"$dir/scores")
    val scores = spark.read.parquet(s"$dir/scores")

    val stream = spark.readStream.schema("doc_id BIGINT, host STRING")
      .parquet(s"$dir/in")
    val q = graft.streaming.DocStream.trustScreened(stream, $"host", scores, 0.0)
      .writeStream.format("memory").queryName("trust_screen").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("trust_screen")
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3))).sorted
    val batch = graft.streaming.DocStream.trustScreened(docs, $"host", scores, 0.0)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3))).sorted
    assert(streamed.sameElements(batch),
      s"stream=${streamed.mkString(",")} batch=${batch.mkString(",")}")
    // the screen is stateless: no state store rows in the progress
    assert(q.lastProgress == null ||
      q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
  }
}
