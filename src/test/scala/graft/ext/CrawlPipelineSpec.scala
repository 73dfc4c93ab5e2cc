package graft.ext

import graft.SparkTestBase
import graft.streaming.DocStream
import org.apache.spark.sql.functions._

/** End-to-end crawl front door: `.warc.gz` blobs → record parse →
  * robots screen → URL blocklist → host trust screen → Gopher quality
  * cascade → exact-dedup admission. Every stage is oracle- or
  * unit-pinned on its own (q112, q148, q126, q133, q109, q20/q58);
  * this spec pins that they COMPOSE — column contracts line up, each
  * planted document dies at exactly the stage built to kill it, and
  * the stateless streaming chain admits the same documents as the
  * batch chain.
  */
class CrawlPipelineSpec extends SparkTestBase {
  import spark.implicits._

  // 60 plain words, stopword-rich, alpha-heavy: passes every Gopher rule
  private val goodBase = ("the quick brown fox jumps over the lazy dog and " +
    "then it runs back into the forest where many other animals live " +
    "together in peace for all of the long summer days and the cold " +
    "winter nights that follow each other in the turning of the year " +
    "with rain and sun alike").trim

  private def fixtureDocs = Seq(
    (1L, "https://ok.example/page1", goodBase + " first"),
    (2L, "https://ok.example/private/a", goodBase + " second"), // robots kills
    (3L, "https://ads.bad.example/p", goodBase + " third"),     // blocklist kills
    (4L, "https://spam.example/x", goodBase + " fourth"),       // trust kills
    (5L, "https://ok.example/page2", goodBase + " known"),      // dedup kills
    (6L, "https://ok.example/page3", "too short"))              // gopher kills

  private def robots = Seq(
    ("ok.example", "User-agent: *\nDisallow: /private")).toDF("host", "body")

  private def blockRules = Seq(("bad.example", "", 7L))
    .toDF("domain", "prefix", "rule_id")

  private def trustScores = {
    val edges = Seq(("ok.example", "news.example")).toDF("src", "dst")
    LinkGraph.trustRank(edges, "src", "dst",
      Seq("ok.example").toDF("host"), iters = 4)
  }

  private def corpusDigests = Seq(goodBase + " known").toDF("text")
    .select(ExactDedup.contentDigest($"text").as("digest"))

  private def buildWarcBlobs(docs: Seq[(Long, String, String)]) = {
    val recs = docs.toDF("ord", "uri", "text")
      .select(lit(0L).as("blob_id"), $"ord",
        Warc.recordBytes(concat(lit("rec-"), $"ord"), $"uri",
          encode($"text", "UTF-8")).as("rec"))
    Warc.buildBlobs(Warc.gzipRecords(recs, $"blob_id", $"ord", $"rec"),
      $"blob_id", $"ord", $"rec")
  }

  private def batchChain(parsed: org.apache.spark.sql.DataFrame) = {
    val robotsOk = DocStream.robotsScreened(parsed, $"target_uri",
        Robots.hostRules(robots, $"host", $"body", "graftbot"))
      .filter($"allowed").drop("allowed")
    val unblocked = UrlOps.blockFiltered(robotsOk, $"target_uri", blockRules)
    val trusted = DocStream.trustScreened(unblocked,
        UrlOps.host($"target_uri"), trustScores, floor = 0.0)
      .filter($"passes").drop("trust", "passes")
    val quality = trusted.filter(QualityFilter.gopherPasses($"text"))
    DocStream.admitNew(quality, $"text", corpusDigests)
  }

  test("each planted document dies at exactly its stage; the clean one is admitted") {
    val parsed = Warc.parseRecords(buildWarcBlobs(fixtureDocs),
        $"blob_id", $"blob", gzipped = true)
      .select($"target_uri", decode($"payload", "UTF-8").as("text"))
    val admitted = batchChain(parsed)
      .select($"target_uri").as[String].collect().toSeq
    assert(admitted == Seq("https://ok.example/page1"), admitted.toString)
  }

  test("blockFiltered retains exactly what blockScreen marks clean") {
    val urls = Seq(
      (1L, "https://ads.bad.example/p"), (2L, "https://bad.example/x"),
      (3L, "https://notbad.example/x"), (4L, "https://deep.ads.bad.example/q"),
      (5L, "https://ok.example/bad.example")).toDF("id", "url")
    val viaScreen = UrlOps.blockScreen(urls, $"id", $"url", blockRules)
      .filter(!$"blocked").select($"id").as[Long].collect().sorted.toSeq
    val viaAnti = UrlOps.blockFiltered(urls, $"url", blockRules)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(viaAnti == viaScreen)
    assert(viaAnti == Seq(3L, 5L))
  }

  test("gopherPasses(text) equals gopherFlags.passes row for row") {
    val docs = fixtureDocs.toDF("id", "uri", "text")
      .unionAll(Seq((7L, "u", "### " * 60), (8L, "u", ("word " * 49).trim))
        .toDF("id", "uri", "text"))
    val viaCol = docs.select($"id", QualityFilter.gopherPasses($"text").as("p"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).sorted.toSeq
    val viaFlags = QualityFilter.gopherFlags(docs, $"id", $"text")
      .select($"doc_id", ($"passes" === 1L).as("p"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).sorted.toSeq
    assert(viaCol == viaFlags)
  }

  test("the streaming front door admits exactly what the batch chain admits, statelessly") {
    val dir = java.nio.file.Files.createTempDirectory("crawlfd").toString
    buildWarcBlobs(fixtureDocs).write.parquet(s"$dir/in")
    val stream = spark.readStream.schema("blob_id BIGINT, blob BINARY")
      .parquet(s"$dir/in")
    val parsed = Warc.parseRecords(stream, $"blob_id", $"blob", gzipped = true)
      .select($"target_uri", decode($"payload", "UTF-8").as("text"))
    val q = batchChain(parsed)
      .writeStream.format("memory").queryName("crawl_front_door").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("crawl_front_door")
      .select($"target_uri").as[String].collect().toSeq
    assert(streamed == Seq("https://ok.example/page1"), streamed.toString)
    assert(q.lastProgress == null ||
      q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
  }
}
