package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** RFC 9309 semantics: group stacking, agent selection, longest-match
  * with the Allow tie-break, empty-value rules, default allow.
  */
class RobotsSpec extends SparkTestBase {
  import spark.implicits._

  private val robots = Seq(
    ("a.com", "User-agent: *\nDisallow: /"),
    ("b.com", "User-agent: *\nDisallow: /priv\nAllow: /priv/ok"),
    ("c.com", "User-agent: graftbot\nDisallow: /only\n\nUser-agent: *\nDisallow: /"),
    ("d.com", "User-agent: otherbot\nUser-agent: graftbot\nDisallow: /x"),
    ("e.com", "# comment\r\nUser-agent: *\r\nDisallow:\r\n"),
    ("f.com", "User-agent: *\nAllow: /p\nDisallow: /p"),
    ("g.com", "User-agent: graftbot\nDisallow: /a\n\nUser-agent: graftbot\nDisallow: /b"))
    .toDF("host", "body")

  private def allowed(url: String): (Boolean, Any) = {
    val r = Robots.screen(Seq((1L, url)).toDF("id", "url"),
        col("id"), col("url"), robots, col("host"), col("body"), "GraftBot")
      .select(col("allowed"), col("rule_len")).collect()(0)
    (r.getBoolean(0), if (r.isNullAt(1)) null else r.getInt(1))
  }

  test("disallow-all blocks every path; unknown host is allowed with no rule") {
    assert(allowed("https://a.com/anything")._1 == false)
    assert(allowed("https://zz.com/anything") == ((true, null)))
  }

  test("longest prefix wins: Allow under a broader Disallow") {
    assert(allowed("https://b.com/priv/secret")._1 == false)
    assert(allowed("https://b.com/priv/ok/page")._1 == true)
    assert(allowed("https://b.com/public")._1 == true)
  }

  test("exact-agent group beats *; the * group is then ignored entirely") {
    assert(allowed("https://c.com/only/x")._1 == false)
    assert(allowed("https://c.com/elsewhere")._1 == true,
      "the * Disallow:/ must not apply when an exact group exists")
  }

  test("consecutive User-agent lines stack into one group") {
    assert(allowed("https://d.com/x/1")._1 == false)
    assert(allowed("https://d.com/y")._1 == true)
  }

  test("empty Disallow value matches nothing; comments and CRLF tolerated") {
    assert(allowed("https://e.com/whatever") == ((true, null)))
  }

  test("equal-length Allow beats Disallow") {
    assert(allowed("https://f.com/p/page")._1 == true)
  }

  test("multiple groups naming the same agent combine (RFC rule)") {
    assert(allowed("https://g.com/a/1")._1 == false)
    assert(allowed("https://g.com/b/1")._1 == false)
    assert(allowed("https://g.com/c")._1 == true)
  }

  test("expression verdict over hostRules equals the aggregation screen on every fixture URL") {
    val urls = (for {
      h <- Seq("a.com", "b.com", "c.com", "d.com", "e.com", "f.com", "g.com", "zz.com")
      p <- Seq("/", "/priv/secret", "/priv/ok/page", "/only/x", "/x/1", "/p/q", "/a/1", "/b", "/c")
    } yield s"https://$h$p").zipWithIndex.map { case (u, i) => (i.toLong, u) }
    val df = urls.toDF("id", "url")
    val viaScreen = Robots.screen(df, col("id"), col("url"),
        robots, col("host"), col("body"), "graftbot")
      .select(col("id"), col("allowed"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).sorted.toSeq
    val hr = Robots.hostRules(robots, col("host"), col("body"), "graftbot")
    val viaVerdict = graft.streaming.DocStream.robotsScreened(df, col("url"), hr)
      .select(col("id"), col("allowed"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).sorted.toSeq
    assert(viaVerdict == viaScreen)
  }

  test("streaming robots screen equals the batch screen and holds no state") {
    val dir = java.nio.file.Files.createTempDirectory("robots").toString
    val urls = Seq(
      (1L, "https://a.com/x"), (2L, "https://b.com/priv/ok/1"),
      (3L, "https://b.com/priv/no"), (4L, "https://zz.com/free"))
      .toDF("id", "url")
    urls.write.parquet(s"$dir/in")
    // rule cache persisted then re-read: the state-table shape the
    // streaming screen joins against in production
    Robots.hostRules(robots, col("host"), col("body"), "graftbot")
      .write.parquet(s"$dir/rules")
    val cache = spark.read.parquet(s"$dir/rules")
    val stream = spark.readStream.schema("id BIGINT, url STRING")
      .parquet(s"$dir/in")
    val q = graft.streaming.DocStream.robotsScreened(stream, col("url"), cache)
      .writeStream.format("memory").queryName("robots_screen").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("robots_screen")
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).sorted.toSeq
    val batch = graft.streaming.DocStream.robotsScreened(urls, col("url"), cache)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).sorted.toSeq
    assert(streamed == batch)
    assert(streamed == Seq((1L, false), (2L, true), (3L, false), (4L, true)))
    assert(q.lastProgress == null ||
      q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
  }

  test("crawlDelays: fractional parse, group selection, max-wins, junk dropped") {
    val rb = Seq(
      ("a.com", "User-agent: *\nCrawl-delay: 2"),
      ("b.com", "User-agent: graftbot\nCrawl-delay: 0.5\n\nUser-agent: *\nCrawl-delay: 9"),
      ("c.com", "User-agent: *\nCrawl-delay: 1\nCrawl-delay: 3"),
      ("d.com", "User-agent: *\nCrawl-delay: soon"),
      ("e.com", "User-agent: *\nDisallow: /x")).toDF("host", "body")
    val d = Robots.crawlDelays(rb, col("host"), col("body"), "graftbot")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(d == Map("a.com" -> 2000L, "b.com" -> 500L, "c.com" -> 3000L),
      d.toString)
  }

  test("politenessSchedule: per-host slots in deterministic order, delay or default") {
    val delays = Seq(("a.com", 2000L)).toDF("host", "delay_ms")
    val urls = Seq(
      (3L, "https://a.com/c"), (1L, "https://a.com/a"), (2L, "https://a.com/b"),
      (4L, "https://z.com/q"), (5L, "https://z.com/p")).toDF("id", "url")
    val s = Robots.politenessSchedule(urls, col("id"), col("url"),
        delays, defaultDelayMs = 100L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(s(1L) == ((0L, 0L)) && s(2L) == ((1L, 2000L)) && s(3L) == ((2L, 4000L)))
    assert(s(5L) == ((0L, 0L)) && s(4L) == ((1L, 100L)),
      "unknown host uses the fleet default delay")
  }

  test("agent match is case-insensitive on both sides") {
    val r = Robots.rulesFor(Seq(("h.com", "User-Agent: GRAFTBOT\ndisallow: /z"))
        .toDF("host", "body"), col("host"), col("body"), "graftbot")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getString(2)))
    assert(r.toSeq == Seq(("h.com", false, "/z")))
  }
}
