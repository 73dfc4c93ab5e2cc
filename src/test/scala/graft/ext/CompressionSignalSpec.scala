package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Compression signal: repetitive content must flag, prose-like must
  * not; sizes are partition-layout-invariant and deterministic across
  * runs (the properties the rows-only gate q117 relies on).
  */
class CompressionSignalSpec extends SparkTestBase {

  import spark.implicits._

  private def fixture = Seq(
    // pure template spam: one sentence repeated 40×
    (1L, Seq.fill(40)("click here to win a prize now").mkString(" ")),
    // keyword stuffing: tiny vocabulary cycled
    (2L, Seq.tabulate(200)(i => Seq("buy", "cheap", "now")(i % 3)).mkString(" ")),
    // prose-like: varied vocabulary, no structural repeats
    (3L, "the migration of arctic terns spans both hemispheres each " +
         "year crossing oceans deserts and storm systems guided by " +
         "magnetic fields and celestial cues that science only partly maps"),
    // short doc: must not crash or flag spuriously
    (4L, "ok")
  ).toDF("doc_id", "text")

  test("repetitive content compresses past the threshold; prose does not") {
    val got = CompressionSignal.flagged(fixture, $"doc_id", $"text", k = 4)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got(1L) && got(2L), s"templates must flag: $got")
    assert(!got(3L) && !got(4L), s"prose/short must pass: $got")
  }

  test("sizes are invariant to partition layout and repeated runs") {
    def run(parts: Int) =
      CompressionSignal.sizes(fixture.repartition(parts), $"doc_id", $"text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(1) == run(4))
    assert(run(4) == run(4))
  }

  test("raw sizes are exact UTF-8 byte counts and deflated sizes are positive") {
    val got = CompressionSignal.sizes(fixture, $"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val texts = fixture.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { case (id, raw, gz) =>
      assert(raw == texts(id).getBytes("UTF-8").length.toLong)
      assert(gz > 0)
    }
  }

  test("ratio ordering: template < stuffing-ish < prose (monotone in redundancy)") {
    val m = CompressionSignal.sizes(fixture, $"doc_id", $"text")
      .collect().map(r => r.getLong(0) -> r.getLong(2).toDouble / r.getLong(1)).toMap
    assert(m(1L) < m(3L) && m(2L) < m(3L), m.toString)
  }

  test("lzCoverage agrees with the deflate face on the fixture and handles edges") {
    val got = CompressionSignal.lzCoverage(fixture, $"doc_id", $"text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(1L)._3 && got(2L)._3, s"templates must flag: $got")
    assert(!got(3L)._3, s"prose must pass: $got")
    // short doc: no full gram -> zero positions, never flags
    assert(got(4L) == ((0L, 0L, false)))
    // template spam: every position past the first period is covered
    assert(got(1L)._2 * 10 > got(1L)._1 * 9, s"template coverage ~97%: $got")
    assert(got(3L)._2 == 0L, s"prose has no 8-gram recurring within 64: $got")
  }

  /** Independent reference: hash-map scan, most recent prior
    * occurrence (within the window iff any is).
    */
  private def refLz(text: String, gram: Int, window: Int): (Long, Long) =
    if (text.length < gram) (0L, 0L)
    else {
      val n = text.length - gram + 1
      val last = scala.collection.mutable.HashMap.empty[String, Int]
      var cov = 0
      for (i <- 0 until n) {
        val g = text.substring(i, i + gram)
        last.get(g).foreach(j => if (i - j <= window) cov += 1)
        last(g) = i
      }
      (n.toLong, cov.toLong)
    }

  test("lzCoverage == brute-force reference on every fixture doc") {
    val texts = fixture.orderBy($"doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = CompressionSignal.lzCoverage(fixture, $"doc_id", $"text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    texts.foreach { case (id, t) =>
      assert(got(id) == refLz(t, 8, 64), s"doc $id")
    }
  }

  test("lzCoverage window rule: start distance exactly W covered, W+1 not (both boundaries planted)") {
    // gram 4, window 8, distinct-char filler: the planted pair is the
    // ONLY repeated gram, so the counts isolate the boundary exactly
    val docs = Seq(
      (1L, "ABCD0123ABCD"),  // second start at 9, gap 8 = W -> covered
      (2L, "ABCD01234ABCD")  // second start at 10, gap 9 > W -> not
    ).toDF("doc_id", "text")
    val got = CompressionSignal.lzCoverage(docs, $"doc_id", $"text",
        gram = 4, window = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((9L, 1L)), s"gap == W must cover: $got")
    assert(got(2L) == ((10L, 0L)), s"gap == W+1 must not: $got")
  }

  test("lzCoverage is invariant to partition layout") {
    val r1 = CompressionSignal.lzCoverage(fixture.repartition(1), $"doc_id", $"text")
      .orderBy($"id").collect().toSeq
    val r8 = CompressionSignal.lzCoverage(fixture.repartition(8), $"doc_id", $"text")
      .orderBy($"id").collect().toSeq
    assert(r1 == r8)
  }
}
