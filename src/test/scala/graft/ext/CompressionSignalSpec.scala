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
}
