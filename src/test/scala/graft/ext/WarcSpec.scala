package graft.ext

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** WARC build/parse: the parser must be Content-Length driven (not a
  * delimiter split), survive payloads that contain the WARC magic,
  * round-trip the gzip-member transport bit-exactly, and produce
  * deterministic blobs regardless of input partition layout.
  */
class WarcSpec extends SparkTestBase {

  import spark.implicits._

  private def docs = Seq(
    (1L, "plain text one", "webz"),
    (2L, "contains the magic\r\nWARC/1.0\r\nright in the payload", "webz"),
    (3L, "", "crawl"), // empty payload is a legal record
    (4L, "unicode é中文 payload", "crawl"),
    (5L, "trailing crlf mimic\r\n\r\n", "webz")
  ).toDF("doc_id", "text", "source")

  private def roundTrip(gz: Boolean) = {
    val rec = Warc.recordBytes(
      concat(lit("urn:graft:doc:"), $"doc_id"),
      concat(lit("https://"), $"source", lit(".example/"), $"doc_id"),
      $"text")
    val perRec =
      if (gz) Warc.gzipRecords(docs, pmod($"doc_id", lit(2)), $"doc_id", rec)
      else docs.select(pmod($"doc_id", lit(2)).as("blob_id"),
                       $"doc_id".as("ord"), rec.as("rec"))
    val blobs = Warc.buildBlobs(perRec, col("blob_id"), col("ord"), col("rec"))
    Warc.parseRecords(blobs, col("blob_id"), col("blob"), gzipped = gz)
      .collect().sortBy(_.record_id)
  }

  test("raw round-trip recovers every field and exact payload bytes") {
    val out = roundTrip(gz = false)
    assert(out.length == 5)
    val byId = out.map(r => r.record_id -> r).toMap
    val r2 = byId("urn:graft:doc:2")
    assert(r2.warc_type == "response")
    assert(r2.target_uri == "https://webz.example/2")
    val want2 = "contains the magic\r\nWARC/1.0\r\nright in the payload"
    assert(new String(r2.payload, UTF_8) == want2, "magic-in-payload must not split the record")
    assert(r2.content_length == want2.getBytes(UTF_8).length.toLong)
    assert(new String(byId("urn:graft:doc:3").payload, UTF_8) == "")
    assert(new String(byId("urn:graft:doc:4").payload, UTF_8) == "unicode é中文 payload")
    assert(new String(byId("urn:graft:doc:5").payload, UTF_8) == "trailing crlf mimic\r\n\r\n")
  }

  test("gzip-member round-trip is bit-identical to the raw path") {
    val raw = roundTrip(gz = false)
    val gz = roundTrip(gz = true)
    assert(raw.length == gz.length)
    raw.zip(gz).foreach { case (a, b) =>
      assert(a.record_id == b.record_id)
      assert(a.target_uri == b.target_uri)
      assert(a.content_length == b.content_length)
      assert(java.util.Arrays.equals(a.payload, b.payload))
    }
  }

  test("blobs are deterministic across partition layouts") {
    def blobBytes(parts: Int): Map[Long, Seq[Byte]] = {
      val d = docs.repartition(parts)
      val rec = Warc.recordBytes(
        concat(lit("urn:graft:doc:"), $"doc_id"),
        concat(lit("https://"), $"source", lit(".example/"), $"doc_id"),
        $"text")
      val gz = Warc.gzipRecords(d, pmod($"doc_id", lit(2)), $"doc_id", rec)
      Warc.buildBlobs(gz, col("blob_id"), col("ord"), col("rec"))
        .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("blob").toSeq).toMap
    }
    assert(blobBytes(1) == blobBytes(5))
  }

  test("rec_offset walks the inflated stream in record order") {
    val out = roundTrip(gz = true)
    out.groupBy(_.blob_id).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.rec_offset)
      assert(sorted.map(_.rec_offset).distinct.length == sorted.length)
      assert(sorted.head.rec_offset == 0L)
    }
  }

  test("overrunning Content-Length fails loudly, not silently") {
    val hdr = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:x:1>\r\nContent-Length: 999\r\n\r\nshort").getBytes(UTF_8)
    val e = intercept[Exception] { Warc.parseBlob(0L, hdr).toList }
    assert(e.getMessage.contains("overruns"))
  }

  test("gunzip of concatenated members recovers the concatenated stream") {
    val a = "first member".getBytes(UTF_8)
    val b = "second member".getBytes(UTF_8)
    val cat = Warc.gzipMember(a) ++ Warc.gzipMember(b)
    assert(new String(Warc.gunzipAll(cat), UTF_8) == "first membersecond member")
  }
}
