package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** LEB128 varint codec: round trips, byte-size claims, loud failures. */
class VarintSpec extends SparkTestBase {
  import spark.implicits._

  private def roundTrip(vals: Seq[Long], delta: Boolean): (Seq[Long], Int) = {
    val df = Seq(Tuple1(vals.toArray)).toDF("v")
    val enc = if (delta) Varint.encodeDeltas($"v") else Varint.encodePlain($"v")
    val dec = if (delta) Varint.decodeDeltas(col("b")) else Varint.decodePlain(col("b"))
    val r = df.select(enc.as("b")).select(dec.as("d"), length(col("b")).as("n"))
      .collect()(0)
    (r.getSeq[Long](0).toSeq, r.getInt(1))
  }

  test("delta mode round-trips sorted lists and gap-compresses them") {
    val ids = Seq(5L, 6L, 9L, 1000L, 1001L, 1002L, 130L + 1002L)
    val (back, bytes) = roundTrip(ids, delta = true)
    assert(back == ids)
    // gaps: 5,1,3,991,1,1,130 → five 1-byte + two 2-byte = 9 bytes vs 56 raw
    assert(bytes == 9, s"$bytes bytes")
  }

  test("plain mode round-trips unsorted values; empty array round-trips empty") {
    val tfs = Seq(3L, 1L, 127L, 128L, 1L, 300L)
    val (back, bytes) = roundTrip(tfs, delta = false)
    assert(back == tfs)
    assert(bytes == 8, s"$bytes bytes") // 127 is the 1-byte boundary
    assert(roundTrip(Nil, delta = true) == ((Nil, 0)))
  }

  test("large values round-trip at every 7-bit boundary") {
    val vals = (0 to 8).map(k => (1L << (7 * k)) - 1) ++
      (0 to 8).map(k => 1L << (7 * k)) :+ Long.MaxValue
    val sorted = vals.sorted
    assert(roundTrip(sorted, delta = true)._1 == sorted)
    assert(roundTrip(vals, delta = false)._1 == vals.toSeq)
  }

  test("delta mode throws loudly on unsorted input; negatives always throw") {
    val e1 = intercept[Exception] { roundTrip(Seq(5L, 3L), delta = true) }
    assert(e1.getMessage.contains("non-decreasing") ||
      e1.getCause.getMessage.contains("non-decreasing"))
    val e2 = intercept[Exception] { roundTrip(Seq(-1L), delta = false) }
    assert(e2.getMessage.contains("negative") ||
      e2.getCause.getMessage.contains("negative"))
  }
}
