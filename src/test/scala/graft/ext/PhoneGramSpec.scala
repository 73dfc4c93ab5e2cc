package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Phone redaction edge cases, edit-distance confirm semantics, and
  * the Gram matrix's exactness/symmetry invariants.
  */
class PhoneGramSpec extends SparkTestBase {
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(TextAnalysis.redactPhones($"t")).as[String].head()

  test("phone formats redact: parens, dots, dashes, +CC; non-phones survive") {
    assert(redact("call (415) 555-0123 now") == "call <PHONE> now")
    assert(redact("dial 415.555.0123 please") == "dial <PHONE> please")
    assert(redact("+1 212-555-9876 works") == "<PHONE> works")
    assert(redact("order 12345678901 shipped") == "order 12345678901 shipped")
    assert(redact("local 555-0123 stays") == "local 555-0123 stays")
    assert(redact("ip 1.2.3.4 stays") == "ip 1.2.3.4 stays")
  }

  test("back-to-back phones are a two-pass fixed point") {
    val once = redact("415.555.0123 415.555.0124")
    assert(once == "<PHONE> <PHONE>", once)
    // a third pass changes nothing
    assert(Seq(once).toDF("t")
      .select(TextAnalysis.redactPhones($"t")).as[String].head() == once)
  }

  test("phone at string end and start both match (captured boundaries)") {
    assert(redact("650 555 0199") == "<PHONE>")
    assert(redact("reach me: 650 555 0199") == "reach me: <PHONE>")
  }

  test("confirmPairsEdit keeps close pairs, drops distant ones, passes evidence through") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "entirely different content that matches nothing here")
    ).toDF("id", "body")
    val cands = Seq((1L, 2L, 7L), (1L, 3L, 4L)).toDF("id1", "id2", "shared")
    val out = TextAnalysis.confirmPairsEdit(docs, col("id"), col("body"),
        cands, maxDist = 5)
      .select("id1", "id2", "shared", "dist").as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 2L, 7L, 3L)))
  }

  test("gram matrix is exact on grid-aligned vectors and symmetric by construction") {
    // vectors already on the 2^-6 grid: snap is identity, sums are exact
    val vecs = Seq(
      Array(0.5f, -0.25f, 1.0f),
      Array(0.125f, 0.5f, -0.5f),
      Array(1.0f, 0.0f, 0.25f)
    ).map(Tuple1(_)).toDF("v")
    val g = EmbeddingSearch.gramMatrix(vecs, col("v"))
      .orderBy("i", "j").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDecimal(2).doubleValue())).toMap
    // hand-computed upper triangle
    assert(g((0, 0)) == 0.5 * 0.5 + 0.125 * 0.125 + 1.0 * 1.0)
    assert(g((0, 1)) == 0.5 * -0.25 + 0.125 * 0.5 + 0.0)
    assert(g((1, 2)) == -0.25 * 1.0 + 0.5 * -0.5 + 0.0)
    assert(g((2, 2)) == 1.0 + 0.25 + 0.0625)
    assert(g.size == 6) // 3 dims → 6 upper-triangle cells
  }

  test("powerIteration2 computes exact integer mat-vec steps on a known matrix") {
    // G (scaled by 2^12 = 4096) for vectors on the grid:
    //   [1, 0] and [0.5, 0.5] → G = [[1.25, 0.25], [0.25, 0.25]]
    val vecs = Seq(Array(1.0f, 0.0f), Array(0.5f, 0.5f))
      .map(Tuple1(_)).toDF("v")
    val gram = EmbeddingSearch.gramMatrix(vecs, col("v"))
    val out = EmbeddingSearch.powerIteration2(gram)
      .orderBy("dim").as[(Int, Long, Long)].collect().toSeq
    // scaled G = [[5120, 1024], [1024, 1024]]
    // v1 = G·1  = (6144, 2048)
    // v2 = G·v1 = (5120*6144 + 1024*2048, 1024*6144 + 1024*2048)
    assert(out == Seq(
      (0, 6144L, 5120L * 6144L + 1024L * 2048L),
      (1, 2048L, 1024L * 6144L + 1024L * 2048L)))
  }

  test("powerIteration2's v2 direction converges toward the dominant eigenvector") {
    // strongly anisotropic: many copies along e0, one along e1
    val vecs = (Seq.fill(20)(Array(1.0f, 0.0f)) :+ Array(0.0f, 0.5f))
      .map(Tuple1(_)).toDF("v")
    val gram = EmbeddingSearch.gramMatrix(vecs, col("v"))
    val v2 = EmbeddingSearch.powerIteration2(gram)
      .orderBy("dim").as[(Int, Long, Long)].collect().map(_._3)
    assert(math.abs(v2(0)) > 10L * math.abs(v2(1)))
  }

  test("gram matrix snaps off-grid values downward to the dyadic grid") {
    val vecs = Seq(Array(0.51f, -0.24f)).map(Tuple1(_)).toDF("v")
    val g = EmbeddingSearch.gramMatrix(vecs, col("v"), gridBits = 6)
      .orderBy("i", "j").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDecimal(2).doubleValue())).toMap
    // floor(0.51*64)/64 = 32/64 = 0.5 ; floor(-0.24*64)/64 = -16/64 = -0.25
    assert(g((0, 0)) == 0.25)
    assert(g((0, 1)) == -0.125)
    assert(g((1, 1)) == 0.0625)
  }
}
