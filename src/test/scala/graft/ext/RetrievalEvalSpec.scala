package graft.ext

import graft.SparkTestBase

/** Hand-computed metric values and the degenerate cases. */
class RetrievalEvalSpec extends SparkTestBase {
  import spark.implicits._

  private val results = Seq(
    (1L, 1L, 100L), (1L, 2L, 101L), (1L, 3L, 102L),
    (2L, 1L, 200L)).toDF("query_id", "rank", "doc_id")
  private val qrels = Seq(
    (1L, 100L, 3L), (1L, 102L, 1L), (1L, 103L, 2L),
    (2L, 201L, 1L),
    (3L, 100L, 2L),
    (4L, 100L, 0L), (4L, 101L, 2L)).toDF("query_id", "doc_id", "rel")

  test("recall, MRR, and nDCG match hand computation; zero-score degenerate cases") {
    val m = RetrievalEval.evaluate(results, qrels, k = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(7))).toMap
    val d = RetrievalEval.discounts(5)
    // q1: hits {100@1 rel3, 102@3 rel1} of 3 relevant
    val dcg1 = 3.0 * d(0) + 1.0 * d(2)
    val idcg1 = 3.0 * d(0) + 2.0 * d(1) + 1.0 * d(2)
    assert(m(1L)._1 == 3L && m(1L)._2 == 2L)
    assert(math.abs(m(1L)._3 - 2.0 / 3.0) < 1e-12)
    assert(m(1L)._4 == 1.0)
    assert(math.abs(m(1L)._5 - dcg1 / idcg1) < 1e-9)
    // q2: ranked but nothing relevant retrieved
    assert(m(2L) == ((1L, 0L, 0.0, 0.0, 0.0)))
    // q3: relevant exists, ranker returned nothing
    assert(m(3L) == ((1L, 0L, 0.0, 0.0, 0.0)))
    // q4: rel<=0 judged-irrelevant rows are ignored in n_rel
    assert(m(4L)._1 == 1L)
  }

  test("a perfect ranking scores nDCG exactly 1.0 (same grid both sides)") {
    val perfect = Seq((9L, 1L, 1L), (9L, 2L, 2L), (9L, 3L, 3L))
      .toDF("query_id", "rank", "doc_id")
    val qr = Seq((9L, 1L, 3L), (9L, 2L, 2L), (9L, 3L, 1L))
      .toDF("query_id", "doc_id", "rel")
    val r = RetrievalEval.evaluate(perfect, qr, k = 3).collect()(0)
    assert(r.getDouble(7) == 1.0 && r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0)
  }
}
