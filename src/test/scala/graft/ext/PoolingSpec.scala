package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Chunk→document embedding pooling and unit normalization. */
class PoolingSpec extends SparkTestBase {
  import spark.implicits._

  test("meanPool is the element-wise mean, partition-invariant") {
    val chunks = Seq(
      (10L, Array(1.0f, 2.0f, 3.0f)),
      (10L, Array(3.0f, 2.0f, 1.0f)),
      (20L, Array(4.0f, 0.0f, 8.0f))).toDF("doc_id", "emb")
    def pooled(df: org.apache.spark.sql.DataFrame) =
      EmbeddingSearch.meanPool(df, col("doc_id"), col("emb"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
        .sortBy(_._1).toSeq
    val p = pooled(chunks)
    assert(p == Seq((10L, Seq(2.0, 2.0, 2.0)), (20L, Seq(4.0, 0.0, 8.0))))
    assert(p == pooled(chunks.repartition(7)))
  }

  test("l2Normalized yields unit vectors; the zero vector passes through") {
    val v = Seq(
      (1L, Array(3.0, 4.0)),
      (2L, Array(0.0, 0.0))).toDF("id", "v")
      .select($"id", EmbeddingSearch.l2Normalized($"v").as("n"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toMap
    assert(v(1L) == Seq(0.6, 0.8))
    assert(v(2L) == Seq(0.0, 0.0))
  }

  test("pooled-then-normalized doc vectors feed cosine search end to end") {
    val chunks = Seq(
      (1L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),   // doc 1 → (1,0)
      (2L, Array(0.0f, 2.0f)), (2L, Array(0.0f, 4.0f)),   // doc 2 → (0,3)
      (3L, Array(1.0f, 1.0f))).toDF("doc_id", "emb")
    val docs = EmbeddingSearch.meanPool(chunks, col("doc_id"), col("emb"))
      .select($"group_id".as("doc_id"),
        transform(EmbeddingSearch.l2Normalized($"pooled"),
          x => x.cast("float")).as("embedding"))
    val q = Seq((100L, Array(0.9f, 0.1f))).toDF("qid", "embedding")
    val top = EmbeddingSearch.bruteForceTopK(docs, "doc_id", "embedding",
      q, "qid", "embedding", k = 1)
    assert(top.select($"neighbor_id").as[Long].collect().toSeq == Seq(1L))
  }
}
