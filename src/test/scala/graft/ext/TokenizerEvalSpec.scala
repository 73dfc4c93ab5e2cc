package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TokenizerEvalSpec extends SparkTestBase {

  import spark.implicits._

  test("fertility: per-group sums, codepoint fallback, ratio edges") {
    val docs = Seq(
      ("a", "ab ab xyz"),   // ab→1, ab→1, xyz off-table → 3
      ("a", "ab"),          // 1
      ("b", ""),            // one empty token: 0 pieces, 0 chars
      ("c", "zz zz")).toDF("source", "text")
    val table = Seq(("ab", 1), ("zz", 2)).toDF("word", "n_pieces")
    val out = TokenizerEval.fertility(docs, $"source", $"text", table)
      .orderBy($"grp").collect()
    // group a: 4 words, pieces 1+1+3+1 = 6, 1 fallback, chars 2+2+3+2 = 9
    assert(out(0).getLong(1) == 4L && out(0).getLong(2) == 6L &&
      out(0).getLong(3) == 1L && out(0).getLong(4) == 9L)
    assert(math.abs(out(0).getDouble(5) - 1.5) < 1e-15)      // fertility
    assert(math.abs(out(0).getDouble(6) - 9.0 / 6.0) < 1e-15) // chars/piece
    // group b: the empty token falls back at length 0 → n_pieces 0 →
    // chars_per_piece NULL, fertility 0/1 = 0
    assert(out(1).getLong(1) == 1L && out(1).getLong(2) == 0L)
    assert(out(1).getDouble(5) == 0.0 && out(1).isNullAt(6))
    // group c: on-table multi-piece words, zero fallback
    assert(out(2).getLong(2) == 4L && out(2).getLong(3) == 0L)
  }

  test("measured: unigram vocab beats character fallback fertility on the corpus it trained on") {
    val docs = Tables()
    val vocab = UnigramLm.train(docs, $"text", maxWordLen = 3, iters = 2)
    val universe = UnigramLm.wordCounts(docs, $"text", 3)
      .select($"word").as[String].collect().toSeq
    val table = UnigramLm.encodeTable(universe, vocab.toMap, 3)
      .toDF("word", "n_pieces")
    val withVocab = TokenizerEval.fertility(
      docs.withColumn("g", lit("all")), $"g", $"text", table)
      .select($"fertility").as[Double].head()
    val charOnly = TokenizerEval.fertility(
      docs.withColumn("g", lit("all")), $"g", $"text",
      table.limit(0))
      .select($"fertility").as[Double].head()
    info(f"fertility: unigram=$withVocab%.3f chars-only=$charOnly%.3f")
    assert(withVocab < charOnly,
      s"vocab must compress below the char baseline: $withVocab vs $charOnly")
  }

  private def Tables() =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
}
