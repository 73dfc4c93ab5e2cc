package graft.functions

import graft.SparkTestBase
import graft.ext.{BpeTrain, TokenizerEval}
import org.apache.spark.sql.functions._

class ByteBpeSpec extends SparkTestBase {

  import spark.implicits._

  private def sym(b: Int): String = ByteBpeUtil.byteChar(b).toString

  test("mapWord: UTF-8 byte symbols, bijective, any input") {
    assert(ByteBpeUtil.mapWord("a") == sym(0x61))
    assert(ByteBpeUtil.mapWord("é") == sym(0xC3) + sym(0xA9))
    assert(ByteBpeUtil.mapWord("α") == sym(0xCE) + sym(0xB1))
    assert(ByteBpeUtil.mapWord("一") == sym(0xE4) + sym(0xB8) + sym(0x80))
    // astral plane: 4 bytes, no exception — the OOV-freeness base case
    assert(ByteBpeUtil.mapWord("😀").length == 4)
    // round trip
    val w = "aé一😀"
    assert(new String(ByteBpeUtil.unmapSymbol(ByteBpeUtil.mapWord(w)), "UTF-8") == w)
  }

  test("builtin table: composite operands appear strictly after their creator") {
    val created = scala.collection.mutable.HashSet.empty[String]
    ByteBpeUtil.merges.foreach { case (a, b) =>
      assert(a.length == 1 || created.contains(a), s"operand '$a' used before creation")
      assert(b.length == 1 || created.contains(b), s"operand '$b' used before creation")
      created += (a + b)
    }
    assert(ByteBpeUtil.merges.distinct.size == ByteBpeUtil.merges.size)
  }

  test("builtin encode: multibyte codepoints rebuild; untouched scripts fall back to bytes, never OOV") {
    def n(s: String): Long =
      ByteBpeUtil.countTokens(ByteBpeUtil.Builtin,
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
    assert(n("αβγ") == 3)          // 6 bytes -> 3 merged codepoint symbols
    assert(n("чаща") == 4)          // cyrillic 2-byte chars, one symbol each
    assert(n("一丁") == 2)          // 3-byte CJK: lead pair + tail merges
    assert(n("the ring") == 3)      // th+e -> the; r + in+g -> r|ing
    assert(n("한") == 3)            // hangul: outside the table -> 3 raw bytes
    assert(n("😀") == 4)  // emoji pre-token -> 4 raw bytes
    assert(n("") == 0)
    // mixed sentence: whitespace never tokenized, everything else is
    assert(n("the αβγ 一") == 1 + 3 + 1)
  }

  test("ByteBpeCount column == driver-side computation; null-safe") {
    val df = Seq((1L, "the αβγ ring"), (2L, "一丁 то"), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val got = df.select($"id", ByteBpe.count($"text").as("n"))
      .orderBy($"id").collect()
    assert(got(0).getLong(1) == 1 + 3 + 2)
    assert(got(1).getLong(1) == 2 + 2)
    assert(got(2).isNullAt(1))
  }

  test("learnMergesBytes: first merges rebuild the frequent script's byte pairs; learned table serves") {
    val docs = Seq.tabulate(40)(i => (i.toLong, "αα αα αα ββ"))
      .toDF("doc_id", "text")
    val table = BpeTrain.learnMergesBytes(docs, $"text", numMerges = 4)
    // α = 0xCE 0xB1 dominates the pair counts
    assert(table.merges.head == (sym(0xCE), sym(0xB1)))
    // within 4 merges the trainer reaches whole-word symbols
    def n(s: String): Long =
      ByteBpeUtil.countTokens(table,
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
    assert(n("αα") == 1)
    // distributed serve with the learned table
    val served = docs.limit(1)
      .select(ByteBpe.count($"text", table).as("n")).head().getLong(0)
    assert(served == 3 * 1 + n("ββ"))
  }

  test("measured: bounded fertility on non-Latin text (tokens ~ chars, not bytes)") {
    val docs = Seq.tabulate(60)(i =>
      (i.toLong, "αβγδ εζη αβγδ θικλ εζη αβγδ")).toDF("doc_id", "text")
    val table = BpeTrain.learnMergesBytes(docs, $"text", numMerges = 48)
    val universe = docs
      .select(explode(regexp_extract_all($"text",
        lit(ByteBpeUtil.PreTokenPattern), lit(0))).as("word"))
      .distinct().as[String].collect().toSeq
    val np = universe.map(w =>
      (w, table.encodeWord(ByteBpeUtil.mapWord(w)).length))
      .toDF("word", "n_pieces")
    val row = TokenizerEval.fertility(
        docs.withColumn("g", lit("all")), $"g", $"text", np)
      .select($"n_fallback", $"fertility", $"n_words").head()
    val bytesPerWord = 2.0 * 11 / 3 // each word's byte count = 2 x chars
    info(f"byte-bpe fertility=${row.getDouble(1)}%.3f raw-bytes=$bytesPerWord%.3f")
    assert(row.getLong(0) == 0L)
    // bounded: at most ~1 token per word once merges rebuild the words,
    // far below the ~7.3 bytes/word raw-byte baseline
    assert(row.getDouble(1) <= 1.5,
      s"fertility must be bounded on non-Latin text, got ${row.getDouble(1)}")
  }
}
