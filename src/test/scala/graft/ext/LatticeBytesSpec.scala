package graft.ext

import graft.SparkTestBase
import graft.functions.ByteBpeUtil
import org.apache.spark.sql.functions._

/** The multilingual (byte-symbol) lattice trainer: representation
  * round-trip, isomorphism with the char-level lattice face on a
  * pure-[a-z] corpus (the byte lift must change the REPRESENTATION,
  * not the arithmetic), multibyte pieces actually learned from
  * non-Latin text, the serve side's zero-fallback claim on
  * multilingual words (the reason the face exists — the char face
  * falls back on 100% of them), and guards.
  */
class LatticeBytesSpec extends SparkTestBase {

  import spark.implicits._

  // planted multilingual corpus: Greek/Cyrillic/CJK words repeated
  // enough that pieces survive the 2^10-grid renormalization, plus
  // ASCII filler
  private val ml = Seq(
    "the cat sat αβγ mat",
    "αβγ is common here the",
    "а вот кириллица да αβγ",
    "一二 the cat 一二 да",
    "да да αβγ 一二 cat"
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("mapWord round-trips and symbol length = octet count") {
    Seq("the", "αβγ", "да", "一二", "naïve", "x") .foreach { w =>
      val sym = ByteBpeUtil.mapWord(w)
      assert(sym.length == w.getBytes("UTF-8").length)
      assert(new String(ByteBpeUtil.unmapSymbol(sym), "UTF-8") == w)
    }
  }

  test("pure-[a-z] corpus: byte face ≡ char face up to the symbol bijection") {
    val ascii = Seq((1L, "the cat sat"), (2L, "cat cat mat the"),
      (3L, "sat the mat")).toDF("doc_id", "text")
    val charFace = UnigramLm.trainLattice(ascii, $"text",
      maxWordLen = 8, maxPieceLen = 8, iters = 2)
    val byteFace = UnigramLm.trainLatticeBytes(ascii, $"text",
      maxWordBytes = 8, maxPieceLen = 8, iters = 2)
    // ASCII bytes map 1:1 to symbols, so the fits must be identical
    // after unmapping — same pieces, same exact-integer weights
    val unmapped = byteFace.map { case (sym, w) =>
      (new String(ByteBpeUtil.unmapSymbol(sym), "UTF-8"), w)
    }.sortBy(_._1)
    assert(unmapped == charFace)
  }

  test("non-Latin pieces are learned: whole multibyte words appear in the vocabulary") {
    val df = ml.toDF("doc_id", "text")
    val vocab = UnigramLm.trainLatticeBytes(df, $"text",
      maxWordBytes = 8, maxPieceLen = 8, iters = 2)
    val pieces = vocab.map { case (sym, w) =>
      (new String(ByteBpeUtil.unmapSymbol(sym), "UTF-8"), w)
    }.toMap
    // the planted words themselves (6, 4, 6 bytes) must carry weight —
    // the char-level face cannot represent ANY of them
    Seq("αβγ", "да", "一二").foreach { w =>
      assert(pieces.getOrElse(w, 0L) > 0L, s"expected piece for '$w' in $pieces")
    }
    // and their UTF-8 prefixes are in the candidate inventory too
    assert(pieces.contains("α") || pieces.keys.exists(_.startsWith("α")))
  }

  test("serve side: zero fallback on multilingual words; >maxWordBytes words fall back") {
    val df = ml.toDF("doc_id", "text")
    val vocab = UnigramLm.trainLatticeBytes(df, $"text",
      maxWordBytes = 8, maxPieceLen = 8, iters = 2)
    val universe = UnigramLm.wordCountsBytes(df, $"text", 8)
      .select($"word").as[String].collect().toSeq.sorted
    assert(universe.contains("αβγ") && universe.contains("一二"))
    val table = UnigramLm.encodeTableLatticeBytes(universe, vocab.toMap, 8)
    val np = table.toMap
    // every multilingual word serves with >= 1 piece, never more than
    // its byte count (the codepoint-fallback analogue)
    Seq("αβγ", "да", "一二").foreach { w =>
      assert(np.contains(w), s"'$w' missing from serve table")
      assert(np(w) >= 1 && np(w) <= w.getBytes("UTF-8").length)
    }
    // TokenizerEval row: the ONLY fallback on this corpus is
    // "кириллица" (18 bytes > the 8-byte training bound) — every
    // in-bound multilingual word serves
    val tdf = table.toDF("word", "n_pieces")
    val row = TokenizerEval.fertility(df.toDF("doc_id", "text"),
        lit("all"), $"text", tdf).collect().head
    assert(row.getAs[Long]("n_fallback") == 1L)
    val withLong = (ml :+ (99L, "кириллическое слово")).toDF("doc_id", "text")
    val row2 = TokenizerEval.fertility(withLong, lit("all"), $"text", tdf)
      .collect().head
    // "кириллическое" (26 bytes) and "слово" (10 bytes) also exceed
    // the bound → exactly 2 more fallbacks
    assert(row2.getAs[Long]("n_fallback") == 3L)
  }

  test("guards raise") {
    val df = ml.toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      UnigramLm.trainLatticeBytes(df, $"text", maxWordBytes = 0)
    }
    intercept[IllegalArgumentException] {
      UnigramLm.trainLatticeBytes(df, $"text", maxWordBytes = 17)
    }
    intercept[IllegalArgumentException] {
      UnigramLm.trainLatticeBytes(df, $"text", maxWordBytes = 4, maxPieceLen = 5)
    }
    intercept[IllegalArgumentException] {
      UnigramLm.trainLatticeBytes(df, $"text", iters = -1)
    }
  }
}
