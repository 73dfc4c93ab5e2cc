package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level BPE — the GPT-2-family encoding discipline (Radford et
  * al. 2019; Sennrich et al. 2016 merges over a 256-symbol byte
  * alphabet) that [[Bpe]]'s char-level face lacks: `Bpe`'s
  * pre-tokenizer is `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]`, so every
  * non-ASCII codepoint is a singleton symbol with unbounded fertility
  * on multilingual text, and OOV-freeness is not guaranteed below the
  * codepoint level. Here the base alphabet is the 256 UTF-8 BYTE
  * values: any string whatsoever — any script, emoji, mojibake —
  * decomposes into base symbols that are always in-vocabulary, and
  * merges rebuild multibyte codepoints (and then words) from their
  * byte sequences.
  *
  * Representation: each byte value b is mapped to the printable
  * placeholder codepoint U+0100 + b, so a "symbol" is an ordinary
  * String and the ENTIRE char-level machinery — [[MergeTable]]'s
  * rank-order exhaustive merge loop, [[graft.ext.BpeTrain]]'s
  * driver-side trainer — applies unchanged over byte symbols. (GPT-2
  * ships the same trick with a scattered byte↔char table; any fixed
  * bijection works, and a contiguous one keeps the SQL oracle's
  * mapping table a one-liner: chr(256 + byte). The mapped range
  * U+0100–U+01FF is Latin Extended — printable, quote-free, SQL-safe.)
  *
  * The pre-tokenizer is the Unicode generalization of the char face's
  * pattern — `\p{L}+|\p{N}+|[^\p{L}\p{N}\s]` — valid in both
  * java.util.regex and RE2, so the DuckDB oracle tokenizes
  * identically (gate q201 hash-matches token counts on a planted
  * Greek/Cyrillic/CJK fixture; the oracle rebuilds the byte symbols
  * via hex(encode(w)) and mirrors the merge loop as a recursive CTE).
  *
  * Scale shape: identical to [[Bpe]] — a narrow per-row codegen'd
  * expression, no shuffle, no state; Zipf word cache; corpus scale
  * only ever touches the one distributed pre-token count in training.
  */
object ByteBpeUtil {

  /** Unicode pre-tokenizer — same shape as [[BpeUtil.PreTokenPattern]]
    * with the ASCII classes widened to Unicode ones (java ∩ RE2).
    * The whitespace class is spelled out EXPLICITLY instead of `\s`
    * (ADVICE r13): Java's `\s` is `[ \t\n\x0B\f\r]` while RE2's Perl
    * `\s` is `[\t\n\f\r ]` — a corpus containing U+000B (vertical
    * tab) would tokenize it as a punctuation token in DuckDB but as
    * whitespace in Spark, desyncing q201's token counts. The literal
    * class below means the same thing in both engines.
    */
  val PreTokenPattern: String = "\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\t\\n\\x0B\\f\\r ]"

  /** Placeholder codepoint for byte value `b`: U+0100 + b. */
  def byteChar(b: Int): Char = (0x100 + (b & 0xFF)).toChar

  /** Map a word to its byte-symbol string: UTF-8 bytes, each as its
    * placeholder char. Bijective — |mapped| = octet_length(word).
    */
  def mapWord(word: String): String = {
    val bytes = word.getBytes(StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      sb.append(byteChar(bytes(i) & 0xFF))
      i += 1
    }
    sb.toString
  }

  /** Inverse of [[mapWord]] (debug / round-trip tests). */
  def unmapSymbol(sym: String): Array[Byte] =
    sym.toCharArray.map(c => ((c - 0x100) & 0xFF).toByte)

  private def mapAscii(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    s.foreach(c => sb.append(byteChar(c.toInt)))
    sb.toString
  }

  /** The checked-in byte-level merge table (the [[BpeUtil.merges]]
    * counterpart): rank-ordered merges that rebuild the multibyte
    * codepoints of the planted multilingual ranges from their UTF-8
    * bytes — Greek α–ω (2-byte), Cyrillic а–я (2-byte), the first 33
    * CJK ideographs U+4E00–U+4E20 (3-byte: lead pair first, then
    * composite + tail) — plus a small English tier in byte space.
    * Composite operands appear strictly after the rule that creates
    * them (the invariant [[MergeTable]]'s rank-order equivalence
    * needs; ByteBpeSpec asserts it). A production swap-in is a table
    * learned by [[graft.ext.BpeTrain.learnMergesBytes]] — same
    * algorithm, same representation.
    */
  val merges: IndexedSeq[(String, String)] = {
    val out = IndexedSeq.newBuilder[(String, String)]
    val seen = scala.collection.mutable.LinkedHashSet.empty[(String, String)]
    def utf8Syms(cp: Int): Array[String] =
      new String(Character.toChars(cp)).getBytes(StandardCharsets.UTF_8)
        .map(b => byteChar(b & 0xFF).toString)
    // tier 1: 2-byte scripts — one merge per codepoint (lead, tail)
    ((0x3B1 to 0x3C9) ++ (0x430 to 0x44F)).foreach { cp =>
      val s = utf8Syms(cp)
      seen.add((s(0), s(1)))
    }
    // tier 2: 3-byte CJK — shared lead pairs first...
    val cjk = (0x4E00 to 0x4E20).map(utf8Syms)
    cjk.foreach(s => seen.add((s(0), s(1))))
    // ...then composite + tail byte
    cjk.foreach(s => seen.add((s(0) + s(1), s(2))))
    // tier 3: English in byte space (ASCII bytes map 1:1 to symbols)
    Seq(("t", "h"), ("th", "e"), ("i", "n"), ("in", "g"), ("a", "n"),
      ("an", "d"), ("e", "r"), ("o", "n"), ("r", "e"), ("e", "s"))
      .foreach { case (a, b) => seen.add((mapAscii(a), mapAscii(b))) }
    out ++= seen
    out.result()
  }

  /** The builtin byte-level table as a [[MergeTable]]. */
  val Builtin: MergeTable = MergeTable(merges)

  // JVM-wide (word, builtin-count) cache — the Zipf-reuse pattern of
  // MergeTable.countCache, here for the byte-level path. Bounded.
  private val countCache =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  @transient private lazy val preToken =
    java.util.regex.Pattern.compile(PreTokenPattern)

  private def count(table: MergeTable, word: String, cache: Boolean): Int = {
    if (cache) {
      val hit = countCache.get(word)
      if (hit != null) return hit.intValue()
    }
    val n = table.encodeWord(mapWord(word)).length
    if (cache) {
      if (countCache.size() > (1 << 20)) countCache.clear()
      countCache.put(word, Integer.valueOf(n))
    }
    n
  }

  /** Byte-level BPE token count of a whole text under `table`:
    * Unicode pre-tokenize, map each pre-token to byte symbols, run
    * the rank-order merge loop. Static entry point for codegen.
    */
  def countTokens(table: MergeTable, s: UTF8String): Long = {
    val cache = table eq Builtin // cache only the shared builtin table
    val m = preToken.matcher(s.toString)
    var n = 0L
    while (m.find()) n += count(table, m.group(), cache)
    n
  }
}

/** Byte-level BPE token count — LONG, codegen'd; the table rides as a
  * referenced object exactly like [[BpeCountTable]].
  */
case class ByteBpeCount(child: Expression, table: MergeTable) extends BpeBase {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    ByteBpeUtil.countTokens(table, input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteBpeTable", table, classOf[MergeTable].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ByteBpeUtil.countTokens($ref, $c);")
  }
  override protected def withNewChildInternal(newChild: Expression): ByteBpeCount =
    copy(child = newChild)
}

/** Column-level API. */
object ByteBpe {
  /** Token count under the builtin byte-level table. */
  def count(c: Column): Column =
    GraftBridge.column(ByteBpeCount(GraftBridge.expression(c), ByteBpeUtil.Builtin))
  /** Token count under a learned byte-level table
    * ([[graft.ext.BpeTrain.learnMergesBytes]]).
    */
  def count(c: Column, table: MergeTable): Column =
    GraftBridge.column(ByteBpeCount(GraftBridge.expression(c), table))
}
