package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer with a real merge table — the unit a
  * training pipeline's budgets are actually denominated in.
  *
  * `TextAnalysis.subwordCount` (the GPT-2-family PRE-tokenizer) stays
  * as the fast estimator; this module runs the second BPE stage on top
  * of it: each pre-token is split to code-point symbols and the merge
  * table is applied in rank order, exactly the published BPE inference
  * algorithm (Sennrich et al. 2016; GPT-2's encoder). The merge table
  * here is a compact checked-in char-level table of common English /
  * digit / punctuation merges (a production swap-in is the model's own
  * merges.txt — same algorithm, longer table; nothing else changes).
  *
  * Algorithm note: the canonical formulation repeatedly merges the
  * LOWEST-RANK adjacent pair. Applying each rule EXHAUSTIVELY in rank
  * order is equivalent: merging pair (a,b) can only create new
  * adjacent pairs that involve the merged symbol `ab`, and any rule
  * with `ab` as an operand ranks AFTER the rule that created `ab`
  * (in a trained table the symbol did not exist earlier) — so no
  * occurrence of an earlier rule can ever be (re)created by a later
  * one. One left-to-right non-overlapping merge pass per rule is that
  * exhaustive application (a rule cannot re-create its own pair
  * either: `ab` differs from both `a` and `b`). BpeSpec pins the
  * equivalence against a brute-force min-rank reference on real
  * corpus text.
  *
  * Scale shape: a narrow per-row expression (no shuffle, no state) in
  * whole-stage codegen via a static call, with a JVM-wide word→count
  * cache (Zipf reuse makes the cache hit rate ~1 for natural text).
  * For corpus-scale encoding the distinct-word trick applies on top:
  * encode each DISTINCT pre-token once, join counts back — that is
  * exactly how the DuckDB oracle mirrors this expression (recursive
  * CTE over distinct words, one merge per step), see
  * [[Bpe.mergesSqlValues]].
  */
object BpeUtil {

  /** Ordered merge rules; rank = position. Composite operands always
    * appear after the rule that creates them (the trained-table
    * invariant the rank-order equivalence needs).
    */
  val merges: IndexedSeq[(String, String)] = IndexedSeq(
    // tier 1: char + char
    ("t", "h"), ("i", "n"), ("e", "r"), ("a", "n"), ("o", "n"),
    ("r", "e"), ("e", "n"), ("a", "t"), ("o", "r"), ("e", "s"),
    ("s", "t"), ("a", "r"), ("o", "u"), ("i", "t"), ("i", "s"),
    ("e", "d"), ("n", "d"), ("a", "l"), ("n", "g"), ("n", "t"),
    ("h", "e"), ("l", "e"), ("s", "e"), ("t", "o"), ("o", "f"),
    ("l", "l"), ("s", "s"), ("e", "e"), ("o", "o"), ("t", "i"),
    ("c", "h"), ("s", "h"), ("w", "h"), ("l", "y"), ("a", "s"),
    ("i", "c"), ("e", "l"), ("u", "r"), ("r", "o"), ("o", "m"),
    ("i", "l"), ("l", "d"), ("u", "s"), ("m", "a"), ("c", "e"),
    ("0", "0"), ("1", "9"), ("2", "0"),
    ("T", "h"), ("I", "n"), ("W", "h"), ("S", "t"),
    // tier 2+: composites (every operand created above, or a raw char)
    ("th", "e"),   // the
    ("in", "g"),   // ing
    ("an", "d"),   // and
    ("er", "s"),   // ers
    ("en", "t"),   // ent
    ("ti", "on"),  // tion
    ("a", "tion"), // ation
    ("al", "ly"),  // ally
    ("ou", "ld"),  // ould
    ("w", "ould"), // would
    ("c", "ould"), // could
    ("sh", "ould"), // should
    ("Th", "e"),   // The
    ("ic", "h"),   // ich
    ("wh", "ich"), // which (operand ich created by the rule above)
    ("th", "at"),  // that
    ("th", "is"),  // this
    ("it", "h"),   // ith
    ("w", "ith"),  // with (operand ith created by the rule above)
    ("f", "or"),   // for
    ("a", "re"),   // are
    ("o", "t"),    // ot
    ("n", "ot"),   // not (operand ot created by the rule above)
    ("b", "e"),    // be
    ("ing", "s"),  // ings
    ("e", "st"),   // est
    ("20", "00"))  // 2000

  /** The builtin table as a [[MergeTable]] — the same object the
    * table-parameterized expressions use, so behavior is identical
    * whichever API level callers pick.
    */
  val Builtin: MergeTable = MergeTable(merges)

  /** `(rank,'a','b'),(rank,'a','b'),…` for a SQL VALUES clause — the
    * single source of truth for the oracle's merge table (symbols are
    * ASCII letters/digits; no quoting hazards).
    */
  def mergesSqlValues: String =
    merges.zipWithIndex
      .map { case ((a, b), i) => s"(${i + 1},'$a','$b')" }
      .mkString(",")

  /** The GPT-2-family pre-tokenizer — same pattern as
    * `TextAnalysis.SubwordPattern` (kept literal here so the functions
    * package does not depend on ext; BpeSpec pins the equality).
    */
  val PreTokenPattern: String = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  /** Encode one pre-token with the BUILTIN table (rank-order merges). */
  def encodeWord(word: String): Array[String] = Builtin.encodeWord(word)

  /** BPE token count of a whole text with the builtin table — static
    * entry point for the zero-argument codegen path.
    */
  def countTokens(s: UTF8String): Long = Builtin.countTokens(s)

  /** Full builtin-table token sequence of a text. */
  def tokens(s: UTF8String): ArrayData = Builtin.tokens(s)
}

/** A BPE merge table as a first-class, SERIALIZABLE value — the
  * builtin table and tables learned by [[graft.ext.BpeTrain]] go
  * through the same encoder, and an instance travels to executors
  * inside the expression tree (codegen references it via
  * `addReferenceObj`), so a table learned five minutes ago can drive
  * distributed tokenization without a recompile.
  *
  * Invariant expected of `merges` (true of any sequentially-trained
  * table): a composite operand appears only AFTER the rule that
  * creates it — what makes exhaustive rank-order application
  * equivalent to the canonical min-rank loop (see the header note).
  */
final case class MergeTable(merges: IndexedSeq[(String, String)])
    extends Serializable {

  private val nRules = merges.length

  // per-table word → token-count cache (pre-tokens repeat heavily —
  // Zipf — and the encode is a pure function). Transient: rebuilt
  // empty after deserialization on each executor. Bounded: cleared if
  // it ever exceeds ~1M entries (degenerate corpora).
  @transient private lazy val countCache =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  @transient private lazy val preToken =
    java.util.regex.Pattern.compile(BpeUtil.PreTokenPattern)

  /** One exhaustive (left-to-right, non-overlapping) merge pass of a
    * single rule over the symbol array; returns the new length.
    */
  private def mergePass(syms: Array[String], len: Int,
                        a: String, b: String, ab: String): Int = {
    var r = 0 // read
    var w = 0 // write
    while (r < len) {
      if (r + 1 < len && syms(r) == a && syms(r + 1) == b) {
        syms(w) = ab
        r += 2
      } else {
        syms(w) = syms(r)
        r += 1
      }
      w += 1
    }
    w
  }

  /** Encode one pre-token: code-point symbols, merges in rank order. */
  def encodeWord(word: String): Array[String] = {
    // split to code points (surrogate-pair safe, matching the oracle's
    // regexp_extract_all(w, '.') code-point semantics)
    val cps = word.codePointCount(0, word.length)
    val syms = new Array[String](cps)
    var cu = 0
    var i = 0
    while (i < cps) {
      val next = word.offsetByCodePoints(cu, 1)
      syms(i) = word.substring(cu, next)
      cu = next
      i += 1
    }
    var len = cps
    var r = 0
    while (r < nRules && len > 1) {
      val (a, b) = merges(r)
      // cheap containment scan before the merge pass
      var j = 0
      var found = false
      while (j < len - 1 && !found) {
        found = syms(j) == a && syms(j + 1) == b
        j += 1
      }
      if (found) len = mergePass(syms, len, a, b, a + b)
      r += 1
    }
    java.util.Arrays.copyOf(syms, len)
  }

  private def cachedCount(w: String): Int = {
    val hit = countCache.get(w)
    if (hit != null) hit.intValue()
    else {
      val n = encodeWord(w).length
      if (countCache.size() > (1 << 20)) countCache.clear()
      countCache.put(w, Integer.valueOf(n))
      n
    }
  }

  /** BPE token count of a whole text: pre-tokenize, sum per-word
    * symbol counts. Codegen calls this on the referenced table object.
    */
  def countTokens(s: UTF8String): Long = {
    val m = preToken.matcher(s.toString)
    var n = 0L
    while (m.find()) n += cachedCount(m.group())
    n
  }

  /** Full token sequence of a text (debug / downstream vocab use). */
  def tokens(s: UTF8String): ArrayData = {
    val m = preToken.matcher(s.toString)
    val out = new java.util.ArrayList[AnyRef]()
    while (m.find()) {
      val syms = encodeWord(m.group())
      var i = 0
      while (i < syms.length) {
        out.add(UTF8String.fromString(syms(i)))
        i += 1
      }
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }
}

abstract class BpeBase extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
}

/** BPE token count of a string — LONG, codegen'd via a static call. */
case class BpeCount(child: Expression) extends BpeBase {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    BpeUtil.countTokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeUtil.countTokens($c);")
  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
}

/** Full BPE token sequence of a string — array<string>. */
case class BpeTokens(child: Expression) extends BpeBase {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    BpeUtil.tokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeUtil.tokens($c);")
  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}

/** BPE token count under an ARBITRARY merge table (e.g. one learned
  * by `graft.ext.BpeTrain`): the table rides along as a referenced
  * object — codegen'd, no UDF, no recompile. Same per-row shape as
  * [[BpeCount]].
  */
case class BpeCountTable(child: Expression, table: MergeTable) extends BpeBase {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    table.countTokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[MergeTable].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.countTokens($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeCountTable =
    copy(child = newChild)
}

/** Full token sequence under an arbitrary merge table. */
case class BpeTokensTable(child: Expression, table: MergeTable) extends BpeBase {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    table.tokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[MergeTable].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.tokens($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeTokensTable =
    copy(child = newChild)
}

/** Column-level API. */
object Bpe {
  def count(c: Column): Column = GraftBridge.column(BpeCount(GraftBridge.expression(c)))
  def tokens(c: Column): Column = GraftBridge.column(BpeTokens(GraftBridge.expression(c)))
  /** Count/tokenize under a custom (e.g. learned) merge table. */
  def count(c: Column, table: MergeTable): Column =
    GraftBridge.column(BpeCountTable(GraftBridge.expression(c), table))
  def tokens(c: Column, table: MergeTable): Column =
    GraftBridge.column(BpeTokensTable(GraftBridge.expression(c), table))
}
