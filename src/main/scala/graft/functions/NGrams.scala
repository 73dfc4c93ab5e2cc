package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram shingling expressions.
  *
  * The composable form (split → transform → slice → concat_ws →
  * array_distinct) is a tree of higher-order functions, which Catalyst
  * evaluates INTERPRETED (HOFs are excluded from whole-stage codegen);
  * profiling at sf0.1 put ~60% of MinHash wall time in that tree. These
  * expressions do the same work in one tight JVM loop and stay inside
  * codegen via a static call, ~an order of magnitude less per-row
  * overhead on shingle-heavy operators (MinHashLsh, ShingleJaccard).
  *
  * Semantics (identical to the composable form):
  *   - char n-grams: distinct substrings of length n, first-occurrence
  *     order; input shorter than n yields the whole input as one gram.
  *   - word n-grams: whitespace-tokenized (trim + \s+), distinct
  *     space-joined n-token windows; fewer than n tokens yields all
  *     tokens joined as one gram.
  */
object NGramsUtil {

  def charNGrams(s: UTF8String, n: Int): ArrayData = charNGrams(s, n, distinct = true)

  def charNGramSeq(s: UTF8String, n: Int): ArrayData = charNGrams(s, n, distinct = false)

  private def charNGrams(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    // code-point semantics, matching Spark's substr and SQL substring —
    // UTF-16 String.substring would split surrogate pairs on non-BMP
    // text and diverge from the composable form and the oracle
    val str = s.toString
    val cpCount = str.codePointCount(0, str.length)
    val out = if (distinct) new java.util.LinkedHashSet[UTF8String]() else null
    val seq = if (distinct) null else new java.util.ArrayList[UTF8String]()
    def add(g: UTF8String): Unit = if (distinct) out.add(g) else seq.add(g)
    if (cpCount < n) add(UTF8String.fromString(str))
    else {
      var startCu = 0 // code-unit offset of the window start
      var i = 0
      while (i <= cpCount - n) {
        val endCu = str.offsetByCodePoints(startCu, n)
        add(UTF8String.fromString(str.substring(startCu, endCu)))
        startCu = str.offsetByCodePoints(startCu, 1)
        i += 1
      }
    }
    val arr = if (distinct) out.toArray[AnyRef](new Array[AnyRef](out.size))
      else seq.toArray[AnyRef](new Array[AnyRef](seq.size))
    new GenericArrayData(arr)
  }

  def wordNGrams(s: UTF8String, n: Int): ArrayData = wordNGrams(s, n, distinct = true)

  def wordNGramSeq(s: UTF8String, n: Int): ArrayData = wordNGrams(s, n, distinct = false)

  private def wordNGrams(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val toks = s.toString.trim.split("\\s+")
    val out = if (distinct) new java.util.LinkedHashSet[UTF8String]() else null
    val seq = if (distinct) null else new java.util.ArrayList[UTF8String]()
    def add(g: UTF8String): Unit = if (distinct) out.add(g) else seq.add(g)
    if (toks.length < n) add(UTF8String.fromString(toks.mkString(" ")))
    else {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        add(UTF8String.fromString(sb.toString))
        i += 1
      }
    }
    val arr = if (distinct) out.toArray[AnyRef](new Array[AnyRef](out.size))
      else seq.toArray[AnyRef](new Array[AnyRef](seq.size))
    new GenericArrayData(arr)
  }
}

abstract class NGramsBase extends UnaryExpression {
  def n: Int
  protected def helper: String // static method name on NGramsUtil

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NGramsUtil.$helper($c, $n);")
}

case class CharNGrams(child: Expression, n: Int) extends NGramsBase {
  override protected def helper: String = "charNGrams"
  override def nullSafeEval(input: Any): Any =
    NGramsUtil.charNGrams(input.asInstanceOf[UTF8String], n)
  override protected def withNewChildInternal(newChild: Expression): CharNGrams =
    copy(child = newChild)
}

/** Positional (non-distinct) char n-grams — winnowing and other
  * rolling-hash consumers need the full k-gram SEQUENCE, not the set.
  */
case class CharNGramSeq(child: Expression, n: Int) extends NGramsBase {
  override protected def helper: String = "charNGramSeq"
  override def nullSafeEval(input: Any): Any =
    NGramsUtil.charNGramSeq(input.asInstanceOf[UTF8String], n)
  override protected def withNewChildInternal(newChild: Expression): CharNGramSeq =
    copy(child = newChild)
}

case class WordNGrams(child: Expression, n: Int) extends NGramsBase {
  override protected def helper: String = "wordNGrams"
  override def nullSafeEval(input: Any): Any =
    NGramsUtil.wordNGrams(input.asInstanceOf[UTF8String], n)
  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

/** Positional (non-distinct) word n-grams — repetition-ratio consumers
  * need every occurrence, not the set.
  */
case class WordNGramSeq(child: Expression, n: Int) extends NGramsBase {
  override protected def helper: String = "wordNGramSeq"
  override def nullSafeEval(input: Any): Any =
    NGramsUtil.wordNGramSeq(input.asInstanceOf[UTF8String], n)
  override protected def withNewChildInternal(newChild: Expression): WordNGramSeq =
    copy(child = newChild)
}

/** Column-level API. */
object NGrams {
  def charNGrams(c: Column, n: Int): Column =
    GraftBridge.column(CharNGrams(GraftBridge.expression(c), n))
  def charNGramSeq(c: Column, n: Int): Column =
    GraftBridge.column(CharNGramSeq(GraftBridge.expression(c), n))
  def wordNGrams(c: Column, n: Int): Column =
    GraftBridge.column(WordNGrams(GraftBridge.expression(c), n))
  def wordNGramSeq(c: Column, n: Int): Column =
    GraftBridge.column(WordNGramSeq(GraftBridge.expression(c), n))
}
