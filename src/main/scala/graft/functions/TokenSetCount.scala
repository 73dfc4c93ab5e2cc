package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of whitespace tokens of `child` that appear in a fixed word
  * set — `size(filter(split(trim(c), "\\s+"), t -> t IN (...)))` as one
  * codegen'd call.
  *
  * The composable form pays an interpreted higher-order `filter` per
  * evaluation; language-ID evaluates it once per language list and the
  * quality score once more — seven interpreted passes per document row
  * in the doc-curation pipeline. This expression tokenizes once and
  * probes a prebuilt hash set, inside whole-stage codegen.
  *
  * Tokenization matches `TextAnalysis.tokens` (trim, split on \s+) and
  * the oracle's string_split_regex exactly, including the empty-string
  * edge (one "" token, never in the set).
  */
case class TokenSetCount(child: Expression, words: Seq[String]) extends UnaryExpression {

  @transient private lazy val wordSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    words.foreach(s.add)
    s
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_set_count requires a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any =
    TokenSetCountUtil.count(input.asInstanceOf[UTF8String], wordSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", wordSet, "java.util.HashSet<String>")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenSetCountUtil.count($c, $setRef)")
  }

  override protected def withNewChildInternal(c: Expression): TokenSetCount =
    copy(child = c)
}

object TokenSetCountUtil {
  def count(s: UTF8String, words: java.util.HashSet[String]): Int = {
    val toks = s.toString.trim.split("\\s+")
    var i = 0
    var c = 0
    while (i < toks.length) {
      if (words.contains(toks(i))) c += 1
      i += 1
    }
    c
  }
}

object TokenSetCount {
  def apply(c: Column, words: Seq[String]): Column =
    GraftBridge.column(TokenSetCount(GraftBridge.expression(c), words))
}
