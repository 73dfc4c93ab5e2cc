package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Luhn-validated payment-card detection — the precision upgrade over
  * the blanket `<NUM>` digit-run scrub ([[graft.ext.TextAnalysis
  * .redactPii]]): a 16-digit order id is NOT a card, and redacting
  * every long digit run destroys training signal (dates, ids,
  * quantities). The Luhn mod-10 checksum (ISO/IEC 7812 — every real
  * PAN carries it) plus the 13-19 digit PAN length bound rejects
  * random digit runs at ~90% while catching every well-formed card
  * number, grouped or not.
  *
  * Candidate spans are MAXIMAL runs of digits optionally separated by
  * single spaces/dashes — exactly the regex `[0-9]+(?:[ -][0-9]+)*`,
  * so the span rule is portable and the whole operator (spans,
  * validity, and the redacted string itself) is mirrored in the gate's
  * DuckDB oracle. A card inside a longer digit run is NOT redacted
  * (the span is 20+ digits — not a PAN); that is the same
  * maximal-span contract the `<NUM>` rule uses.
  *
  * Scale: both expressions are one O(len) pass per row, zero shuffle,
  * inside whole-stage codegen.
  */
object LuhnUtil {

  /** Luhn mod-10 over an ASCII digit string (caller strips
    * separators): double every second digit from the RIGHT, fold >9
    * by -9, valid iff the sum is divisible by 10.
    */
  def luhnOk(digits: Array[Byte], from: Int, len: Int): Boolean = {
    var sum = 0
    var i = 0
    while (i < len) {
      val d = digits(from + len - 1 - i) - '0'
      sum += (if (i % 2 == 1) { val t = 2 * d; if (t > 9) t - 9 else t } else d)
      i += 1
    }
    sum % 10 == 0
  }

  /** True iff `run` (one candidate span: digits with optional single
    * space/dash separators) strips to 13-19 digits passing Luhn.
    */
  def isCard(run: UTF8String): Boolean = {
    val b = run.getBytes
    if (b.length == 0) return false
    val digits = new Array[Byte](b.length)
    var n = 0
    var i = 0
    var prevDigit = false
    while (i < b.length) {
      val c = b(i)
      if (c >= '0' && c <= '9') { digits(n) = c; n += 1; prevDigit = true }
      else if (c == ' ' || c == '-') {
        // span grammar `[0-9]+(?:[ -][0-9]+)*`: separators are single
        // and strictly between digit groups
        if (!prevDigit) return false
        prevDigit = false
      } else return false
      i += 1
    }
    prevDigit && n >= 13 && n <= 19 && luhnOk(digits, 0, n)
  }

  /** One-pass scan of `s`: find each maximal digit(-sep-digit) span
    * (the same spans `[0-9]+(?:[ -][0-9]+)*` matches), replace the
    * Luhn-valid 13-19-digit ones with `<CARD>`, copy everything else.
    */
  def redact(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val out = new java.io.ByteArrayOutputStream(b.length)
    val digits = new Array[Byte](b.length)
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if (c >= '0' && c <= '9') {
        val start = i
        var n = 0
        // consume digits, then (sep digit+)* — maximal, regex-identical
        var done = false
        while (!done) {
          while (i < b.length && b(i) >= '0' && b(i) <= '9') {
            digits(n) = b(i); n += 1; i += 1
          }
          if (i + 1 < b.length && (b(i) == ' ' || b(i) == '-') &&
              b(i + 1) >= '0' && b(i + 1) <= '9') i += 1
          else done = true
        }
        if (n >= 13 && n <= 19 && luhnOk(digits, 0, n))
          out.write("<CARD>".getBytes("US-ASCII"))
        else out.write(b, start, i - start)
      } else { out.write(c); i += 1 }
    }
    UTF8String.fromBytes(out.toByteArray)
  }
}

/** Boolean: is this one candidate span a Luhn-valid 13-19-digit card
  * number (separators allowed)? Intended for per-element use inside
  * `filter(regexp_extract_all(...))` audits.
  */
case class LuhnCard(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"luhn_card requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any =
    LuhnUtil.isCard(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LuhnUtil.isCard($c)")
  override protected def withNewChildInternal(c: Expression): LuhnCard =
    copy(child = c)
}

/** String: input with every Luhn-valid card span replaced by
  * `<CARD>`. Compose before the generic `<NUM>` scrub so card spans
  * get the typed placeholder.
  */
case class RedactCards(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"redact_cards requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    LuhnUtil.redact(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LuhnUtil.redact($c)")
  override protected def withNewChildInternal(c: Expression): RedactCards =
    copy(child = c)
}

object LuhnCard {
  def apply(c: Column): Column =
    GraftBridge.column(LuhnCard(GraftBridge.expression(c)))
}

object RedactCards {
  def apply(c: Column): Column =
    GraftBridge.column(RedactCards(GraftBridge.expression(c)))
}
