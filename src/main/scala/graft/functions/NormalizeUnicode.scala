package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (UAX #15) as a codegen'd expression — the
  * curation step that makes every downstream text operator see ONE
  * byte encoding per abstract string. Without it, `é` composed
  * (U+00E9) and decomposed (e + U+0301) hash to different exact-dedup
  * digests, different MinHash shingles, and different BPE byte runs —
  * so a corpus mixing encoders (web crawls always do) under-dedups
  * and splits token statistics for identical text.
  *
  * Forms: NFC (canonical compose — the curation default; what DuckDB's
  * `nfc_normalize` computes, so NFC output is oracle-checkable
  * cross-engine), NFD, NFKC (compatibility: also folds ligatures
  * ﬁ→fi, fullwidth Ａ→A, superscripts — the aggressive pre-tokenizer
  * choice), NFKD.
  *
  * Scale: per-row, zero-shuffle, stays inside whole-stage codegen. The
  * dominant path (already-normalized ASCII/NFC text) costs one
  * `Normalizer.isNormalized` scan and returns the INPUT UTF8String —
  * no allocation, no re-encode; only rows that actually change pay
  * the decompose/compose walk and re-encode.
  */
case class NormalizeUnicode(child: Expression, form: String) extends UnaryExpression {

  @transient private lazy val jform: Normalizer.Form = Normalizer.Form.valueOf(form)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"normalize_unicode requires a string input, got ${child.dataType.catalogString}")
    else if (!Seq("NFC", "NFD", "NFKC", "NFKD").contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"normalize_unicode form must be NFC|NFD|NFKC|NFKD, got '$form'")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NormalizeUnicodeUtil.normalize(input.asInstanceOf[UTF8String], jform)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("jform", jform, "java.text.Normalizer$Form")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NormalizeUnicodeUtil.normalize($c, $formRef)")
  }

  override protected def withNewChildInternal(c: Expression): NormalizeUnicode =
    copy(child = c)
}

object NormalizeUnicodeUtil {
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val str = s.toString
    // fast path: web text is overwhelmingly already normalized — one
    // quick-check scan, zero allocation beyond the String view
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}

object NormalizeUnicode {
  def apply(c: Column, form: String): Column =
    GraftBridge.column(NormalizeUnicode(GraftBridge.expression(c), form))

  /** The curation default: canonical composition. */
  def nfc(c: Column): Column = apply(c, "NFC")

  /** Compatibility composition — ligatures/fullwidth/superscripts
    * folded too; the aggressive pre-tokenizer normalization.
    */
  def nfkc(c: Column): Column = apply(c, "NFKC")
}
