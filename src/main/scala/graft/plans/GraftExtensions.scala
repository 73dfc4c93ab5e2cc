package graft.plans

import graft.functions._
import org.apache.spark.sql.{GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StringType}

/** SparkSessionExtensions entry point: makes the engine's custom
  * Catalyst pieces available to ANY session — including pure-SQL users
  * — via
  *
  *   spark.sql.extensions=graft.plans.GraftExtensions
  *
  * Injects (a) the VecDotRewrite optimizer rule, so the composable
  * aggregate(zip_with(...)) dot-product pattern silently becomes the
  * native expression, and (b) SQL function bindings for the custom
  * expressions (vec_dot, char_ngrams, word_ngrams, char_ngram_seq,
  * word_ngram_seq, mix_hash64, token_set_count).
  *
  * `GraftFunctions.register(spark)` does the same function
  * registration on an already-running session (tests, notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => VecDotRewrite)
    GraftFunctions.all.foreach(f => ext.injectFunction(f))
  }
}

object GraftFunctions {

  // Builders run during resolution, BEFORE constant folding — so a
  // constant that isn't syntactically a Literal (word_ngrams(t, 1+1))
  // must be folded here via eval() on the foldable expression, and a
  // genuinely non-constant argument must surface as an
  // AnalysisException (what SQL users expect from a bad function
  // call), not a raw IllegalArgumentException out of the planner.
  private def fail(fn: String, msg: String): Nothing =
    throw GraftBridge.analysisError(s"$fn: $msg")

  private def intLit(e: Expression, fn: String): Int = {
    if (!e.foldable) fail(fn, s"expected a constant integer argument, got $e")
    e.eval() match {
      case i: Int => i
      case null => fail(fn, "constant integer argument must not be NULL")
      case other => fail(fn, s"expected a constant integer argument, got $other")
    }
  }

  private def longLit(e: Expression, fn: String): Long = {
    if (!e.foldable) fail(fn, s"expected a constant long argument, got $e")
    e.eval() match {
      case l: Long => l
      case i: Int => i.toLong
      case null => fail(fn, "constant long argument must not be NULL")
      case other => fail(fn, s"expected a constant long argument, got $other")
    }
  }

  private def stringSeq(e: Expression, fn: String): Seq[String] = {
    if (!e.foldable) fail(fn, s"expected a constant array of strings, got $e")
    e.dataType match {
      case ArrayType(StringType, _) =>
        e.eval() match {
          case null => fail(fn, "constant string array must not be NULL")
          case ad: ArrayData =>
            (0 until ad.numElements()).map { i =>
              if (ad.isNullAt(i)) fail(fn, "string array must not contain NULLs")
              else ad.getUTF8String(i).toString
            }
        }
      case t => fail(fn, s"expected array<string>, got ${t.catalogString}")
    }
  }

  private def stringLit(e: Expression, fn: String): String = {
    if (!e.foldable || e.dataType != StringType)
      fail(fn, s"expected a constant string argument, got $e")
    e.eval() match {
      case null => fail(fn, "constant string argument must not be NULL")
      case s => s.toString
    }
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft.functions", name, usage)

  private def arity(fn: String, n: Int)(b: Seq[Expression] => Expression)
      : Seq[Expression] => Expression =
    args => {
      if (args.length != n) fail(fn, s"expects $n arguments, got ${args.length}")
      b(args)
    }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - ordered-fold dot product of float vectors"),
      arity("vec_dot", 2)(a => VecDot(a(0), a(1)))),
    (FunctionIdentifier("char_ngrams"),
      info("char_ngrams", "char_ngrams(s, n) - distinct character n-grams"),
      arity("char_ngrams", 2)(a => CharNGrams(a(0), intLit(a(1), "char_ngrams")))),
    (FunctionIdentifier("char_ngram_seq"),
      info("char_ngram_seq", "char_ngram_seq(s, n) - positional character n-grams"),
      arity("char_ngram_seq", 2)(a => CharNGramSeq(a(0), intLit(a(1), "char_ngram_seq")))),
    (FunctionIdentifier("word_ngrams"),
      info("word_ngrams", "word_ngrams(s, n) - distinct word n-grams"),
      arity("word_ngrams", 2)(a => WordNGrams(a(0), intLit(a(1), "word_ngrams")))),
    (FunctionIdentifier("word_ngram_seq"),
      info("word_ngram_seq", "word_ngram_seq(s, n) - positional word n-grams"),
      arity("word_ngram_seq", 2)(a => WordNGramSeq(a(0), intLit(a(1), "word_ngram_seq")))),
    (FunctionIdentifier("mix_hash64"),
      info("mix_hash64", "mix_hash64(h, a, b) - wrapping h*a+b permutation of a long"),
      arity("mix_hash64", 3)(a =>
        MixHash64(a(0), longLit(a(1), "mix_hash64"), longLit(a(2), "mix_hash64")))),
    (FunctionIdentifier("token_set_count"),
      info("token_set_count", "token_set_count(s, array(...)) - tokens of s found in the set"),
      arity("token_set_count", 2)(a =>
        TokenSetCount(a(0), stringSeq(a(1), "token_set_count")))),
    (FunctionIdentifier("srp_signature"),
      info("srp_signature", "srp_signature(vec, bits) - signed-random-projection signature of a float vector"),
      arity("srp_signature", 2)(a =>
        SrpSignature(a(0), intLit(a(1), "srp_signature")))),
    (FunctionIdentifier("bpe_count"),
      info("bpe_count", "bpe_count(s) - BPE token count under the builtin merge table"),
      arity("bpe_count", 1)(a => BpeCount(a(0)))),
    (FunctionIdentifier("bpe_tokens"),
      info("bpe_tokens", "bpe_tokens(s) - BPE token sequence under the builtin merge table"),
      arity("bpe_tokens", 1)(a => BpeTokens(a(0)))),
    (FunctionIdentifier("span_mask"),
      info("span_mask", "span_mask(tokens, starts, n) - tokens not covered by any n-token window at starts"),
      arity("span_mask", 3)(a =>
        SpanMask(a(0), a(1), intLit(a(2), "span_mask")))),
    // ---- signature/sketch AGGREGATES: the SQL face of the engine's
    // TypedImperativeAggregates. Builders return the bare
    // AggregateFunction — the analyzer wraps it in AggregateExpression
    // (the same contract Spark's builtin aggregate builders rely on).
    // Inputs are Cast here (hash→long, value→double): update() reads
    // buffers with unchecked casts, and a SQL user's integer literal
    // column must be an analysis-time coercion, not a runtime CCE.
    (FunctionIdentifier("minhash_agg"),
      info("minhash_agg", "minhash_agg(hash, k) - k-slot minhash signature of the group's 64-bit hashes"),
      arity("minhash_agg", 2)(a =>
        MinHashAgg(Cast(a(0), LongType), intLit(a(1), "minhash_agg")))),
    (FunctionIdentifier("simhash_agg"),
      info("simhash_agg", "simhash_agg(hash) - 64-bit simhash of the group's token hashes"),
      arity("simhash_agg", 1)(a => SimHashAgg(Cast(a(0), LongType)))),
    (FunctionIdentifier("kmv_sketch"),
      info("kmv_sketch", "kmv_sketch(hash, k) - k minimum values of the group's hashes, sorted ascending"),
      arity("kmv_sketch", 2)(a =>
        KmvSketchAgg(Cast(a(0), LongType), intLit(a(1), "kmv_sketch")))),
    (FunctionIdentifier("quantile_sketch"),
      info("quantile_sketch", "quantile_sketch(hash, value, k) - bottom-k-by-hash distinct sample with exact counts"),
      arity("quantile_sketch", 3)(a =>
        QuantileSketchAgg(Cast(a(0), LongType), Cast(a(1), DoubleType),
          intLit(a(2), "quantile_sketch")))),
    (FunctionIdentifier("top_k"),
      info("top_k", "top_k(score, id, k) - array<struct<score,id>> of the group's top k, strongest first"),
      arity("top_k", 3)(a =>
        TopKAgg(Cast(a(0), DoubleType), Cast(a(1), LongType),
          intLit(a(2), "top_k")))),
    (FunctionIdentifier("luhn_card"),
      info("luhn_card", "luhn_card(s) - s is a Luhn-valid 13-19-digit card span (single space/dash separators allowed)"),
      arity("luhn_card", 1)(a => LuhnCard(a(0)))),
    (FunctionIdentifier("redact_cards"),
      info("redact_cards", "redact_cards(s) - replace Luhn-valid card spans with <CARD>"),
      arity("redact_cards", 1)(a => RedactCards(a(0)))),
    (FunctionIdentifier("normalize_unicode"),
      info("normalize_unicode", "normalize_unicode(s, 'NFC'|'NFD'|'NFKC'|'NFKD') - UAX #15 Unicode normalization"),
      arity("normalize_unicode", 2)(a =>
        NormalizeUnicode(a(0), stringLit(a(1), "normalize_unicode")))),
    (FunctionIdentifier("normalize_text"),
      info("normalize_text", "normalize_text(s) - strip control chars, collapse whitespace, trim, lowercase"),
      arity("normalize_text", 1) { a =>
        // built from RESOLVED catalyst nodes: function builders fire
        // after analysis, so a Column-API composition (unresolved
        // function nodes) would never resolve here. Patterns must stay
        // byte-identical to ext.TextAnalysis.normalize.
        import org.apache.spark.sql.catalyst.expressions.{Literal, Lower, RegExpReplace, StringTrim}
        val ctl = RegExpReplace(a(0), Literal("[\\x00-\\x08\\x0e-\\x1f\\x7f]"), Literal(""))
        val ws = RegExpReplace(ctl, Literal("[ \\t\\n\\r\\f\\x0b]+"), Literal(" "))
        Lower(StringTrim(ws))
      }))

  /** Register every function into a live session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, i, b) => GraftBridge.registerFunction(spark, id, i, b) }
}
