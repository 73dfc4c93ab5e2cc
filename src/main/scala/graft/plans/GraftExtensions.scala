package graft.plans

import graft.functions._
import org.apache.spark.sql.{GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{CreateArray, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

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

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case _ => throw new IllegalArgumentException(
      s"$fn: expected an integer literal, got $e")
  }

  private def longLit(e: Expression, fn: String): Long = e match {
    case Literal(v: Long, LongType) => v
    case Literal(v: Int, IntegerType) => v.toLong
    case _ => throw new IllegalArgumentException(
      s"$fn: expected a long literal, got $e")
  }

  private def stringSeq(e: Expression, fn: String): Seq[String] = e match {
    case CreateArray(children, _) => children.map {
      case Literal(s, StringType) if s != null => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: expected string literals in the array, got $other")
    }
    case _ => throw new IllegalArgumentException(
      s"$fn: expected array(...) of string literals, got $e")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft.functions", name, usage)

  private def arity(fn: String, n: Int)(b: Seq[Expression] => Expression)
      : Seq[Expression] => Expression =
    args => {
      require(args.length == n, s"$fn expects $n arguments, got ${args.length}")
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
        TokenSetCount(a(0), stringSeq(a(1), "token_set_count")))))

  /** Register every function into a live session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, i, b) => GraftBridge.registerFunction(spark, id, i, b) }
}
