package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class NGramsSpec extends SparkTestBase {

  import spark.implicits._

  test("charNGrams: known answers, distinctness, short-input edge") {
    val df = Seq("abcab", "ab", "").toDF("t")
    val out = df.select(NGrams.charNGrams($"t", 3).as("g")).as[Seq[String]].collect()
    assert(out(0) == Seq("abc", "bca", "cab")) // "abcab" → distinct, first-occurrence order
    assert(out(1) == Seq("ab"))                // shorter than n → whole string
    assert(out(2) == Seq(""))
  }

  test("wordNGrams: known answers and few-token edge") {
    val df = Seq("a b c d a b c", "one two", "  padded   tokens  ").toDF("t")
    val out = df.select(NGrams.wordNGrams($"t", 3).as("g")).as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d", "c d a", "d a b"))
    assert(out(1) == Seq("one two"))
    assert(out(2) == Seq("padded tokens"))
  }

  test("charNGrams uses code-point semantics on non-BMP text (matches Column.substr)") {
    val astral = "a😀b😁c" // a😀b😁c — 5 code points, 7 UTF-16 units
    val df = Seq(astral).toDF("t")
    val native = df.select(NGrams.charNGrams($"t", 3).as("g")).as[Seq[String]].head()
    val hof = df.select(array_distinct(transform(
      sequence(lit(1), greatest(length($"t") - 2, lit(1))),
      i => $"t".substr(i, lit(3)))).as("g")).as[Seq[String]].head()
    assert(native == hof, s"native=$native hof=$hof")
    assert(native.length == 3) // 5 - 3 + 1 distinct windows
    assert(native.head == "a😀b")
  }

  test("wordNGramSeq keeps every occurrence in position order") {
    val df = Seq("a b a b a b", "solo").toDF("t")
    val out = df.select(NGrams.wordNGramSeq($"t", 2).as("g")).as[Seq[String]].collect()
    assert(out(0) == Seq("a b", "b a", "a b", "b a", "a b")) // duplicates preserved
    assert(out(1) == Seq("solo"))
    // distinct variant collapses to the set
    val d = df.select(NGrams.wordNGrams($"t", 2).as("g")).as[Seq[String]].head()
    assert(d == Seq("a b", "b a"))
  }

  test("null input propagates null") {
    val df = Seq[(Int, String)]((1, null)).toDF("id", "t")
    val out = df.select(NGrams.wordNGrams($"t", 3).as("g")).collect()
    assert(out(0).isNullAt(0))
  }

  test("matches the composable higher-order-function formulation on real text") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val hofChar = array_distinct(transform(
      sequence(lit(1), greatest(length($"text") - 2, lit(1))),
      i => $"text".substr(i, lit(3))))
    val toks = split(trim($"text"), "\\s+")
    val hofWord = array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - 2, lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(3)))))
    val diff = docs.select(
      NGrams.charNGrams($"text", 3).as("nc"), hofChar.as("hc"),
      NGrams.wordNGrams($"text", 3).as("nw"), hofWord.as("hw"))
      .filter($"nc" =!= $"hc" || $"nw" =!= $"hw")
    assert(diff.count() == 0)
  }

  test("interpreted eval path (no codegen) agrees with codegen path") {
    val df = Seq("the quick brown fox").toDF("t")
    val expr = CharNGrams(org.apache.spark.sql.GraftBridge.expression($"t"), 2)
    // direct eval through the expression API (interpreted)
    val row = org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString("abcd"))
    val bound = CharNGrams(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.StringType, nullable = true), 2)
    val got = bound.eval(row).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(got.numElements() == 3)
    // codegen path via a real query
    val viaQuery = df.select(NGrams.charNGrams($"t", 2).as("g")).as[Seq[String]].head()
    assert(viaQuery.head == "th")
  }
}
