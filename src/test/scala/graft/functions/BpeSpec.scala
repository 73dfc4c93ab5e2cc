package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

class BpeSpec extends SparkTestBase {

  import spark.implicits._

  /** Brute-force CANONICAL BPE (GPT-2 encoder shape): repeatedly find
    * the lowest-rank adjacent pair and merge all its occurrences
    * left-to-right non-overlapping. The production code applies rules
    * exhaustively in rank order instead; this reference pins the
    * equivalence.
    */
  private def referenceEncode(word: String): Seq[String] = {
    val rank = BpeUtil.merges.zipWithIndex.toMap
    var syms: Vector[String] = {
      val out = ArrayBuffer[String]()
      var cu = 0
      while (cu < word.length) {
        val next = word.offsetByCodePoints(cu, 1)
        out += word.substring(cu, next)
        cu = next
      }
      out.toVector
    }
    var done = false
    while (!done && syms.length > 1) {
      val best = (0 until syms.length - 1)
        .flatMap(i => rank.get((syms(i), syms(i + 1))))
        .minOption
      best match {
        case None => done = true
        case Some(r) =>
          val (a, b) = BpeUtil.merges(r)
          val out = ArrayBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += a + b; i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.toVector
      }
    }
    syms
  }

  test("merge table invariants: unique pairs, operands created before use") {
    assert(BpeUtil.merges.distinct == BpeUtil.merges)
    val created = scala.collection.mutable.Set[String]()
    for (((a, b), i) <- BpeUtil.merges.zipWithIndex) {
      for (op <- Seq(a, b) if op.codePointCount(0, op.length) > 1)
        assert(created.contains(op),
          s"rule ${i + 1} ($a,$b): operand '$op' not created by an earlier rule")
      created += (a + b)
    }
    // pre-tokenizer is the SAME pattern the q39 estimator uses
    assert(BpeUtil.PreTokenPattern == graft.ext.TextAnalysis.SubwordPattern)
  }

  test("rank-order implementation == canonical min-rank reference") {
    val words = Seq("the", "The", "which", "would", "could", "shoulders",
      "station", "nation", "things", "llllll", "ssss", "2000", "1999",
      "initialization", "naïve", "don", "a", "", "x", "thththth",
      "estimate", "notwithstanding", "bee", "been", "ooooo")
    for (w <- words)
      assert(BpeUtil.encodeWord(w).toSeq == referenceEncode(w), s"word '$w'")
    // randomized stress over a merge-dense alphabet (self-pairs, runs)
    val rnd = new scala.util.Random(42)
    val alpha = "thelwoucd019s"
    for (_ <- 1 to 300) {
      val w = (1 to (1 + rnd.nextInt(24))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      assert(BpeUtil.encodeWord(w).toSeq == referenceEncode(w), s"word '$w'")
    }
  }

  test("golden counts and token sequences") {
    // the: t,h -> th (r1); th,e -> the          => 1 token
    // would: ou; ld; ou+ld; w+ould              => 1 token
    // lllll: (l,l) leftmost non-overlap         => [ll, ll, l]
    // 2000: (0,0) fires before (2,0) can        => [2, 00, 0]
    assert(BpeUtil.encodeWord("the").toSeq == Seq("the"))
    assert(BpeUtil.encodeWord("would").toSeq == Seq("would"))
    assert(BpeUtil.encodeWord("lllll").toSeq == Seq("ll", "ll", "l"))
    assert(BpeUtil.encodeWord("2000").toSeq == Seq("2", "00", "0"))
    val df = Seq("the would 2000 lllll", "don't", "", "  ").toDF("t")
    assert(df.select(Bpe.count($"t")).as[Long].collect().toSeq == Seq(8L, 4L, 0L, 0L))
    assert(df.select(Bpe.tokens($"t")).as[Seq[String]].head() ==
      Seq("the", "would", "2", "00", "0", "ll", "ll", "l"))
  }

  test("expression matches a per-word map over pre-tokens (purity)") {
    val texts = Seq(
      "The station would not be which 2000 things, notwithstanding!",
      "unusual— characters: naïve café 99.5% (parens) [brackets]")
    val df = texts.toDF("t")
    val viaExpr = df.select(Bpe.count($"t")).as[Long].collect().toSeq
    val expected = texts.map { t =>
      val m = java.util.regex.Pattern.compile(BpeUtil.PreTokenPattern).matcher(t)
      var n = 0L
      while (m.find()) n += referenceEncode(m.group()).length
      n
    }
    assert(viaExpr == expected)
  }
}
