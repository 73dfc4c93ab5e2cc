package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LuhnSpec extends SparkTestBase {

  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(RedactCards($"t")).as[String].head()
  private def isCard(s: String): Boolean =
    Seq(s).toDF("t").select(LuhnCard($"t")).as[Boolean].head()

  test("standard test PANs validate; off-by-one checksums do not") {
    // the classic network test numbers (public, non-live)
    assert(isCard("4111111111111111"))   // Visa 16
    assert(isCard("4222222222222"))      // Visa 13
    assert(isCard("5500000000000004"))   // MC 16
    assert(isCard("371449635398431"))    // Amex 15
    assert(!isCard("4111111111111112"))
    assert(!isCard("4222222222221"))
  }

  test("length bounds: 12 digits never a card, 20 never a card, 13-19 Luhn-gated") {
    // 12-digit Luhn-valid run (checksum 0 by construction)
    assert(!isCard("000000000000"))
    assert(!isCard("00000000000000000000")) // 20 zeros, Luhn-valid, too long
    assert(isCard("0000000000000"))         // 13 zeros: valid length + checksum
  }

  test("separators: single space/dash groups accepted, anything else rejects the span") {
    assert(isCard("4111 1111 1111 1111"))
    assert(isCard("5500-0000-0000-0004"))
    assert(!isCard("4111  1111 1111 1111")) // double space is not one span
    assert(!isCard("4111_1111_1111_1111"))
  }

  test("redaction splices <CARD> only for valid spans and copies everything else") {
    assert(redact("pay 4111 1111 1111 1111 now") == "pay <CARD> now")
    assert(redact("fake 4111111111111112 number") == "fake 4111111111111112 number")
    assert(redact("overlong 41111111111111110000 run") == "overlong 41111111111111110000 run")
    assert(redact("a 4222222222222 b 5500-0000-0000-0004 c")
      == "a <CARD> b <CARD> c")
    assert(redact("4111111111111111") == "<CARD>")
    assert(redact("") == "")
    assert(redact("no digits") == "no digits")
    // card at string end, separator dangling at end
    assert(redact("x 4111111111111111") == "x <CARD>")
    assert(redact("x 4111 1111 1111 1111-") == "x <CARD>-")
  }

  test("scanner spans equal the regex spans on adversarial digit/separator soup") {
    val pat = "[0-9]+(?:[ -][0-9]+)*"
    val cases = Seq(
      "1-2-3 44 55-66 4111111111111111-9", "-1-", "9 9 9", "12-", " -12",
      "4111 1111 1111 1111 4222222222222", "a1b22c333 4444-5555")
    for (s <- cases) {
      // reference: regex-extracted spans, each independently verdicted,
      // then spliced — must equal the one-pass scanner output
      val runs = java.util.regex.Pattern.compile(pat).matcher(s)
      val sb = new StringBuilder
      var last = 0
      while (runs.find()) {
        sb.append(s.substring(last, runs.start()))
        val run = runs.group()
        val digits = run.filter(_.isDigit)
        val ok = digits.length >= 13 && digits.length <= 19 && {
          val sum = digits.reverse.zipWithIndex.map { case (c, i) =>
            val d = c - '0'
            if (i % 2 == 1) { val t = 2 * d; if (t > 9) t - 9 else t } else d
          }.sum
          sum % 10 == 0
        }
        sb.append(if (ok) "<CARD>" else run)
        last = runs.end()
      }
      sb.append(s.substring(last))
      assert(redact(s) == sb.toString, s"diverged on '$s'")
    }
  }

  test("composes before the generic <NUM> scrub for typed placeholders") {
    val out = Seq("card 4111111111111111 order 123456789")
      .toDF("t")
      .select(graft.ext.TextAnalysis.redactPii(RedactCards($"t")))
      .as[String].head()
    assert(out == "card <CARD> order <NUM>")
  }

  test("SQL surface") {
    graft.plans.GraftFunctions.register(spark)
    assert(spark.sql("SELECT redact_cards('c 4111111111111111')").as[String].head()
      == "c <CARD>")
    assert(spark.sql("SELECT luhn_card('4111111111111111')").as[Boolean].head())
  }
}
