package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class NormalizeUnicodeSpec extends SparkTestBase {

  import spark.implicits._

  private def nfc(s: String): String =
    Seq(s).toDF("t").select(NormalizeUnicode.nfc($"t")).as[String].head()
  private def nfkc(s: String): String =
    Seq(s).toDF("t").select(NormalizeUnicode.nfkc($"t")).as[String].head()

  test("NFC composes combining marks, singletons, and Hangul jamo") {
    assert(nfc("é") == "é")                       // é
    assert(nfc("Å") == "Å")                       // Å
    assert(nfc("Ω") == "Ω")                        // OHM → Ω
    assert(nfc("Å") == "Å")                        // ANGSTROM → Å
    assert(nfc("각") == "각")            // 각
    assert(nfc("plain ascii") == "plain ascii")
    assert(nfc("café") == "café")                  // already NFC
  }

  test("NFKC additionally folds compatibility forms NFC must preserve") {
    assert(nfkc("ﬁle") == "file")                       // ﬁ ligature
    assert(nfkc("ＡＢ") == "AB")                     // fullwidth
    assert(nfkc("x²") == "x2")                          // superscript
    assert(nfkc("①") == "1")                            // circled one
    // NFC keeps all of these verbatim — compatibility folds are NFKC-only
    assert(nfc("ﬁle") == "ﬁle")
    assert(nfc("ＡＢ") == "ＡＢ")
  }

  test("exact-dedup motivation: composed and decomposed text digest identically after NFC") {
    val docs = Seq((1L, "café menu"), (2L, "café menu")).toDF("id", "t")
    val n = docs.select(md5(NormalizeUnicode.nfc($"t").cast("binary")).as("h"))
      .distinct().count()
    assert(n == 1L)
    // without normalization they digest apart — the under-dedup this fixes
    assert(docs.select(md5($"t".cast("binary"))).distinct().count() == 2L)
  }

  test("null propagates; astral codepoints pass through untouched") {
    val out = Seq[(java.lang.Long, String)]((1L, null), (2L, new String(Character.toChars(0x1F600))))
      .toDF("id", "t")
      .select($"id", NormalizeUnicode.nfc($"t").as("n")).orderBy($"id")
      .collect()
    assert(out(0).isNullAt(1))
    assert(out(1).getString(1) == new String(Character.toChars(0x1F600)))
  }

  test("interpreted eval matches codegen") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val in_ = "e\u0301 \u2126 \u1100\u1161"
    val e = NormalizeUnicode(BoundReference(0, StringType, nullable = true), "NFC")
    val interpreted = e.eval(InternalRow(UTF8String.fromString(in_))).toString
    val viaDf = Seq(in_).toDF("t")
      .select(NormalizeUnicode.nfc($"t")).as[String].head()
    assert(interpreted == viaDf)
    assert(interpreted == "\u00e9 \u03a9 \uac00")
  }

  test("SQL surface: normalize_unicode with constant form; bad form fails analysis") {
    graft.plans.GraftFunctions.register(spark)
    val r = spark.sql("SELECT normalize_unicode('é', 'NFC') AS n")
      .as[String].head()
    assert(r == "é")
    intercept[Exception] {
      spark.sql("SELECT normalize_unicode('x', 'NFX')").collect()
    }
  }
}
