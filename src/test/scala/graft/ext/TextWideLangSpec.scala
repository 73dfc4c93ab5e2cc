package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Wide-coverage language ID: per-language precision on planted
  * multilingual docs (the confusion-matrix fixture), the ja/zh
  * kana-vs-ideograph split, and the script-vs-stopword routing
  * threshold.
  */
class TextWideLangSpec extends SparkTestBase {
  import spark.implicits._

  // 2-3 planted docs per language, varied register and length
  private val planted: Seq[(String, String)] = Seq(
    "en" -> "the cat sat on a mat and the dog is near the door of the house",
    "en" -> "a story of the sea and the wind is a fine thing",
    "de" -> "der hund und die katze sind im haus und das ist gut",
    "de" -> "das wetter ist heute schön und die sonne scheint",
    "es" -> "el perro y los gatos viven en una casa grande y es bonita",
    "es" -> "una mañana el niño y los amigos van a la playa y es divertido",
    "fr" -> "le chien et les chats sont dans une maison et est belle",
    "fr" -> "une femme et les enfants vont au marché et le pain est bon",
    "it" -> "il gatto è sul tetto della casa e non vuole scendere che bello",
    "it" -> "la storia della città è antica e il mare che la circonda è blu",
    "pt" -> "o menino não quer uma coisa que ele viu e o pai dele também",
    "pt" -> "o mar é grande e uma onda que vem não para",
    "nl" -> "de man en het kind zijn in een huis en dat is mooi",
    "nl" -> "het weer is vandaag goed en de zon schijnt op een plein",
    "ru" -> "это новый дом и мы живём здесь уже давно",
    "ru" -> "сегодня хорошая погода и солнце светит ярко",
    "el" -> "αυτό είναι ένα καλό σπίτι και μένουμε εδώ χρόνια",
    "el" -> "ο καιρός είναι καλός σήμερα και ο ήλιος λάμπει",
    "ar" -> "هذا بيت جديد ونحن نعيش هنا منذ زمن طويل",
    "ar" -> "الطقس جميل اليوم والشمس مشرقة في السماء",
    "he" -> "זה בית חדש ואנחנו גרים כאן הרבה זמן",
    "he" -> "מזג האוויר יפה היום והשמש זורחת בשמיים",
    "hi" -> "यह एक नया घर है और हम यहाँ रहते हैं",
    "hi" -> "आज मौसम अच्छा है और सूरज चमक रहा है",
    "th" -> "นี่คือบ้านใหม่และเราอยู่ที่นี่มานาน",
    "th" -> "วันนี้อากาศดีและแดดออกสดใส",
    "ko" -> "이것은 새 집이고 우리는 여기 오래 살았다",
    "ko" -> "오늘 날씨가 좋고 해가 밝게 빛난다",
    "ja" -> "これは新しい家でわたしたちはここに住んでいます",
    "ja" -> "今日は天気がよくて日がまぶしいです", // kanji-heavy, kana present
    "zh" -> "这是一个新房子我们在这里住了很久",
    "zh" -> "今天天气很好太阳很亮")

  test("confusion matrix is diagonal: every planted doc predicts its own language") {
    val df = planted.zipWithIndex
      .map { case ((lang, text), i) => (i.toLong, lang, text) }
      .toDF("id", "lang", "text")
      .withColumn("pred", TextAnalysis.langIdWide($"text"))
    val wrong = df.filter($"pred" =!= $"lang")
      .select("lang", "pred", "text").collect()
    assert(wrong.isEmpty,
      "misclassified:\n" + wrong.map(_.mkString(" | ")).mkString("\n"))
    // per-language precision == 1.0 on the fixture, and every language
    // actually appears (the matrix has all 16 rows)
    val langs = df.select("lang").distinct().count()
    assert(langs == 16)
  }

  test("ja/zh split: kana routes ja even when kanji dominate; kana-free ideographs route zh") {
    // 12 ideographs, 3 kana — kana share is small but decisive
    assert(predict("日本語の文章は漢字仮名交じりで書かれます") == "ja")
    assert(predict("中文文章完全用汉字书写没有假名") == "zh")
  }

  test("Latin text quoting a few foreign words stays on the stopword path") {
    assert(predict("the word αβγ is greek and the rest of the text is english") == "en")
    assert(predict("der begriff 日本 ist japanisch und der text ist deutsch") == "de")
  }

  test("astral input: codepoint denominator holds on the 30% boundary; ext-B stays out of zh") {
    val emoji = new String(Character.toChars(0x1F600))
    val extB = new String(Character.toChars(0x20000))
    // 3 Cyrillic of 10 non-space CODEPOINTS — exactly the 30% threshold.
    // An engine counting UTF-16 units (denominator 14) would flip this
    // to the stopword branch (en); Spark's length counts codepoints.
    assert(predict("ввв " + (emoji * 4) + " abc") == "ru")
    // CJK-extension-B ideographs: outside the zh class, inside the
    // denominator — the 7 BMP ideographs still clear 30% (7/9)
    assert(predict((extB * 2) + " 这是一个新房子") == "zh")
  }

  test("langId (the narrow 4-language gate surface) is unchanged by the wide extension") {
    val df = Seq("the cat and the dog is a pet of a man",
      "der hund und die katze das ist gut",
      "el perro y los gatos una casa es",
      "le chien et les chats une maison est")
      .toDF("text")
    assert(df.select(TextAnalysis.langId($"text")).as[String].collect().toSeq ==
      Seq("en", "de", "es", "fr"))
  }

  private def predict(text: String): String =
    Seq(text).toDF("text")
      .select(TextAnalysis.langIdWide($"text")).as[String].head()
}
