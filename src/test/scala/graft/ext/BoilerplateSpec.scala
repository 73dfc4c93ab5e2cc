package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkTestBase {

  import spark.implicits._

  test("frequentGrams: df counts distinct docs; threshold filters") {
    val footer = "all rights reserved"
    val docs = (1 to 10).map(i => (i.toLong, s"unique words $i here $footer")) ++
      Seq((11L, "nothing shared at all"),
        // gram repeated INSIDE one doc must count once
        (12L, s"$footer $footer"))
    val out = Boilerplate.frequentGrams(docs.toDF("id", "t"), $"id", $"t",
        n = 3, minDf = 5L)
      .as[(String, Long)].collect().toMap
    assert(out("all rights reserved") == 11L) // 10 footers + doc 12
    assert(out.keys.forall(_ != "nothing shared at"))
    // "words N here" varies per doc -> below threshold
    assert(out.keySet.forall(g => g.contains("rights") || g.contains("reserved") ||
      g.contains("here all")))
  }
}
