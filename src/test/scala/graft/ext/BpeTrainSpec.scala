package graft.ext

import graft.SparkTestBase
import graft.functions.Bpe
import org.apache.spark.sql.functions._

class BpeTrainSpec extends SparkTestBase {

  import spark.implicits._

  /** Independent reference trainer: same spec (adjacent-pair counts
    * weighted by word frequency, argmax by count desc then pair
    * lexicographic, left-to-right non-overlapping replace), written
    * naively over a word-count map.
    */
  private def referenceMerges(wordCounts: Map[String, Long],
                              numMerges: Int): Seq[(String, String)] = {
    var state: Map[Vector[String], Long] = wordCounts.map { case (w, c) =>
      (w.map(_.toString).toVector, c)
    }.groupMapReduce(_._1)(_._2)(_ + _)
    val out = Seq.newBuilder[(String, String)]
    var done = false
    for (_ <- 1 to numMerges if !done) {
      val pc = state.toSeq.flatMap { case (s, c) =>
        s.zip(s.tail).map(p => (p, c))
      }.groupMapReduce(_._1)(_._2)(_ + _).filter(_._2 >= 2)
      if (pc.isEmpty) done = true
      else {
        val ((a, b), _) = pc.minBy { case ((x, y), c) => (-c, x, y) }
        out += ((a, b))
        state = state.map { case (s, c) =>
          val ab = a + b
          val r = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { r += ab; i += 2 }
            else { r += s(i); i += 1 }
          }
          (r.result(), c)
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    out.result()
  }

  test("learnMerges matches an independent reference trainer on a known corpus") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the hat and the bat and the rat"),
      (3L, "that cat in that hat"),
      (4L, "rats pat the fat cats")).toDF("doc_id", "text")
    // reference word counts (whitespace corpus, pre-tokenizer = words here)
    val wc = docs.as[(Long, String)].collect()
      .flatMap(_._2.split(" ")).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val expected = referenceMerges(wc, 12)
    val learned = BpeTrain.learnMerges(docs, $"text", numMerges = 12)
    assert(learned.merges == expected.toIndexedSeq,
      s"learned=${learned.merges} expected=$expected")
  }

  test("learned tables satisfy the composite-after-creator invariant") {
    val docs = graft.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val t = BpeTrain.learnMerges(docs, col("text"), numMerges = 40)
    assert(t.merges.nonEmpty)
    val created = scala.collection.mutable.Set[String]()
    t.merges.foreach { case (a, b) =>
      for (op <- Seq(a, b))
        assert(op.codePointCount(0, op.length) == 1 || created(op),
          s"operand '$op' used before any rule created it")
      created += (a + b)
    }
  }

  test("a learned table drives DISTRIBUTED tokenization codegen'd, matching the driver encoder") {
    val docs = graft.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text").limit(200)
    val t = BpeTrain.learnMerges(docs, col("text"), numMerges = 30)
    val distributed = docs
      .select($"doc_id", Bpe.count($"text", t).as("n"))
      .as[(Long, Long)].collect().toMap
    val pat = graft.functions.BpeUtil.PreTokenPattern.r
    val local = docs.as[(Long, String)].collect().map { case (id, txt) =>
      id -> pat.findAllIn(txt).map(w => t.encodeWord(w).length.toLong).sum
    }.toMap
    assert(distributed == local && distributed.nonEmpty)
    // token stream round-trip: concatenated tokens re-spell each word
    val toks = docs.select($"doc_id", Bpe.tokens($"text", t).as("ts"))
      .as[(Long, Seq[String])].collect().toMap
    docs.as[(Long, String)].collect().foreach { case (id, txt) =>
      assert(toks(id).mkString == pat.findAllIn(txt).mkString)
    }
  }

  test("more merges never increase the corpus token count (compression monotonicity)") {
    val docs = graft.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val sizes = Seq(0, 10, 40).map { k =>
      val t = BpeTrain.learnMerges(docs, col("text"), numMerges = k)
      docs.agg(sum(Bpe.count(col("text"), t))).as[Long].head()
    }
    assert(sizes == sizes.sorted.reverse, sizes.toString)
    assert(sizes.last < sizes.head) // 40 merges genuinely compress
  }
}
