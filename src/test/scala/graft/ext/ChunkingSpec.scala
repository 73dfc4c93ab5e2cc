package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkTestBase {

  import spark.implicits._

  test("tokenChunks: windows, overlap, short tail, tiny doc") {
    val doc = (1 to 95).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, doc), (2L, "only three tokens"), (3L, " ")).toDF("id", "t")
    val out = Chunking.tokenChunks(df, $"id", $"t", width = 40, stride = 30)
      .as[(Long, Long, String, Long)].collect().sortBy(r => (r._1, r._2))

    val d1 = out.filter(_._1 == 1L)
    // starts 1, 31, 61 -> chunk lengths 40, 40, 35; the window at 61
    // reaches w95, so no (strictly contained) start at 91 is emitted
    assert(d1.map(_._2).toSeq == Seq(0L, 1L, 2L))
    assert(d1.map(_._4).toSeq == Seq(40L, 40L, 35L))
    assert(d1(0)._3.startsWith("w1 w2 ") && d1(0)._3.endsWith(" w40"))
    assert(d1(1)._3.startsWith("w31 ") && d1(1)._3.endsWith(" w70"))
    assert(d1(2)._3.startsWith("w61 ") && d1(2)._3.endsWith(" w95"))
    // overlap: chunk k starts 10 tokens before chunk k-1 ends
    assert(d1(1)._3.split(" ").take(10).toSeq == d1(0)._3.split(" ").takeRight(10).toSeq)

    val d2 = out.filter(_._1 == 2L)
    assert(d2.toSeq == Seq((2L, 0L, "only three tokens", 3L)))
    // blank doc still emits exactly one (empty) chunk
    assert(out.count(_._1 == 3L) == 1)
  }

  test("tokenChunks: tail past the last full window still gets covered") {
    // len=101, width=40, stride=30: window at 61 ends at 100, so a
    // start at 91 IS needed (11-token tail); len=100 stops at 61.
    for ((n, starts) <- Seq(101 -> Seq(1, 31, 61, 91), 100 -> Seq(1, 31, 61))) {
      val doc = (1 to n).map(i => s"w$i").mkString(" ")
      val out = Chunking.tokenChunks(Seq((1L, doc)).toDF("id", "t"),
          $"id", $"t", width = 40, stride = 30)
        .as[(Long, Long, String, Long)].collect().sortBy(_._2)
      assert(out.map(_._3.split(" ").head).toSeq == starts.map(s => s"w$s"))
      assert(out.last._3.endsWith(s" w$n"))
    }
  }

  test("tokenChunks: stride == size means zero overlap, full cover") {
    val doc = (1 to 10).map(i => s"t$i").mkString(" ")
    val out = Chunking.tokenChunks(Seq((1L, doc)).toDF("id", "t"),
        $"id", $"t", width = 4, stride = 4)
      .as[(Long, Long, String, Long)].collect().sortBy(_._2)
    assert(out.map(_._3).mkString(" ") == doc)
    assert(out.map(_._4).toSeq == Seq(4L, 4L, 2L))
  }

  test("bpeTokenChunks: real-token windows, conservation, tails, empty doc") {
    import graft.functions.{Bpe, BpeUtil}
    val doc = "the would station which could notwithstanding estimate " * 6
    val df = Seq((1L, doc), (2L, "the"), (3L, "")).toDF("id", "t")
    // zero-overlap chunks reassemble the exact token stream
    val streamed = Chunking.bpeTokenChunks(df.filter($"id" === 1L), $"id", $"t",
        width = 16, stride = 16)
      .orderBy($"chunk_id").as[(Long, Long, String, Long)].collect()
    val full = df.filter($"id" === 1L).select(Bpe.tokens($"t"))
      .as[Seq[String]].head()
    assert(streamed.map(_._3).filter(_.nonEmpty).mkString(" ") == full.mkString(" "))
    assert(streamed.map(_._4).sum == full.length)
    // every chunk is exactly width tokens except a shorter covering tail
    assert(streamed.init.forall(_._4 == 16L) && streamed.last._4 <= 16L)

    // overlap: stride < width duplicates width-stride tokens per step
    val over = Chunking.bpeTokenChunks(df.filter($"id" === 1L), $"id", $"t",
        width = 16, stride = 12)
      .orderBy($"chunk_id").as[(Long, Long, String, Long)].collect()
    assert(over(1)._3.split(" ").take(4).toSeq ==
      over(0)._3.split(" ").takeRight(4).toSeq)

    // single-token and empty documents still emit exactly one chunk
    val tiny = Chunking.bpeTokenChunks(df.filter($"id" >= 2L), $"id", $"t",
        width = 16, stride = 16)
      .as[(Long, Long, String, Long)].collect().sortBy(_._1)
    assert(tiny.toSeq == Seq((2L, 0L, "the", 1L), (3L, 0L, "", 0L)))
  }

  test("withBpeCost: chunk budgets in real tokenizer tokens") {
    import graft.functions.{Bpe, BpeUtil}
    val doc = "the would station which could " * 8
    val out = Chunking.withBpeCost(
      Chunking.tokenChunks(Seq((1L, doc)).toDF("id", "t"),
        $"id", $"t", width = 10, stride = 10))
      .select($"chunk", $"n_bpe").as[(String, Long)].collect()
    assert(out.nonEmpty)
    for ((chunk, nBpe) <- out) {
      val m = java.util.regex.Pattern.compile(BpeUtil.PreTokenPattern).matcher(chunk)
      var n = 0L
      while (m.find()) n += BpeUtil.encodeWord(m.group()).length
      assert(nBpe == n, s"chunk '$chunk'")
    }
  }
}
