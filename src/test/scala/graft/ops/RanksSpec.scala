package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bucket-offset ranking: the distributed rank must equal the naive
  * single-window rank bit for bit — including ties — for every
  * bucketShift, per group and globally (the property gate q175's
  * oracle pins on real data).
  */
class RanksSpec extends SparkTestBase {

  import spark.implicits._

  // groups of uneven size, clustered scores (many shared high bits),
  // exact ties on s inside and across buckets — but GLOBALLY UNIQUE
  // ids, so (s desc, id asc) is a total order and the naive-vs-bucket
  // comparison is deterministic even with empty `part`
  private def fixture = {
    val base = Map("en" -> 0L, "de" -> 100000L, "fr" -> 200000L)
    val rows = for {
      g <- Seq("en", "de", "fr")
      i <- 0 until (if (g == "en") 37 else if (g == "de") 11 else 5)
    } yield (g, base(g) + i.toLong, (i % 7).toLong * 100L + (if (i % 3 == 0) 0L else i.toLong))
    rows.toDF("g", "id", "s")
  }

  test("per-group bucketRank equals the naive window rank for several bucketShifts") {
    val df = fixture
    val naive = df.withColumn("rank",
      row_number().over(Window.partitionBy("g").orderBy(col("s").desc, col("id").asc)))
      .select("g", "id", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2).toLong).toMap
    for (shift <- Seq(0, 2, 8, 20)) {
      val got = Ranks.bucketRank(df, Seq("g"), col("s"), col("id"), bucketShift = shift)
        .select("g", "id", "rank")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == naive, s"bucketShift=$shift")
    }
  }

  test("global bucketRank (empty part) equals the naive global window") {
    val df = fixture
    val naive = df.withColumn("rank",
      row_number().over(Window.orderBy(col("s").desc, col("id").asc)))
      .select("g", "id", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2).toLong).toMap
    val got = Ranks.bucketRank(df, Seq.empty, col("s"), col("id"))
      .select("g", "id", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == naive)
  }

  test("propTile: tiles partition each group, sizes differ by at most one, top tile = rank prefix") {
    val n = 10
    val out = Ranks.propTile(fixture, Seq("g"), col("s"), col("id"), n)
      .select("g", "id", "rank", "n_part", "tile")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    for ((g, rows) <- out.groupBy(_._1)) {
      val np = rows.head._4
      assert(np == rows.length, s"$g n_part")
      // mirrored arithmetic rule, recomputed independently
      rows.foreach { case (_, _, rank, _, tile) =>
        val expect = math.floor(((rank - 1) * n).toDouble / np.toDouble).toLong + 1
        assert(tile == expect, s"$g rank=$rank")
      }
      // tile sizes balanced within 1 when the group is at least n rows
      if (np >= n) {
        val sizes = rows.groupBy(_._5).values.map(_.length).toSeq
        assert(sizes.max - sizes.min <= 1, s"$g sizes=$sizes")
      }
      // tile 1 is exactly the best-ranked prefix
      val t1 = rows.filter(_._5 == 1L).map(_._3).sorted.toSeq
      assert(t1 == (1L to t1.length.toLong).toSeq, s"$g tile-1 ranks: $t1")
    }
  }

  test("negative and NULL scores raise instead of silently mis-ranking or vanishing") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val neg = Seq(("a", 1L, 5L), ("a", 2L, -1L)).toDF("g", "id", "s")
    val ex1 = intercept[Exception] {
      Ranks.bucketRank(neg, Seq("g"), col("s"), col("id")).collect()
    }
    assert(msgs(ex1).exists(_.contains("non-negative long")), ex1.getMessage)
    // a NULL score would fail the bucket equi-join and silently DROP
    // the row (while group counts still include it) — must raise
    val withNull = Seq(("a", 1L, Some(5L)), ("a", 2L, None))
      .toDF("g", "id", "s")
    val ex2 = intercept[Exception] {
      Ranks.propTile(withNull, Seq("g"), col("s"), col("id"), n = 2).collect()
    }
    assert(msgs(ex2).exists(_.contains("non-negative long")), ex2.getMessage)
  }
}
