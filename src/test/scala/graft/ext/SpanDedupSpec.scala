package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SpanDedupSpec extends SparkTestBase {

  import spark.implicits._

  private def clean(rows: Seq[(Long, String)], n: Int, minCount: Long = 2L) =
    SpanDedup.cleanRepeatedSpans(rows.toDF("doc_id", "text"), $"doc_id", $"text", n, minCount)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)

  test("SpanDedup: a span shared by two docs is cut from both, unique text survives") {
    val out = clean(Seq(
      (1L, "alpha beta gamma delta epsilon unique one tail"),
      (2L, "other prefix alpha beta gamma delta epsilon different end"),
      (3L, "totally unrelated words in this document here")), n = 5)
    // the 5-token span "alpha beta gamma delta epsilon" occurs twice
    assert(out(0) == ((1L, "unique one tail", 3L, 5L)))
    assert(out(1) == ((2L, "other prefix different end", 4L, 5L)))
    assert(out(2)._3 == 7L && out(2)._4 == 0L) // untouched
  }

  test("SpanDedup: a doc repeating its OWN span is cut (multiplicity, not df)") {
    val out = clean(Seq(
      (1L, "a b c d e x a b c d e y"),
      (2L, "completely different words here now then")), n = 5)
    assert(out(0)._2 == "x y" && out(0)._4 == 10L)
    assert(out(1)._4 == 0L)
  }

  test("SpanDedup: spans LONGER than n are removed whole (window union covers them)") {
    val long = "p q r s t u v w" // 8-token duplicated span
    val out = clean(Seq(
      (1L, s"start1 one $long end1"),
      (2L, s"start2 two $long end2 extra")), n = 5)
    assert(out(0)._2 == "start1 one end1")
    assert(out(1)._2 == "start2 two end2 extra")
  }

  test("SpanDedup: identical whole documents empty out; short docs are never cut") {
    val out = clean(Seq(
      (1L, "dup dup dup dup dup dup"),
      (2L, "dup dup dup dup dup dup"),
      (3L, "too short")), n = 5)
    assert(out(0) == ((1L, "", 0L, 6L)))
    assert(out(1) == ((2L, "", 0L, 6L)))
    assert(out(2) == ((3L, "too short", 2L, 0L)))
  }

  test("SpanDedup: random corpora match a naive driver-side reference") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      // small alphabet forces plenty of accidental duplicate grams
      val words = Vector("a", "b", "c", "d", "e")
      val n = 3
      val docs = (1L to 25L).map { i =>
        (i, Seq.fill(3 + rnd.nextInt(15))(words(rnd.nextInt(words.size))).mkString(" "))
      }
      // naive reference: count every n-gram occurrence, mask covered tokens
      val grams = scala.collection.mutable.Map[Seq[String], Int]()
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
      toks.values.foreach { ts =>
        ts.sliding(n).filter(_.size == n).foreach(g => grams(g) = grams.getOrElse(g, 0) + 1)
      }
      val expected = docs.map { case (id, _) =>
        val ts = toks(id)
        val starts = (0 to ts.size - n).filter(s => grams(ts.slice(s, s + n)) >= 2)
        val covered = starts.flatMap(s => s until s + n).toSet
        val kept = ts.zipWithIndex.collect { case (t, i) if !covered(i) => t }
        (id, kept.mkString(" "), kept.size.toLong, (ts.size - kept.size).toLong)
      }
      val got = clean(docs, n)
      assert(got.toSeq == expected, s"seed=$seed")
    }
  }

  test("SpanMask: native two-pointer sweep ≡ the HOF filter/exists formulation") {
    import org.apache.spark.sql.functions.{filter => ffilter, exists => fexists, _}
    val rnd = new scala.util.Random(7)
    val rows = (1 to 60).map { i =>
      val len = rnd.nextInt(20)
      val toks = Seq.tabulate(len)(k => s"t$k")
      val n = 1 + rnd.nextInt(4)
      val starts = (1 to math.max(len - n + 1, 0))
        .filter(_ => rnd.nextBoolean()).sorted
      (i, toks, starts, n)
    }
    rows.groupBy(_._4).foreach { case (n, grp) =>
      val df = grp.map(r => (r._1, r._2, r._3)).toDF("id", "toks", "starts")
      val nat = graft.functions.SpanMask(col("toks"), col("starts"), n)
      val hof = ffilter(col("toks"), (_, i) =>
        !fexists(col("starts"), s => s <= i + 1 && i + 1 < s + n))
      val bad = df.select(col("id"), nat.as("a"), hof.as("b"))
        .filter(not(col("a") === col("b"))).count()
      assert(bad == 0, s"n=$n")
    }
  }

  test("SpanMask: nullable-element arrays — output type tracks input, nulls pass through, null starts skipped") {
    // SQL-registered span_mask is callable on arbitrary arrays: an
    // array with null tokens must produce a declared-nullable output
    // (not a containsNull=false array carrying nulls), and null start
    // slots must not erase anything
    val df = Seq(1).toDF("x").select(
      graft.functions.SpanMask(
        expr("array('a', CAST(NULL AS STRING), 'c', 'd')"),
        expr("array(3)"), 2).as("m"),
      graft.functions.SpanMask(
        expr("array('a', 'b', 'c')"),
        expr("array(CAST(NULL AS INT), 2)"), 1).as("ns"))
    val schema = df.schema
    assert(schema("m").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, containsNull = true),
      s"output must declare containsNull=true for nullable input, got ${schema("m").dataType}")
    val row = df.head()
    assert(row.getSeq[String](0) == Seq("a", null), row.toString)
    assert(row.getSeq[String](1) == Seq("a", "c"), row.toString)
  }

  test("SpanDedup: result is partition-invariant") {
    val docs = (1L to 40L).map { i =>
      val span = if (i % 4 == 0) " shared span alpha beta gamma delta epsilon" else ""
      (i, s"document $i body token$i more$i filler$i$span")
    }
    val df = docs.toDF("doc_id", "text")
    val a = SpanDedup.cleanRepeatedSpans(df.repartition(1), $"doc_id", $"text", 5)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    val b = SpanDedup.cleanRepeatedSpans(df.repartition(7, $"text"), $"doc_id", $"text", 5)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
    assert(a.count(_._4 > 0) == 10) // exactly the planted docs were cut
  }
}
