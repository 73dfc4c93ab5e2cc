package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the lattice-DP unigram trainer against brute-force
  * enumeration: the forward-backward recurrences against exhaustive
  * segmentation-mass sums (including the per-occurrence posterior
  * masses, the quantity the E-step floor-divides), equivalence with
  * the round-12 exhaustive face's padded mask sums on the ≤3-length
  * universe, the end-to-end fit against an independent recursive
  * reference, the Viterbi encode table, ledger composition, and the
  * measured fallback-fraction claim the lattice face exists for.
  */
class UnigramLatticeSpec extends SparkTestBase {

  import spark.implicits._

  private val WG = UnigramLm.LatticeWeightGrid
  private val CG = UnigramLm.CountGrid
  private val wg = BigInt(WG)

  /** Brute-force segmentations of `w` under a piece-length cap, by
    * recursion (structurally unlike the DP under test).
    */
  private def segs(w: String, cap: Int): Seq[Seq[String]] =
    if (w.isEmpty) Seq(Seq.empty)
    else (1 to math.min(cap, w.length)).flatMap(i =>
      segs(w.drop(i), cap).map(w.take(i) +: _))

  /** Integer mass of one segmentation of an L-codepoint span:
    * Π wt(p) · WG^(L − k) — the DP's scaling, computed directly.
    */
  private def segMass(ps: Seq[String], wt: Map[String, Long],
                      grid: BigInt, spanLen: Int): BigInt =
    ps.map(p => BigInt(wt.getOrElse(p, 0L))).product *
      grid.pow(spanLen - ps.length)

  /** Does segmentation `ps` of the whole word contain a piece starting
    * at `s` with length `l`?
    */
  private def hasOcc(ps: Seq[String], s: Int, l: Int): Boolean = {
    val starts = ps.scanLeft(0)(_ + _.length)
    starts.zip(ps.map(_.length)).contains((s, l))
  }

  /** Deterministic pseudo-random weights over the pieces of `words`,
    * with ~1/5 of pieces dropped to 0 to exercise the zero-weight
    * paths (absent ≡ 0 everywhere).
    */
  private def pseudoWeights(words: Seq[String], cap: Int): Map[String, Long] =
    words.flatMap(w =>
      for {
        i <- 0 until w.length
        l <- 1 to math.min(cap, w.length - i)
      } yield w.substring(i, i + l)).distinct.map { p =>
      val h = scala.util.hashing.MurmurHash3.stringHash(p)
      p -> (if (h % 5 == 0) 0L else ((h & 0x7fffffff) % 97 + 1).toLong)
    }.toMap

  private val words8 = Seq("a", "ab", "aba", "abab", "banana",
    "abcdefgh", "zzzzzzzz", "mississi")

  test("forward/backward DP == brute-force segmentation sums (alpha, beta, Z, occurrence mass)") {
    for (cap <- Seq(3, 8); w <- words8) {
      val wt = pseudoWeights(words8, cap)
      val L = w.length
      val a = UnigramLm.latticeForward(w, wt, cap, wg)
      val b = UnigramLm.latticeBackward(w, wt, cap, wg)
      for (i <- 0 to L) {
        val bruteA = segs(w.take(i), cap).map(segMass(_, wt, wg, i)).sum
        assert(a(i) == bruteA, s"alpha($i) of '$w' cap=$cap")
        val bruteB = segs(w.drop(i), cap).map(segMass(_, wt, wg, L - i)).sum
        assert(b(i) == bruteB, s"beta($i) of '$w' cap=$cap")
      }
      assert(a(L) == b(0), s"Z mismatch for '$w' cap=$cap")
      // the E-step's per-occurrence quantity: every segmentation
      // through (s, l) counted exactly once
      for (s <- 0 until L; l <- 1 to math.min(L - s, cap)) {
        val p = w.substring(s, s + l)
        val dp = a(s) * BigInt(wt.getOrElse(p, 0L)) * wg.pow(l - 1) * b(s + l)
        val brute = segs(w, cap).filter(hasOcc(_, s, l))
          .map(segMass(_, wt, wg, L)).sum
        assert(dp == brute, s"occurrence ($s,$l)='$p' of '$w' cap=$cap")
      }
    }
  }

  test("lattice == exhaustive padded mask sums on the <=3 universe (round-12 face cross-check)") {
    // On the exhaustive face's own universe and 2^20 grid, the DP's
    // occurrence mass times the word's pad constant WG^(M-L) must
    // equal the padded per-mask numerators (emStep's n_m) summed over
    // the masks whose segmentation contains the occurrence — the two
    // trainers differ ONLY in where they floor-divide.
    val M = 3
    val grid20 = BigInt(UnigramLm.WeightGrid)
    val words3 = Seq("a", "ab", "aba", "bab", "abc", "ccc")
    val wt = words3.flatMap(w =>
      for {
        i <- 0 until w.length
        l <- 1 to (w.length - i)
      } yield w.substring(i, i + l)).distinct.map { p =>
      val h = scala.util.hashing.MurmurHash3.stringHash(p)
      p -> (if (h % 4 == 0) 0L else ((h & 0x7fffffff) % 50000 + 1).toLong)
    }.toMap
    for (w <- words3) {
      val L = w.length
      val a = UnigramLm.latticeForward(w, wt, M, grid20)
      val b = UnigramLm.latticeBackward(w, wt, M, grid20)
      val pad = grid20.pow(M - L)
      val allSegs = segs(w, M)
      val zPadded = allSegs.map(ps =>
        ps.map(p => BigInt(wt.getOrElse(p, 0L))).padTo(M, grid20).product).sum
      assert(a(L) * pad == zPadded, s"padded Z of '$w'")
      for (s <- 0 until L; l <- 1 to (L - s)) {
        val p = w.substring(s, s + l)
        val dp = a(s) * BigInt(wt.getOrElse(p, 0L)) * grid20.pow(l - 1) * b(s + l)
        val masked = allSegs.filter(hasOcc(_, s, l)).map(ps =>
          ps.map(q => BigInt(wt.getOrElse(q, 0L))).padTo(M, grid20).product).sum
        assert(dp * pad == masked, s"padded occurrence ($s,$l) of '$w'")
      }
    }
  }

  /** Independent reference fit: brute-force occurrence masses, plain
    * maps, recursion — the floor-division points (once per occurrence,
    * once per renorm) are the only shared structure with the DP.
    */
  private def refTrain(words: Map[String, Long], cap: Int,
                       iters: Int): Map[String, Long] = {
    def renorm(c: Map[String, BigInt]): Map[String, Long] = {
      val tot = c.values.sum
      c.map { case (p, v) => p -> (v * wg / tot).toLong }
    }
    val seed = words.toSeq.flatMap { case (w, f) =>
      (for {
        i <- 0 until w.length
        l <- 1 to math.min(cap, w.length - i)
      } yield w.substring(i, i + l)).map(_ -> BigInt(f))
    }.groupMapReduce(_._1)(_._2)(_ + _)
    var wt = renorm(seed)
    for (_ <- 1 to iters) {
      val ec = scala.collection.mutable.HashMap.empty[String, BigInt]
      words.foreach { case (w, f) =>
        val all = segs(w, cap)
        val z = all.map(segMass(_, wt, wg, w.length)).sum
        if (z > 0)
          for (s <- 0 until w.length; l <- 1 to math.min(w.length - s, cap)) {
            val p = w.substring(s, s + l)
            val mass = all.filter(hasOcc(_, s, l)).map(segMass(_, wt, wg, w.length)).sum
            if (mass > 0)
              ec.update(p, ec.getOrElse(p, BigInt(0)) + BigInt(f) * mass * BigInt(CG) / z)
          }
      }
      wt = renorm(ec.toMap)
    }
    wt
  }

  test("trainLattice == independent brute-force reference on a mixed-length corpus") {
    val docs = Seq(
      (1L, "the quick brownfox jumps over the lazy dog"),
      (2L, "The QUICK brown fox, jumps! over 42 the dog"),
      (3L, "banana bandana banana cabana the the the"),
      (4L, "aaaaaaaa bb aaaaaaaa cc abadacab"),
      (5L, "  padded   whitespace   tokens  here  "))
      .toDF("doc_id", "text")
    for (cap <- Seq(4, 8)) {
      val got = UnigramLm.trainLattice(docs, $"text", maxWordLen = 8,
        maxPieceLen = cap, iters = 2)
      val words = docs.select(explode(split(lower(trim($"text")), "\\s+")).as("w"))
        .filter($"w".rlike("^[a-z]{1,8}$"))
        .groupBy($"w").count()
        .as[(String, Long)].collect().toMap
      val want = refTrain(words, cap, 2).toSeq.filter(_._2 > 0L).sortBy(_._1)
      assert(got == want, s"cap=$cap")
    }
  }

  test("encodeTableLattice == brute-force argmax (max mass, then fewest pieces); zero-score fallback") {
    val wt = pseudoWeights(words8, 8) ++ Map("unseen" -> 0L)
    val table = UnigramLm.encodeTableLattice(words8 :+ "qqq", wt, 8).toMap
    for (w <- words8) {
      val all = segs(w, 8).map(ps => (ps, segMass(ps, wt, wg, w.length)))
      val best = all.map(_._2).max
      val expected =
        if (best == 0) w.length
        else all.filter(_._2 == best).map(_._1.length).min
      assert(table(w) == expected, s"n_pieces('$w')")
    }
    // 'qqq': no piece of it carries weight -> codepoint fallback
    assert(table("qqq") == 3)
  }

  test("ledger composition: admit then trainLatticeFromLedger == trainLattice on the union") {
    val a = Seq((1L, "banana bandana the quick"), (2L, "fox the banana")).toDF("doc_id", "text")
    val b = Seq((3L, "quick quick bandana dog")).toDF("doc_id", "text")
    val both = a.union(b)
    val viaLedger = UnigramLm.trainLatticeFromLedger(
      UnigramLm.admit(UnigramLm.ledger(a, $"text", maxWordLen = 8), b, $"text"),
      maxPieceLen = 8, iters = 2)
    val direct = UnigramLm.trainLattice(both, $"text", maxWordLen = 8,
      maxPieceLen = 8, iters = 2)
    assert(viaLedger == direct)
  }

  test("word-universe cap: the driver collects <= maxWords rows, deterministic top by (freq desc, word asc)") {
    // 260 distinct words, frequencies 1..26 repeating: the cap must
    // keep exactly the top-K by freq with ties broken on the word,
    // never more
    val words = (0 until 260).map(i => (i.toLong,
      (("w" + ('a' + i / 26).toChar.toString + ('a' + i % 26).toChar.toString) + " ") * (1 + i % 26)))
    val docs = words.toDF("doc_id", "text")
    val capped = UnigramLm.wordUniverse(docs, $"text", maxWordLen = 8, maxWords = 50)
    assert(capped.size == 50)
    val full = UnigramLm.wordUniverse(docs, $"text", maxWordLen = 8)
    assert(full.size == 260)
    val expected = full.sortBy { case (w, f) => (-f, w) }.take(50).toSet
    assert(capped.toSet == expected)
    // a trainer under the cap == the trainer on a corpus holding ONLY
    // the kept words (the cap is a pure universe cut, nothing else)
    val keptSet = expected.map(_._1)
    val onlyKept = words.map { case (id, t) =>
      (id, t.split("\\s+").filter(keptSet).mkString(" ")) }
      .filter(_._2.nonEmpty).toDF("doc_id", "text")
    val viaCap = UnigramLm.trainLattice(docs, $"text", maxWordLen = 8,
      maxPieceLen = 8, iters = 1, maxWords = 50)
    val direct = UnigramLm.trainLattice(onlyKept, $"text", maxWordLen = 8,
      maxPieceLen = 8, iters = 1)
    assert(viaCap == direct)
    // the byte face and the ledger read take the same cap
    assert(UnigramLm.wordUniverseBytes(docs, $"text", 8, maxWords = 50).size == 50)
    assert(UnigramLm.trainLatticeFromLedger(
      UnigramLm.ledger(docs, $"text", maxWordLen = 8),
      maxPieceLen = 8, iters = 1, maxWords = 50) == direct)
  }

  test("guards: maxPieceLen must not exceed the word universe") {
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      UnigramLm.trainLattice(docs, $"text", maxWordLen = 4, maxPieceLen = 5)
    }
    intercept[IllegalArgumentException] {
      UnigramLm.trainLatticeFromLedger(
        UnigramLm.ledger(docs, $"text", maxWordLen = 4), maxPieceLen = 5)
    }
    intercept[IllegalArgumentException] {
      UnigramLm.trainLattice(docs, $"text", maxWordLen = 17)
    }
  }

  test("measured: lattice vocab at maxWordLen=8 covers the full corpus (zero fallback) and compresses") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val vocab = UnigramLm.trainLattice(docs, $"text", maxWordLen = 8,
      maxPieceLen = 8, iters = 2)
    val universe = UnigramLm.wordCounts(docs, $"text", 8)
      .select($"word").as[String].collect().toSeq
    val table = UnigramLm.encodeTableLattice(universe, vocab.toMap, 8)
      .toDF("word", "n_pieces")
    val row = TokenizerEval.fertility(
        docs.withColumn("g", lit("all")), $"g", $"text", table)
      .select($"n_fallback", $"fertility").head()
    val charOnly = TokenizerEval.fertility(
        docs.withColumn("g", lit("all")), $"g", $"text", table.limit(0))
      .select($"fertility").as[Double].head()
    info(f"lattice fallback=${row.getLong(0)} fertility=${row.getDouble(1)}%.3f chars-only=$charOnly%.3f")
    // the round-12 [a-z]{1,3} face left most words on codepoint
    // fallback; the lattice face's trained universe covers EVERY
    // whitespace token of this corpus
    assert(row.getLong(0) == 0L, "no word may fall back to codepoints")
    assert(row.getDouble(1) < charOnly,
      s"vocab must compress below the char baseline: ${row.getDouble(1)} vs $charOnly")
  }
}
