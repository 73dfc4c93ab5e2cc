package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkTestBase {

  import spark.implicits._

  private val WG = UnigramLm.WeightGrid
  private val CG = UnigramLm.CountGrid

  /** Independent reference trainer: same spec, structurally different
    * implementation — segmentations by RECURSION (not breakpoint
    * masks), accumulation order by segmentation-list order (not mask
    * order; exact integer sums make order irrelevant, which this
    * cross-checks), plain Maps throughout.
    */
  private def refSegmentations(w: String): Seq[Seq[String]] =
    if (w.isEmpty) Seq(Seq.empty)
    else (1 to w.length).flatMap(i =>
      refSegmentations(w.drop(i)).map(w.take(i) +: _))

  private def refRenorm(c: Map[String, BigInt]): Map[String, Long] = {
    val tot = c.values.sum
    c.map { case (p, v) => p -> (v * WG / tot).toLong }
  }

  /** One reference EM pass (recursive segmentations, plain maps). */
  private def refOneStep(words: Map[String, Long], wt: Map[String, Long],
                         maxWordLen: Int): Map[String, Long] = {
    val ec = scala.collection.mutable.HashMap.empty[String, BigInt]
    words.foreach { case (w, f) =>
      val segs = refSegmentations(w)
      val withN = segs.map { ps =>
        (ps, ps.map(p => BigInt(wt.getOrElse(p, 0L)))
          .padTo(maxWordLen, BigInt(WG)).product)
      }
      val z = withN.map(_._2).sum
      if (z > 0) withN.foreach { case (ps, n) =>
        val contrib = BigInt(f) * n * CG / z
        ps.foreach(p => ec.update(p, ec.getOrElse(p, BigInt(0)) + contrib))
      }
    }
    refRenorm(ec.toMap)
  }

  /** Reference fit, UNFILTERED (zero-weight entries retained). */
  private def refTrainAll(words: Map[String, Long], maxWordLen: Int,
                          iters: Int): Map[String, Long] = {
    val seed = words.toSeq.flatMap { case (w, f) =>
      (for {
        i <- 0 until w.length
        l <- 1 to (w.length - i)
      } yield w.substring(i, i + l)).map(_ -> BigInt(f))
    }.groupMapReduce(_._1)(_._2)(_ + _)
    var wt = refRenorm(seed)
    for (_ <- 1 to iters) wt = refOneStep(words, wt, maxWordLen)
    wt
  }

  private def refTrain(words: Map[String, Long], maxWordLen: Int,
                       iters: Int): Map[String, Long] =
    refTrainAll(words, maxWordLen, iters).filter(_._2 > 0L)

  private val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "a cab and a cat ate"),
    (3L, "he ate the ham"),
    (4L, "cat cab cat ham the the")).toDF("doc_id", "text")

  test("train matches the independent recursive-reference trainer") {
    val words = corpus.as[(Long, String)].collect()
      .flatMap(_._2.split(" ")).filter(_.matches("^[a-z]{1,3}$"))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = refTrain(words, maxWordLen = 3, iters = 2)
    val learned = UnigramLm.train(corpus, $"text", maxWordLen = 3, iters = 2)
    assert(learned.toMap == expected,
      s"learned=${learned.toMap}\nexpected=$expected")
    // piece-ordered output contract
    assert(learned.map(_._1) == learned.map(_._1).sorted)
  }

  test("train is partition-invariant") {
    val a = UnigramLm.train(corpus.repartition(1), $"text", 3, 2)
    val b = UnigramLm.train(corpus.repartition(7), $"text", 3, 2)
    assert(a == b)
  }

  test("pruneVocab keeps every char piece plus the ranked multi-char survivors") {
    val wt = Map("a" -> 0L, "b" -> 7L, "ab" -> 50L, "ba" -> 50L,
      "abc" -> 60L, "bc" -> 0L)
    val kept = UnigramLm.pruneVocab(wt, keepMulti = 2)
    // chars always survive (even at weight 0); multi ties break on
    // the piece: abc(60), then ab beats ba at 50
    assert(kept == Map("a" -> 0L, "b" -> 7L, "abc" -> 60L, "ab" -> 50L))
    // zero-weight multi pieces never make the cut even with room
    assert(!UnigramLm.pruneVocab(wt, keepMulti = 10).contains("bc"))
  }

  test("trainPruned matches the reference fit -> prune -> post-EM sequence") {
    val words = corpus.as[(Long, String)].collect()
      .flatMap(_._2.split(" ")).filter(_.matches("^[a-z]{1,3}$"))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    // reference: the same recursive-reference trainer, pruned by the
    // documented rule, then one more reference EM pass
    val fit2 = refTrainAll(words, 3, 2)
    val pruned = UnigramLm.pruneVocab(fit2, keepMulti = 3)
    val expected = refOneStep(words, pruned, 3).filter(_._2 > 0L)
    val got = UnigramLm.trainPruned(corpus, $"text", maxWordLen = 3,
      emIters = 2, keepMulti = 3, postIters = 1)
    assert(got.toMap == expected, s"got=${got.toMap}\nexpected=$expected")
  }

  test("encodeTable: exact Viterbi with documented tie-breaks and zero fallback") {
    // hand-built weights: "ab" dominant, chars weak
    val wts = Map("ab" -> 1000L, "a" -> 10L, "b" -> 10L, "c" -> 10L,
      "abc" -> 0L, "bc" -> 0L, "ac" -> 0L)
    val tab = UnigramLm.encodeTable(Seq("ab", "abc", "xyz"), wts, 3).toMap
    // "ab": whole-piece (1000·WG·WG) beats chars (10·10·WG) → 1 piece
    assert(tab("ab") == 1)
    // "abc": best is ab+c (1000·10·WG) over a+b+c (10·10·10) and the
    // zero-weight whole word → 2 pieces
    assert(tab("abc") == 2)
    // "xyz": every substring weight 0 → every mask scores 0 → fallback
    // to codepoints
    assert(tab("xyz") == 3)
    // tie-break: all weights equal → products tie only between equal-k
    // masks; fewer pieces wins
    val flat = Map("d" -> 5L, "e" -> 5L, "de" -> 5L)
    // "de" as one piece: 5·WG·WG; as d+e: 5·5·WG — whole word wins
    assert(UnigramLm.encodeTable(Seq("de"), flat, 3).toMap.apply("de") == 1)
  }

  test("encode: broadcast vocab join with codepoint fallback off-universe") {
    val docs = Seq((1L, "ab abc zz9 throughout"),
      (2L, "")).toDF("doc_id", "text")
    val table = Seq(("ab", 1), ("abc", 2), ("zz", 1)).toDF("word", "n_pieces")
    val out = UnigramLm.encode(docs, $"doc_id", $"text", table)
      .orderBy($"doc_id").as[(Long, Long, Long)].collect()
    // doc 1: ab→1, abc→2, zz9→len 3 (off-universe), throughout→len 10
    assert(out(0) == ((1L, 4L, 16L)))
    // empty text: one empty token, fallback length 0
    assert(out(1) == ((2L, 1L, 0L)))
  }

  test("word-count ledger: admit == rebuild, retract == rebuild, both desyncs raise") {
    val old = corpus.filter($"doc_id" <= 2)
    val delta = corpus.filter($"doc_id" > 2)
    val merged = UnigramLm.admitWordCounts(
      UnigramLm.wordCounts(old, $"text", 3), delta, $"text", 3)
      .as[(String, Long)].collect().toMap
    val full = UnigramLm.wordCounts(corpus, $"text", 3)
      .as[(String, Long)].collect().toMap
    assert(merged == full)
    // retract the delta back out: state returns to the old corpus
    val back = UnigramLm.retractWordCounts(
      UnigramLm.wordCounts(corpus, $"text", 3), delta, $"text", 3)
      .as[(String, Long)].collect().toMap
    assert(back == UnigramLm.wordCounts(old, $"text", 3)
      .as[(String, Long)].collect().toMap)
    // desync 1: retracting never-admitted content raises
    val alien = Seq((99L, "zzz zzz")).toDF("doc_id", "text")
    intercept[Exception] {
      UnigramLm.retractWordCounts(
        UnigramLm.wordCounts(old, $"text", 3), alien, $"text", 3).collect()
    }
    // desync 2: over-deleting a known word raises
    val over = Seq((99L, "the the the the the the the the the the the the"))
      .toDF("doc_id", "text")
    intercept[Exception] {
      UnigramLm.retractWordCounts(
        UnigramLm.wordCounts(old, $"text", 3), over, $"text", 3).collect()
    }
    // trainFromState over maintained state == train from scratch
    val viaState = UnigramLm.trainFromState(
      UnigramLm.admitWordCounts(
        UnigramLm.wordCounts(old, $"text", 3), delta, $"text", 3), 3, 2)
    assert(viaState == UnigramLm.train(corpus, $"text", 3, 2))
  }

  test("vocab serving table round-trips parquet; encode through reloaded state is identical") {
    val vocab = UnigramLm.train(corpus, $"text", maxWordLen = 3, iters = 2)
    val universe = UnigramLm.wordCounts(corpus, $"text", 3)
      .select($"word").as[String].collect().toSeq
    val table = UnigramLm.encodeTable(universe, vocab.toMap, 3)
      .toDF("word", "n_pieces")
    val dir = java.nio.file.Files.createTempDirectory("uni-model").toString
    UnigramLm.writeVocab(table, dir)
    val reloaded = UnigramLm.readVocab(spark, dir)
    val a = UnigramLm.encode(corpus, $"doc_id", $"text", table)
      .as[(Long, Long, Long)].collect().toSet
    val b = UnigramLm.encode(corpus, $"doc_id", $"text", reloaded)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("compression comparison vs BPE on the same short-word corpus") {
    // the honest fixture: repeated short words where subword structure
    // exists ("cat"/"cab" share "ca"; "the" repeats)
    val vocab = UnigramLm.train(corpus, $"text", maxWordLen = 3, iters = 2)
    val universe = UnigramLm.wordCounts(corpus, $"text", 3)
      .select($"word").as[String].collect().toSeq
    val table = UnigramLm.encodeTable(universe, vocab.toMap, 3)
      .toDF("word", "n_pieces")
    val uni = UnigramLm.encode(corpus, $"doc_id", $"text", table)
      .agg(sum($"n_pieces")).as[Long].head()
    val chars = corpus.select(
        explode(split(lower(trim($"text")), "\\s+")).as("w"))
      .agg(sum(length($"w"))).as[Long].head()
    val merges = BpeTrain.learnMerges(corpus, $"text", numMerges = 16)
    val bpe = corpus.select(
        graft.functions.Bpe.count($"text", merges).as("n"))
      .agg(sum($"n")).as[Long].head()
    // both subword schemes must compress below the character baseline
    assert(uni < chars, s"unigram $uni !< chars $chars")
    assert(bpe < chars, s"bpe $bpe !< chars $chars")
    info(s"corpus chars=$chars unigram_pieces=$uni bpe_tokens=$bpe")
  }
}
