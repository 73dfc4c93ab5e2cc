package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer vocabulary induction —
  * the OTHER half of the modern tokenizer space next to
  * [[BpeTrain]]: instead of greedily merging the most frequent pair,
  * unigram training keeps a candidate piece inventory and runs EM —
  * the E-step distributes each word's probability mass over its
  * possible segmentations, the M-step re-estimates piece weights from
  * the expected counts (Kudo 2018, "Subword Regularization", §3.2;
  * cf. reference `load_hhs.py`-era pipelines have no tokenizer at all
  * — this is extension surface).
  *
  * EXACT-INTEGER discipline (what makes this oracle-checkable where
  * SentencePiece's float EM is not): piece weights live on the
  * 2^20 integer grid, a segmentation's likelihood numerator is the
  * integer product of its piece weights padded to exactly `maxWordLen`
  * factors with the grid constant (the pad is a per-word uniform
  * scale, so it cancels in the posterior n_m / Z_w), and every
  * posterior contribution is one exact integer floor-division
  * `(freq · n_m · CountGrid) / Z_w`. No float appears anywhere, so
  * the fit is a pure function of the corpus — partition-invariant,
  * order-invariant, and bit-identical in any engine with 128-bit
  * integer arithmetic (gate q185 pins 2 EM iterations cross-engine in
  * DuckDB HUGEINT; the widest intermediate, freq · WG³ · CG, stays
  * below 2¹²⁷ for corpora up to ~10¹⁴ training tokens).
  *
  * Scale shape (the [[BpeTrain.learnMerges]] contract): the corpus is
  * touched exactly once — one tokenize + grouped count; everything
  * after runs on the VOCABULARY-BOUNDED word table. Training is
  * restricted to words of ≤ `maxWordLen` codepoints over [a-z]: that
  * universe is finite (≤ Σ 26^l), so no frequency cap is even needed,
  * and segmentations are enumerated EXHAUSTIVELY (2^(len−1) masks) —
  * the E-step is exact, not a Viterbi approximation. A 100 TB corpus
  * and a 1 GB corpus produce the same-sized driver state.
  * `maxWordLen` beyond ~16 would need the lattice-DP form; the
  * bounded form is the oracle-gated one (the cross-engine HUGEINT
  * bound above assumes maxWordLen ≤ 3 — larger values stay exact
  * here via BigInt but leave DuckDB mirrorability behind).
  *
  * Longer / non-[a-z] words are out of the trained universe BY
  * DESIGN and fall back to codepoint segmentation at encode time
  * ([[encode]]); [[graft.functions.Bpe]] remains the
  * arbitrary-length subword face.
  */
object UnigramLm {

  /** Piece-weight grid: weights are integers in [0, 2^20]. */
  val WeightGrid: Long = 1L << 20

  /** Expected-count grid: posterior contributions are integers on the
    * 10^6 grid.
    */
  val CountGrid: Long = 1000000L

  /** Driver-state bound for every trainer's collected word universe —
    * the [[BpeTrain]] `collectWordCounts` discipline (VERDICT r14):
    * the (word, freq) table collects to the driver, and on a real web
    * corpus the distinct ≤8-byte token set (numbers, hashes, URL
    * fragments, any script) is 10⁸-10⁹ rows — an uncapped collect is
    * a driver OOM, not a fit. Every trainer takes the deterministic
    * top-`maxWords` by (freq DESC, word ASC); both engines compare
    * strings by binary UTF-8 bytes, so the cut is a pure function of
    * the corpus and a 100 TB corpus and a 1 GB corpus produce the
    * same-sized driver state. The exhaustive [a-z]{1,3} face's
    * universe is mathematically ≤ 26+26²+26³ = 18,278 words, so this
    * default can never bind there (its q185/q193-q195 oracles stay
    * cap-free); the lattice faces' oracles (q198-q200/q204,
    * q213/q214) mirror the cap as a ranked-window CTE.
    */
  val DefaultMaxWords: Int = 1 << 16

  /** The one capped driver collect behind every trainer: top
    * `maxWords` rows of a (word, freq) frame by (freq DESC, word ASC)
    * — Spark plans this as TakeOrderedAndProject, so the full
    * universe is never moved, only each partition's top-`maxWords`.
    */
  private def collectCapped(counts: DataFrame,
                            maxWords: Int): Seq[(String, Long)] = {
    require(maxWords >= 1, s"maxWords must be >= 1, got $maxWords")
    counts.orderBy(col("freq").desc, col("word"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** The capped word universe of [[wordCounts]] — the serve side
    * builds its [[encodeTable]] vocabulary from THIS face so trainer
    * and vocabulary see the identical universe (words beyond the cap
    * take the documented codepoint fallback at encode time).
    */
  def wordUniverse(df: DataFrame, text: Column, maxWordLen: Int,
                   maxWords: Int = DefaultMaxWords): Seq[(String, Long)] =
    collectCapped(wordCounts(df, text, maxWordLen), maxWords)

  /** The capped byte-universe of [[wordCountsBytes]] (raw words, not
    * symbol strings — the cap ranks on the corpus-visible token).
    */
  def wordUniverseBytes(df: DataFrame, text: Column, maxWordBytes: Int,
                        maxWords: Int = DefaultMaxWords): Seq[(String, Long)] =
    collectCapped(wordCountsBytes(df, text, maxWordBytes), maxWords)

  /** (word, freq) occurrence counts of the trained universe — the one
    * corpus-scale pass. Tokens are `lower(trim(text))` split on
    * whitespace (the corpus-wide convention), kept iff they match
    * `^[a-z]{1,maxWordLen}$`.
    */
  def wordCounts(df: DataFrame, text: Column, maxWordLen: Int): DataFrame =
    df.select(explode(split(lower(trim(text)), "\\s+")).as("word"))
      .filter(col("word").rlike(s"^[a-z]{1,$maxWordLen}$$"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** All contiguous substrings of `w` (the candidate pieces of one
    * word), with multiplicity.
    */
  private def substrings(w: String): Seq[String] =
    for {
      i <- 0 until w.length
      l <- 1 to (w.length - i)
    } yield w.substring(i, i + l)

  /** Pieces of `w` under breakpoint mask `m`: bit (i−1) of `m` set
    * means a break after codepoint i (1-based), so mask 0 is the
    * whole word and mask 2^(len−1)−1 is the character segmentation.
    */
  private def piecesOf(w: String, m: Int): Seq[String] = {
    val starts = 0 +: (1 until w.length).filter(i => ((m >> (i - 1)) & 1) == 1)
    starts.zipWithIndex.map { case (s, idx) =>
      val end = if (idx + 1 < starts.length) starts(idx + 1) else w.length
      w.substring(s, end)
    }
  }

  /** One EM pass over the (word, freq) table: given the current
    * integer weight map (absent piece = 0), return the gridded
    * expected counts. Pure integer arithmetic; the per-word uniform
    * WG^(maxWordLen−k) pad cancels in n_m / Z_w.
    */
  private def emStep(words: Seq[(String, Long)], wt: Map[String, Long],
                     maxWordLen: Int): Map[String, BigInt] = {
    val wg = BigInt(WeightGrid)
    val cg = BigInt(CountGrid)
    val ec = scala.collection.mutable.HashMap.empty[String, BigInt]
    words.foreach { case (w, f) =>
      val masks = 0 until (1 << (w.length - 1))
      val segs = masks.map { m =>
        val ps = piecesOf(w, m)
        val nm = ps.map(p => BigInt(wt.getOrElse(p, 0L)))
          .padTo(maxWordLen, wg).product
        (ps, nm)
      }
      val z = segs.map(_._2).sum
      if (z > 0) {
        val bf = BigInt(f)
        segs.foreach { case (ps, nm) =>
          if (nm > 0) {
            val contrib = bf * nm * cg / z // exact floor division
            ps.foreach { p => ec.update(p, ec.getOrElse(p, BigInt(0)) + contrib) }
          }
        }
      }
    }
    ec.toMap
  }

  /** Renormalize a count map onto the weight grid:
    * wt(p) = floor(c_p · WG / Σc). Requires a non-empty total.
    */
  private def renorm(counts: Map[String, BigInt]): Map[String, Long] = {
    val total = counts.values.sum
    require(total > 0, "unigram train: empty training universe (no kept words)")
    counts.map { case (p, c) => p -> (c * BigInt(WeightGrid) / total).toLong }
  }

  /** Learn the piece-weight vocabulary: seed weights from raw
    * substring occurrence counts, then `iters` exact-integer EM
    * passes. Returns (piece, weight) with weight > 0, piece-ordered —
    * bounded driver state (the BPE merge-table contract).
    */
  private def collectWords(df: DataFrame, text: Column, maxWordLen: Int,
                           maxWords: Int): Seq[(String, Long)] =
    wordUniverse(df, text, maxWordLen, maxWords)

  // ---- word-count ledger maintenance --------------------------------
  // The corpus-scale part of unigram training is ONE tokenize+count
  // scan; everything after is vocabulary-bounded driver work. Keeping
  // the (word, freq) table as COUNTED LEDGER STATE (the
  // ExactDedup.digestCounts discipline) therefore makes RETRAINING
  // O(delta): admit a crawl batch by addition, cascade takedowns by
  // subtraction, and re-run the bounded EM from state — the corpus is
  // never re-read.

  /** Word-count ledger state WITH its word universe bound: maxWordLen
    * is structural (it defines which tokens the counts cover), so it
    * travels with the counts instead of being re-supplied — an
    * independently-passed value that disagreed with the build-time one
    * would silently tokenize deltas against a DIFFERENT word universe
    * and desynchronize the ledger without ever tripping the
    * raise-on-desync checks (ADVICE r12). All maintenance goes through
    * this wrapper; the DataFrame-level functions remain as the
    * low-level faces it delegates to.
    */
  final case class WordLedger(counts: DataFrame, maxWordLen: Int)

  /** Build ledger state from a corpus batch — the one corpus-scale
    * scan, with the word universe bound into the state.
    */
  def ledger(df: DataFrame, text: Column, maxWordLen: Int = 3): WordLedger =
    WordLedger(wordCounts(df, text, maxWordLen), maxWordLen)

  /** Fold a new batch into the ledger under ITS OWN word universe. */
  def admit(state: WordLedger, newDocs: DataFrame, text: Column): WordLedger =
    state.copy(counts =
      admitWordCounts(state.counts, newDocs, text, state.maxWordLen))

  /** Cascade a takedown through the ledger under its own universe. */
  def retract(state: WordLedger, deletedDocs: DataFrame, text: Column): WordLedger =
    state.copy(counts =
      retractWordCounts(state.counts, deletedDocs, text, state.maxWordLen))

  /** Run the bounded EM from ledger state — maxWordLen comes from the
    * state itself, so the fit always runs over the universe the counts
    * were built with.
    */
  def trainFromLedger(state: WordLedger, iters: Int = 2,
                      maxWords: Int = DefaultMaxWords): Seq[(String, Long)] =
    trainFromState(state.counts, state.maxWordLen, iters, maxWords)

  /** Fold a new batch into word-count state: full-outer add (the
    * [[Bm25.admitToIndex]] shape). Contract: the batch's documents
    * must be NEW (the admission front door guarantees it) — admitting
    * the same rows twice double-counts, exactly like any counted
    * ledger. Identity (gate q194 via q185's oracle VERBATIM):
    * trainFromState(admit(state(a), b)) ≡ train(a ∪ b).
    */
  def admitWordCounts(state: DataFrame, newDocs: DataFrame, text: Column,
                      maxWordLen: Int = 3): DataFrame =
    state.select(col("word"), col("freq").as("__f0"))
      .join(wordCounts(newDocs, text, maxWordLen)
          .select(col("word"), col("freq").as("__f1")),
        Seq("word"), "full_outer")
      .select(col("word"),
        (coalesce(col("__f0"), lit(0L)) + coalesce(col("__f1"), lit(0L)))
          .as("freq"))

  /** Cascade a takedown through word-count state: subtract the
    * deleted rows' counts; words hitting zero leave; BOTH desync
    * shapes raise (subtracting a word the state never saw, or more
    * occurrences than it holds) — the [[ExactDedup]] retraction
    * discipline, because clamping would silently corrupt every later
    * fit. Identity (gate q195): trainFromState(retract(state(c), d))
    * ≡ train(c ∖ d).
    */
  def retractWordCounts(state: DataFrame, deletedDocs: DataFrame,
                        text: Column, maxWordLen: Int = 3): DataFrame =
    state.select(col("word"), col("freq").as("__f0"))
      .join(wordCounts(deletedDocs, text, maxWordLen)
          .select(col("word"), col("freq").as("__f1")),
        Seq("word"), "full_outer")
      .select(col("word"),
        when(col("__f0").isNull, raise_error(concat(
          lit("retractWordCounts: word never admitted: "), col("word"))))
          .when(col("__f1") > col("__f0"), raise_error(concat(
            lit("retractWordCounts: over-delete for word: "), col("word"))))
          .otherwise(col("__f0") - coalesce(col("__f1"), lit(0L)))
          .as("freq"))
      .filter(col("freq") > 0L)

  /** Run the bounded EM from maintained ledger state instead of a
    * corpus scan — byte-identical to [[train]] on the equivalent
    * corpus because the fit is a pure function of the (word, freq)
    * multiset.
    */
  def trainFromState(state: DataFrame, maxWordLen: Int = 3,
                     iters: Int = 2,
                     maxWords: Int = DefaultMaxWords): Seq[(String, Long)] = {
    val words = collectCapped(state.select(col("word"), col("freq")), maxWords)
    fitLoop(words, maxWordLen, iters)
      .toSeq.filter(_._2 > 0L).sortBy(_._1)
  }

  private def fitLoop(words: Seq[(String, Long)], maxWordLen: Int,
                      iters: Int): Map[String, Long] = {
    // seed: substring occurrence counts with multiplicity, weighted
    // by word frequency
    val seed = scala.collection.mutable.HashMap.empty[String, BigInt]
    words.foreach { case (w, f) =>
      substrings(w).foreach { p =>
        seed.update(p, seed.getOrElse(p, BigInt(0)) + f)
      }
    }
    var wt = renorm(seed.toMap)
    for (_ <- 1 to iters)
      wt = renorm(emStep(words, wt, maxWordLen))
    wt
  }

  def train(df: DataFrame, text: Column, maxWordLen: Int = 3,
            iters: Int = 2,
            maxWords: Int = DefaultMaxWords): Seq[(String, Long)] = {
    require(maxWordLen >= 1 && maxWordLen <= 16,
      s"maxWordLen in [1, 16], got $maxWordLen")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    fitLoop(collectWords(df, text, maxWordLen, maxWords), maxWordLen, iters)
      .toSeq.filter(_._2 > 0L).sortBy(_._1)
  }

  // ---- lattice-DP training (realistic word lengths) -----------------
  // The exhaustive trainer above enumerates 2^(len−1) breakpoint masks
  // per word, which pins its cross-engine HUGEINT bound to
  // maxWordLen = 3 (freq · WG³ · CG < 2¹²⁷ at WG = 2^20). Real English
  // words average ~4.7 codepoints, so on real text that face degrades
  // to codepoint fallback for most words. The lattice form below is
  // the forward-backward DP of Kudo 2018 §3.2 proper —
  // O(len · maxPieceLen) per word instead of O(2^len) — in the SAME
  // exact-integer discipline, which lifts the oracle-checkable word
  // universe to [a-z]{1,8}.
  //
  // Integer scaling that replaces the fixed-length pad: define
  //   α(i) = Σ_{segs of w[0..i)} Π wt(p) · WG^(i − k)
  //   β(j) = Σ_{segs of w[j..L)} Π wt(p) · WG^(L − j − k)
  // (k = piece count of the seg). Appending a piece of length l adds
  // l to the prefix length and 1 to k, so the exponent increments by
  // l − 1 and the recurrences are pure integer:
  //   α(i) = Σ_l α(i−l) · wt(w[i−l..i)) · WG^(l−1),   α(0) = 1
  //   β(j) = Σ_l wt(w[j..j+l)) · WG^(l−1) · β(j+l),   β(L) = 1
  // Z = α(L) differs from the exhaustive trainer's padded Z only by
  // the per-word constant WG^(maxWordLen − L), which cancels in every
  // posterior. The seg-mass through a piece occurrence (s, e) is
  // EXACTLY α(s) · wt · WG^(e−s−1) · β(e) (each segmentation counted
  // once — LatticeSpec pins this against brute-force mask sums), so
  // the E-step floor-divides ONCE per occurrence:
  //   ec(p) += freq · α(s) · wt(p) · WG^(e−s−1) · β(e) · CG / Z.
  // (The exhaustive face floors once per SEGMENTATION and then sums —
  // a different, equally exact rounding convention; the two trainers
  // are separate oracle-gated faces, not interchangeable.)
  //
  // HUGEINT bound (what sets the lattice grid): renorm guarantees
  // Σ wt ≤ WG, hence Σ_{segs, k pieces} Π (wt/WG) ≤ 1 per k and every
  // intermediate ≤ freq · L · WG^L · CG. At L = 8 this forces
  // WG = 2^10 (2^20 alone gives WG^7 = 2^140 > 2^127 for the
  // per-occurrence factor): worst case freq · 2^3 · 2^80 · 2^20 keeps
  // word frequencies up to ~2^23 ≈ 8M cross-engine safe — far above
  // the gate corpus (max freq 964 at sf0.01, ~10k at sf0.1). In-engine
  // the arithmetic is BigInt and exact at any scale; only DuckDB
  // mirrorability needs the bound.

  /** Lattice-face piece-weight grid: 2^10 (see bound above). */
  val LatticeWeightGrid: Long = 1L << 10

  /** Contiguous substrings of `w` up to `maxPieceLen` codepoints —
    * the candidate-piece inventory of the lattice face.
    */
  private def substringsCapped(w: String, maxPieceLen: Int): Seq[String] =
    for {
      i <- 0 until w.length
      l <- 1 to math.min(w.length - i, maxPieceLen)
    } yield w.substring(i, i + l)

  /** Forward pass: α(0..L) under the integer scaling above. */
  private[ext] def latticeForward(w: String, wt: Map[String, Long],
                                  maxPieceLen: Int, wg: BigInt): Array[BigInt] = {
    val L = w.length
    val a = Array.fill(L + 1)(BigInt(0))
    a(0) = BigInt(1)
    var i = 1
    while (i <= L) {
      var l = 1
      while (l <= math.min(i, maxPieceLen)) {
        val p = wt.getOrElse(w.substring(i - l, i), 0L)
        if (p > 0L && a(i - l) > 0) a(i) += a(i - l) * p * wg.pow(l - 1)
        l += 1
      }
      i += 1
    }
    a
  }

  /** Backward pass: β(0..L) under the integer scaling above. */
  private[ext] def latticeBackward(w: String, wt: Map[String, Long],
                                   maxPieceLen: Int, wg: BigInt): Array[BigInt] = {
    val L = w.length
    val b = Array.fill(L + 1)(BigInt(0))
    b(L) = BigInt(1)
    var j = L - 1
    while (j >= 0) {
      var l = 1
      while (l <= math.min(L - j, maxPieceLen)) {
        val p = wt.getOrElse(w.substring(j, j + l), 0L)
        if (p > 0L && b(j + l) > 0) b(j) += BigInt(p) * wg.pow(l - 1) * b(j + l)
        l += 1
      }
      j -= 1
    }
    b
  }

  /** One lattice EM pass: exact per-occurrence posteriors on the
    * count grid. Pure integer; order- and partition-invariant.
    */
  private def emStepLattice(words: Seq[(String, Long)], wt: Map[String, Long],
                            maxPieceLen: Int): Map[String, BigInt] = {
    val wg = BigInt(LatticeWeightGrid)
    val cg = BigInt(CountGrid)
    val ec = scala.collection.mutable.HashMap.empty[String, BigInt]
    words.foreach { case (w, f) =>
      val L = w.length
      val a = latticeForward(w, wt, maxPieceLen, wg)
      val b = latticeBackward(w, wt, maxPieceLen, wg)
      val z = a(L)
      if (z > 0) {
        val bf = BigInt(f)
        var s = 0
        while (s < L) {
          var l = 1
          while (l <= math.min(L - s, maxPieceLen)) {
            val p = w.substring(s, s + l)
            val pw = wt.getOrElse(p, 0L)
            if (pw > 0L) {
              val seg = a(s) * pw * wg.pow(l - 1) * b(s + l)
              if (seg > 0)
                ec.update(p, ec.getOrElse(p, BigInt(0)) + bf * seg * cg / z)
            }
            l += 1
          }
          s += 1
        }
      }
    }
    ec.toMap
  }

  /** Renormalize onto an explicit grid (the lattice face's 2^10). */
  private def renormOn(counts: Map[String, BigInt], grid: Long): Map[String, Long] = {
    val total = counts.values.sum
    require(total > 0, "unigram train: empty training universe (no kept words)")
    counts.map { case (p, c) => p -> (c * BigInt(grid) / total).toLong }
  }

  private def fitLoopLattice(words: Seq[(String, Long)], maxPieceLen: Int,
                             iters: Int): Map[String, Long] = {
    val seed = scala.collection.mutable.HashMap.empty[String, BigInt]
    words.foreach { case (w, f) =>
      substringsCapped(w, maxPieceLen).foreach { p =>
        seed.update(p, seed.getOrElse(p, BigInt(0)) + f)
      }
    }
    var wt = renormOn(seed.toMap, LatticeWeightGrid)
    for (_ <- 1 to iters)
      wt = renormOn(emStepLattice(words, wt, maxPieceLen), LatticeWeightGrid)
    wt
  }

  /** Lattice-DP vocabulary induction over the [a-z]{1,maxWordLen}
    * universe — the realistic-word trainer (gate q198 pins 2 EM
    * iterations at maxWordLen = 8 cross-engine in DuckDB HUGEINT).
    * Same one-corpus-scan shape as [[train]]; only the driver-side
    * per-word E-step changes (DP instead of mask enumeration), so
    * maxWordLen ≤ 16 costs len · maxPieceLen work per word, not 2^len.
    */
  def trainLattice(df: DataFrame, text: Column, maxWordLen: Int = 8,
                   maxPieceLen: Int = 8, iters: Int = 2,
                   maxWords: Int = DefaultMaxWords): Seq[(String, Long)] = {
    require(maxWordLen >= 1 && maxWordLen <= 16,
      s"maxWordLen in [1, 16], got $maxWordLen")
    require(maxPieceLen >= 1 && maxPieceLen <= maxWordLen,
      s"maxPieceLen in [1, maxWordLen], got $maxPieceLen")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    fitLoopLattice(collectWords(df, text, maxWordLen, maxWords),
        maxPieceLen, iters)
      .toSeq.filter(_._2 > 0L).sortBy(_._1)
  }

  // ---- byte-symbol (multilingual) lattice training -------------------
  // The lattice trainer above still trains over [a-z]{1,maxWordLen} —
  // a user training on multilingual text gets codepoint fallback for
  // every non-Latin word (VERDICT r13 item 1). The byte face lifts the
  // word universe to ANY whitespace token of ≤ maxWordBytes UTF-8
  // bytes, any script: each word maps to its byte-symbol string
  // ([[graft.functions.ByteBpeUtil.mapWord]] — byte b ↦ the printable
  // placeholder codepoint U+0100+b, the GPT-2 trick), and the ENTIRE
  // lattice machinery applies unchanged over byte symbols, because a
  // symbol string is an ordinary String whose length IS the word's
  // octet count. Learned pieces are byte sequences — they rebuild
  // multibyte codepoints (and then words) exactly as a SentencePiece
  // byte-fallback model does, and single-byte symbols give the same
  // any-input coverage guarantee.
  //
  // The HUGEINT bound is UNCHANGED: the DP runs over symbol strings of
  // length ≤ maxWordBytes, so at maxWordBytes = 8 on the 2^10 grid
  // every intermediate stays ≤ freq · 8 · WG^8 · CG < 2^127 for word
  // frequencies up to ~2^23 — the same derivation as the char face,
  // with codepoint length replaced by octet length. The oracle maps
  // words to the identical symbol strings via hex(encode(w)) and the
  // chr(256+byte) table (the q201 recipe) and runs the SAME lattice
  // CTE chain (gate q213 pins 2 EM iterations on q201's planted
  // Greek/Cyrillic/CJK fixture; gate q214 pins the serve side's
  // fertility with n_fallback counting ONLY >maxWordBytes words —
  // the multilingual tokens all train, fallback ≈ 0 where the char
  // face fell back on 100% of them).

  /** (word, freq) over the byte-universe: any whitespace token of
    * 1..maxWordBytes UTF-8 bytes (the one corpus-scale pass — same
    * tokenize convention as [[wordCounts]], the charset filter
    * replaced by an octet-length bound).
    */
  def wordCountsBytes(df: DataFrame, text: Column, maxWordBytes: Int): DataFrame =
    df.select(explode(split(lower(trim(text)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0 &&
        octet_length(col("word")) <= maxWordBytes)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Lattice-DP vocabulary induction over the byte-symbol universe —
    * the multilingual trainer. Returns (piece, weight) with pieces as
    * byte-symbol strings (U+0100+b placeholder chars — feed them to
    * [[graft.functions.ByteBpeUtil.unmapSymbol]] to recover raw
    * bytes). Same one-corpus-scan shape as [[trainLattice]]; the
    * word table is mapped to symbols driver-side (it is already
    * vocabulary-bounded state).
    */
  def trainLatticeBytes(df: DataFrame, text: Column, maxWordBytes: Int = 8,
                        maxPieceLen: Int = 8, iters: Int = 2,
                        maxWords: Int = DefaultMaxWords): Seq[(String, Long)] = {
    require(maxWordBytes >= 1 && maxWordBytes <= 16,
      s"maxWordBytes in [1, 16], got $maxWordBytes")
    require(maxPieceLen >= 1 && maxPieceLen <= maxWordBytes,
      s"maxPieceLen in [1, maxWordBytes], got $maxPieceLen")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val words = wordUniverseBytes(df, text, maxWordBytes, maxWords)
      .map { case (w, f) => (graft.functions.ByteBpeUtil.mapWord(w), f) }
    fitLoopLattice(words, maxPieceLen, iters)
      .toSeq.filter(_._2 > 0L).sortBy(_._1)
  }

  /** Serve-side table for the byte face: (raw word, n_pieces) — each
    * word Viterbi-segments through its byte-symbol string under the
    * trained weights ([[encodeTableLattice]] verbatim over mapped
    * words; zero-score words fall back to their OCTET count — the
    * byte-symbol analogue of codepoint fallback). Output feeds
    * [[encode]] / [[graft.ext.TokenizerEval.fertility]] unchanged.
    */
  def encodeTableLatticeBytes(words: Seq[String], weights: Map[String, Long],
                              maxPieceLen: Int): Seq[(String, Int)] =
    words.zip(encodeTableLattice(
        words.map(graft.functions.ByteBpeUtil.mapWord), weights, maxPieceLen))
      .map { case (raw, (_, k)) => raw -> k }

  /** Lattice fit from maintained ledger state — the O(delta) retrain
    * face; maxWordLen comes from the state (gate q200 pins
    * trainLatticeFromLedger(admit(a, b)) ≡ trainLattice(a ∪ b) via
    * q198's oracle verbatim).
    */
  def trainLatticeFromLedger(state: WordLedger, maxPieceLen: Int = 8,
                             iters: Int = 2,
                             maxWords: Int = DefaultMaxWords): Seq[(String, Long)] = {
    require(maxPieceLen >= 1 && maxPieceLen <= state.maxWordLen,
      s"maxPieceLen in [1, ${state.maxWordLen}], got $maxPieceLen")
    val words = collectCapped(
      state.counts.select(col("word"), col("freq")), maxWords)
    fitLoopLattice(words, maxPieceLen, iters)
      .toSeq.filter(_._2 > 0L).sortBy(_._1)
  }

  /** The full prune loop on the lattice face ([[trainPruned]]'s
    * shape): `emIters` lattice EM passes, one [[pruneVocab]] cut,
    * `postIters` more passes over the survivors (gate q199 unrolls
    * the sequence in SQL).
    */
  def trainLatticePruned(df: DataFrame, text: Column, maxWordLen: Int = 8,
                         maxPieceLen: Int = 8, emIters: Int = 2,
                         keepMulti: Int = 64, postIters: Int = 1,
                         maxWords: Int = DefaultMaxWords): Seq[(String, Long)] = {
    require(maxWordLen >= 1 && maxWordLen <= 16,
      s"maxWordLen in [1, 16], got $maxWordLen")
    require(maxPieceLen >= 1 && maxPieceLen <= maxWordLen,
      s"maxPieceLen in [1, maxWordLen], got $maxPieceLen")
    require(emIters >= 0 && postIters >= 0, "iteration counts must be >= 0")
    val words = collectWords(df, text, maxWordLen, maxWords)
    var wt = pruneVocab(fitLoopLattice(words, maxPieceLen, emIters), keepMulti)
    for (_ <- 1 to postIters)
      wt = renormOn(emStepLattice(words, wt, maxPieceLen), LatticeWeightGrid)
    wt.toSeq.filter(_._2 > 0L).sortBy(_._1)
  }

  /** Viterbi piece count per word on the lattice face: best(i) =
    * (max score, min pieces among argmax) — valid because the score
    * is multiplicative over pieces, so every prefix of an optimal
    * segmentation is optimally scored and the secondary min composes.
    * Zero-score words fall back to codepoint count, exactly like
    * [[encodeTable]]. Output feeds [[encode]] / [[writeVocab]]
    * unchanged — the serve side is face-agnostic.
    */
  def encodeTableLattice(words: Seq[String], weights: Map[String, Long],
                         maxPieceLen: Int): Seq[(String, Int)] = {
    val wg = BigInt(LatticeWeightGrid)
    words.map { w =>
      val L = w.length
      val score = Array.fill(L + 1)(BigInt(0))
      val k = Array.fill(L + 1)(Int.MaxValue)
      score(0) = BigInt(1); k(0) = 0
      var i = 1
      while (i <= L) {
        var l = 1
        while (l <= math.min(i, maxPieceLen)) {
          val pw = weights.getOrElse(w.substring(i - l, i), 0L)
          if (pw > 0L && score(i - l) > 0) {
            val s = score(i - l) * pw * wg.pow(l - 1)
            if (s > score(i) || (s == score(i) && k(i - l) + 1 < k(i))) {
              score(i) = s; k(i) = k(i - l) + 1
            }
          }
          l += 1
        }
        i += 1
      }
      w -> (if (score(L) == 0) w.length else k(L))
    }
  }

  /** SentencePiece's vocabulary-size control: keep every
    * single-codepoint piece (the coverage guarantee — any word stays
    * segmentable) plus the `keepMulti` best multi-codepoint pieces by
    * weight (ties: piece ascending). Pruned pieces simply leave the
    * map; every segmentation using one scores 0 in the next E-step,
    * so their probability mass redistributes on the following
    * iteration.
    */
  def pruneVocab(wt: Map[String, Long], keepMulti: Int): Map[String, Long] = {
    require(keepMulti >= 0, s"keepMulti must be >= 0, got $keepMulti")
    val (chars, multi) = wt.partition {
      case (p, _) => p.codePointCount(0, p.length) == 1
    }
    chars ++ multi.toSeq.filter(_._2 > 0L)
      .sortBy { case (p, w) => (-w, p) }.take(keepMulti)
  }

  /** The full SentencePiece-style loop: `emIters` EM passes over the
    * seeded candidates, one [[pruneVocab]] cut to the target size,
    * `postIters` more EM passes over the survivors (mass from pruned
    * pieces redistributes). Same exact-integer arithmetic end to end;
    * gate q193 unrolls the whole sequence in SQL.
    */
  def trainPruned(df: DataFrame, text: Column, maxWordLen: Int = 3,
                  emIters: Int = 2, keepMulti: Int = 64,
                  postIters: Int = 1,
                  maxWords: Int = DefaultMaxWords): Seq[(String, Long)] = {
    require(maxWordLen >= 1 && maxWordLen <= 16,
      s"maxWordLen in [1, 16], got $maxWordLen")
    require(emIters >= 0 && postIters >= 0, "iteration counts must be >= 0")
    val words = collectWords(df, text, maxWordLen, maxWords)
    var wt = pruneVocab(fitLoop(words, maxWordLen, emIters), keepMulti)
    for (_ <- 1 to postIters)
      wt = renorm(emStep(words, wt, maxWordLen))
    wt.toSeq.filter(_._2 > 0L).sortBy(_._1)
  }

  /** Exact Viterbi piece count per trained word: argmax of n_m over
    * the exhaustive masks (ties: fewer pieces, then lowest mask); a
    * word every segmentation of which scores 0 falls back to
    * codepoint count. Returns (word, n_pieces) for the WHOLE trained
    * universe — the serve-side vocabulary table.
    */
  def encodeTable(words: Seq[String], weights: Map[String, Long],
                  maxWordLen: Int): Seq[(String, Int)] = {
    val wg = BigInt(WeightGrid)
    words.map { w =>
      var bestN = BigInt(-1)
      var bestK = Int.MaxValue
      (0 until (1 << (w.length - 1))).foreach { m =>
        val ps = piecesOf(w, m)
        val nm = ps.map(p => BigInt(weights.getOrElse(p, 0L)))
          .padTo(maxWordLen, wg).product
        if (nm > bestN || (nm == bestN && ps.length < bestK)) {
          bestN = nm; bestK = ps.length
        }
      }
      w -> (if (bestN == 0) w.length else bestK)
    }
  }

  /** Persist / reload the serving state — the (word, n_pieces)
    * [[encodeTable]] frame — as parquet model state (the
    * [[NgramLm]]-style lifecycle: train once, write, serve forever).
    */
  def writeVocab(table: DataFrame, dir: String): Unit =
    table.select(col("word"), col("n_pieces"))
      .write.mode("overwrite").parquet(dir)

  def readVocab(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Distributed encode statistics: per document, the whitespace
    * token count and the total piece count — trained-universe words
    * segment by the broadcast [[encodeTable]] (a tokenizer ships its
    * vocab exactly this way), everything else falls back to codepoint
    * count. Shuffle carries (doc, word) pairs only; the vocab side is
    * broadcast.
    */
  def encode(df: DataFrame, id: Column, text: Column,
             table: DataFrame): DataFrame = {
    val toks = df.select(id.as("doc_id"),
      explode(split(lower(trim(text)), "\\s+")).as("word"))
    toks.join(broadcast(table.select(col("word"), col("n_pieces").as("__np"))),
        Seq("word"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("__np").cast("long"), length(col("word")).cast("long")))
          .as("n_pieces"))
  }
}
