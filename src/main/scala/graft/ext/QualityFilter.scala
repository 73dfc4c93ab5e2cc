package graft.ext

import graft.functions.QuantileSketchAgg
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-relative quality filtering: keep rows whose metric
  * falls inside a percentile band of the corpus-wide distribution.
  *
  * Training-data pipelines trim both tails of a quality metric (too
  * short = boilerplate/fragments, too long = concatenation junk) by
  * QUANTILE rather than fixed threshold, so the filter adapts as the
  * corpus mix shifts. The reference's filters are all fixed-constant
  * CHECKs (`load_quality.py:84-89`); this is the data-relative
  * extension.
  *
  * Scale: the cutoffs are ONE scalar aggregate over the metric column
  * (column-pruned scan), broadcast to the filter pass — two scans
  * total, no shuffle of the data rows. Exact `percentile` is used for
  * the oracle-gated face (it sorts per-group state — fine for a single
  * numeric column even at large row counts, since only the metric
  * values aggregate); swap in `approx_percentile(metric, p, err)` for
  * a one-pass mergeable-sketch cutoff when the metric column itself is
  * too hot to sort — rank error `err` merely shifts the cutoff, the
  * filter semantics are unchanged.
  */
object QualityFilter {

  /** The rows of `df` whose `metric` lies within the [pLo, pHi]
    * exact-percentile band (inclusive), with the two cutoffs attached
    * as columns `cut_lo` / `cut_hi`.
    */
  def quantileBand(df: DataFrame, metric: Column, pLo: Double, pHi: Double): DataFrame = {
    val cuts = df.agg(
      percentile(metric, lit(pLo)).as("cut_lo"),
      percentile(metric, lit(pHi)).as("cut_hi"))
    df.crossJoin(broadcast(cuts))
      .filter(metric.cast("double").between(col("cut_lo"), col("cut_hi")))
  }

  /** SCALE path of [[quantileBand]]: cutoffs from the mergeable
    * bounded [[QuantileSketchAgg]] instead of an exact full sort —
    * the aggregation state is ≤ k entries per partition (merged
    * map-side), so the metric column is never globally sorted and the
    * cutoff pass costs one column-pruned scan with O(k) shuffle bytes.
    *
    * `hash` must be a pure deterministic function of `metric` (use
    * MinHashLsh.portableHash32 of its canonical string form); with a
    * portable hash the sampled cutoffs — hence the kept row SET — are
    * bit-reproducible on any engine with md5, which is what lets the
    * sketch path carry its own oracle gate (q85) rather than only a
    * tolerance test.
    *
    * The p-cutoff is the smallest sampled value whose cumulative
    * sampled count reaches p × total sampled count (ties inclusive).
    * Same output contract as the exact path: input rows inside the
    * band, `cut_lo`/`cut_hi` attached. Rank error is O(1/√k); see
    * QuantileSketchSpec for the measured bound.
    */
  def quantileBandSketch(df: DataFrame, metric: Column, hash: Column,
                         pLo: Double, pHi: Double, k: Int = 512): DataFrame = {
    require(pLo <= pHi, s"pLo <= pHi required, got $pLo > $pHi")
    // hash/value behind a codegen'd projection: TypedImperativeAggregate
    // evals child expressions interpreted per row (see Layout
    // .sketchCutpoints — measured ~15 µs/row on the md5-Horner tree)
    val sk = df.select(hash.as("__qb_h"), metric.cast("double").as("__qb_v"))
      .agg(QuantileSketchAgg.sample(col("__qb_h"), col("__qb_v"), k).as("__s"))
    // ≤ k rows from here down: the window and aggregate are trivial
    val cdf = sk.select(explode(col("__s")).as("e"))
      .select(col("e.value").as("__v"), col("e.count").as("__c"))
      .select(col("__v"),
        sum(col("__c")).over(
          Window.orderBy(col("__v")).rowsBetween(Window.unboundedPreceding, 0)).as("__cum"),
        sum(col("__c")).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).as("__tot"))
    val cuts = cdf.agg(
      min(when(col("__cum").cast("double") >= lit(pLo) * col("__tot").cast("double"),
        col("__v"))).as("cut_lo"),
      min(when(col("__cum").cast("double") >= lit(pHi) * col("__tot").cast("double"),
        col("__v"))).as("cut_hi"))
    df.crossJoin(broadcast(cuts))
      .filter(metric.cast("double").between(col("cut_lo"), col("cut_hi")))
  }

  /** The eight Gopher words a document must contain two of (the
    * fixed-rule complement to the distribution-relative bands above).
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style fixed-rule quality cascade (Rae et al. 2021, the
    * rule set RedPajama/Dolma reuse): per document, the integer stats
    * each rule reads plus one 0/1 flag per rule and the conjunction.
    * Every comparison is INTEGER arithmetic (3·n ≤ Σlen, not Σlen/n ≥
    * 3.0) so the cascade is exact cross-engine — no ratio ever hits a
    * float boundary.
    *
    * Rules: word count in [50, 100 000]; mean word length in [3, 10];
    * `#`-or-`…` symbol-to-word ratio ≤ 0.1; ≤ 90% of lines bullet-led;
    * ≤ 30% of lines ellipsis-terminated; ≥ 80% of words contain an
    * alphabetic character; ≥ 2 distinct [[GopherStopwords]] present.
    *
    * Scale: one projection-only scan, zero shuffles, zero joins — every
    * stat is a per-row expression (the line/token filters are bounded
    * higher-order passes over that row's own splits), so the cascade
    * runs wherever the scan runs and survives any corpus size by
    * construction. Counting conventions pinned for the oracle: `...`
    * occurrences count non-overlapping left-to-right (replace-scan
    * semantics, identical in both engines), lines split on `\n`,
    * tokens on runs of whitespace.
    */
  /** The whole cascade as ONE boolean column — the filter face for
    * pipelines that must keep their other columns (e.g. the streaming
    * crawl front door, where the text continues downstream). Built
    * from the same expressions as [[gopherFlags]]; CrawlPipelineSpec
    * pins `gopherPasses(text) ≡ (gopherFlags.passes = 1)` row for
    * row.
    */
  def gopherPasses(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    val toksLower = split(trim(lower(text)), "\\s+")
    val lines = split(text, "\n")
    val nWords = size(toks).cast("long")
    val sumLen = length(regexp_replace(text, "\\s+", "")).cast("long")
    val nHash = (length(text) - length(regexp_replace(text, "#", ""))).cast("long")
    val nEllipsis = ((length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))) / lit(3)).cast("long")
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines,
      l => l.startsWith("- ") || l.startsWith("* "))).cast("long")
    val nEllEnd = size(filter(lines, l => l.endsWith("..."))).cast("long")
    val nAlpha = size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
    val nStop = size(filter(
      array(GopherStopwords.map(lit): _*),
      w => array_contains(toksLower, w))).cast("long")
    (nWords >= 50L && nWords <= 100000L) &&
      (nWords * 3L <= sumLen && sumLen <= nWords * 10L) &&
      ((nHash + nEllipsis) * 10L <= nWords) &&
      (nBullet * 10L <= nLines * 9L) &&
      (nEllEnd * 10L <= nLines * 3L) &&
      (nAlpha * 5L >= nWords * 4L) &&
      (nStop >= 2L)
  }

  def gopherFlags(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = split(trim(text), "\\s+")
    val toksLower = split(trim(lower(text)), "\\s+")
    val lines = split(text, "\n")
    val nWords = size(toks).cast("long")
    val sumLen = length(regexp_replace(text, "\\s+", "")).cast("long")
    val nHash = (length(text) - length(regexp_replace(text, "#", ""))).cast("long")
    val nEllipsis = ((length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))) / lit(3)).cast("long")
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines,
      l => l.startsWith("- ") || l.startsWith("* "))).cast("long")
    val nEllEnd = size(filter(lines, l => l.endsWith("..."))).cast("long")
    val nAlpha = size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
    val nStop = size(filter(
      array(GopherStopwords.map(lit): _*),
      w => array_contains(toksLower, w))).cast("long")
    df.select(
        id.as("doc_id"), nWords.as("n_words"), sumLen.as("sum_word_len"),
        nHash.as("n_hash"), nEllipsis.as("n_ellipsis"), nLines.as("n_lines"),
        nBullet.as("n_bullet_lines"), nEllEnd.as("n_ellipsis_lines"),
        nAlpha.as("n_alpha_words"), nStop.as("n_stopwords"))
      .withColumn("f_word_count",
        (col("n_words") >= 50L && col("n_words") <= 100000L).cast("long"))
      .withColumn("f_mean_word_len",
        (col("n_words") * 3L <= col("sum_word_len") &&
          col("sum_word_len") <= col("n_words") * 10L).cast("long"))
      .withColumn("f_symbol_ratio",
        ((col("n_hash") + col("n_ellipsis")) * 10L <= col("n_words")).cast("long"))
      .withColumn("f_bullet_lines",
        (col("n_bullet_lines") * 10L <= col("n_lines") * 9L).cast("long"))
      .withColumn("f_ellipsis_lines",
        (col("n_ellipsis_lines") * 10L <= col("n_lines") * 3L).cast("long"))
      .withColumn("f_alpha_words",
        (col("n_alpha_words") * 5L >= col("n_words") * 4L).cast("long"))
      .withColumn("f_stopwords", (col("n_stopwords") >= 2L).cast("long"))
      .withColumn("passes",
        (col("f_word_count") === 1L && col("f_mean_word_len") === 1L &&
          col("f_symbol_ratio") === 1L && col("f_bullet_lines") === 1L &&
          col("f_ellipsis_lines") === 1L && col("f_alpha_words") === 1L &&
          col("f_stopwords") === 1L).cast("long"))
  }

  /** Gopher REPETITION signals, gram face (Rae et al. 2021 §A1.1 —
    * the filters [[gopherFlags]] deliberately omits because they need
    * a per-doc grouped aggregate, not a per-row expression): for each
    * word-n-gram size, the occurrence-weighted character coverage of
    * (a) the most frequent n-gram and (b) all duplicated n-grams.
    * Machine-generated and template text repeats; these two numbers
    * are the standard way to see it.
    *
    * Counting conventions (pinned by gate q176's oracle): tokens are
    * lowercased whitespace splits (the q101 rule), grams are
    * space-joined SLIDING windows (non-distinct; a doc shorter than n
    * contributes its whole token join as one gram — the
    * [[graft.functions.NGrams]] fallback), coverage is
    * count·length(gram) — occurrence-weighted, so overlapping
    * occurrences each count (a documented upper bound on the paper's
    * distinct-character-position measure; deterministic and exactly
    * portable where position-set union is not), and top-gram ties
    * resolve to the LARGEST coverage among maximal-count grams.
    *
    * Output is LONG format — (doc_id, n, n_grams, top_cov, dup_cov),
    * one row per requested n with all-integer values.
    *
    * Scale shape: one explode per n over the corpus, shuffles keyed
    * (doc, n, md5(gram)) carrying 16-byte digests + a length — never
    * gram text (the q86/q130 discipline); the tie-break window
    * partitions by (doc, n) — per-document cardinality, bounded by
    * document length, never corpus-sized.
    */
  /** Host-level "bad neighborhood" screening — the curation move
    * per-document filters cannot express: when most of a host's pages
    * fail the document screen, the host itself is the signal, and its
    * INDIVIDUALLY-PASSING pages (the one tidy page on a spam farm)
    * should go too (C4 dropped entire hosts this way; the host
    * link-graph screens here — TrustRank q133, templates q178 — judge
    * structure, this judges the host's own content yield).
    *
    * Rule, exact-integer so the boundary never floats: a document is
    * KEPT iff it passes the document screen AND its neighborhood is
    * acceptable — the host has fewer than `minDocs` documents (too
    * few to judge; individual verdicts stand) OR the host's pass rate
    * clears the threshold: n_pass · den ≥ n_docs · num
    * (cross-multiplied — no ratio, no float equality edge). The
    * spam-farm's one tidy page fails the combined screen; a failing
    * page keeps failing everywhere.
    *
    * Scale shape: ONE grouped count per host (map-side combined) +
    * one equi-join back on host — the host-stats side is
    * host-cardinality, orders of magnitude below the corpus. Output:
    * (doc_id, host, passes, host_docs, host_pass, kept).
    */
  /** The host-stats half of [[hostNeighborhoodScreen]] on its own:
    * (host, host_docs, host_pass) — ONE grouped count, host-cardinality
    * output. Callers whose verdict only needs host-LEVEL evidence (the
    * curation cascade: its per-document flags already exist) join THIS
    * table broadcast on the host key instead of paying the screen's
    * corpus-sized per-document join-back (VERDICT r13).
    */
  def hostNeighborhoodStats(df: DataFrame, host: Column,
                            passes: Column): DataFrame =
    df.select(host.as("host"), passes.cast("boolean").as("passes"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("host_docs"),
        sum(when(col("passes"), lit(1L)).otherwise(lit(0L))).as("host_pass"))

  def hostNeighborhoodScreen(df: DataFrame, id: Column, host: Column,
                             passes: Column, minDocs: Long,
                             num: Int, den: Int): DataFrame = {
    require(minDocs >= 1, s"minDocs must be >= 1, got $minDocs")
    require(num >= 0 && den >= 1 && num <= den,
      s"threshold num/den must satisfy 0 <= num <= den, 1 <= den; got $num/$den")
    val base = df.select(id.as("doc_id"), host.as("host"),
      passes.cast("boolean").as("passes"))
    val stats = hostNeighborhoodStats(base, col("host"), col("passes"))
    base.join(stats, "host")
      .select(col("doc_id"), col("host"), col("passes"),
        col("host_docs"), col("host_pass"),
        (col("passes") && (col("host_docs") < minDocs ||
          col("host_pass") * den >= col("host_docs") * num))
          .as("kept"))
  }

  def gramRepetition(df: DataFrame, id: Column, text: Column,
                     ns: Seq[Int] = Seq(2, 3, 4, 5, 6, 7, 8, 9, 10)): DataFrame = {
    require(ns.nonEmpty && ns.forall(n => n >= 1 && n <= 16),
      s"gram sizes in [1, 16], got $ns")
    val perN = ns.map { n =>
      df.select(id.as("doc_id"), lit(n).as("n"),
          explode(graft.functions.NGrams.wordNGramSeq(lower(text), n)).as("__g"))
        .select(col("doc_id"), col("n"),
          md5(col("__g").cast("binary")).as("__h"),
          length(col("__g")).cast("long").as("__len"))
    }.reduce(_ unionAll _)
    val counted = perN
      .groupBy(col("doc_id"), col("n"), col("__h"), col("__len"))
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(col("doc_id"), col("n"))
    counted.withColumn("__mxc", max(col("__cnt")).over(w))
      .groupBy(col("doc_id"), col("n"))
      .agg(sum(col("__cnt")).as("n_grams"),
        max(when(col("__cnt") === col("__mxc"), col("__cnt") * col("__len"))
          .otherwise(lit(0L))).as("top_cov"),
        coalesce(sum(when(col("__cnt") >= 2L, col("__cnt") * col("__len"))),
          lit(0L)).as("dup_cov"))
  }

  /** Gopher repetition signals, line face: duplicate-line counts and
    * duplicate-line character mass per document. Lines are
    * newline-splits, trimmed, empties dropped; a line's duplicates
    * beyond its first occurrence count as duplicated (so
    * dup = total − distinct, in both rows and characters). Pure
    * per-row higher-order expressions — zero shuffle, the
    * [[gopherFlags]] scale shape.
    */
  def lineRepetition(df: DataFrame, id: Column, text: Column): DataFrame = {
    val lines = filter(transform(split(text, "\n"), l => trim(l)),
      l => l =!= lit(""))
    val dist = array_distinct(lines)
    def chars(arr: Column): Column =
      aggregate(arr, lit(0L), (acc, l) => acc + length(l).cast("long"))
    df.select(id.as("doc_id"),
      size(lines).cast("long").as("n_lines"),
      (size(lines) - size(dist)).cast("long").as("n_dup_lines"),
      chars(lines).as("line_chars"),
      (chars(lines) - chars(dist)).as("dup_line_chars"))
  }

  /** The Gopher repetition CASCADE as one (doc_id, passes) verdict —
    * the paper's thresholds in exact integer arithmetic over
    * [[lineRepetition]] and [[gramRepetition]]: duplicate lines
    * ≤ 30% of lines and ≤ 20% of line characters; top n-gram
    * coverage ≤ 20/18/16% of document characters for n = 2/3/4;
    * duplicated n-gram coverage ≤ 15/14/13/12/11/10% for n = 5…10.
    * Empty docs (no lines, no grams beyond the degenerate join) pass
    * the ratio rules vacuously, matching the paper's length filters
    * owning that case.
    */
  def repetitionPasses(df: DataFrame, id: Column, text: Column): DataFrame = {
    val topT = Seq(2 -> 20, 3 -> 18, 4 -> 16)
    val dupT = Seq(5 -> 15, 6 -> 14, 7 -> 13, 8 -> 12, 9 -> 11, 10 -> 10)
    val topMap = map(topT.flatMap { case (n, t) => Seq(lit(n), lit(t)) }: _*)
    val dupMap = map(dupT.flatMap { case (n, t) => Seq(lit(n), lit(t)) }: _*)
    val nchars = df.select(id.as("doc_id"),
      length(text).cast("long").as("__nc"))
    val gramOk = gramRepetition(df, id, text,
        ns = (topT ++ dupT).map(_._1))
      .join(nchars, "doc_id")
      .withColumn("__ok",
        (element_at(topMap, col("n")).isNull ||
          col("top_cov") * 100L <= col("__nc") * element_at(topMap, col("n"))) &&
        (element_at(dupMap, col("n")).isNull ||
          col("dup_cov") * 100L <= col("__nc") * element_at(dupMap, col("n"))))
      .groupBy("doc_id")
      .agg(min(col("__ok").cast("long")).as("__gok"))
    lineRepetition(df, id, text)
      .withColumn("__lok",
        (col("n_dup_lines") * 10L <= col("n_lines") * 3L &&
          col("dup_line_chars") * 5L <= col("line_chars")).cast("long"))
      .select(col("doc_id"), col("__lok"))
      .join(gramOk, Seq("doc_id"), "left")
      .select(col("doc_id"),
        // NULL text yields NULL line stats → the conjunction is NULL;
        // coalesce to 0 so the verdict stays in its documented {0,1}
        // domain (an unscoreable document is a rejected document)
        coalesce((col("__lok") === 1L &&
          coalesce(col("__gok"), lit(1L)) === 1L).cast("long"), lit(0L))
          .as("passes"))
  }
}
