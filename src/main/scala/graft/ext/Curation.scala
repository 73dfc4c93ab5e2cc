package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The curation CASCADE — the composed front door every corpus build
  * actually runs (C4/RefinedWeb/FineWeb shape): per-document quality
  * screens, then exact deduplication, then the source-level
  * neighborhood cut, with a per-stage ATTRITION LEDGER so "where did
  * 40% of the crawl go?" is a queryable artifact instead of a log
  * line. The stages are the engine's existing operators composed —
  * this module adds the sequencing, the survival bookkeeping, and
  * the ledger contract.
  *
  * Stage semantics (sequential — a document reaches stage k+1 iff it
  * survived stage k):
  *  1. `word_bounds`  — minWords ≤ n_words ≤ maxWords (Gopher rule).
  *  2. `word_len`     — mean word length inside
  *                      [minLenTenths, maxLenTenths]/10, as integer
  *                      cross-multiplications (10·Σlen ⋛ bound·n) —
  *                      no float boundary.
  *  3. `exact_dedup`  — keep the MINIMUM doc_id per distinct text
  *                      (md5 digest key — text never shuffles; the
  *                      [[ExactDedup]] discipline).
  *  4. `source_rate`  — [[QualityFilter.hostNeighborhoodScreen]] with
  *                      the source as the neighborhood: a survivor is
  *                      kept iff its source has < minDocs documents
  *                      OR the source's stage-1∧2 pass rate clears
  *                      num/den. The rate is computed over the FULL
  *                      corpus (a spam source's failing pages are
  *                      exactly the evidence), applied to stage-3
  *                      survivors.
  *
  * Scale shape: stages 1-2 are zero-shuffle per-row expressions
  * riding the ingest scan; stage 3 is one digest-keyed grouped MIN
  * (map-side combined) joined back on the digest; stage 4 is one
  * source-keyed count whose SOURCE-CARDINALITY stats table joins back
  * BROADCAST on source — no corpus-sized exchange.
  * The ledger is ONE aggregation over the survival flags — counting
  * never re-scans text. Nothing in the cascade holds corpus-sized
  * driver state.
  *
  * Exactness: verdicts and counts are pure integer arithmetic on
  * md5 digests — deterministic, partitioning-invariant, oracle-
  * checkable end to end (q207 hash-matches the whole ledger; the
  * oracle keys raw text where Spark keys digests — the q20 pin).
  */
object Curation {

  final case class CascadeParams(minWords: Long = 5L,
                                 maxWords: Long = 100000L,
                                 minLenTenths: Long = 20L,
                                 maxLenTenths: Long = 120L,
                                 srcMinDocs: Long = 3L,
                                 srcNum: Int = 1,
                                 srcDen: Int = 2)

  val StageNames: Seq[String] =
    Seq("word_bounds", "word_len", "exact_dedup", "source_rate")

  /** Per-document survival flags: (doc_id, source, s1, s2, s3, s4)
    * with s_k = "alive after stage k". The building block both
    * [[ledger]] and [[kept]] read — computed once, reused.
    */
  def survival(df: DataFrame, id: Column, text: Column, source: Column,
               p: CascadeParams = CascadeParams()): DataFrame = {
    require(p.minWords >= 0 && p.maxWords >= p.minWords, s"bad word bounds $p")
    require(p.minLenTenths >= 0 && p.maxLenTenths >= p.minLenTenths,
      s"bad word-length bounds $p")
    require(p.srcMinDocs >= 1 && p.srcNum >= 0 && p.srcDen >= 1 &&
      p.srcNum <= p.srcDen, s"bad source-rate params $p")

    // a NULL source would silently vanish from the stage-4 source
    // equi-join, undercounting the ledger's n0 instead of raising —
    // contrary to the module's raise-on-desync discipline (ADVICE
    // r13); coalesce to a sentinel upstream if NULL sources are real
    val guardedSource = when(source.isNull, raise_error(lit(
      "Curation.survival: document with NULL source — the source-rate " +
        "stage would silently drop it; coalesce to a sentinel upstream")))
      .otherwise(source)
    val words = filter(split(lower(trim(text)), "\\s+"), w => w =!= lit(""))
    val base = df.select(id.as("doc_id"), guardedSource.as("source"),
        md5(text.cast("binary")).as("__dig"),
        size(words).cast("long").as("__nw"),
        aggregate(words, lit(0L), (a, w) => a + length(w).cast("long"))
          .as("__sumlen"))
      .withColumn("s1",
        col("__nw") >= p.minWords && col("__nw") <= p.maxWords)
      .withColumn("s2", col("s1") &&
        col("__sumlen") * 10 >= col("__nw") * p.minLenTenths &&
        col("__sumlen") * 10 <= col("__nw") * p.maxLenTenths)

    // stage 3: first (min doc_id) per digest among stage-2 survivors
    val canon = base.filter(col("s2")).groupBy(col("__dig"))
      .agg(min(col("doc_id")).as("__keep_id"))
    val withS3 = base.join(canon, Seq("__dig"), "left")
      .withColumn("s3", col("s2") && col("doc_id") === col("__keep_id"))

    // stage 4: source pass-rate over the FULL corpus's stage-2
    // verdicts. The verdict only depends on SOURCE-level stats, so the
    // source-cardinality stats table joins back BROADCAST on source —
    // not the corpus×corpus doc_id join-back of the per-document
    // screen face (one full exchange deleted from the cascade;
    // VERDICT r13 item 3)
    val stats = QualityFilter.hostNeighborhoodStats(
        base, col("source"), col("s2"))
      .select(col("host").as("source"), col("host_docs"), col("host_pass"))
    withS3.join(broadcast(stats), "source")
      .withColumn("s4", col("s3") && (col("host_docs") < p.srcMinDocs ||
        col("host_pass") * p.srcDen >= col("host_docs") * p.srcNum))
      .select(col("doc_id"), col("source"),
        col("s1"), col("s2"), col("s3"), col("s4"))
  }

  /** The attrition ledger: one row per stage —
    * (stage_id, stage, n_in, n_kept) — from ONE aggregation over the
    * survival flags.
    */
  def ledger(surv: DataFrame): DataFrame = {
    val agg = surv.agg(
      count(lit(1)).as("n0"),
      sum(when(col("s1"), 1L).otherwise(0L)).as("n1"),
      sum(when(col("s2"), 1L).otherwise(0L)).as("n2"),
      sum(when(col("s3"), 1L).otherwise(0L)).as("n3"),
      sum(when(col("s4"), 1L).otherwise(0L)).as("n4"))
    val rows = StageNames.zipWithIndex.map { case (name, k) =>
      struct(lit((k + 1).toLong).as("stage_id"), lit(name).as("stage"),
        col(s"n$k").as("n_in"), col(s"n${k + 1}").as("n_kept"))
    }
    agg.select(explode(array(rows: _*)).as("r"))
      .select(col("r.stage_id"), col("r.stage"), col("r.n_in"), col("r.n_kept"))
  }

  /** Per-SOURCE attrition: (source, stage_id, stage, n_in, n_kept) —
    * the governance view behind "which source loses most at dedup":
    * the same one-aggregation discipline as [[ledger]], grouped by
    * source (source-cardinality output, never a re-scan).
    */
  def ledgerBySource(surv: DataFrame): DataFrame = {
    val agg = surv.groupBy(col("source")).agg(
      count(lit(1)).as("n0"),
      sum(when(col("s1"), 1L).otherwise(0L)).as("n1"),
      sum(when(col("s2"), 1L).otherwise(0L)).as("n2"),
      sum(when(col("s3"), 1L).otherwise(0L)).as("n3"),
      sum(when(col("s4"), 1L).otherwise(0L)).as("n4"))
    val rows = StageNames.zipWithIndex.map { case (name, k) =>
      struct(lit((k + 1).toLong).as("stage_id"), lit(name).as("stage"),
        col(s"n$k").as("n_in"), col(s"n${k + 1}").as("n_kept"))
    }
    agg.select(col("source"), explode(array(rows: _*)).as("r"))
      .select(col("source"), col("r.stage_id"), col("r.stage"),
        col("r.n_in"), col("r.n_kept"))
  }

  /** The surviving documents (ids): stage-4 survivors. */
  def kept(surv: DataFrame): DataFrame =
    surv.filter(col("s4")).select(col("doc_id"))

  /** One-call face: (ledger, kept doc ids) over a documents frame. */
  def cascade(df: DataFrame, id: Column, text: Column, source: Column,
              p: CascadeParams = CascadeParams()): (DataFrame, DataFrame) = {
    val surv = survival(df, id, text, source, p)
    (ledger(surv), kept(surv))
  }
}
