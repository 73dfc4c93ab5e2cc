package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring (the CCNet/KenLM curation
  * signal): train integer bigram count tables on a trusted reference
  * corpus, score candidate documents by how well the reference model
  * predicts their bigrams. Low scores flag gibberish, boilerplate
  * soup, and wrong-language text that the surface heuristics
  * ([[TextAnalysis.qualityScore]], [[VocabScore]]) under-penalize.
  *
  * ORACLE-EXACT BY CONSTRUCTION (the q51 discipline): where KenLM
  * reports float log-probabilities (whose ln() differs between libm
  * and the JVM in the last ulp — measured on q51's workload), the
  * gated face here is a pure RATIONAL function of integer counts:
  * add-one-smoothed bigram probability p = (c12 + 1) / (c1 + V), each
  * term one exactly-rounded IEEE division of integers, per-document
  * score = mean of terms with the sum taken over DECIMAL(38,6)
  * (order-invariant → partition-invariant; terms pre-scaled by 1e6 so
  * the quantization keeps ~12 significant digits at corpus-vocabulary
  * V). The classic avg-ln-p form is available as [[avgLogProb]] for
  * in-engine ranking, exactly like [[Keywords.tfIdfLog]].
  *
  * Scale shape: the model is corpus-VOCABULARY-sized state (bigram
  * and history count tables — sparse, far smaller than the corpus),
  * trained in one explode + two grouped counts + one distinct count.
  * Scoring is one explode and two shuffle joins keyed on gram / w1 —
  * the model side is the small side and AQE broadcasts it when it
  * fits, same honesty note as [[Keywords]] (a web-scale vocab is too
  * big to ASSUME broadcast); the per-document aggregate is
  * partial-aggregated map-side. Unseen bigrams take the left-join
  * null path: p = 1 / (c1 + V), and the OOV count is reported — the
  * standard curation cut.
  */
object NgramLm {

  /** Trained model: (w1, c1) history-occurrence counts, (gram, c12)
    * bigram counts, (tok, cu) unigram counts with the corpus token
    * total, and the reference vocabulary size.
    */
  final case class NgramModel(history: DataFrame, bigrams: DataFrame,
                              unigrams: DataFrame, totalTokens: Long,
                              vocabSize: Long)

  /** (doc_id, gram, w1) bigram rows — lowercased whitespace bigrams;
    * documents with fewer than two tokens contribute nothing (the
    * degenerate single-token "gram" carries no space and is filtered,
    * mirroring q64's CASE len(t) < 2 branch by exclusion).
    */
  private def bigramRows(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"),
        explode(graft.functions.NGrams.wordNGramSeq(lower(trim(text)), 2)).as("gram"))
      .filter(col("gram").contains(" "))
      .withColumn("w1", substring_index(col("gram"), " ", 1))

  /** Train on the trusted reference corpus. `vocabSize` counts
    * distinct whitespace tokens (ALL tokens, including those of
    * single-token documents — the vocabulary is a token property, not
    * a bigram property).
    */
  def train(ref: DataFrame, text: Column): NgramModel = {
    val b = bigramRows(ref, lit(0L), text)
    val bigrams = b.groupBy(col("gram")).agg(count(lit(1)).as("c12"))
    val history = b.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val toks = ref.select(explode(split(lower(trim(text)), "\\s+")).as("tok"))
    val unigrams = toks.groupBy(col("tok")).agg(count(lit(1)).as("cu"))
    val Array(v, n) = unigrams
      .agg(count(lit(1)), sum(col("cu"))).head()
      .toSeq.map(x => x.asInstanceOf[Long]).toArray
    NgramModel(history, bigrams, unigrams, n, v)
  }

  /** Score candidate documents against the model. Output one row per
    * document WITH at least one bigram: (doc_id, n_bigrams, n_oov,
    * lm_score) where lm_score = mean add-one bigram probability — the
    * oracle-gated rational face (see object doc). Higher = more
    * reference-like; gibberish scores ≈ 1/V.
    */
  def scoreDocs(docs: DataFrame, id: Column, text: Column,
                model: NgramModel): DataFrame = {
    val v = model.vocabSize.toDouble
    val b = bigramRows(docs, id, text)
      .join(model.bigrams.select(col("gram"), col("c12").as("__c12")),
        Seq("gram"), "left")
      .join(model.history.select(col("w1"), col("c1").as("__c1")),
        Seq("w1"), "left")
      .withColumn("__p",
        (coalesce(col("__c12"), lit(0L)).cast("double") + lit(1.0)) /
          (coalesce(col("__c1"), lit(0L)).cast("double") + lit(v)))
    b.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_bigrams"),
      sum(when(col("__c12").isNull, 1L).otherwise(0L)).as("n_oov"),
      (sum((col("__p") * lit(1e6)).cast("decimal(38,6)")).cast("double") /
        count(lit(1)).cast("double") / lit(1e6)).as("lm_score"))
  }

  /** Interpolated (Jelinek–Mercer) scoring face: per bigram (w1, w2),
    *
    *   p = 0.75 · (c12/c1 when c1 > 0 else 0)  +  0.25 · (cu(w2)+1)/(N+V)
    *
    * i.e. maximum-likelihood bigram probability backed off onto an
    * add-one unigram. Unlike the pure add-one face ([[scoreDocs]]),
    * this orders same-vocabulary word salad ABOVE out-of-vocabulary
    * gibberish: add-one alone scores an unseen bigram 1/(c1+V), which
    * for a popular (high-c1) history is LOWER than the fully-OOV
    * 1/(0+V) — the classic additive-smoothing artifact; the unigram
    * back-off term restores the separation a curation cut needs
    * (known-word soup ≻ unknown-word soup). Still oracle-exact: λ =
    * 0.75 and 1−λ = 0.25 are dyadic (exact doubles), each division is
    * one exactly-rounded IEEE op, and the per-document mean uses the
    * same 1e6-prescaled DECIMAL(38,6) order-invariant sum.
    *
    * Output: (doc_id, n_bigrams, n_oov, lm_score).
    */
  def scoreDocsInterpolated(docs: DataFrame, id: Column, text: Column,
                            model: NgramModel): DataFrame = {
    val nv = (model.totalTokens + model.vocabSize).toDouble
    val b = bigramRows(docs, id, text)
      .withColumn("w2", substring_index(col("gram"), " ", -1))
      .join(model.bigrams.select(col("gram"), col("c12").as("__c12")),
        Seq("gram"), "left")
      .join(model.history.select(col("w1"), col("c1").as("__c1")),
        Seq("w1"), "left")
      .join(model.unigrams.select(col("tok").as("w2"), col("cu").as("__cu")),
        Seq("w2"), "left")
      .withColumn("__p",
        when(coalesce(col("__c1"), lit(0L)) > 0L,
          lit(0.75) * (coalesce(col("__c12"), lit(0L)).cast("double") /
            col("__c1").cast("double"))).otherwise(lit(0.0)) +
        lit(0.25) * ((coalesce(col("__cu"), lit(0L)).cast("double") + lit(1.0)) /
          lit(nv)))
    b.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_bigrams"),
      sum(when(col("__c12").isNull, 1L).otherwise(0L)).as("n_oov"),
      (sum((col("__p") * lit(1e6)).cast("decimal(38,6)")).cast("double") /
        count(lit(1)).cast("double") / lit(1e6)).as("lm_score"))
  }

  /** Interpolated Kneser–Ney scoring face — the smoothing KenLM/CCNet
    * actually ship — kept oracle-exact by the same rational discipline
    * as [[scoreDocsInterpolated]]. Per candidate bigram (w1, w2):
    *
    *   pcont(w2) = (N1+(·w2) + 1) / (B + V)
    *   p = max(c12 − D, 0)/c1 + (D · N1+(w1·) / c1) · pcont(w2)   when c1 > 0
    *   p = pcont(w2)                                              when c1 = 0
    *
    * where N1+(w1·) / N1+(·w2) are the distinct-continuation /
    * distinct-history counts (derived from the model's bigram table —
    * each row there IS a distinct bigram), B the distinct-bigram count
    * and V the vocabulary. Two deltas from the textbook form, both
    * documented choices: the continuation distribution is add-one
    * smoothed over B+V (textbook KN gives an unseen w2 zero mass,
    * which would zero whole documents — a curation scorer needs OOV
    * mass, the same reason [[scoreDocs]] is add-one), and unseen
    * HISTORIES back off to pcont alone rather than to a held-out
    * λ-weighted mix (c1 = 0 leaves no count to discount).
    *
    * Exactness: D = 0.75 is dyadic, c12 − 0.75 and 0.75·N1+ are exact
    * doubles (integer ± dyadic below 2⁵⁰), every division is one
    * exactly-rounded IEEE op mirrored verbatim in the oracle SQL, and
    * the per-document mean is the usual 1e6-prescaled DECIMAL(38,6)
    * order-invariant sum. What KN buys over Jelinek–Mercer: the
    * back-off weight is per-HISTORY (D·N1+(w1·)/c1 — promiscuous
    * histories back off harder) and the back-off distribution rewards
    * words seen after MANY distinct histories rather than raw-frequent
    * words — "san francisco"-soup stops inflating p(francisco|·).
    * What it does NOT buy (measured, NgramLmSpec): ordering known-word
    * salad above OOV gibberish — a seen history discounts its unseen
    * continuations by the small λ(w1) while an unseen history falls
    * back to the (larger) bland continuation prior, the KN-shaped
    * cousin of add-one's artifact. A curation cut that needs the
    * salad ≻ gibberish ordering should read [[scoreDocsInterpolated]];
    * this face is for in-distribution ranking with honest
    * history-confidence discounting.
    *
    * Output: (doc_id, n_bigrams, n_oov, lm_score).
    */
  def scoreDocsKneserNey(docs: DataFrame, id: Column, text: Column,
                         model: NgramModel): DataFrame = {
    // continuation tables derived from the (distinct-by-construction)
    // bigram count table: one row per distinct (w1,w2) pair
    val grams = model.bigrams.select(
      substring_index(col("gram"), " ", 1).as("w1"),
      substring_index(col("gram"), " ", -1).as("w2"))
    val fwd = grams.groupBy(col("w1")).agg(count(lit(1)).as("__n1pf"))
    val bwd = grams.groupBy(col("w2")).agg(count(lit(1)).as("__n1pb"))
    // distinct-bigram total: bounded driver-side scalar (the model is
    // vocabulary-sized state, not corpus-sized — same class as train()'s
    // vocab head())
    val bTotal = model.bigrams.count()
    val denom = (bTotal + model.vocabSize).toDouble
    val b = bigramRows(docs, id, text)
      .withColumn("w2", substring_index(col("gram"), " ", -1))
      .join(model.bigrams.select(col("gram"), col("c12").as("__c12")),
        Seq("gram"), "left")
      .join(model.history.select(col("w1"), col("c1").as("__c1")),
        Seq("w1"), "left")
      .join(fwd, Seq("w1"), "left")
      .join(bwd, Seq("w2"), "left")
      .withColumn("__pcont",
        (coalesce(col("__n1pb"), lit(0L)).cast("double") + lit(1.0)) / lit(denom))
      .withColumn("__p",
        when(coalesce(col("__c1"), lit(0L)) > 0L,
          greatest(coalesce(col("__c12"), lit(0L)).cast("double") - lit(0.75),
            lit(0.0)) / col("__c1").cast("double") +
          ((lit(0.75) * coalesce(col("__n1pf"), lit(0L)).cast("double")) /
            col("__c1").cast("double")) * col("__pcont"))
        .otherwise(col("__pcont")))
    b.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_bigrams"),
      sum(when(col("__c12").isNull, 1L).otherwise(0L)).as("n_oov"),
      (sum((col("__p") * lit(1e6)).cast("decimal(38,6)")).cast("double") /
        count(lit(1)).cast("double") / lit(1e6)).as("lm_score"))
  }

  /** CCNet-style perplexity bucketing: label every scored document
    * head / middle / tail by exact global rank on (score DESC, id ASC)
    * — head = best-scoring third, the slice CCNet keeps outright.
    * Integer-threshold arithmetic (3·rank ≤ n, ≤ 2n) so the bucket
    * boundary is exact cross-engine; ties on score break on id, and
    * the scores themselves hash-match cross-engine (the q101/q103
    * gates), so the labeling is deterministic end to end.
    *
    * The exact-rank face needs one global sort (this IS the oracle
    * semantics — same class as the top/bottom-k reporting gates). At
    * corpus scale swap the thresholds for
    * [[QualityFilter.quantileBandSketch]] cut points — mergeable
    * sketch, no global sort — and keep the same labeling rule.
    */
  def perplexityBuckets(scored: DataFrame, id: Column, score: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(score.desc, id.asc)
    scored.select(id.as("doc_id"), score.as("lm_score"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("bucket",
        when(col("__rn") * 3 <= col("__n"), lit("head"))
          .when(col("__rn") * 3 <= col("__n") * 2, lit("middle"))
          .otherwise(lit("tail")))
      .select(col("doc_id"), col("lm_score"), col("bucket"))
  }

  /** Classic average log-probability (≈ −ln perplexity) — in-engine
    * ranking use only; ln() is not bit-stable cross-engine (the
    * [[Keywords.tfIdfLog]] precedent). Monotonic per-term in the
    * rational face's p.
    */
  def avgLogProb(docs: DataFrame, id: Column, text: Column,
                 model: NgramModel): DataFrame = {
    val v = model.vocabSize.toDouble
    bigramRows(docs, id, text)
      .join(model.bigrams.select(col("gram"), col("c12").as("__c12")),
        Seq("gram"), "left")
      .join(model.history.select(col("w1"), col("c1").as("__c1")),
        Seq("w1"), "left")
      .withColumn("__lp", log(
        (coalesce(col("__c12"), lit(0L)).cast("double") + lit(1.0)) /
          (coalesce(col("__c1"), lit(0L)).cast("double") + lit(v))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), avg(col("__lp")).as("avg_logp"))
  }

  /** Persist / reload the model as parquet state (the serving pattern
    * every stored-state operator here follows).
    */
  def writeModel(model: NgramModel, dir: String): Unit = {
    model.history.write.mode("overwrite").parquet(s"$dir/history")
    model.bigrams.write.mode("overwrite").parquet(s"$dir/bigrams")
    model.unigrams.write.mode("overwrite").parquet(s"$dir/unigrams")
    model.history.sparkSession.range(1)
      .select(lit(model.vocabSize).as("vocab_size"),
        lit(model.totalTokens).as("total_tokens"))
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Fails loudly on state written by the pre-unigram writeModel (no
    * `unigrams/` table, no `total_tokens` meta): the interpolated face
    * needs both, silently defaulting them would mis-score every
    * document, and the corpus is not available here to rebuild them —
    * re-run [[train]] + [[writeModel]] once to migrate.
    */
  def readModel(spark: SparkSession, dir: String): NgramModel = {
    val meta = spark.read.parquet(s"$dir/meta").head()
    require(meta.schema.fieldNames.contains("total_tokens"),
      s"$dir holds a pre-unigram NgramLm model (no total_tokens/unigrams); " +
        "re-run train + writeModel to migrate this state")
    NgramModel(spark.read.parquet(s"$dir/history"),
      spark.read.parquet(s"$dir/bigrams"),
      spark.read.parquet(s"$dir/unigrams"),
      meta.getAs[Long]("total_tokens"),
      meta.getAs[Long]("vocab_size"))
  }
}
