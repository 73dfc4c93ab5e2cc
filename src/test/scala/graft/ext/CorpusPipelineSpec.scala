package graft.ext

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the extension operators composed into
  * the pipeline a training-data team would actually run —
  *
  *   normalize → repeated-span removal → incremental exact dedup →
  *   near-dup cluster canonicalization → quality band →
  *   n-gram + semantic decontaminate → temperature mixture sample →
  *   leakage-safe split → pack
  *
  * Each stage's row accounting is asserted, so a semantic change in
  * any operator that breaks composability (column clashes, dropped
  * rows, non-determinism across stages) fails here even if every
  * per-operator spec still passes.
  */
class CorpusPipelineSpec extends SparkTestBase {
  import spark.implicits._

  test("the full curation chain composes and conserves row accounting") {
    val dir = "/root/testdata/sf0.001"
    val raw = Tables.table(spark, dir, "documents")
      .select($"doc_id", $"text", $"lang")
    val n0 = raw.count()

    // 1. normalize (adds no rows, canonicalizes text)
    val normed = raw.withColumn("text", TextAnalysis.normalize($"text"))
    assert(normed.count() == n0)

    // 2. repeated-span removal: corpus-duplicated 8-grams cut from
    //    every document; rewrite keeps one row per doc, docs reduced
    //    to nothing (pure boilerplate / exact dups) are dropped
    val despanned = SpanDedup.cleanRepeatedSpans(normed, $"doc_id", $"text", n = 8)
      .filter($"n_kept" > 0)
      .join(normed.select($"doc_id", $"lang"), "doc_id")
      .select($"doc_id", $"clean_text".as("text"), $"lang")
    val n1 = despanned.count()
    assert(n1 > 0 && n1 <= n0)

    // 3. incremental exact dedup against an "existing" first half
    val existing = despanned.filter($"doc_id" < 250)
    val incoming = despanned.filter($"doc_id" >= 250)
    val fresh = ExactDedup.incremental(incoming, existing, $"text", "doc_id")
    val n2 = fresh.count()
    assert(n2 > 0 && n2 <= incoming.count())

    // 4. near-dup cluster canonicalization (char-3-gram jaccard pairs)
    val pairs = ShingleJaccard.similarPairs(fresh, $"doc_id", $"text", 3, 0.8)
    val canonical = DedupClusters.keepCanonical(fresh, "doc_id", pairs)
    val n3 = canonical.count()
    val losers = DedupClusters.connectedComponents(pairs)
      .filter($"id" =!= $"component").count()
    assert(n3 == n2 - losers)

    // 5. quality band on n_chars
    val banded = QualityFilter.quantileBand(
      canonical.withColumn("n_chars", length($"text")), $"n_chars", 0.05, 0.95)
    val n4 = banded.count()
    assert(n4 > 0 && n4 <= n3)

    // 6a. decontaminate against an eval slice drawn from the corpus
    val evalDocs = normed.filter($"doc_id" % 97 === 0)
    val clean = Decontaminate.decontaminate(banded, evalDocs, $"doc_id", $"text", 8)
    val n5a = clean.count()
    assert(n5a <= n4)

    // 6b. SEMANTIC decontaminate: drop survivors whose embedding sits
    //     within cosine 0.95 of the eval slice's embeddings
    val emb = Tables.table(spark, dir, "embeddings")
    val evalVecs = emb.filter($"vec_id" % 97 === 0)
      .select($"vec_id".as("eval_id"), $"embedding".as("evec"))
    val flagged = Decontaminate.byEmbedding(
        emb, "vec_id", "embedding", evalVecs, "eval_id", "evec", tau = 0.95)
      .select($"vec_id".as("__flagged"))
    val semClean = clean.join(flagged, clean("doc_id") === col("__flagged"), "left_anti")
    val n5 = semClean.count()
    assert(n5 <= n5a)

    // 7. temperature mixture sample by language (α = ½); the rarest
    //    language among survivors is kept in full
    val sampled = Sampling.temperatureSample(semClean, $"lang", $"doc_id", alpha = 0.5)
    val n6 = sampled.count()
    assert(n6 > 0 && n6 <= n5)
    val rarest = semClean.groupBy($"lang").count().orderBy($"count", $"lang")
      .as[(String, Long)].head()
    val keptRarest = sampled.filter($"lang" === rarest._1).count()
    assert(keptRarest == rarest._2)

    // 8. leakage-safe split: assignment hashes the near-dup COMPONENT,
    //    so surviving near-dup pairs can never straddle train/test
    val split = DedupClusters.leakageSafeSplit(
      sampled.drop("rate"), "doc_id", pairs,
      Seq(("train", 204), ("val", 26), ("test", 26)))
    val bySplit = split.groupBy($"split").count().as[(String, Long)].collect().toMap
    assert(bySplit.values.sum == n6)

    // 9. pack the train split into 512-token bins
    val train = split.filter($"split" === "train")
      .withColumn("n_tokens", TextAnalysis.tokenCount($"text").cast("long"))
    val packed = Packing.packByBudget(train, $"doc_id", $"n_tokens", 512L)
    assert(packed.count() == train.count())
    // token conservation through the packing layout
    val packedTokens = packed.groupBy($"bucket").agg(max($"cum_tokens").as("m"))
      .agg(sum($"m")).as[Long].head()
    assert(packedTokens == train.agg(sum($"n_tokens")).as[Long].head())

    // the whole chain is deterministic: a second run is identical
    val again = Packing.packByBudget(train, $"doc_id", $"n_tokens", 512L)
      .orderBy($"bucket", $"pack_pos").collect().toSeq
    assert(again == packed.orderBy($"bucket", $"pack_pos").collect().toSeq)
  }
}
