package graft.ext

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the round-3 operators composed into the
  * pipeline a training-data team would actually run —
  *
  *   normalize → incremental exact dedup → near-dup cluster
  *   canonicalization → quality band → decontaminate → split → pack
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

    // 2. incremental exact dedup against an "existing" first half
    val existing = normed.filter($"doc_id" < 250)
    val incoming = normed.filter($"doc_id" >= 250)
    val fresh = ExactDedup.incremental(incoming, existing, $"text", "doc_id")
    val n2 = fresh.count()
    assert(n2 > 0 && n2 <= incoming.count())

    // 3. near-dup cluster canonicalization (char-3-gram jaccard pairs)
    val pairs = ShingleJaccard.similarPairs(fresh, $"doc_id", $"text", 3, 0.8)
    val canonical = DedupClusters.keepCanonical(fresh, "doc_id", pairs)
    val n3 = canonical.count()
    val losers = DedupClusters.connectedComponents(pairs)
      .filter($"id" =!= $"component").count()
    assert(n3 == n2 - losers)

    // 4. quality band on n_chars
    val banded = QualityFilter.quantileBand(
      canonical.withColumn("n_chars", length($"text")), $"n_chars", 0.05, 0.95)
    val n4 = banded.count()
    assert(n4 > 0 && n4 <= n3)

    // 5. decontaminate against an eval slice drawn from the corpus
    val evalDocs = normed.filter($"doc_id" % 97 === 0)
    val clean = Decontaminate.decontaminate(banded, evalDocs, $"doc_id", $"text", 8)
    val n5 = clean.count()
    assert(n5 <= n4)

    // 6. deterministic split — partitions the survivors exactly
    val split = clean.withColumn("split",
      Sampling.hashSplit($"doc_id", Seq(("train", 204), ("val", 26), ("test", 26))))
    val bySplit = split.groupBy($"split").count().as[(String, Long)].collect().toMap
    assert(bySplit.values.sum == n5)

    // 7. pack the train split into 512-token bins
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
