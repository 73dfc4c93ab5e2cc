package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Temperature mixture sampling + embedding-space decontamination. */
class MixDecontamSpec extends SparkTestBase {

  import spark.implicits._

  // groups: a=32 rows, b=8 rows, c=2 rows
  private def mixDf = ((1 to 32).map(i => (i.toLong, "a"))
    ++ (33 to 40).map(i => (i.toLong, "b"))
    ++ Seq((41L, "c"), (42L, "c"))).toDF("id", "grp")

  test("temperatureSample: alpha=1 keeps every row at rate 1") {
    val out = Sampling.temperatureSample(mixDf, $"grp", $"id", alpha = 1.0)
    assert(out.count() == 42)
    assert(out.select("rate").distinct().as[Double].collect().toSeq == Seq(1.0))
  }

  test("temperatureSample: alpha=0.5 rates are sqrt(cmin/c); smallest group kept whole") {
    val out = Sampling.temperatureSample(mixDf, $"grp", $"id", alpha = 0.5)
    val rates = out.select($"grp", $"rate").distinct()
      .as[(String, Double)].collect().toMap
    assert(rates("a") == 0.25 && rates("b") == 0.5 && rates("c") == 1.0)
    val kept = out.groupBy($"grp").count().as[(String, Long)].collect().toMap
    assert(kept("c") == 2L)                       // rate-1 group: complete
    assert(kept("a") >= 2L && kept("a") <= 16L)   // ~32·0.25, hash-dependent
  }

  test("temperatureSample: alpha=0 equalizes (rate = cmin/c) and is repartition-invariant") {
    val out = Sampling.temperatureSample(mixDf, $"grp", $"id", alpha = 0.0)
    val rates = out.select($"grp", $"rate").distinct()
      .as[(String, Double)].collect().toMap
    assert(rates.getOrElse("a", 1.0 / 16) == 1.0 / 16 && rates.getOrElse("c", 1.0) == 1.0)
    val a = Sampling.temperatureSample(mixDf.repartition(1), $"grp", $"id", 0.5)
      .select("id").as[Long].collect().toSet
    val b = Sampling.temperatureSample(mixDf.repartition(7, $"grp"), $"grp", $"id", 0.5)
      .select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("temperatureSample: membership is per-key stable — growing one group never flips another") {
    val grown = mixDf.unionAll((100 to 131).map(i => (i.toLong, "a")).toDF("id", "grp"))
    val before = Sampling.temperatureSample(mixDf, $"grp", $"id", 0.5)
      .filter($"grp" === "b").select("id").as[Long].collect().toSet
    val after = Sampling.temperatureSample(grown, $"grp", $"id", 0.5)
      .filter($"grp" === "b").select("id").as[Long].collect().toSet
    assert(before == after) // b's count and rate unchanged; a's growth is invisible to b
  }

  test("sampleByRates: groups unseen by the rate snapshot follow defaultRate") {
    // snapshot rates know only groups a and b; group c appears later
    // (new language in continuous ingest after rates were persisted)
    val rates = Seq(("a", 0.25), ("b", 1.0)).toDF("__grp", "rate")
    val keptDefault = Sampling.sampleByRates(mixDf, $"grp", $"id", rates, "s")
      .filter($"grp" === "c")
    assert(keptDefault.count() == 2,
      "defaultRate=1.0 must keep unseen groups whole")
    assert(keptDefault.select("rate").distinct().as[Double].collect().toSeq == Seq(1.0))
    val dropped = Sampling.sampleByRates(mixDf, $"grp", $"id", rates, "s",
      defaultRate = 0.0)
    assert(dropped.filter($"grp" === "c").count() == 0,
      "defaultRate=0.0 must drop unseen groups")
    // known groups are untouched by the defaultRate choice
    val knownA = Sampling.sampleByRates(mixDf, $"grp", $"id", rates, "s")
      .filter($"grp" === "a").select("id").as[Long].collect().toSet
    val knownB = Sampling.sampleByRates(mixDf, $"grp", $"id", rates, "s",
      defaultRate = 0.0).filter($"grp" === "a").select("id").as[Long].collect().toSet
    assert(knownA == knownB)
  }

  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (3L, Array(1.0f, 0.05f, 0.0f, 0.0f)),  // near-dup of 1
    (4L, Array(0.0f, 0.0f, 1.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("byEmbedding: verbatim and near-dup leaks flagged, orthogonal vectors not") {
    val evalSet = Seq((10L, Array(1.0f, 0.0f, 0.0f, 0.0f))).toDF("eval_id", "evec")
    val out = Decontaminate.byEmbedding(vecs, "vec_id", "embedding",
        evalSet, "eval_id", "evec", tau = 0.9)
      .as[(Long, Long, Double, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 3L))
    assert(out(0)._3 == 1.0 && out(0)._2 == 10L && out(0)._4 == 1L)
    assert(out(1)._3 > 0.99 && out(1)._3 < 1.0)
  }

  test("byEmbedding: argmax takes the lowest eval id on exact cosine ties") {
    val evalSet = Seq(
      (20L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (21L, Array(1.0f, 0.0f, 0.0f, 0.0f))).toDF("eval_id", "evec")
    val out = Decontaminate.byEmbedding(vecs, "vec_id", "embedding",
        evalSet, "eval_id", "evec", tau = 0.9)
      .as[(Long, Long, Double, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 20L, 1.0, 2L)))
  }

  test("byEmbeddingLsh: verbatim leaks are always caught; result is a subset of exact") {
    val evalSet = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (11L, Array(0.0f, 0.0f, 1.0f, 1.0f))).toDF("eval_id", "evec")
    val exact = Decontaminate.byEmbedding(vecs, "vec_id", "embedding",
      evalSet, "eval_id", "evec", 0.9).select("vec_id").as[Long].collect().toSet
    val lsh = Decontaminate.byEmbeddingLsh(vecs, "vec_id", "embedding",
      evalSet, "eval_id", "evec", 0.9, bits = 8).select("vec_id").as[Long].collect().toSet
    assert(lsh.subsetOf(exact))
    assert(Set(1L, 4L).subsetOf(lsh)) // identical vectors share any SRP signature
  }

  test("byEmbeddingLsh banded: catch set is a superset of the full-signature single band; hits never double-count") {
    val evalSet = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (11L, Array(0.0f, 0.0f, 1.0f, 1.0f))).toDF("eval_id", "evec")
    val exact = Decontaminate.byEmbedding(vecs, "vec_id", "embedding",
      evalSet, "eval_id", "evec", 0.9)
      .as[(Long, Long, Double, Long)].collect().toSet
    val single = Decontaminate.byEmbeddingLsh(vecs, "vec_id", "embedding",
      evalSet, "eval_id", "evec", 0.9, bits = 16)
      .as[(Long, Long, Double, Long)].collect().toSet
    val banded = Decontaminate.byEmbeddingLsh(vecs, "vec_id", "embedding",
      evalSet, "eval_id", "evec", 0.9, bits = 4, bands = 4)
      .as[(Long, Long, Double, Long)].collect().toSet
    // OR-amplification over the same 16 planes: candidates (hence
    // flagged rows) are a superset of the single-band run...
    assert(single.map(_._1).subsetOf(banded.map(_._1)))
    // ...and each flagged row carries the SAME argmax/count as the
    // exact screen whenever its pairs were all candidates — verify the
    // rows banded shares with exact agree exactly (no band-multiplied
    // n_hits, no wrong argmax from a dropped pair)
    banded.foreach { r =>
      exact.find(_._1 == r._1).foreach { e =>
        assert(r._4 <= e._4, s"banded n_hits exceeds exact for ${r._1}: $r vs $e")
      }
    }
    // verbatim leaks always caught, any banding
    assert(Set(1L, 4L).subsetOf(banded.map(_._1)))
    intercept[IllegalArgumentException] {
      Decontaminate.byEmbeddingLsh(vecs, "vec_id", "embedding",
        evalSet, "eval_id", "evec", 0.9, bits = 32, bands = 4)
    }
  }

  test("capPerGroup keeps exactly cap rows per oversized group, all of smaller ones") {
    val capped = Sampling.capPerGroup(mixDf, $"grp", $"id", cap = 5, salt = "s")
    val byGrp = capped.groupBy($"grp").count().as[(String, Long)].collect().toMap
    assert(byGrp == Map("a" -> 5L, "b" -> 5L, "c" -> 2L))
    // deterministic: same selection under any partitioning
    val again = Sampling.capPerGroup(mixDf.repartition(7, $"id"), $"grp", $"id", 5, "s")
      .select($"id").as[Long].collect().sorted.toSeq
    assert(again == capped.select($"id").as[Long].collect().sorted.toSeq)
    // salt changes the kept subset (unbiased re-draw), not the counts
    val other = Sampling.capPerGroup(mixDf, $"grp", $"id", 5, "other")
      .select($"id").as[Long].collect().sorted.toSeq
    assert(other != again)
    assert(other.size == again.size)
  }

  test("capPerGroupAgg (bounded-state scale face) selects the identical rows") {
    for (salt <- Seq("", "s", "zz"); cap <- Seq(1, 3, 5, 40)) {
      val w = Sampling.capPerGroup(mixDf, $"grp", $"id", cap, salt)
        .as[(Long, String)].collect().sorted.toSeq
      val a = Sampling.capPerGroupAgg(mixDf, $"grp", $"id", cap, salt)
        .as[(Long, String)].collect().sorted.toSeq
      assert(a == w, s"faces diverge at cap=$cap salt=$salt")
    }
  }

  test("quotaAdmit: earlier batches hold slots; a single batch equals the batch face") {
    import org.apache.spark.sql.DataFrame
    val empty = Seq.empty[(String, Long)].toDF("grp", "n_admitted")
    // one batch with everything = the batch-face re-draw
    val (all1, counts1) = Sampling.quotaAdmit(mixDf, empty, "grp", "id", cap = 5, salt = "s")
    val batchFace = Sampling.capPerGroup(mixDf, $"grp", $"id", 5, "s")
    assert(all1.select($"id", $"grp").as[(Long, String)].collect().sorted.toSeq ==
      batchFace.select($"id", $"grp").as[(Long, String)].collect().sorted.toSeq)
    assert(counts1.as[(String, Long)].collect().toMap == Map("a" -> 5L, "b" -> 5L, "c" -> 2L))

    // sequential: batch 1 = ids 1..3 of group a (all admitted, under cap);
    // batch 2 = ids 4..9 of a (only 2 open slots left; smallest hashes win)
    val b1 = mixDf.filter($"id" <= 3)
    val b2 = mixDf.filter($"id" > 3 && $"id" <= 9)
    val (a1, c1) = Sampling.quotaAdmit(b1, empty, "grp", "id", 5, "s")
    assert(a1.count() == 3 && c1.as[(String, Long)].collect().toMap == Map("a" -> 3L))
    val (a2, c2) = Sampling.quotaAdmit(b2, c1, "grp", "id", 5, "s")
    assert(a2.count() == 2, "only the two open slots admit")
    assert(c2.as[(String, Long)].collect().toMap == Map("a" -> 5L))
    // slot-holding makes the sequential result differ from the re-draw
    // over the union (ids 1-3 are guaranteed in; the re-draw may drop them)
    val seq9 = (a1.select($"id").as[Long].collect() ++
      a2.select($"id").as[Long].collect()).sorted.toSeq
    assert(Set(1L, 2L, 3L).subsetOf(seq9.toSet))
    // a full group admits nothing more
    val b3 = mixDf.filter($"id" > 9 && $"id" <= 12)
    val (a3, c3) = Sampling.quotaAdmit(b3, c2, "grp", "id", 5, "s")
    assert(a3.count() == 0)
    assert(c3.as[(String, Long)].collect().toMap == Map("a" -> 5L))
  }

  test("quotaAdmit counts table carries groups absent from the current batch") {
    val stored = Seq(("a", 2L), ("zzz", 4L)).toDF("grp", "n_admitted")
    val batch = mixDf.filter($"grp" === "b")
    val (_, counts) = Sampling.quotaAdmit(batch, stored, "grp", "id", 3, "s")
    assert(counts.as[(String, Long)].collect().toMap ==
      Map("a" -> 2L, "zzz" -> 4L, "b" -> 3L))
  }
}
