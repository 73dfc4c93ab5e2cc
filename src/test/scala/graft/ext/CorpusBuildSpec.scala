package graft.ext

import graft.{ExtQueries4, SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** The composed end-to-end corpus-build gate (q215): invariants the
  * oracle hash cannot state directly — ledger chaining, conservation
  * into the shard manifest, snake balance, leakage safety of the
  * component split, and run-to-run determinism of the whole chain.
  */
class CorpusBuildSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def rows() =
    ExtQueries4.q215.run(spark, dir)
      .select($"ord", $"step", $"n_in", $"n_kept", $"weight", $"digest")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(_._1)

  private lazy val out = rows()

  test("attrition ledger chains: every stage's n_in is the previous n_kept") {
    val stages = out.filter(_._1 < 100)
    assert(stages.map(_._2).toSeq == Seq("warc_parse", "word_bounds",
      "word_len", "exact_dedup", "source_rate", "split_train", "near_dup",
      "budget"))
    stages.foreach { case (_, step, nIn, nKept, _, _) =>
      assert(nKept <= nIn, s"$step grew rows: $nIn -> $nKept")
    }
    stages.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 == a._4,
        s"${b._2}.n_in=${b._3} != ${a._2}.n_kept=${a._4} — stage interface drift")
    }
    // WARC parse is lossless in count (content fidelity is what the
    // downstream digests pin); the planted near-dups guarantee drops
    val warc = stages.head
    assert(warc._3 == warc._4 && warc._3 > 0)
    val nearDup = stages.find(_._2 == "near_dup").get
    assert(nearDup._4 < nearDup._3, "planted replays must be deduped in train")
    val budget = stages.find(_._2 == "budget").get
    assert(budget._4 < budget._3, "half-token budget must cut the corpus")
  }

  test("shard manifest conserves the selection and deals a balanced snake") {
    val sel = out.find(_._2 == "budget").get._4
    val shards = out.filter(_._1 >= 100)
    assert(shards.length == 7)
    assert(shards.map(_._3).sum == sel,
      "shard n_rows must sum to the budget stage's n_kept")
    val counts = shards.map(_._3)
    assert(counts.max - counts.min <= 1, s"snake dealing unbalanced: ${counts.toSeq}")
    val weights = shards.map(_._5)
    // weight-DESC serpentine: spread bounded by ~one heaviest doc; at
    // this SF the shard totals sit within a few percent of each other
    assert(weights.min > 0 &&
      (weights.max - weights.min) * 10 < weights.min,
      s"snake weights unbalanced: ${weights.toSeq}")
    assert(shards.forall(_._6 != 0L), "content digest must be non-trivial")
  }

  test("the component split is leakage-safe: no near-dup pair straddles splits") {
    val base = Tables.table(spark, dir, "documents")
      .select($"doc_id", $"text")
    val planted = base.filter($"doc_id" >= 20 && $"doc_id" < 24)
      .select(($"doc_id" + 920000L).as("doc_id"),
        concat($"text", lit(" chain tail one")).as("text"))
      .unionAll(base.filter($"doc_id" >= 20 && $"doc_id" < 24)
        .select(($"doc_id" + 930000L).as("doc_id"),
          concat($"text", lit(" chain tail one two")).as("text")))
    val docs = base.unionAll(planted)
    val pairs = MinHashLsh.selfNearDupEstimate(
      MinHashLsh.portableSignatures(docs, $"doc_id", $"text", n = 3, k = 8),
      k = 8, bands = 4, threshold = 0.5)
    assert(pairs.count() >= 4, "planted chain must produce near-dup pairs")
    val sp = DedupClusters.leakageSafeSplit(docs, "doc_id",
      pairs.select($"id1", $"id2"),
      Seq("train" -> 204, "val" -> 26, "test" -> 26), salt = "corpus")
      .select($"doc_id", $"component", $"split")
    // a chain replay shares its component with the original — ≥3 members
    val compSizes = sp.groupBy($"component").count()
    assert(compSizes.filter($"count" >= 3).count() >= 1,
      "chain fixture must form a >=3-member component")
    val straddle = pairs
      .join(sp.select($"doc_id".as("id1"), $"split".as("sp1")), "id1")
      .join(sp.select($"doc_id".as("id2"), $"split".as("sp2")), "id2")
      .filter($"sp1" =!= $"sp2")
    assert(straddle.count() == 0, "a near-dup pair straddles train/val/test")
  }

  test("the whole chain is deterministic run to run") {
    assert(rows().toSeq == out.toSeq)
  }

  test("q216 incremental admission: both rejection branches fire; shards conserve corpus+admitted") {
    val r = ExtQueries4.q216.run(spark, dir)
      .select($"ord", $"step", $"n_in", $"n_kept")
      .collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3)))
      .sortBy(_._1)
    val stages = r.filter(_._1 < 100)
    assert(stages.map(_._2).toSeq == Seq("quality", "exact_dedup", "near_dup"))
    stages.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 == a._4, s"${b._2} n_in != ${a._2} n_kept")
    }
    // planted exact replays: corpus ids {1,2,4,5,7,8} (< 10, % 3 != 0)
    val ex = stages.find(_._2 == "exact_dedup").get
    assert(ex._3 - ex._4 >= 6, "exact replays must be rejected")
    // planted mutated replays: ids {10,11,13,14,16,17,19} at minimum
    val nd = stages.find(_._2 == "near_dup").get
    assert(nd._3 - nd._4 >= 7, "mutated replays must be rejected by the probe")
    // updated manifest = stored corpus rows + admitted rows, exactly
    val corpusN = graft.Tables.table(spark, dir, "documents")
      .filter($"doc_id" % 3 =!= 0).count()
    assert(r.filter(_._1 >= 100).map(_._3).sum == corpusN + nd._4)
  }
}
