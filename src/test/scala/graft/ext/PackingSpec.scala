package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Offset sequence packing: budget bins, deterministic layout. */
class PackingSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = (1L to 300L).map(i => (i, 10L + i % 90)).toDF("doc_id", "n_tokens")

  test("bins inside a bucket are contiguous and hold ~budget tokens") {
    val out = Packing.packByBudget(docs, $"doc_id", $"n_tokens", budget = 200L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // per bucket: pack_pos is 1..n, cum_tokens strictly increasing,
    // bin_id = (cum_before) div budget and non-decreasing
    out.groupBy(_._1).foreach { case (bucket, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, s"bucket $bucket positions")
      sorted.foldLeft((0L, 0L)) { case ((prevCum, prevBin), (_, _, cum, bin)) =>
        assert(cum > prevCum, s"bucket $bucket cum not increasing")
        // prefix-before this doc is the previous cum; bin = floor(prefix/budget)
        assert(bin == prevCum / 200L, s"bucket $bucket bin $bin vs ${prevCum / 200L}")
        assert(bin >= prevBin, s"bucket $bucket bin went backwards")
        (cum, bin)
      }
    }
  }

  test("layout is invariant to input partitioning") {
    val one = Packing.packByBudget(docs.repartition(1), $"doc_id", $"n_tokens", 200L)
      .orderBy($"bucket", $"pack_pos").collect().toSeq
    val many = Packing.packByBudget(docs.repartition(13), $"doc_id", $"n_tokens", 200L)
      .orderBy($"bucket", $"pack_pos").collect().toSeq
    assert(one == many)
  }

  test("empty input packs to empty output") {
    val empty = docs.filter($"doc_id" < 0)
    assert(Packing.packByBudget(empty, $"doc_id", $"n_tokens", 200L).count() == 0)
  }

  test("total tokens are conserved") {
    val packed = Packing.packByBudget(docs, $"doc_id", $"n_tokens", 200L)
    val maxCum = packed.groupBy($"bucket").agg(max($"cum_tokens").as("m"))
      .agg(sum($"m")).as[Long].head()
    val total = docs.agg(sum($"n_tokens")).as[Long].head()
    assert(maxCum == total)
  }

  test("budgets in REAL tokenizer tokens: pack by Bpe.count, conserved") {
    import graft.functions.Bpe
    val texts = (1L to 120L).map(i =>
      (i, s"the would station $i which could notwithstanding " * (1 + (i % 4)).toInt))
      .toDF("doc_id", "text")
    val withCost = texts.select($"doc_id", Bpe.count($"text").as("n_bpe"))
    val packed = Packing.packByBudget(withCost, $"doc_id", $"n_bpe", budget = 64L)
    val maxCum = packed.groupBy($"bucket").agg(max($"cum_tokens").as("m"))
      .agg(sum($"m")).as[Long].head()
    val total = withCost.agg(sum($"n_bpe")).as[Long].head()
    assert(maxCum == total && total > 0)
    // real-token budget differs from the whitespace estimate (fertility
    // != 1), so packing by BPE produces a different (correct) layout
    val ws = texts.select($"doc_id",
      graft.ext.TextAnalysis.tokenCount($"text").cast("long").as("n"))
      .agg(sum($"n")).as[Long].head()
    assert(total != ws)
  }
}
