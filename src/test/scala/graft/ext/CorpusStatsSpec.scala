package graft.ext

import graft.SparkTestBase

/** Vocabulary-growth curve: hand-computed checkpoints, the
  * min-first-doc ≡ running-distinct identity against a naive
  * sequential reference, empty-doc handling, checkpoint guards, and
  * partition invariance.
  */
class CorpusStatsSpec extends SparkTestBase {

  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat"),
    (2L, "the dog sat"),
    (3L, ""),
    (4L, "the cat RAN ran"),
    (5L, "entirely novel words here")).toDF("doc_id", "text")

  test("hand-computed curve: docs, tokens, vocabulary per checkpoint") {
    val out = CorpusStats.vocabGrowth(docs, $"doc_id", $"text", Seq(2L, 4L, 5L))
      .orderBy($"checkpoint")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // c=2: docs {1,2}, tokens 6, vocab {the,cat,sat,dog} = 4
    // c=4: +doc3 (empty) +doc4 (the cat ran ran — "ran" casefolds) →
    //      docs 4, tokens 10, vocab {the,cat,sat,dog,ran} = 5
    // c=5: docs 5, tokens 14, vocab 5 + {entirely,novel,words,here} = 9
    assert(out.toSeq == Seq(
      (2L, 2L, 6L, 4L),
      (4L, 4L, 10L, 5L),
      (5L, 5L, 14L, 9L)))
  }

  test("min-first-doc face equals the naive sequential distinct count") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cps = Seq(50L, 200L, 1000000L)
    val fast = CorpusStats.vocabGrowth(corpus, $"doc_id", $"text", cps)
      .orderBy($"checkpoint")
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    val naive = cps.map { c =>
      val v = corpus.filter($"doc_id" <= c)
        .select(org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.lower(
              org.apache.spark.sql.functions.trim($"text")), "\\s+")).as("w"))
        .filter(org.apache.spark.sql.functions.length($"w") > 0)
        .distinct().count()
      (c, v)
    }
    assert(fast.toSeq == naive)
  }

  test("partitioning-invariant") {
    val a = CorpusStats.vocabGrowth(docs.repartition(1), $"doc_id", $"text",
      Seq(3L, 5L)).orderBy($"checkpoint").collect().map(_.toSeq)
    val b = CorpusStats.vocabGrowth(docs.repartition(7), $"doc_id", $"text",
      Seq(3L, 5L)).orderBy($"checkpoint").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("per-group curves: vocabulary counts within the group; single group ≡ global") {
    val grouped = Seq(
      (1L, "the cat", "en"),
      (2L, "the dog", "en"),
      (3L, "le chat", "fr"),
      (4L, "the chat", "fr")).toDF("doc_id", "text", "lang")
    val out = CorpusStats.vocabGrowthByGroup(grouped, $"doc_id", $"text",
        $"lang", Seq(2L, 4L))
      .orderBy($"grp", $"checkpoint")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // en@2: docs 2, tokens 4, vocab {the,cat,dog}=3; en@4 unchanged
    // fr@2: docs 0; fr@4: docs 2, tokens 4, vocab {le,chat,the}=3 —
    // "the" counts in BOTH groups (per-group vocabulary)
    assert(out.toSeq == Seq(
      ("en", 2L, 2L, 4L, 3L), ("en", 4L, 2L, 4L, 3L),
      ("fr", 2L, 0L, 0L, 0L), ("fr", 4L, 2L, 4L, 3L)))
    // one constant group ≡ the global curve
    val one = CorpusStats.vocabGrowthByGroup(
        docs.withColumn("g", org.apache.spark.sql.functions.lit("all")),
        $"doc_id", $"text", $"g", Seq(2L, 4L, 5L))
      .orderBy($"checkpoint")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val global = CorpusStats.vocabGrowth(docs, $"doc_id", $"text", Seq(2L, 4L, 5L))
      .orderBy($"checkpoint")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(one.toSeq == global.toSeq)
  }

  test("ledger admit ≡ rebuild (merge identity on the first-occurrence min)") {
    val a = docs.filter($"doc_id" % 2 === 1L)
    val b = docs.filter($"doc_id" % 2 === 0L)
    val admitted = CorpusStats.admitVocab(
      CorpusStats.vocabLedger(a, $"doc_id", $"text"), b, $"doc_id", $"text")
    val fromState = CorpusStats.growthFromLedger(admitted, Seq(2L, 4L, 5L))
      .orderBy($"checkpoint").collect().map(_.toSeq)
    val rebuilt = CorpusStats.vocabGrowth(docs, $"doc_id", $"text", Seq(2L, 4L, 5L))
      .orderBy($"checkpoint").collect().map(_.toSeq)
    assert(fromState.toSeq == rebuilt.toSeq)
  }

  test("ledger desync: re-admitting a ledgered doc raises") {
    val state = CorpusStats.vocabLedger(docs, $"doc_id", $"text")
    // the guard is folded into the docs-merge aggregation (single-job
    // admission, VERDICT r13 item 8): admit() itself schedules no job,
    // the raise fires when the merged ledger first computes
    val merged = CorpusStats.admitVocab(state, docs.filter($"doc_id" === 2L),
      $"doc_id", $"text")
    val e = intercept[Exception] { merged.docs.collect() }
    assert(e.getMessage.contains("re-admits already-ledgered doc id"))
  }

  test("guards: empty and duplicate checkpoints raise") {
    intercept[IllegalArgumentException] {
      CorpusStats.vocabGrowth(docs, $"doc_id", $"text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      CorpusStats.vocabGrowth(docs, $"doc_id", $"text", Seq(2L, 2L))
    }
  }
}
