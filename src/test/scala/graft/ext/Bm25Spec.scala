package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BM25 ranking semantics on hand-built corpora (the q139 gate pins
  * cross-engine arithmetic; this pins that the scores MEAN the right
  * thing).
  */
class Bm25Spec extends SparkTestBase {

  import spark.implicits._

  private def docsDF(rows: (Long, String)*) = rows.toDF("doc_id", "text")
  private def qDF(rows: (Long, String)*) = rows.toDF("query_id", "qtext")

  private def ranked(docs: org.apache.spark.sql.DataFrame,
                     qs: org.apache.spark.sql.DataFrame, k: Int = 10) =
    Bm25.topK(docs, col("doc_id"), col("text"), qs,
        col("query_id"), col("qtext"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  test("a document matching the rarer query term outranks one matching the common term") {
    val docs = docsDF(
      (1L, "zebra runs far away today"),        // rare term
      (2L, "common words appear here often"),   // common term
      (3L, "common things are common indeed"),
      (4L, "more common text common again"))
    val r = ranked(docs, qDF((1L, "zebra common")))
    assert(r.head._3 == 1L, s"rare-term doc must rank first: ${r.mkString(",")}")
  }

  test("length normalization: same tf, shorter document wins") {
    val docs = docsDF(
      (1L, "needle word word word word word word word word word word word"),
      (2L, "needle word word"))
    val r = ranked(docs, qDF((1L, "needle")))
    assert(r.map(_._3).toSeq == Seq(2L, 1L), r.mkString(","))
    assert(r(0)._4 > r(1)._4)
  }

  test("higher tf wins between same-length documents") {
    val docs = docsDF(
      (1L, "spark spark spark other filler text"),
      (2L, "spark other filler text here too"))
    val r = ranked(docs, qDF((1L, "spark")))
    assert(r.map(_._3).toSeq == Seq(1L, 2L), r.mkString(","))
  }

  test("queries with only unseen terms return nothing; repeated query terms count once") {
    val docs = docsDF((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
    val none = ranked(docs, qDF((1L, "qqqmissing zzzunseen")))
    assert(none.isEmpty)
    val once = ranked(docs, qDF((1L, "alpha"), (2L, "alpha alpha alpha")))
    val s1 = once.filter(_._1 == 1L).head._4
    val s2 = once.filter(_._1 == 2L).head._4
    assert(s1 == s2, s"query-term repetition must not change the score: $s1 vs $s2")
  }

  test("RRF: a document on both lists beats single-list documents at similar ranks") {
    val r1 = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val r2 = Seq((1L, 11L, 1L), (1L, 99L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val fused = Bm25.rrfTopK(Seq(r1, r2), k = 10)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted
    // doc 11: 1/62 + 1/61 ~ 0.0325 beats doc 10's single 1/61
    assert(fused.head == ((1L, 11L)), fused.mkString(","))
    // absent-from-list docs still rank, by their one term
    assert(fused.map(_._2).toSet == Set(10L, 11L, 12L, 99L))
  }

  test("RRF fusion is exact and stable under list order and repartition") {
    val r1 = (0L until 50L).map(i => (1L, i, i + 1)).toDF("query_id", "doc_id", "rank")
    val r2 = (0L until 50L).map(i => (1L, i, 50L - i)).toDF("query_id", "doc_id", "rank")
    val a = Bm25.rrfFuse(Seq(r1, r2)).collect()
      .map(r => (r.getLong(1), r.getDouble(2))).sorted.toSeq
    val b = Bm25.rrfFuse(Seq(r2.repartition(7), r1.repartition(3))).collect()
      .map(r => (r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(a == b, "fusion must not depend on list order or partitioning")
  }

  test("index probe equals direct top-k bit for bit, including through parquet state") {
    val docs = docsDF((0L until 60L).map(i =>
      (i, s"alpha w$i spark data ${"beta " * (i % 4).toInt}")): _*)
    val qs = qDF((1L, "spark beta"), (2L, "alpha data"))
    val direct = Bm25.topK(docs, col("doc_id"), col("text"),
        qs, col("query_id"), col("qtext"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq
    val idx = Bm25.buildIndex(docs, col("doc_id"), col("text"))
    val probed = Bm25.probeIndex(idx, qs, col("query_id"), col("qtext"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq
    assert(direct == probed, s"probe diverged from direct:\n$direct\n$probed")

    // the state-table lifecycle: postings + lengths round-trip parquet
    val dir = java.nio.file.Files.createTempDirectory("lexidx").toString
    idx.postings.write.parquet(s"$dir/postings")
    idx.docLens.write.parquet(s"$dir/lens")
    val reloaded = Bm25.LexIndex(
      spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/lens"), idx.nDocs, idx.totalTokens)
    val served = Bm25.probeIndex(reloaded, qs, col("query_id"), col("qtext"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq
    assert(served == direct, "parquet round-trip changed the served scores")
  }

  test("phraseMatch: contiguity over kept tokens, self-overlap, three-word phrases") {
    val docs = docsDF(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha gamma beta delta"),     // right words, wrong order
      (3L, "alpha xx beta gamma"),        // 'xx' dropped (<3 chars) -> alpha beta gamma contiguous!
      (4L, "beta beta beta"),
      (5L, "beta"),
      (6L, "Alpha BETA gamma"))           // case-folded
    def m(p: String*) = Bm25.phraseMatch(docs, col("doc_id"), col("text"), p)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(m("alpha", "beta") == Seq(1L, 3L, 6L), m("alpha", "beta").toString)
    assert(m("alpha", "beta", "gamma") == Seq(1L, 3L, 6L))
    assert(m("beta", "beta") == Seq(4L), "self-overlapping phrase")
    assert(m("beta", "beta", "beta") == Seq(4L))
    assert(m("gamma", "delta") == Seq(1L))
    assert(m("delta", "alpha").isEmpty)
  }

  private def lexState(ix: Bm25.LexIndex) = (
    ix.postings.select(col("token"), col("df"),
        array_join(transform(col("postings"), p =>
          concat(p.getField("doc_id"), lit(":"), p.getField("tf"))), ","))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq,
    ix.docLens.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toSeq,
    ix.nDocs, ix.totalTokens)

  test("admitToIndex ≡ buildIndex on the union corpus — postings, ledger, scalars, served scores") {
    val base = docsDF(
      (1L, "spark data join table"),
      (2L, "window stream data"),
      (3L, "spark spark table"),
      (7L, "zz"))                    // no kept tokens: dl=0 ledger row, counts in N
    val delta = docsDF(
      (4L, "spark merge data"),
      (5L, "newword only here"),
      (6L, "zz yy"))                 // token-less admission
    val merged = Bm25.admitToIndex(
      Bm25.buildIndex(base, col("doc_id"), col("text")),
      delta, col("doc_id"), col("text"))
    val rebuilt = Bm25.buildIndex(base.unionAll(delta),
      col("doc_id"), col("text"))
    assert(lexState(merged) == lexState(rebuilt))
    val q = qDF((1L, "spark newword"))
    val served = Bm25.probeIndex(merged, q, col("query_id"), col("qtext"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val direct = Bm25.topK(base.unionAll(delta), col("doc_id"), col("text"),
        q, col("query_id"), col("qtext"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(served == direct, "admit-merged probe must equal direct top-k bit for bit")
  }

  test("booleanProbe: conjunction, disjunction, negation, and the unkeepable-word rules") {
    val docs = docsDF(
      (1L, "spark join data"),
      (2L, "spark table"),
      (3L, "join only here"),
      (4L, "spark join merge"),
      (5L, "window stream"))
    val idx = Bm25.buildIndex(docs, col("doc_id"), col("text"))
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(Bm25.booleanProbe(idx, Seq("spark", "join"))) == Seq(1L, 4L))
    assert(ids(Bm25.booleanProbe(idx, Seq("spark"), not = Seq("join"))) == Seq(2L))
    assert(ids(Bm25.booleanProbe(idx, Nil, any = Seq("table", "window"))) == Seq(2L, 5L))
    assert(ids(Bm25.booleanProbe(idx, Seq("spark", "join"), not = Seq("merge"))) == Seq(1L))
    // repeated must-word is emphasis, not a second requirement
    assert(ids(Bm25.booleanProbe(idx, Seq("spark", "Spark"))) == Seq(1L, 2L, 4L))
    // an unkeepable must-word is satisfiable by no document
    assert(ids(Bm25.booleanProbe(idx, Seq("spark", "ab"))).isEmpty)
    // unkeepable words in any/not contribute/exclude nothing
    assert(ids(Bm25.booleanProbe(idx, Nil, any = Seq("table", "ab"))) == Seq(2L))
    assert(ids(Bm25.booleanProbe(idx, Seq("spark"), not = Seq("ab"))) == Seq(1L, 2L, 4L))
    intercept[IllegalArgumentException] {
      Bm25.booleanProbe(idx, Nil, not = Seq("spark"))
    }
  }

  test("refreshIndex from a snapshot diff ≡ buildIndex on the new snapshot — full state") {
    val before = docsDF(
      (1L, "spark data join"),
      (2L, "window stream data"),      // will change
      (3L, "gone forever now"),        // will be removed
      (4L, "spark table"))
    val after = docsDF(
      (1L, "spark data join"),
      (2L, "window stream merged"),    // changed text
      (4L, "spark table"),
      (5L, "brand newword here"))      // added
    val refreshed = Bm25.refreshIndex(
      Bm25.buildIndex(before, col("doc_id"), col("text")),
      before, after, "doc_id", "text")
    val rebuilt = Bm25.buildIndex(after, col("doc_id"), col("text"))
    assert(lexState(refreshed) == lexState(rebuilt))
  }

  test("packPostings round-trips byte-identically and shrinks the state") {
    val docs = docsDF((0L until 200L).map(i =>
      (i, s"spark data common${i % 7} rare$i")): _*)
    val idx = Bm25.buildIndex(docs, col("doc_id"), col("text"))
    val packed = Bm25.packPostings(idx.postings)
    val back = Bm25.unpackPostings(packed)
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("token"), col("df"), array_join(transform(col("postings"),
        p => concat(p.getField("doc_id"), lit(":"), p.getField("tf"))), ","))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(snap(back) == snap(idx.postings))
    val sizes = packed.agg(
        sum(length(col("doc_bytes")) + length(col("tf_bytes"))).as("packed"),
        sum(size(graft.functions.Varint.decodeDeltas(col("doc_bytes"))) * 16)
          .as("raw"))
      .collect()(0)
    assert(sizes.getLong(0) * 3 < sizes.getLong(1),
      s"packed ${sizes.getLong(0)} vs raw ${sizes.getLong(1)} bytes: want >3x")
    // serving through the packed state is exact
    val q = qDF((1L, "spark rare42"))
    val servedIdx = Bm25.LexIndex(Bm25.unpackPostings(packed), idx.docLens,
      idx.nDocs, idx.totalTokens)
    val viaPacked = Bm25.probeIndex(servedIdx, q, col("query_id"), col("qtext"), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val direct = Bm25.probeIndex(idx, q, col("query_id"), col("qtext"), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(viaPacked == direct)
  }

  test("phraseProbe from parquet-persisted positions equals direct phraseMatch") {
    val docs = docsDF(
      (1L, "alpha beta gamma"), (2L, "beta alpha"), (3L, "alpha xx beta"))
    val dir = java.nio.file.Files.createTempDirectory("positions").toString
    Bm25.termPositions(docs, col("doc_id"), col("text"))
      .write.parquet(s"$dir/pos")
    val served = Bm25.phraseProbe(spark.read.parquet(s"$dir/pos"),
        Seq("alpha", "beta"))
      .collect().map(_.getLong(0)).sorted.toSeq
    val direct = Bm25.phraseMatch(docs, col("doc_id"), col("text"),
        Seq("alpha", "beta"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(served == direct && served == Seq(1L, 3L))
  }

  test("scores are partition-invariant") {
    val docs = docsDF((0L until 40L).map(i =>
      (i, s"token$i spark data ${"pad " * (i % 5).toInt}")): _*)
    val q = qDF((1L, "spark data"))
    val a = ranked(docs, q, 40).toSeq
    val b = ranked(docs.repartition(13), q, 40).toSeq
    assert(a == b, "repartition changed BM25 output")
  }
}
