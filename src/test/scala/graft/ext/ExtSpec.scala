package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ExtSpec extends SparkTestBase {

  import spark.implicits._

  test("ExactDedup: planted duplicates collapse to the smallest id") {
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "aaa")).toDF("doc_id", "text")
    val out = ExactDedup.byContent(df, $"text", $"doc_id")
      .as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 3L), (2L, 1L)))
    val corpus = ExactDedup.dedupedCorpus(df, $"text", $"doc_id", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(corpus == Set(1L, 2L))
  }

  test("ShingleJaccard: identical docs score 1.0, planted near-dups found") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dot"), // near-dup of 1
      (3L, "completely unrelated content xyz qqq zzz www")).toDF("id", "text")
    val pairs = ShingleJaccard.similarPairs(df, $"id", $"text", 3, 0.5)
      .as[(Long, Long, Double)].collect()
    assert(pairs.length == 1)
    assert(pairs.head._1 == 1L && pairs.head._2 == 2L && pairs.head._3 > 0.7)

    val same = Seq((1L, "hello world"), (2L, "hello world")).toDF("id", "text")
    val p2 = ShingleJaccard.similarPairs(same, $"id", $"text", 3, 0.99)
      .as[(Long, Long, Double)].collect()
    assert(p2.length == 1 && p2.head._3 == 1.0)
  }

  test("ShingleJaccard: maxDf pruning drops ubiquitous shingles from the join") {
    // 'zz' + unique tails: the common prefix shingle appears in all docs
    val df = (1L to 6L).map(i => (i, s"zzzz unique$i")).toDF("id", "text")
    val unpruned = ShingleJaccard.similarPairs(df, $"id", $"text", 3, 0.01)
    val pruned = ShingleJaccard.similarPairs(df, $"id", $"text", 3, 0.01, maxDf = Some(2))
    assert(pruned.count() <= unpruned.count())
  }

  test("ShingleJaccard: maxDf scores are exact Jaccard of the PRUNED universe") {
    // t1 {abc,bcd,cdQ}, t2 {abc,bcd,cdZ}, t3 {abc,bcY,cYY}; df(abc)=3,
    // df(bcd)=2 → maxDf=2 prunes only "abc". Pruned sets for (1,2):
    // {bcd,cdQ} ∩ {bcd,cdZ} = 1, union 3 → 1/3. Sizes computed from the
    // UNPRUNED frame would give the inconsistent 1/(3+3-1) = 1/5.
    val df = Seq((1L, "abcdQ"), (2L, "abcdZ"), (3L, "abcYY")).toDF("id", "text")
    val pruned = ShingleJaccard.similarPairs(df, $"id", $"text", 3, 0.0, maxDf = Some(2))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => ((a, b), j) }.toMap
    assert(pruned.get((1L, 2L)).contains(1.0 / 3.0))
  }

  test("EmbeddingSearch: corpus and query sides may share column names") {
    val corpus = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 1f)), (3L, Array(0.9f, 0.1f)))
      .toDF("id", "embedding")
    // query frame uses the SAME column names as the corpus
    val queries = Seq((1L, Array(1f, 0f))).toDF("id", "embedding")
    val nn = EmbeddingSearch.bruteForceTopK(corpus, "id", "embedding",
      queries, "id", "embedding", k = 1)
      .select("id", "neighbor_id").as[(Long, Long)].collect()
    assert(nn.toSeq == Seq((1L, 3L))) // nearest non-self is the 0.9/0.1 vector
    val ivf = EmbeddingSearch.ivfTopK(corpus, "id", "embedding",
      queries, "id", "embedding", k = 1, nlist = 3, nprobe = 3)
      .select("id", "neighbor_id").as[(Long, Long)].collect()
    assert(ivf.toSeq == Seq((1L, 3L)))
    val lsh = EmbeddingSearch.lshTopK(corpus, "id", "embedding",
      queries, "id", "embedding", k = 1, bits = 1)
      .select("id", "neighbor_id").as[(Long, Long)].collect()
    assert(lsh.nonEmpty) // bucket recall ≥ the identical-direction vector
  }

  test("Sampling: hashSplit is a total, disjoint, subset-stable partition") {
    val df = (1L to 1000L).toDF("id")
    val cuts = Seq(("train", 204), ("val", 26), ("test", 26))
    val split = df.select($"id", Sampling.hashSplit($"id", cuts).as("s"))
    val counts = split.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 1000L) // total: every row assigned
    assert(counts("train") > 700 && counts("train") < 900) // ~80%
    // pure function of the key: a subset sees identical assignments
    val sub = df.filter($"id" % 7 === 0)
      .select($"id", Sampling.hashSplit($"id", cuts).as("s2"))
    val joined = split.join(sub, "id").filter($"s" =!= $"s2")
    assert(joined.count() == 0)
  }

  test("Sampling: shuffled (distributed) equals shufflePosition (window) exactly") {
    val df = (1L to 500L).toDF("id").repartition(8)
    val viaWindow = df.select($"id", Sampling.shufflePosition($"id").cast("long").as("pos"))
    val viaZip = Sampling.shuffled(df, $"id").select($"id", $"pos")
    assert(viaWindow.except(viaZip).count() == 0)
    assert(viaZip.except(viaWindow).count() == 0)
    assert(viaZip.count() == 500)
  }

  test("Sampling: weightedInterleave holds the mixture ratio at every prefix") {
    val a = (1L to 300L).toDF("id")      // weight 3
    val b = (1001L to 1100L).toDF("id")  // weight 1
    val mix = Sampling.weightedInterleave(Seq((a, 3), (b, 1)), "id")
      .orderBy($"mix_key", $"source_id", $"id")
      .select($"source_id").as[Int].collect()
    assert(mix.length == 400)
    // any prefix of the mixture: |count(a)/count(b) - 3| stays tight
    Seq(40, 100, 200, 400).foreach { k =>
      val pre = mix.take(k)
      val nA = pre.count(_ == 0).toDouble
      val nB = pre.count(_ == 1).toDouble
      assert(nB > 0 && math.abs(nA / nB - 3.0) <= 0.5, s"prefix $k: $nA vs $nB")
    }
    // deterministic: identical on re-run
    val again = Sampling.weightedInterleave(Seq((a, 3), (b, 1)), "id")
      .orderBy($"mix_key", $"source_id", $"id").select($"source_id").as[Int].collect()
    assert(again.toSeq == mix.toSeq)
  }

  test("Sampling: shufflePosition is a deterministic bijection") {
    val df = (1L to 500L).toDF("id")
    val p1 = df.select($"id", Sampling.shufflePosition($"id").as("pos"))
    assert(p1.select("pos").distinct().count() == 500)
    assert(p1.agg(min($"pos"), max($"pos")).as[(Int, Int)].head() == ((1, 500)))
    val p2 = df.select($"id", Sampling.shufflePosition($"id").as("pos"))
    assert(p1.except(p2).count() == 0) // identical permutation on re-run
    // not the identity order (md5 scrambles)
    assert(p1.filter($"id" === $"pos").count() < 50)
  }

  test("EmbeddingSearch: lshNearDupPairs always finds identical-direction vectors") {
    val base = (1L to 50L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13 - 6).toFloat)))
    val twins = base.take(5).map { case (i, v) => (i + 1000L, v.map(_ * 2f)) }
    val df = (base ++ twins).toDF("id", "vec")
    val pairs = EmbeddingSearch.lshNearDupPairs(df, "id", "vec", threshold = 0.999, bits = 8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // scaled copies share every SRP bucket → all 5 planted pairs found
    assert((1L to 5L).forall(i => pairs.contains((i, i + 1000L))))
  }

  test("EmbeddingSearch: multi-band LSH emits each pair exactly once and never misses single-band pairs") {
    val base = (1L to 60L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13 - 6).toFloat)))
    val twins = base.take(8).map { case (i, v) => (i + 1000L, v.map(_ * 2f)) }
    val df = (base ++ twins).toDF("id", "vec")
    val multi = EmbeddingSearch.lshNearDupPairs(df, "id", "vec",
      threshold = 0.9, bits = 6, bands = 4)
      .select("id1", "id2").as[(Long, Long)].collect().toSeq
    // a pair sharing several bands must still appear exactly once
    assert(multi.distinct == multi, "duplicate pairs from multi-band join")
    // identical-direction twins share EVERY band → all planted pairs found
    assert((1L to 8L).forall(i => multi.contains((i, i + 1000L))))
    // OR-amplification: multi-band candidates are a superset of any
    // single band's, so found pairs must be a superset of the
    // same-plane single-band run (bits=24 = the full signature)
    val single = EmbeddingSearch.lshNearDupPairs(df, "id", "vec",
      threshold = 0.9, bits = 24)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(single.subsetOf(multi.toSet))
    intercept[IllegalArgumentException] {
      EmbeddingSearch.lshNearDupPairs(df, "id", "vec", 0.9, bits = 32, bands = 2)
    }
  }

  test("EmbeddingSearch: multi-band lshTopK scores each candidate once (ranks equal brute force on covered queries)") {
    val vecs = (1L to 40L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 17 + d * 11) % 19 - 9).toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val q = Seq((901L, vecs(3)._2), (902L, vecs(11)._2)).toDF("qid", "qvec")
    val multi = EmbeddingSearch.lshTopK(df, "vec_id", "embedding",
      q, "qid", "qvec", k = 5, bits = 5, bands = 4)
      .select("qid", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSeq
    // no candidate may appear twice for a query (dedup-by-first-band)
    assert(multi.map(t => (t._1, t._2)).distinct.size == multi.size)
    // ranks within each query are 1..n with no gaps
    multi.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted == (1 to rows.size).toList)
    }
    // identical query vectors: the twin must rank first with cos ≈ 1
    val twin = multi.filter(_._1 == 901L).find(_._3 == 1)
    assert(twin.exists(_._2 == 4L))
  }

  test("TextAnalysis: token/char counts and fingerprint basics") {
    val df = Seq((1L, "the cat sat on 3 mats"), (2L, "  spaced  out  ")).toDF("id", "text")
    val out = df.select($"id",
      TextAnalysis.tokenCount($"text").as("nt"),
      TextAnalysis.digitCount($"text").as("nd"),
      TextAnalysis.stopwordCount($"text", Seq("the", "on")).as("ns"),
      TextAnalysis.fingerprint($"text").as("fp"))
      .orderBy("id").collect()
    assert(out(0).getInt(1) == 6 && out(0).getInt(2) == 1 && out(0).getInt(3) == 2)
    assert(out(1).getInt(1) == 2) // trim first, then \s+ split
    assert(out(0).getLong(4) != out(1).getLong(4))
  }

  test("TokenSetCount matches the composable filter formulation on real text") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    val words = TextAnalysis.langWords.head._2
    val hof = size(filter(split(trim($"text"), "\\s+"), t => t.isInCollection(words)))
    val diff = docs.select(
      TextAnalysis.stopwordCount($"text", words).as("native"), hof.as("hof"))
      .filter($"native" =!= $"hof")
    assert(diff.count() == 0)
    // empty + null edges
    val edge = Seq((1, ""), (2, "   "), (3, null)).toDF("id", "text")
    val out = edge.select(TextAnalysis.stopwordCount($"text", words).as("n")).collect()
    assert(out(0).getInt(0) == 0 && out(1).getInt(0) == 0 && out(2).isNullAt(0))
  }

  test("TextAnalysis: langId is deterministic and prefers matching stopwords") {
    val df = Seq(
      (1L, "the house of the king is a great and old house"),
      (2L, "der hund und die katze das ist gut und schoen"),
      (3L, "le chat et les chiens est une belle chose et")).toDF("id", "text")
    val out = df.select($"id", TextAnalysis.langId($"text").as("l"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "en"), (2L, "de"), (3L, "fr")))
  }

  test("EmbeddingSearch: brute-force top-k finds the planted nearest vector") {
    val mk = (s: Double) => Array(1.0f * s.toFloat, 0.5f * s.toFloat, 0.1f * s.toFloat)
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)), // closest to query 10
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (10L, Array(1.0f, 0.05f, 0.0f))).toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" === 10L)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val out = EmbeddingSearch.bruteForceTopK(corpus, "vec_id", "embedding",
      queries, "qid", "qvec", k = 2).orderBy("rank")
      .select("neighbor_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 2L)) // cos(q,1)=~0.999 > cos(q,2)=~0.95
  }

  test("EmbeddingSearch: IVF with nprobe == nlist reduces exactly to brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val brute = EmbeddingSearch.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "qid", "qvec", k = 5)
      .select("qid", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    val ivfFull = EmbeddingSearch.ivfTopK(emb, "vec_id", "embedding",
      queries, "qid", "qvec", k = 5, nlist = 8, nprobe = 8)
      .select("qid", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(ivfFull == brute)
    // narrow probing still returns k results and decent recall
    val ivf2 = EmbeddingSearch.ivfTopK(emb, "vec_id", "embedding",
      queries, "qid", "qvec", k = 5, nlist = 8, nprobe = 2)
      .select("qid", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(ivf2.size == 25)
    assert((ivf2 & brute).size >= 5, s"recall too low: ${(ivf2 & brute).size}/25")
  }

  test("EmbeddingSearch: LSH signature is deterministic; bucket rerank is exact") {
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 31 + d * 7).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val sig1 = df.select(EmbeddingSearch.srpSignature($"embedding", 8).as("s"))
      .as[Long].collect().toSeq
    val sig2 = df.select(EmbeddingSearch.srpSignature($"embedding", 8).as("s"))
      .as[Long].collect().toSeq
    assert(sig1 == sig2)
    // identical vectors always share a bucket → lshTopK must find the twin
    val withTwin = df.unionAll(Seq((999L, vecs(7)._2)).toDF("vec_id", "embedding"))
    val q = Seq((999L, vecs(7)._2)).toDF("qid", "qvec")
    val res = EmbeddingSearch.lshTopK(withTwin, "vec_id", "embedding", q, "qid", "qvec", 1)
      .select("neighbor_id").as[Long].collect()
    assert(res.headOption.contains(7L))
  }
}
