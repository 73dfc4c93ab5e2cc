package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BloomSpec extends SparkTestBase {

  import spark.implicits._

  private val keys = (1 to 40).map(i => (i.toLong, s"member key number $i"))
  private val probes = (1 to 200).map(i => (1000L + i, s"probe value $i"))

  test("Bloom: no false negatives — every inserted key probes true") {
    val df = keys.toDF("id", "k")
    val bloom = Bloom.build(df, $"k", k = 3, words = 8)
    val hits = df.crossJoin(broadcast(bloom))
      .filter(Bloom.mightContain($"bloom", $"k", k = 3, words = 8))
      .count()
    assert(hits == keys.size)
  }

  test("Bloom: probe set behaves — misses dominate, FP rate bounded") {
    val bloom = Bloom.build(keys.toDF("id", "k"), $"k", k = 3, words = 8)
    // 40 keys * 3 probes into 256 bits: fill <= 38%, expected FP < 6%.
    // Deterministic (md5), so this is a fixed count, not a flaky bound;
    // the assert allows 4x the expectation to make the test's intent
    // (filter actually filters) robust to parameter tweaks.
    val fp = probes.toDF("id", "k").crossJoin(broadcast(bloom))
      .filter(Bloom.mightContain($"bloom", $"k", k = 3, words = 8))
      .count()
    assert(fp < probes.size / 4, s"false-positive count $fp out of ${probes.size}")
  }

  test("decontaminateExact: confirmed set == exact intersection, FPs flagged") {
    val eval = keys.toDF("id", "text")
    val contaminated = keys.take(7).map { case (i, t) => (500L + i, t) }
    val clean = probes.map { case (i, t) => (i, t) }
    val train = (contaminated ++ clean).toDF("id", "text")
    // undersized filter so FPs are plausible; correctness must hold anyway
    val out = Bloom.decontaminateExact(train, eval, $"id", $"text",
      k = 2, words = 1).as[(Long, Boolean)].collect()
    val confirmed = out.filter(_._2).map(_._1).toSet
    assert(confirmed == contaminated.map(_._1).toSet)
    // every unconfirmed candidate is a genuine non-member (FP of the
    // filter, not of the operator)
    val cleanIds = clean.map(_._1).toSet
    assert(out.filterNot(_._2).forall(r => cleanIds(r._1)))
  }

  test("fileBlooms: candidates have no false negatives and skip most files") {
    // 500 rows spread over 25 files; probe 5 present keys + 20 absent
    val rows = (1 to 500).map(i => (i.toLong % 25, s"stored key $i"))
      .toDF("f", "k")
    val blooms = Bloom.fileBlooms(rows, $"f", $"k", k = 3, words = 16)
    assert(blooms.count() == 25)
    val present = Seq(17, 203, 311, 404, 499).map(i => s"stored key $i")
    val absent = (1 to 20).map(i => s"missing key $i")
    val cand = Bloom.candidateFiles(blooms,
        (present ++ absent).toDF("p"), $"p", k = 3, words = 16)
      .as[(String, Long)].collect().toSet
    // no false negatives: each present key's true file is a candidate
    present.foreach { p =>
      val trueFile = p.stripPrefix("stored key ").toLong % 25
      assert(cand.contains((p, trueFile)), s"missing true file for '$p'")
    }
    // skipping actually skips: with 20 keys/file * 3 probes in 512 bits
    // (fill ~11%), FP per (probe, file) is ~0.1%; allow a generous 10%
    val fpPairs = cand.size - present.size
    assert(fpPairs <= (present.size + absent.size) * 25 / 10,
      s"candidate pairs $fpPairs — bloom not pruning")
  }

  test("fileBlooms merge across incremental loads by word-wise OR equals the rebuild") {
    val a = (1 to 200).map(i => (i.toLong % 5, s"stored key $i")).toDF("f", "k")
    val b = (201 to 300).map(i => (i.toLong % 5, s"stored key $i")).toDF("f", "k")
    val merged = Bloom.fileBlooms(a, $"f", $"k", k = 3, words = 8)
      .select($"file", explode($"bloom").as(Seq("w", "m")))
      .unionByName(Bloom.fileBlooms(b, $"f", $"k", k = 3, words = 8)
        .select($"file", explode($"bloom").as(Seq("w", "m"))))
      .groupBy("file", "w").agg(expr("bit_or(m)").as("m"))
      .groupBy("file").agg(map_from_entries(
        collect_list(struct($"w", $"m"))).as("bloom"))
    val rebuilt = Bloom.fileBlooms(a.unionByName(b), $"f", $"k", k = 3, words = 8)
    def flat(df: org.apache.spark.sql.DataFrame) =
      df.select($"file", explode(map_entries($"bloom")).as("kv"))
        .select($"file", $"kv.key", $"kv.value")
        .as[(Long, Int, Long)].collect().toSet
    val mm = flat(merged)
    val rr = flat(rebuilt)
    assert(mm == rr)
  }

  test("retractFileBlooms equals the rebuild over retained rows, bit for bit; untouched files never rebuild") {
    val rows = (1 to 500).map(i => (i.toLong, i.toLong % 25, s"stored key $i"))
      .toDF("id", "f", "k")
    // delete every row of file 3 plus some rows of files 0-4
    val deleted = rows.filter($"f" === 3L || ($"f" < 5L && $"id" % 3 === 0))
    val retained = rows.exceptAll(deleted)
    val stored = Bloom.fileBlooms(rows, $"f", $"k", k = 3, words = 16)
    val retracted = Forget.retractFileBlooms(stored, retained, deleted,
      $"f", $"k", k = 3, words = 16)
    val rebuilt = Bloom.fileBlooms(retained, $"f", $"k", k = 3, words = 16)
    def flat(df: org.apache.spark.sql.DataFrame) =
      df.select($"file", explode(map_entries($"bloom")).as("kv"))
        .select($"file", $"kv.key", $"kv.value")
        .as[(Long, Int, Long)].collect().toSet
    assert(flat(retracted) == flat(rebuilt))
    // file 3 emptied → dropped from the index
    assert(!retracted.select("file").as[Long].collect().contains(3L))
    assert(retracted.count() == 24)
  }

  test("prunedLookup result equals the full-scan filter") {
    val rows = (1 to 500).map(i => (i.toLong, i.toLong % 25, s"stored key $i"))
      .toDF("id", "f", "k")
    val blooms = Bloom.fileBlooms(rows, $"f", $"k", k = 3, words = 16)
    val probes = Seq("stored key 17", "stored key 203", "missing key").toDF("p")
    val got = Bloom.prunedLookup(rows, $"f", $"k", blooms, probes, $"p",
        k = 3, words = 16)
      .select("id").as[Long].collect().toSet
    assert(got == Set(17L, 203L))
  }
}
