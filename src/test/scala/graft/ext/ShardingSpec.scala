package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Snake sharding: rank correctness vs a flat sort, serpentine
  * dealing, balance quality, and manifest algebra (order invariance,
  * additivity, difference detection).
  */
class ShardingSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = (1 to 100).map { i =>
    // weights with ties (i/3) so the key tiebreak matters
    (i.toLong, "doc " + ("x" * (i / 3)))
  }.toDF("id", "body")

  test("snake rank equals the flat (weight desc, key asc) sort rank") {
    val out = Sharding.snakeShards(docs, col("id"), length(col("body")),
        nShards = 4, bucketShift = 2)
      .select("id", "w", "rank").as[(Long, Long, Long)].collect()
    val expected = out.map { case (id, w, _) => (id, w) }
      .sortBy { case (id, w) => (-w, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    out.foreach { case (id, _, r) => assert(r == expected(id), s"id=$id") }
  }

  test("serpentine dealing: rounds alternate direction") {
    val out = Sharding.snakeShards(docs, col("id"), length(col("body")),
        nShards = 4, bucketShift = 2)
      .select("rank", "shard").as[(Long, Long)].collect().sortBy(_._1)
    out.foreach { case (rank, shard) =>
      val r0 = rank - 1
      val exp = if ((r0 / 4) % 2 == 0) r0 % 4 else 3 - r0 % 4
      assert(shard == exp, s"rank=$rank")
    }
  }

  test("shard weight totals are balanced within one max item weight") {
    val out = Sharding.snakeShards(docs, col("id"), length(col("body")),
        nShards = 4, bucketShift = 2)
    val sums = out.groupBy("shard").agg(sum("w").as("tw"))
      .select("tw").as[Long].collect()
    val maxItem = out.agg(max("w")).as[Long].head()
    assert(sums.max - sums.min <= maxItem,
      s"spread ${sums.max - sums.min} > max item $maxItem")
  }

  test("manifest is order/partition-invariant and detects any change") {
    val base = docs.withColumn("g", col("id") % 3)
    val m1 = Sharding.manifest(base, col("g"), col("body"), length(col("body")))
      .orderBy("group").collect()
    val m2 = Sharding.manifest(base.repartition(7, col("body")).orderBy(desc("id")),
        col("g"), col("body"), length(col("body")))
      .orderBy("group").collect()
    assert(m1.toSeq == m2.toSeq)
    // a one-character change in one row moves exactly that group's digest
    val tweaked = base.withColumn("body",
      when(col("id") === 42, concat(col("body"), lit("!"))).otherwise(col("body")))
    val m3 = Sharding.manifest(tweaked, col("g"), col("body"), length(col("body")))
      .orderBy("group").collect()
    val changed = m1.zip(m3).filter { case (a, b) => a != b }
    assert(changed.length == 1)
    assert(changed.head._1.getLong(0) == 42 % 3)
  }

  test("retractManifest equals rebuild-from-survivors, digests included") {
    val base = docs.withColumn("g", col("id") % 3)
    val stored = Sharding.manifest(base, col("g"), col("body"), length(col("body")))
    val deleted = base.filter(col("id") % 5 === 0)
    val retracted = Forget.retractManifest(stored, deleted,
      col("g"), col("body"), length(col("body"))).orderBy("group").collect()
    val rebuilt = Sharding.manifest(base.filter(col("id") % 5 =!= 0),
      col("g"), col("body"), length(col("body"))).orderBy("group").collect()
    assert(retracted.toSeq == rebuilt.toSeq)
  }

  test("retractManifest drops groups emptied by the deletion") {
    val base = docs.withColumn("g", when(col("id") <= 3, lit(9L)).otherwise(col("id") % 2))
    val stored = Sharding.manifest(base, col("g"), col("body"), length(col("body")))
    val out = Forget.retractManifest(stored, base.filter(col("id") <= 3),
      col("g"), col("body"), length(col("body")))
    assert(!out.select("group").as[Long].collect().contains(9L))
  }

  test("admitManifest equals rebuild over the union, new groups included") {
    val base = docs.withColumn("g", col("id") % 3)
    val old = base.filter(col("id") % 4 =!= 0)
    // the batch introduces rows in every group PLUS a brand-new group
    val batch = base.filter(col("id") % 4 === 0)
      .withColumn("g", when(col("id") === 100, lit(9L)).otherwise(col("g")))
    val stored = Sharding.manifest(old, col("g"), col("body"), length(col("body")))
    val admitted = Sharding.admitManifest(stored, batch,
      col("g"), col("body"), length(col("body"))).orderBy("group").collect()
    val rebuilt = Sharding.manifest(old.unionByName(batch),
      col("g"), col("body"), length(col("body"))).orderBy("group").collect()
    assert(admitted.toSeq == rebuilt.toSeq)
    assert(admitted.map(_.getLong(0)).contains(9L))
  }

  test("retractManifest inverts admitManifest exactly") {
    val base = docs.withColumn("g", col("id") % 3)
    val old = base.filter(col("id") % 4 =!= 0)
    val batch = base.filter(col("id") % 4 === 0)
    val stored = Sharding.manifest(old, col("g"), col("body"), length(col("body")))
    val roundTrip = Forget.retractManifest(
      Sharding.admitManifest(stored, batch, col("g"), col("body"),
        length(col("body"))),
      batch, col("g"), col("body"), length(col("body")))
      .orderBy("group").collect()
    assert(roundTrip.toSeq == stored.orderBy("group").collect().toSeq)
  }

  test("vacuumOrphans keeps only unreferenced files; absent references are ignored") {
    val files = Seq(("a/f1", 10L), ("a/f2", 20L), ("b/f3", 5L), ("rootfile", 1L))
      .toDF("f", "b")
    val refs = Seq("a/f1", "b/f3", "c/never_existed").toDF("r")
    val orphans = Sharding.vacuumOrphans(files, col("f"), col("b"),
      refs, col("r")).orderBy("file")
      .select("file", "bytes", "dir").as[(String, Long, String)].collect().toSeq
    // a/f2 is orphaned; rootfile has no dir component → empty dir
    assert(orphans == Seq(("a/f2", 20L, "a"), ("rootfile", 1L, "")))
    val summary = Sharding.vacuumSummary(
        Sharding.vacuumOrphans(files, col("f"), col("b"), refs, col("r")))
      .orderBy("dir").as[(String, Long, Long)].collect().toSeq
    assert(summary == Seq(("", 1L, 1L), ("a", 1L, 20L)))
  }

  test("manifests compose by addition across incremental loads") {
    val a = docs.filter(col("id") <= 50).withColumn("g", lit(0L))
    val b = docs.filter(col("id") > 50).withColumn("g", lit(0L))
    val whole = Sharding.manifest(
      docs.withColumn("g", lit(0L)), col("g"), col("body"), length(col("body")))
      .collect().head
    val pa = Sharding.manifest(a, col("g"), col("body"), length(col("body"))).collect().head
    val pb = Sharding.manifest(b, col("g"), col("body"), length(col("body"))).collect().head
    assert(whole.getLong(1) == pa.getLong(1) + pb.getLong(1))
    assert(whole.getDecimal(3) ==
      pa.getDecimal(3).add(pb.getDecimal(3)))
  }
}
