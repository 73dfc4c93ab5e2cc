package graft

import org.apache.spark.sql.functions._

/** Dev probe: when does `ops.Skew.saltedAgg` actually beat the plain
  * plan on a hot key, and when do Spark's own mechanisms (map-side
  * partial aggregation for aggregates, AQE skew-split for joins)
  * already cover it? Generates a 20M-row frame with HALF its rows on
  * ONE key and measures each shape both ways. Results feed the SURVEY
  * scale-notes decision table — the point is to stop users reaching
  * for the salted path when the plain plan is already skew-proof.
  *
  *   runMain graft.SkewCheck
  */
object SkewCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("32")
    import spark.implicits._

    val n = 20000000L
    // 50% of rows on key 0, the rest uniform over 1M keys
    val fact = spark.range(n).select(
      when($"id" % 2 === 0, 0L).otherwise(pmod(xxhash64($"id"), lit(1000000L)) + 1)
        .as("k"),
      $"id".as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    fact.count()
    val dim = spark.range(1000001).select($"id".as("k"), (rand(7) * 100).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    dim.count()

    def time(label: String)(f: => Long): Unit = (1 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      val r = f
      println(f"[skew] $label rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r rows)")
    }

    // 1. algebraic agg (count/sum): partial aggregation collapses the
    // hot key per map partition BEFORE the shuffle — the reducer for
    // key 0 receives #partitions pre-aggregated rows, not 10M
    time("agg plain")(fact.groupBy("k").agg(count(lit(1)).as("c"), sum($"v").as("s")).count())
    time("agg salted")(graft.ops.Skew.saltedAgg(fact, Seq("k"), 16,
      Seq("c" -> count(lit(1)), "s" -> sum($"v")),
      nm => sum(col(nm))).count())

    // 2. skewed sort-merge join (broadcast disabled to isolate the
    // mechanism): without AQE's skew split one task sorts/joins the
    // 10M-row key-0 partition; with it the partition is split
    def smj(skewSplit: Boolean): Long = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewSplit)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", -1)
      try fact.join(dim, "k").agg(sum($"w" * $"v")).count()
      finally {
        spark.conf.unset("spark.sql.adaptive.skewJoin.enabled")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
    time("join skew-split OFF")(smj(skewSplit = false))
    time("join skew-split ON")(smj(skewSplit = true))

    // 3. where salting DOES matter for aggregation: a holistic-state
    // aggregate whose map-side combine cannot shrink the hot key
    // (every value distinct → partial agg emits all of them; the key-0
    // reducer then builds one 10M-entry set). The salt here must be
    // VALUE-derived (not saltedAgg's positional salt): duplicates must
    // land in the same bucket for per-bucket distinct counts to add up.
    // Spark's own countDistinct rewrite is already skew-proof (its
    // first shuffle partitions on (k, v)), and approx_count_distinct
    // makes the state algebraic again — both measured as the
    // reach-for-these-first alternatives.
    time("distinct-state collect_set plain")(
      fact.groupBy("k").agg(size(collect_set($"v")).as("d")).count())
    time("distinct-state value-salted")(
      fact.groupBy($"k", pmod(xxhash64($"v"), lit(16L)).as("__vs"))
        .agg(size(collect_set($"v")).cast("long").as("d"))
        .groupBy("k").agg(sum($"d").as("d")).count())
    time("distinct-state countDistinct")(
      fact.groupBy("k").agg(countDistinct($"v").as("d")).count())
    time("distinct-state sketch")(
      fact.groupBy("k").agg(approx_count_distinct($"v").as("d")).count())

    // 4. pre-salted join vs the same skewed sort-merge join: saltedJoin
    // spreads key 0 across 16 reducers at the FIRST shuffle (the dim
    // pays 16× replication — 1M rows, cheap), where AQE's skew split
    // reacts only after the oversized partition materializes. Measures
    // both against the AQE-split plan from section 2.
    def saltedSmj(): Long = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", -1)
      try graft.ops.Skew.saltedJoin(fact, dim, Seq("k"), buckets = 16)
        .agg(sum($"w" * $"v")).count()
      finally {
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
    time("join pre-salted (16)")(saltedSmj())

    spark.stop()
  }
}
