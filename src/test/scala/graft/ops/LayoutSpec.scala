package graft.ops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Layout specs assert the SCALE property, not just the result: a
  * bucketed join must plan with zero exchanges, a partitioned scan
  * must show partition pruning.
  */
class LayoutSpec extends SparkTestBase {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(s"spark-warehouse/$name")
    if (loc.isDirectory) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
  }

  test("bucketed tables join with no shuffle exchange") {
    dropTable("li_bucketed"); dropTable("o_bucketed")
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    Layout.writeBucketed(li, "li_bucketed", Seq("l_orderkey"), 8)
    Layout.writeBucketed(o, "o_bucketed", Seq("o_orderkey"), 8)
    // disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // join AND aggregate on the bucket key: the bucketed layout
      // satisfies both distributions → the whole plan has NO exchange
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderkey").agg(sum($"l_quantity").as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      // and it still computes the right thing
      val expect = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderkey").agg(sum($"l_quantity").as("q"))
        .as[(Long, Double)].collect().toMap
      val got = joined.as[(Long, Double)].collect().toMap
      assert(got == expect)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("partitioned write enables directory-level partition pruning") {
    val tmp = java.nio.file.Files.createTempDirectory("part").toString
    val o = Tables.orders(spark, dir)
      .withColumn("order_year", year($"o_orderdate"))
    Layout.writePartitioned(o, s"$tmp/orders", Seq("order_year"))

    val scan = spark.read.parquet(s"$tmp/orders").filter($"order_year" === 1995)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(order_year"), plan)
    // pruned read returns only that year's rows
    val expect = o.filter($"order_year" === 1995).count()
    assert(scan.count() == expect && expect > 0)
  }

  test("rebalanced write collapses a sliver-partitioned frame into few well-sized files") {
    val tmp = java.nio.file.Files.createTempDirectory("rebal").toString
    // 64 near-empty partitions — the many-tasks-few-rows write shape
    val slivers = Tables.orders(spark, dir).repartition(64)
    Layout.rebalanced(slivers).write.mode("overwrite").parquet(s"$tmp/naive")
    val files = new java.io.File(s"$tmp/naive").listFiles()
      .count(_.getName.endsWith(".parquet"))
    // AQE coalesces the tiny partitions; without the hint this writes 64
    assert(files < 16, s"expected few coalesced files, got $files")
    assert(spark.read.parquet(s"$tmp/naive").count() ==
      Tables.orders(spark, dir).count())

    val o = Tables.orders(spark, dir).withColumn("order_year", year($"o_orderdate"))
      .repartition(64)
    Layout.writePartitionedRebalanced(o, s"$tmp/orders", Seq("order_year"))
    val years = new java.io.File(s"$tmp/orders").listFiles()
      .filter(_.getName.startsWith("order_year="))
    assert(years.nonEmpty)
    // one-ish file per partition dir, not one per (task × year)
    years.foreach { d =>
      val n = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(n <= 4, s"${d.getName}: $n files")
    }
  }

  test("zValue: bit interleave basics") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (1023L, 0L))
      .toDF("x", "y")
    val z = df.select(Layout.zValue($"x", $"y", 10)).as[Long].collect().toSeq
    // x on odd bits, y on even: (1,0)→2, (0,1)→1, (3,3)→15
    assert(z == Seq(0L, 2L, 1L, 15L, 0xAAAAAL))
  }

  test("z-ordered files have small bounding boxes in BOTH columns (data skipping)") {
    val tmp = java.nio.file.Files.createTempDirectory("zorder").toString
    // uniform 2-D grid: worst case for any single-column sort
    val n = 1 << 14
    val df = spark.range(n).select(
      (col("id") * 2654435761L % n % 1024).as("x"),
      (col("id") * 40503L % n % 1024).as("y"))
    val files = 16

    Layout.zOrderedWrite(df, col("x"), col("y"), 10, s"$tmp/z", files)
    df.repartition(files).write.parquet(s"$tmp/rand")

    // mean per-file bounding-box area ~ what fraction of 2-D predicates
    // a file's min/max stats can exclude
    def meanArea(path: String): Double =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(((max($"x") - min($"x")) * (max($"y") - min($"y"))).as("a"))
        .agg(avg($"a")).as[Double].head()

    val zArea = meanArea(s"$tmp/z")
    val randArea = meanArea(s"$tmp/rand")
    // random layout: every file spans ~the full 1024x1024 domain; the
    // z-curve cuts the mean bounding box by well over 2x
    assert(zArea * 2 < randArea, s"z=$zArea rand=$randArea")
  }

  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i))
    }

  test("zValue matches an independent Morton reference on an exhaustive small grid") {
    val grid = for { x <- 0 until 32; y <- 0 until 32 } yield (x.toLong, y.toLong)
    val got = grid.toDF("x", "y")
      .select($"x", $"y", Layout.zValue($"x", $"y", 5).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    grid.foreach { case (x, y) =>
      assert(got((x, y)) == mortonRef(x, y, 5), s"($x,$y)")
    }
  }

  test("zValueChecked: out-of-range key fails loudly instead of aliasing into a wrong cell") {
    val e = intercept[Exception] {
      Seq((4096L, 1L)).toDF("x", "y")
        .select(Layout.zValueChecked($"x", $"y", 12)).collect()
    }
    assert(e.getMessage.contains("zValue") || e.getCause != null)
  }

  test("cell stats give the skip rates the q113 gate claims (floors)") {
    val li = Tables.lineitem(spark, dir)
    val stats = Layout.cellStats(
      li, datediff($"l_shipdate", lit("1995-01-01")),
      floor($"l_quantity" * 80), bits = 12, cellBits = 8).cache()
    try {
      def frac(r: org.apache.spark.sql.Row) =
        r.getLong(1).toDouble / r.getLong(0).toDouble
      val dateSkip = Layout.skipRate(stats, 0L, 365L, Long.MinValue / 4, Long.MaxValue / 4)
        .collect().head
      val qtySkip = Layout.skipRate(stats, Long.MinValue / 4, Long.MaxValue / 4, 800L, 1600L)
        .collect().head
      assert(frac(dateSkip) >= 0.6, s"date slice skip ${frac(dateSkip)}")
      assert(frac(qtySkip) >= 0.6, s"quantity band skip ${frac(qtySkip)}")
      // an unclustered (hash) layout skips ~nothing on the same predicate:
      // every hash bucket spans the full value range of both columns
      val hashStats = li
        .select(pmod(hash($"l_orderkey", $"l_linenumber"), lit(160)).cast("long").as("cell"),
                datediff($"l_shipdate", lit("1995-01-01")).cast("long").as("x"),
                floor($"l_quantity" * 80).cast("long").as("y"))
        .groupBy($"cell")
        .agg(count(lit(1)).as("n"), min($"x").as("min_x"), max($"x").as("max_x"),
             min($"y").as("min_y"), max($"y").as("max_y"))
      val hashSkip = Layout.skipRate(hashStats, 0L, 365L,
        Long.MinValue / 4, Long.MaxValue / 4).collect().head
      assert(frac(hashSkip) <= 0.05, s"hash layout should not prune, got ${frac(hashSkip)}")
    } finally stats.unpersist()
  }

  test("rankGrid keeps z-cells balanced on skewed keys where affine normalization cannot") {
    val df = Tables.lineitem(spark, dir)
    val tie = Seq($"l_orderkey", $"l_linenumber")
    val skewed = $"l_extendedprice" * $"l_extendedprice"

    def imbalance(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column): Double = {
      val counts = Layout.cellStats(df, x, y, bits = 12, cellBits = 6)
        .select($"n").as[Long].collect()
      counts.max.toDouble / counts.min.toDouble
    }

    val yAffine = datediff($"l_shipdate", lit("1995-01-01")).cast("long") * 4096L / 2500L
    // affine: squared price concentrates mass into few cells
    val mnmx = df.agg(min(skewed), max(skewed)).collect().head
    val (mn, mx) = (mnmx.getDouble(0), mnmx.getDouble(1))
    val xAffine = floor((skewed - mn) / (mx - mn) * 4095)
    val affineRatio = imbalance(xAffine, yAffine)

    val xRank = Layout.rankGrid(skewed, tie, 4096)
    val yRank = Layout.rankGrid(datediff($"l_shipdate", lit("1995-01-01")), tie, 4096)
    val rankRatio = imbalance(xRank, yRank)

    // ~94 rows/cell at sf0.001: Poisson noise alone reaches ~1.6-1.8×,
    // so the bound is 2× here; at sf0.01 the same ratio measures 1.11×
    assert(affineRatio >= 3.0, s"fixture no longer skewed: affine $affineRatio")
    assert(rankRatio <= 2.0, s"rank grid must stay balanced: $rankRatio")
    assert(rankRatio * 2 < affineRatio,
      s"rank ($rankRatio) must clearly beat affine ($affineRatio)")
  }

  test("sketchCutpoints at the exact regime (k >= distinct) equals brute-force rank cutpoints") {
    val df = Tables.lineitem(spark, dir).select($"l_quantity".cast("long").as("v"))
    // l_quantity has 50 distinct values -> k=64 keeps ALL of them:
    // the sketch degenerates to the exact value histogram
    val cuts = Layout.sketchCutpoints(df, $"v",
        graft.ext.MinHashLsh.portableHash32($"v".cast("string")), grid = 8, k = 64)
      .orderBy($"i").select($"cut").as[Double].collect().toSeq
    val vals = df.as[Long].collect().sorted
    val n = vals.length.toLong
    val expect = (1 to 7).map { i =>
      // smallest value whose cumulative count reaches i/8 of the total:
      // with the full histogram, that's the element at ceil(i*n/8)-1
      vals(((i * n + 7) / 8 - 1).toInt).toDouble
    }
    assert(cuts == expect, s"got $cuts want $expect")
  }

  test("sketch grid balance: lossy k costs bounded imbalance vs the exact rank grid") {
    val df = Tables.lineitem(spark, dir)
    val skewed = floor($"l_extendedprice" * $"l_extendedprice").cast("long")
    val base = df.select(skewed.as("v"))
    def maxShare(cells: Array[Long]): Double = {
      val total = cells.sum.toDouble
      cells.max / total
    }
    val grid = 8
    val cuts = Layout.sketchCutpoints(base, $"v",
      graft.ext.MinHashLsh.portableHash32($"v".cast("string")), grid, k = 256)
    val sketchCells = Layout.sketchGridCell(base, $"v", cuts, "cell")
      .groupBy($"cell").count().select($"count").as[Long].collect()
    // ideal share is 1/8 = 0.125; the O(1/sqrt(k)) sampling error at
    // k=256 should hold the heaviest cell under 2x ideal even on the
    // squared-price skew (affine slicing puts >60% in one cell here)
    assert(sketchCells.length == grid, s"expected $grid cells, got ${sketchCells.length}")
    assert(maxShare(sketchCells) <= 0.25,
      s"sketch grid too imbalanced: ${maxShare(sketchCells)}")
    // affine comparison: same skewed column, fixed-range slicing
    val mnmx = base.agg(min($"v"), max($"v")).collect().head
    val (mn, mx) = (mnmx.getLong(0), mnmx.getLong(1))
    val affineCells = base
      .select(floor(($"v" - mn).cast("double") / (mx - mn + 1).toDouble * grid)
        .cast("long").as("cell"))
      .groupBy($"cell").count().select($"count").as[Long].collect()
    // at 8 coarse cells the squared-price skew measures ~0.35 in the
    // heaviest affine cell (2.8x ideal) — the sketch grid must clearly
    // beat it
    assert(maxShare(affineCells) >= 0.3,
      s"fixture no longer skewed: affine max share ${maxShare(affineCells)}")
    assert(maxShare(sketchCells) < maxShare(affineCells),
      s"sketch (${maxShare(sketchCells)}) must beat affine (${maxShare(affineCells)})")
  }

  test("cellStats plans as one partial-aggregated shuffle (zero-shuffle cell id)") {
    val stats = Layout.cellStats(
      Tables.lineitem(spark, dir), datediff($"l_shipdate", lit("1995-01-01")),
      floor($"l_quantity" * 80), bits = 12, cellBits = 8)
    val p = stats.queryExecution.executedPlan.toString
    assert(p.contains("partial_count") || p.contains("partial_"), p)
    assert("Exchange".r.findAllIn(p).size <= 2, p)
  }
}
