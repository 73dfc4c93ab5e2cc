package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{assert_true, coalesce, col, concat, count, lit, max, min, shiftleft, shiftright, sum, when}

/** Physical data layout for scale (SURVEY §8 scale notes): how tables
  * should be WRITTEN so the expensive operations never happen at read
  * time.
  *
  * - Bucketing: both sides of a recurring equi-join written with the
  *   same bucket count/keys join with NO shuffle — the scan is already
  *   hash-partitioned. At 100 TB, pre-bucketing fact tables on their
  *   join key turns every downstream join into a zip of local scans.
  * - Partitioning: directory-level partition columns let Catalyst prune
  *   entire partitions from the scan when filters hit them (visible as
  *   PartitionFilters in the plan) — the coarse-grained complement to
  *   parquet row-group pushdown.
  *
  * Both write through the session catalog / file layout only — no
  * external metastore needed.
  */
object Layout {

  /** Write `df` as a bucketed (and per-bucket sorted) catalog table.
    * Joins and aggregations on `keys` over this table need no
    * exchange; sorting additionally enables merge-join without a sort
    * step.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    numBuckets: Int, sorted: Boolean = true): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
    (if (sorted) w.sortBy(keys.head, keys.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Write `df` partitioned by directory on `partitionCols` — filters
    * on those columns prune at the directory level before any file is
    * opened.
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** AQE-rebalanced view of `df` for writing: the REBALANCE hint makes
    * the final exchange split oversized partitions AND coalesce tiny
    * ones to spark.sql.adaptive.advisoryPartitionSizeInBytes — the fix
    * for the small-files problem (a filter-heavy job writing through
    * 10k near-empty tasks produces 10k near-empty files, which then
    * tax every downstream listing and scan). Unlike coalesce(n), no
    * magic file count to guess, and skewed partitions still split.
    */
  def rebalanced(df: DataFrame): DataFrame = df.hint("rebalance")

  /** writePartitioned with a rebalance on the partition columns, so
    * each output directory gets well-sized files (rows for the same
    * partition value land in the same tasks instead of a sliver per
    * task × partition).
    */
  def writePartitionedRebalanced(df: DataFrame, path: String,
                                 partitionCols: Seq[String]): Unit =
    df.hint("rebalance", partitionCols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Z-order (Morton) interleave of two non-negative `bits`-bit
    * integer ranks — built entirely from codegen'd integer bit ops
    * (shift/and/or), so it is deterministic, engine-portable
    * (oracle-checkable), and needs no custom expression. x takes the
    * ODD bit positions, y the even.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(
          shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }

  /** Write parquet clustered on the Z-order curve of two columns — the
    * data-skipping layout when queries filter on EITHER or BOTH
    * columns (a single-column sort gives perfect min/max pruning on
    * one column and none on the other; the Z-curve keeps each output
    * file's bounding box small in BOTH dimensions, so parquet
    * row-group/file min-max stats prune most files for most 2-D
    * predicates — measured in LayoutSpec).
    *
    * `x`/`y` must already be non-negative `bits`-bit ranks (bucketize
    * raw values first — range-normalization is the caller's policy
    * decision). Shape: one range repartition on the z-value (sampled
    * range partitioner → equal-sized files) + per-partition sort; no
    * extra pass.
    */
  def zOrderedWrite(df: DataFrame, x: Column, y: Column, bits: Int,
                    path: String, numFiles: Int): Unit =
    df.withColumn("__z", zValue(x, y, bits))
      .repartitionByRange(numFiles, org.apache.spark.sql.functions.col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** [[zValue]] with a range guard: a key wider than `bits` would
    * silently alias distant values into the same curve position and
    * corrupt the layout, so out-of-range input fails the query
    * instead. Same bit convention as zValue (x odd, y even) — pinned
    * by gate q76.
    */
  def zValueChecked(x: Column, y: Column, bits: Int): Column = {
    val xi = x.cast("long"); val yi = y.cast("long")
    val lim = lit(1L << bits)
    val guard = assert_true(
      xi >= 0 && xi < lim && yi >= 0 && yi < lim,
      concat(lit(s"zValue: key outside [0, 2^$bits): x="),
             xi.cast("string"), lit(" y="), yi.cast("string")))
    when(guard.isNull, zValue(xi, yi, bits)).otherwise(lit(0L))
  }

  /** Quadtree cell id: the top `cellBits` bits of the z-value — the
    * FIXED-slicing complement to [[zOrderedWrite]]'s sampled range
    * boundaries. Pure arithmetic (zero-shuffle), deterministic at any
    * scale and oracle-checkable cross-engine; rows in a cell are
    * contiguous in BOTH key dimensions, so per-cell min-max spans are
    * tight. Cells can be uneven on skewed data — balance is what the
    * sampled write face buys instead.
    */
  def zCell(x: Column, y: Column, bits: Int, cellBits: Int): Column = {
    require(cellBits >= 1 && cellBits <= 2 * bits,
      s"cellBits must be in [1, ${2 * bits}], got $cellBits")
    shiftright(zValueChecked(x, y, bits), 2 * bits - cellBits)
  }

  /** Per-cell layout statistics — the min-max index a reader would
    * prune with. One partial-aggregated shuffle on the cell id.
    */
  def cellStats(df: DataFrame, x: Column, y: Column, bits: Int,
                cellBits: Int): DataFrame =
    df.select(zCell(x, y, bits, cellBits).as("cell"),
              x.cast("long").as("x"), y.cast("long").as("y"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"),
           min(col("x")).as("min_x"), max(col("x")).as("max_x"),
           min(col("y")).as("min_y"), max(col("y")).as("max_y"))

  /** Exact rank-grid normalization for layout keys: map a value column
    * onto [0, grid) by its GLOBAL rank — `(rank * grid) div n` — so
    * the marginal distribution on the grid is uniform BY CONSTRUCTION
    * and z-cells stay balanced no matter how skewed the raw values are
    * (a fixed affine normalization concentrates skewed mass into few
    * cells — measured 5.9× cell imbalance on a squared-price column
    * where this face holds 1.1×). This is what table formats'
    * OPTIMIZE-style z-ordering does with per-column range ids.
    *
    * The exact rank is one global sort per column (windowed
    * row_number with a total tiebreak — deterministic and
    * oracle-mirrorable; integer `div`, no float rounding). At corpus
    * scale, swap in cutpoints from the mergeable quantile sketch
    * ([[graft.functions.QuantileSketchAgg]]) — approximate ranks cost
    * a bounded balance factor instead of a sort; LayoutSpec measures
    * this exact face (≤1.2× imbalance) against the affine one (5.9×).
    */
  def rankGrid(value: Column, tiebreak: Seq[Column], grid: Int): Column = {
    require(grid >= 2, s"grid must be >= 2, got $grid")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(value +: tiebreak: _*)
    val r = org.apache.spark.sql.functions.row_number().over(w).cast("long") - 1L
    val n = count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy())
    // integer floor-division without float rounding risk: subtract the
    // remainder first so the division is exact (numerator stays well
    // under 2^53)
    val num = r * grid
    ((num - org.apache.spark.sql.functions.pmod(num, n)) / n).cast("long")
  }

  /** Sketch-derived grid cutpoints — the SORT-FREE scale face of
    * [[rankGrid]]. rankGrid's exact global rank costs one full sort
    * per layout column; at corpus scale the standard substitute is
    * range cutpoints from a mergeable quantile sketch
    * ([[graft.functions.QuantileSketchAgg]] — bottom-k-by-hash
    * distinct sample, deterministic and partition-invariant), one
    * partially-aggregated scan instead of a sort. Returns `grid-1`
    * rows (i, cut): cut_i is the smallest sampled value whose
    * cumulative sampled count reaches i/grid of the sampled total —
    * pure INTEGER comparison (`cum*grid >= i*tot`), no float
    * quantile definition to mismatch across engines.
    *
    * Fed a PORTABLE hash of the value ([[graft.ext.MinHashLsh
    * .portableHash32]]), the sample — and therefore every cutpoint —
    * is reproducible in any engine with md5, so the LOSSY regime is
    * oracle-checkable end-to-end (gate q123), not just the degenerate
    * exact one. Balance degrades O(1/√k) with sketch size; LayoutSpec
    * measures the cell-imbalance cost vs the exact face on the skewed
    * squared-price column.
    */
  def sketchCutpoints(df: DataFrame, metric: Column, hash: Column,
                      grid: Int, k: Int): DataFrame = {
    require(grid >= 2 && grid <= 4096, s"grid in [2,4096], got $grid")
    import org.apache.spark.sql.functions.{col, explode, sequence, sum, when, min => fmin}
    // materialize hash/value through a codegen'd projection FIRST:
    // TypedImperativeAggregate.update evals its child expressions
    // INTERPRETED per row, so feeding the md5-Horner tree directly
    // costs ~15 µs/row (measured 8.8 s over 600k rows); behind a
    // projection the agg reads two bound columns and the md5 runs
    // inside whole-stage codegen
    val prepped = df.select(hash.as("__qs_h"),
      metric.cast("double").as("__qs_v"))
    val sk = prepped.agg(graft.functions.QuantileSketchAgg
      .sample(col("__qs_h"), col("__qs_v"), k).as("__s"))
    // ≤ k rows from here on
    val w = org.apache.spark.sql.expressions.Window
    val cdf = sk.select(explode(col("__s")).as("e"))
      .select(col("e.value").as("__v"), col("e.count").as("__c"))
      .select(col("__v"),
        sum(col("__c")).over(w.orderBy(col("__v"))
          .rowsBetween(Long.MinValue, 0)).as("__cum"),
        sum(col("__c")).over(w.rowsBetween(Long.MinValue, Long.MaxValue)).as("__tot"))
    cdf.select(col("__v"), col("__cum"), col("__tot"),
        explode(sequence(lit(1), lit(grid - 1))).as("i"))
      .groupBy(col("i"))
      .agg(fmin(when(col("__cum") * lit(grid.toLong) >= col("i") * col("__tot"),
        col("__v"))).as("cut"))
  }

  /** Assign each row its grid cell from a [[sketchCutpoints]] table:
    * cell = number of DISTINCT cutpoints ≤ value (duplicate cutpoints
    * — a value heavier than 1/grid of the corpus — collapse, so a
    * heavy value occupies ONE cell rather than inflating its
    * neighbors' indices). The grid-1 distinct cutpoints are bounded
    * driver state (the nlist-centroids precedent) compiled into a
    * codegen'd O(log grid) binary-search expression
    * ([[graft.functions.CutpointCell]]) — the broadcast-array
    * higher-order `filter` formulation evaluates its lambda
    * interpreted per row and measured ~7 s over 600k rows where this
    * is scan-cost. Zero shuffles over `df`.
    */
  def sketchGridCell(df: DataFrame, metric: Column, cuts: DataFrame,
                     out: String): DataFrame = {
    val arr = cuts.select(col("cut")).where(col("cut").isNotNull)
      .distinct().collect().map(_.getDouble(0)).sorted
    df.withColumn(out,
      graft.functions.CutpointCell(metric.cast("double"), arr))
  }

  /** Skip-rate of a min-max index for a conjunctive range predicate:
    * how many cells (files) a reader can prove disjoint from the query
    * box on EITHER column and never open. A second tiny aggregate over
    * the stats frame — no driver loop.
    */
  def skipRate(stats: DataFrame,
               xLo: Long, xHi: Long, yLo: Long, yHi: Long): DataFrame =
    stats.agg(
      count(lit(1)).as("n_cells"),
      coalesce(sum(when(col("max_x") < xLo || col("min_x") > xHi ||
                        col("max_y") < yLo || col("min_y") > yHi, 1L)
                     .otherwise(0L)), lit(0L)).as("n_skipped"))
}
