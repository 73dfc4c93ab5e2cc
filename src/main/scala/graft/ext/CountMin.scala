package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min frequency sketching with an exact confirm pass — the
  * sketch-to-prune / exact-to-confirm pattern that makes heavy-hitter
  * queries affordable at corpus scale: one bounded-state pass builds a
  * depth×width counter matrix ([[graft.functions.CountMinAgg]]),
  * candidate keys are read off the sketch (estimates can only
  * OVER-count, so candidates ⊇ true heavy hitters — no recall loss,
  * ever), and an exact count over only the candidate rows removes the
  * collision-born false positives. The final answer is EXACT; the
  * sketch merely bounds how much work the exact pass does.
  *
  * Hashing is the repo's portable affine family over
  * [[MinHashLsh.portableHash32]] (md5 Horner base hash, splitmix64
  * slot constants) — BIGINT arithmetic only, so every stage up to and
  * including the sketch itself is oracle-mirrorable cross-engine.
  *
  * 100 TB shape: the sketch pass shuffles one depth×width matrix per
  * map partition (constant, not key-proportional); the candidate set
  * is threshold-bound and broadcast back for the confirm pass, whose
  * exact aggregation touches only candidate keys after a broadcast
  * semi-join prune at the scan.
  */
object CountMin {

  /** Per-key column-index array: entry j is the key's counter column
    * in sketch row j — `(h32 * mul_j + add_j) mod width`. h32 < 2^32
    * and mul_j < 2^31 keep the product under 2^63: no wrapping
    * arithmetic, same result in any BIGINT engine.
    */
  def indices(key: Column, depth: Int, width: Int): Column = {
    val h = MinHashLsh.portableHash32(key.cast("string"))
    array((0 until depth).map { j =>
      pmod(h * lit(MinHashLsh.portableMul(j)) + lit(MinHashLsh.portableAdd(j)),
           lit(width.toLong))
    }: _*)
  }

  /** The sketch as rows: (j, col, cnt) for every non-zero counter.
    * One aggregate pass (map-side partial matrices, element-wise
    * merge), then a posexplode of the final depth×width array.
    */
  def sketchCells(df: DataFrame, key: Column, depth: Int, width: Int): DataFrame =
    df.select(indices(key, depth, width).as("__idx"))
      .agg(graft.functions.CountMinAgg.sketch(col("__idx"), depth, width).as("m"))
      .select(posexplode(col("m")).as(Seq("pos", "cnt")))
      .filter(col("cnt") > 0)
      .select((col("pos") / width).cast("long").as("j"),
              pmod(col("pos"), lit(width)).cast("long").as("col"),
              col("cnt"))

  /** Merge sketch-cell tables from separate batches/shards/days into
    * one — counter matrices add element-wise, so the cell form merges
    * with a union + one STATE-sized re-aggregation (the
    * [[graft.ops.IncrementalAgg]] maintenance shape; also the
    * foreachBatch streaming step). Tables must share depth/width and
    * hash family — the caller's contract, as with any sketch state.
    */
  def mergeCells(cells: Seq[DataFrame]): DataFrame = {
    require(cells.nonEmpty, "mergeCells needs at least one cell table")
    cells.reduce(_ unionByName _)
      .groupBy(col("j"), col("col"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Count-Min estimate per distinct key of `keys`: min over the d
    * counters the key hashes to. The sketch side is depth×width rows
    * — broadcast, so this is one shuffle (the distinct) regardless of
    * corpus size.
    */
  def estimates(cells: DataFrame, keys: DataFrame, key: Column,
                depth: Int, width: Int): DataFrame =
    keys.select(key.as("key")).distinct()
      .select(col("key"), posexplode(indices(col("key"), depth, width))
                .as(Seq("j", "col")))
      .join(broadcast(cells), Seq("j", "col"), "left")
      .groupBy(col("key"))
      // a missing cell means count 0 (possible only for keys absent
      // from the sketched corpus)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** EXACT heavy hitters via sketch-prune + confirm: keys whose true
    * frequency is >= threshold, with their exact counts. False
    * positives from collisions die in the confirm pass; false
    * negatives cannot exist (over-count-only estimates).
    *
    * Shape (reworked, optimization round 17): the sketch matrix is
    * depth×width longs of BOUNDED state — collect it and evaluate the
    * estimate as a ROW EXPRESSION (min over the d counters the row's
    * key hashes to, against the matrix literal). The previous
    * formulation ran THREE full input scans (sketch pass, estimate
    * probe, exact confirm) plus a key-CARDINALITY distinct shuffle for
    * the probe; this runs two scans and shuffles only candidate rows —
    * the shape the scaladoc above always claimed. Output is unchanged:
    * row-literal estimates equal the join-form estimates cell for
    * cell, and the confirm filter made the result exact either way.
    */
  def heavyHittersExact(df: DataFrame, key: Column, threshold: Long,
                        depth: Int = 4, width: Int = 512): DataFrame = {
    val keyed = df.select(key.as("key"))
    // bounded driver state: depth×width counters (the IVF-centroid /
    // BPE-merge-table contract), dense so element_at is total
    val cellRows = sketchCells(keyed, col("key"), depth, width)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val matrix = Array.fill(depth, width)(0L)
    cellRows.foreach { case (j, c, n) => matrix(j.toInt)(c.toInt) = n }
    val matrixLit = array(matrix.map(row => typedLit(row.toSeq)): _*)
    val estExpr = array_min(zip_with(
      matrixLit, indices(col("key"), depth, width),
      (row, idx) => element_at(row, idx.cast("int") + 1)))
    keyed
      .filter(estExpr >= threshold)
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
  }
}
