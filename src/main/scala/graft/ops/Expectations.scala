package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations → one violations report —
  * the reference enforces its rules imperatively inside the loaders
  * (non-negativity splits, CHECK rating >= 0, key dedup probes,
  * `load_hhs.py:96-137` / `load_quality.py:119-126`); this is the
  * same contract as a reusable operator any table can declare.
  *
  * Report: one row per check, `(check, n_violations)` — zero rows
  * violated means the expectation HOLDS (the row is still emitted, so
  * a green report is distinguishable from a check that never ran).
  *
  * Scale shape: all row-level predicates fold into ONE scan (a single
  * aggregate of conditional sums — adding a check costs a column, not
  * a pass); uniqueness is one grouped count per key set (surplus rows
  * = Σ(cnt−1)); referential integrity is one anti-join per FK (AQE
  * picks broadcast when the dimension is small). Nothing collects to
  * the driver.
  */
object Expectations {

  /** @param rowChecks    (name, VIOLATION predicate) — true = bad row
    * @param uniqueKeys   (name, key columns) — violations = surplus
    *                     duplicate rows beyond the first per key
    * @param foreignKeys  (name, fk column, dimension, pk column) —
    *                     violations = non-null fk values with no match
    */
  def report(df: DataFrame,
             rowChecks: Seq[(String, Column)],
             uniqueKeys: Seq[(String, Seq[Column])] = Nil,
             foreignKeys: Seq[(String, Column, DataFrame, Column)] = Nil): DataFrame = {
    require(rowChecks.nonEmpty || uniqueKeys.nonEmpty || foreignKeys.nonEmpty,
      "declare at least one expectation")
    val rowReport: Option[DataFrame] =
      if (rowChecks.isEmpty) None
      else {
        val sums = df.agg(
          sum(when(rowChecks.head._2, 1L).otherwise(0L)).as("c0"),
          rowChecks.tail.zipWithIndex.map { case ((_, cond), i) =>
            sum(when(cond, 1L).otherwise(0L)).as(s"c${i + 1}")
          }: _*)
        // melt the single row to (check, n_violations)
        val stacked = rowChecks.zipWithIndex.map { case ((name, _), i) =>
          sums.select(lit(name).as("check"),
            coalesce(col(s"c$i"), lit(0L)).as("n_violations"))
        }
        Some(stacked.reduce(_ unionAll _))
      }
    val uniqueReports = uniqueKeys.map { case (name, keys) =>
      df.groupBy(keys: _*).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1)
        .agg(coalesce(sum(col("__n") - 1), lit(0L)).as("n_violations"))
        .select(lit(name).as("check"), col("n_violations"))
    }
    val fkReports = foreignKeys.map { case (name, fk, dim, pk) =>
      df.select(fk.as("__fk")).filter(col("__fk").isNotNull)
        .join(dim.select(pk.as("__pk")), col("__fk") === col("__pk"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check"), col("n_violations"))
    }
    (rowReport.toSeq ++ uniqueReports ++ fkReports).reduce(_ unionAll _)
  }

  /** Per-load profile for cross-load drift monitoring: one row per
    * profiled column — `(column, n_rows, n_nulls, null_rate)` — in ONE
    * scan (a single aggregate of conditional sums; adding a column
    * costs a column, not a pass). Persist each load's profile as a
    * tiny parquet table; [[driftReport]] compares consecutive loads.
    * The operational layer the reference's logged counters
    * (`load_quality.py:145-146`) gesture at: the log line becomes a
    * queryable table with a decision attached.
    */
  def loadProfile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile at least one column")
    // The per-column rows come out of ONE aggregate STRUCTURALLY: the
    // single agg row carries an array of per-column null counts which
    // is then exploded — not N selects over the same aggregate, whose
    // one-scan property would hinge on the optimizer's exchange-reuse
    // deduplicating N identical subtrees (and silently become N scans
    // if a plan change broke subtree equality).
    val agg0 = df.agg(
      count(lit(1)).as("__rows"),
      array(columns.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L))): _*).as("__nulls"))
    val names = array(columns.map(lit): _*)
    agg0.select(col("__rows"),
        posexplode(col("__nulls")).as(Seq("__i", "__n")))
      .select(element_at(names, col("__i") + 1).as("column"),
        col("__rows").as("n_rows"),
        coalesce(col("__n"), lit(0L)).as("n_nulls"),
        (coalesce(col("__n"), lit(0L)).cast("double") /
          greatest(col("__rows"), lit(1L)).cast("double")).as("null_rate"))
  }

  /** Cross-load drift report: compare this load's profile against the
    * previous load's. One `row_count_delta` row (table-level) plus one
    * `null_rate_drift` row per column:
    * `(check, column, current, previous, drift, ok)` — `drift` is the
    * relative row-count change resp. absolute null-rate change, `ok`
    * the pass/fail against the caller's bound. Columns present in only
    * one profile fail loudly (`ok` = false, drift null) — a schema
    * change between loads is drift, not a join artifact to drop.
    *
    * Scale: profiles are |columns| rows; everything here is
    * broadcast-trivial regardless of the loads' own size.
    */
  def driftReport(current: DataFrame, previous: DataFrame,
                  maxRowDeltaPct: Double = 0.5,
                  maxNullRateDrift: Double = 0.05): DataFrame = {
    val cur = current.select(col("column").as("__col"),
      col("n_rows").as("__cur_rows"), col("null_rate").as("__cur_nr"))
    val prev = previous.select(col("column").as("__pcol"),
      col("n_rows").as("__prev_rows"), col("null_rate").as("__prev_nr"))
    val joined = cur.join(prev, col("__col") === col("__pcol"), "full_outer")

    // row counts ride on every profile row identically; max() over the
    // joined frame is a deterministic way to read one value per side
    // (and survives profiles whose column sets diverged entirely)
    val rowDelta = joined.agg(
      max(col("__cur_rows")).as("__c"), max(col("__prev_rows")).as("__p"))
      .select(
        lit("row_count_delta").as("check"), lit(null).cast("string").as("column"),
        col("__c").cast("double").as("current"),
        col("__p").cast("double").as("previous"),
        (abs(col("__c") - col("__p")).cast("double") /
          greatest(col("__p"), lit(1L)).cast("double")).as("drift"))
      // an EMPTY profile side (a batch id that never ran, an empty
      // state dir) must FAIL, not yield a null ok that every
      // filter(!ok) monitoring query silently skips
      .withColumn("ok",
        when(col("current").isNull || col("previous").isNull, lit(false))
          .otherwise(col("drift") <= maxRowDeltaPct))

    val nullDrift = joined.select(
      lit("null_rate_drift").as("check"),
      coalesce(col("__col"), col("__pcol")).as("column"),
      col("__cur_nr").as("current"),
      col("__prev_nr").as("previous"),
      abs(col("__cur_nr") - col("__prev_nr")).as("drift"))
      .withColumn("ok",
        when(col("current").isNull || col("previous").isNull, lit(false))
          .otherwise(col("drift") <= maxNullRateDrift))

    rowDelta.unionAll(nullDrift)
  }
}
