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
}
