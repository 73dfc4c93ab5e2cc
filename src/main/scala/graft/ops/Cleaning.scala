package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-cleaning operators (SURVEY.md §2.2 P1–P8).
  *
  * Reference semantics: /root/reference/load_hhs.py:49-53 (sentinel
  * replace, NaN normalize, numeric cast, date parse) and
  * /root/reference/load_quality.py:102-107 (header normalize, value map,
  * literal column). All operators here are pure column expressions —
  * single narrow projection, no shuffle, whole-stage-codegen friendly —
  * so they cost one map pass regardless of data volume.
  */
object Cleaning {

  /** Rewrite selected columns through `f` in ONE projection (not a
    * withColumn chain — keeps the analyzed plan small on wide frames,
    * which matters for the reference's 127-column HHS scans).
    */
  def mapColumns(df: DataFrame, cols: Set[String])(f: Column => Column): DataFrame = {
    val out = df.columns.map { c => if (cols(c)) f(col(c)).as(c) else col(c) }
    df.select(out.toIndexedSeq: _*)
  }

  /** P1: numeric sentinel (e.g. -999999 at load_hhs.py:49) → NULL. */
  def sentinelToNull(df: DataFrame, cols: Seq[String], sentinel: Double): DataFrame =
    mapColumns(df, cols.toSet)(c => when(c === lit(sentinel), lit(null)).otherwise(c))

  /** P3: explicit per-column cast (Spark cast = null-on-failure, the
    * documented delta vs pandas astype(errors='ignore'), SURVEY §4).
    */
  def castColumns(df: DataFrame, cols: Seq[String], to: DataType): DataFrame =
    mapColumns(df, cols.toSet)(_.cast(to))

  /** P4: string → DateType with an explicit pattern (load_hhs.py:53). */
  def parseDates(df: DataFrame, cols: Seq[String], fmt: String = "yyyy-MM-dd"): DataFrame =
    mapColumns(df, cols.toSet)(c => to_date(c, fmt))

  /** P5: header normalization — lower-case, spaces → underscores
    * (load_quality.py:102).
    */
  def normalizeHeaders(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.trim.toLowerCase.replace(" ", "_")).toIndexedSeq: _*)

  /** P6: categorical value remap ('Yes'→true / 'Not Available'→0,
    * load_quality.py:103-105). Unmapped values pass through unchanged
    * unless `default` is given.
    */
  def mapValues(df: DataFrame, column: String, mapping: Map[String, Any],
                default: Option[Any] = None): DataFrame = {
    val c = col(column)
    val mapped = mapping.foldLeft(when(lit(false), lit(null))) {
      case (acc, (k, v)) => acc.when(c === lit(k), lit(v))
    }
    val full = default.map(d => mapped.otherwise(lit(d))).getOrElse(mapped.otherwise(c))
    df.withColumn(column, full)
  }

  /** P7: constant column from a driver-side parameter (load_quality.py:107). */
  def withLiteral(df: DataFrame, column: String, value: Any, to: DataType): DataFrame =
    df.withColumn(column, lit(value).cast(to))
}
