package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling: per-column statistics as rows, computed in
  * ONE scan.
  *
  * The naive per-column loop runs k jobs over the table; this builds a
  * single aggregation with k×4 expressions (count / exact distinct /
  * min / max) plus the row count, then explodes the one result row into
  * k (column, stats) rows — scan cost independent of how many columns
  * are profiled. Exact distinct counts expand via Spark's Expand
  * operator (multi-distinct rewrite, still one pass over the data); at
  * 100 TB swap `count_distinct` for `approx_count_distinct` per column
  * where exactness isn't required.
  */
object Profile {

  /** Profile numeric columns: one row per column with
    * (column_name, n_rows, n_vals, n_distinct, min_val, max_val).
    */
  def numeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val aggs = count(lit(1)).as("__n") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"__cnt_$c"),
      count_distinct(col(c)).as(s"__nd_$c"),
      min(col(c)).as(s"__min_$c"),
      max(col(c)).as(s"__max_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stats = cols.map(c => struct(
      lit(c).as("column_name"),
      col("__n").as("n_rows"),
      col(s"__cnt_$c").as("n_vals"),
      col(s"__nd_$c").as("n_distinct"),
      col(s"__min_$c").cast("double").as("min_val"),
      col(s"__max_$c").cast("double").as("max_val")))
    one.select(explode(array(stats: _*)).as("p")).select("p.*")
  }
}
