package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from the per-family query sets (CoreQueries =
  * SURVEY §2 operator inventory over the testdata star schema; ExtQueries
  * = the LLM-pipeline extensions). Every entry with SQL-expressible
  * semantics also appears in `oracleSql` for the driver's DuckDB gate.
  */
object SparkEntry {

  private def querySets: Seq[CoreQueries.Q] =
    CoreQueries.all ++ ExtQueries.all ++ ExtQueries2.all ++ ExtQueries3.all ++
      ExtQueries4.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q05.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    querySets.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    querySets.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
