package graft

/** SQL-text surface (SURVEY §7.3): the DataFrame DSL covers the
  * reference, but queries may arrive as SQL text — spark.sql must
  * agree with the DataFrame plans. The oracle strings double as the
  * fixture: for every ANSI-subset query, running ITS OWN oracle SQL
  * through Spark must reproduce the DataFrame result exactly (the same
  * text DuckDB executes for the driver's gate — one query text, two
  * engines, three execution paths, one answer).
  */
class SqlSurfaceSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  // oracle SQL that is pure ANSI (no DuckDB-only functions)
  private val ansiQueries = Seq(
    CoreQueries.q02, CoreQueries.q04, CoreQueries.q05, CoreQueries.q06,
    CoreQueries.q07, CoreQueries.q08, CoreQueries.q10, CoreQueries.q13,
    CoreQueries.q14, CoreQueries.q15, CoreQueries.q16, CoreQueries.q18,
    ExtQueries.q41, ExtQueries.q42)

  test("spark.sql over the oracle text matches the DataFrame plans") {
    Seq("lineitem", "orders", "customer", "nation", "region").foreach { t =>
      Tables.table(spark, dir, t).createOrReplaceTempView(t)
    }
    Tables.events(spark, dir).createOrReplaceTempView("events")
    ansiQueries.foreach { q =>
      val viaSql = spark.sql(q.oracle.get).collect().toSeq
      val viaDf = q.run(spark, dir).collect().toSeq
      assert(viaSql == viaDf, s"${q.name}: SQL text and DataFrame results differ")
    }
  }
}
