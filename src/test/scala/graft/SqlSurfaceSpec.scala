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

  test("signature/sketch aggregates are reachable from SQL text and match their DataFrame twins") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val docs = Tables.table(spark, dir, "documents")
    docs.select($"doc_id", explode(graft.functions.NGrams.wordNGrams($"text", 2)).as("g"))
      .select($"doc_id", xxhash64($"g").as("h"), (xxhash64($"g") % 1000L).as("score_src"))
      .createOrReplaceTempView("grams")
    val grams = spark.table("grams")

    def check(label: String, sql: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val viaSql = spark.sql(sql).collect().toSeq
      val viaDf = df.collect().toSeq
      assert(viaSql == viaDf, s"$label: SQL text and DataFrame results differ")
      assert(viaSql.nonEmpty, s"$label: vacuous comparison")
    }

    check("minhash_agg",
      "SELECT doc_id, minhash_agg(h, 8) AS sig FROM grams GROUP BY doc_id ORDER BY doc_id",
      grams.groupBy($"doc_id")
        .agg(graft.functions.MinHashAgg.minhash($"h", 8).as("sig"))
        .orderBy($"doc_id"))
    check("simhash_agg",
      "SELECT doc_id, simhash_agg(h) AS sh FROM grams GROUP BY doc_id ORDER BY doc_id",
      grams.groupBy($"doc_id")
        .agg(graft.functions.SimHashAgg.simhash($"h").as("sh"))
        .orderBy($"doc_id"))
    check("kmv_sketch",
      "SELECT kmv_sketch(h, 16) AS kmv FROM grams",
      grams.agg(graft.functions.KmvSketchAgg.kMinima($"h", 16).as("kmv")))
    check("quantile_sketch",
      // integer-typed value column exercises the binding's analysis-time cast
      "SELECT quantile_sketch(h, score_src, 32) AS qs FROM grams",
      grams.agg(graft.functions.QuantileSketchAgg.sample(
        $"h", $"score_src".cast("double"), 32).as("qs")))
    check("top_k",
      "SELECT doc_id, top_k(CAST(score_src AS DOUBLE), h, 3) AS tk FROM grams GROUP BY doc_id ORDER BY doc_id",
      grams.groupBy($"doc_id")
        .agg(graft.functions.TopKAgg.topK($"score_src".cast("double"), $"h", 3).as("tk"))
        .orderBy($"doc_id"))

    // gate queries that ride these aggregates must be unaffected by
    // registration (same session, same plans): q50 / q85 re-checked
    val q50 = ExtQueries.q50.run(spark, dir).collect().toSeq
    assert(q50.nonEmpty)
    val q85 = ExtQueries.q85.run(spark, dir).collect().toSeq
    assert(q85.nonEmpty)
  }
}
