package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SparkSessionExtensions integration: a session built with
  * GraftExtensions gets the custom functions in SQL and the
  * VecDotRewrite optimizer rule; runtime registration covers
  * already-running sessions.
  */
class ExtensionsSpec extends SparkTestBase {

  /** Fresh session over the SAME SparkContext, with extensions.
    *
    * Uses the programmatic withExtensions hook: the equivalent
    * `spark.sql.extensions=graft.plans.GraftExtensions` config string
    * is only read when the SparkContext itself is created, so it
    * cannot be exercised from a suite sharing one context — verified:
    * passing it via builder.config on an existing context injects
    * nothing. Both paths call the same GraftExtensions.apply.
    */
  private lazy val extSession: SparkSession = {
    val base = spark // force-create the shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  test("injected SQL functions resolve and compute") {
    val d = extSession.sql(
      "SELECT vec_dot(cast(array(1.0, 2.0) as array<float>), " +
        "cast(array(3.0, 4.0) as array<float>)) AS d").head().getDouble(0)
    assert(d == 11.0)
    val n = extSession.sql(
      "SELECT token_set_count('the cat the mat', array('the', 'mat')) AS n")
      .head().getInt(0)
    assert(n == 3)
    val g = extSession.sql("SELECT word_ngrams('a b c', 2) AS g")
      .head().getSeq[String](0)
    assert(g == Seq("a b", "b c"))
    val t = extSession.sql("SELECT normalize_text('  MiXeD \t Case  ') AS t")
      .head().getString(0)
    assert(t == "mixed case")
    val b = extSession.sql("SELECT bpe_count('the cat') AS b").head().getLong(0)
    assert(b == 3L) // 'the' merges to one token; 'cat' to two (c + at)
    val bt = extSession.sql("SELECT bpe_tokens('the') AS t").head().getSeq[String](0)
    assert(bt == Seq("the"))
    val sm = extSession.sql(
      "SELECT span_mask(array('a','b','c','d'), array(2), 2) AS k")
      .head().getSeq[String](0)
    assert(sm == Seq("a", "d"))
  }

  test("normalize_text SQL binding matches the Column API (no copy drift)") {
    GraftFunctions.register(spark)
    val docs = graft.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .limit(50)
    docs.createOrReplaceTempView("nt_docs")
    val viaSql = spark.sql("SELECT normalize_text(text) AS n FROM nt_docs ORDER BY n")
      .collect().toSeq
    val viaCol = docs.select(graft.ext.TextAnalysis.normalize(docs("text")).as("n"))
      .orderBy("n").collect().toSeq
    assert(viaSql == viaCol)
  }

  test("bpe_count SQL binding matches the Column API on corpus text (no drift)") {
    val docs = graft.Tables.table(extSession, "/root/testdata/sf0.001", "documents")
      .limit(50)
    docs.createOrReplaceTempView("bpe_docs")
    val viaSql = extSession.sql(
      "SELECT doc_id, bpe_count(text) AS n FROM bpe_docs ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaApi = docs.select(col("doc_id"),
        graft.functions.Bpe.count(col("text")).as("n"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaSql == viaApi && viaSql.nonEmpty)
  }

  test("foldable-but-unfolded constant args are accepted; bad args raise AnalysisException") {
    // builders run before constant folding — 1+1 must fold to 2
    val g = extSession.sql("SELECT word_ngrams('a b c', 1+1) AS g")
      .head().getSeq[String](0)
    assert(g == Seq("a b", "b c"))
    // a genuinely non-constant argument is an analysis error, not a
    // raw IllegalArgumentException out of the planner
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      extSession.sql("SELECT word_ngrams(c, n) FROM VALUES ('a b', 2) t(c, n)").collect()
    }
    assert(e.getMessage.contains("word_ngrams"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      extSession.sql("SELECT vec_dot(cast(array(1.0) as array<float>))").collect()
    }
    assert(e2.getMessage.contains("expects 2 arguments"))
  }

  test("srp_signature SQL binding matches the Column API") {
    val viaSql = extSession.sql(
      "SELECT srp_signature(cast(array(0.5, -1.25, 3.0) as array<float>), 2*8) AS s")
      .head().getLong(0)
    val s = extSession
    import s.implicits._
    val viaCol = Seq(Tuple1(Array(0.5f, -1.25f, 3f))).toDF("v")
      .select(graft.functions.SrpSignature($"v", 16)).as[Long].head()
    assert(viaSql == viaCol)
  }

  test("VecDotRewrite: widened HOF dot product becomes the native expression") {
    val s = extSession
    import s.implicits._
    // parquet-backed frame — a literal LocalRelation would be constant-
    // folded away before the plan shows the rewritten expression
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding").limit(3)
    val hof = aggregate(
      zip_with($"embedding", $"embedding", (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val q = emb.select($"vec_id", hof.as("d"))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.toLowerCase.contains("vecdot"), s"not rewritten:\n$opt")
    // rewritten result equals the native expression called directly
    val native = emb.select($"vec_id",
      graft.functions.VecDot($"embedding", $"embedding").as("d"))
    assert(q.collect().toSeq == native.collect().toSeq)
  }

  test("VecDotRewrite: float-multiply variant is NOT rewritten (different rounding)") {
    val s = extSession
    import s.implicits._
    val df = Seq((Array(1f, 2f), Array(3f, 4f))).toDF("a", "b")
    val hof = aggregate(
      zip_with($"a", $"b", (x, y) => x * y), // float product, rounds per element
      lit(0.0), (acc, v) => acc + v)
    val opt = df.select(hof.as("d")).queryExecution.optimizedPlan.toString
    assert(!opt.toLowerCase.contains("vecdot"), s"must not rewrite float-multiply:\n$opt")
  }

  test("runtime registration works on an already-running session") {
    GraftFunctions.register(spark)
    val d = spark.sql(
      "SELECT vec_dot(cast(array(2.0) as array<float>), " +
        "cast(array(8.0) as array<float>)) AS d").head().getDouble(0)
    assert(d == 16.0)
    assert(spark.sql("SELECT mix_hash64(1L, 3L, 4L) AS m").head().getLong(0) == 7L)
  }
}
