package graft.sources

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Source-format parity: the engine's operators are format-agnostic
  * DataFrame transforms, so every Spark-native columnar/row format
  * must round-trip the same rows — and the SCALE property (predicate
  * pushdown into the scan) must hold on ORC exactly as PlanSpec pins
  * it for parquet. CSV/JSONL ingestion with quarantine already has
  * its own paths (aragon loaders, JsonlSource); this spec covers the
  * remaining interchange formats a 100 TB pipeline meets.
  */
class FormatsSpec extends SparkTestBase {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("ORC round-trips lineitem exactly and pushes filters into the ORC scan") {
    val li = Tables.lineitem(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("orc").toString + "/li"
    li.write.orc(tmp)
    val back = spark.read.orc(tmp)

    val a = li.select($"l_orderkey", $"l_linenumber", $"l_quantity")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val b = back.select($"l_orderkey", $"l_linenumber", $"l_quantity")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(a == b)

    val p = back.filter($"l_quantity" > 45.0)
      .select($"l_orderkey", $"l_quantity")
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)"), p)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), p)
  }

  test("documents survive ORC and JSON round-trips byte-for-byte (text fidelity)") {
    val docs = Tables.table(spark, dir, "documents")
      .select($"doc_id", $"text", $"lang", $"source")
    val base = java.nio.file.Files.createTempDirectory("fmt").toString

    docs.write.orc(s"$base/orc")
    docs.write.json(s"$base/json")

    def fp(df: org.apache.spark.sql.DataFrame): Array[org.apache.spark.sql.Row] =
      df.select($"doc_id", md5($"text".cast("binary")).as("h"), $"lang", $"source")
        .orderBy($"doc_id").collect()

    val want = fp(docs)
    assert(fp(spark.read.orc(s"$base/orc")).sameElements(want))
    assert(fp(spark.read.schema(docs.schema).json(s"$base/json")).sameElements(want))
  }

  test("a gate query computes identically over an ORC copy of its input") {
    // format-agnostic operator proof: run the q113 cell-stats operator
    // over ORC-sourced lineitem and compare to the parquet-sourced run
    val li = Tables.lineitem(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("orcgate").toString + "/li"
    li.write.orc(tmp)
    def stats(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Layout.cellStats(
        df, datediff($"l_shipdate", lit("1995-01-01")),
        floor($"l_quantity" * 80), bits = 12, cellBits = 8)
        .orderBy($"cell").collect().toSeq
    assert(stats(spark.read.orc(tmp)) == stats(li))
  }
}
