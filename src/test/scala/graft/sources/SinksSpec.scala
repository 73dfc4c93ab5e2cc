package graft.sources

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Format-sink round trips: JSONL sharded export and ORC. */
class SinksSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
    .select($"doc_id", $"text", $"lang")

  test("JsonlSink round-trips and honors the shard size") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    new JsonlSink(dir, maxRecordsPerFile = 100L).append(docs.coalesce(1), "corpus")
    val files = new java.io.File(s"$dir/corpus").listFiles()
      .filter(_.getName.endsWith(".json"))
    assert(files.length >= 5, s"expected >=5 shards of <=100 rows, got ${files.length}")
    val back = spark.read.schema(docs.schema).json(s"$dir/corpus")
    assert(back.count() == docs.count())
    // spot-check value fidelity, not just counts
    val orig = docs.orderBy($"doc_id").limit(5).collect().toSeq
    val rt = back.orderBy($"doc_id").limit(5).collect().toSeq
    assert(rt == orig)
  }

  test("JsonlSink gzip codec writes compressed shards that read back") {
    val dir = java.nio.file.Files.createTempDirectory("jsonlgz").toString
    new JsonlSink(dir, codec = Some("gzip")).append(docs, "corpus")
    val files = new java.io.File(s"$dir/corpus").listFiles()
      .filter(_.getName.endsWith(".json.gz"))
    assert(files.nonEmpty, "no gzip shards written")
    assert(spark.read.schema(docs.schema).json(s"$dir/corpus").count() == docs.count())
  }

  test("JsonlSource quarantines malformed lines without losing or killing anything") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("jsonl-q")
    val lines = Seq(
      """{"doc_id": 1, "text": "good row"}""",
      """{"doc_id": 2, "text": "also fine"}""",
      """{"doc_id": 3, "text": "unterminated""",      // malformed JSON
      """not json at all""",
      """{"doc_id": 4, "text": "fine again"}""")
    java.nio.file.Files.write(dir.resolve("in.jsonl"),
      String.join("\n", lines: _*).getBytes("UTF-8"))

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    // default: no caching — nothing pinned for the session lifetime
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.size
    val r = JsonlSource.readWithQuarantine(spark, dir.toString, schema)
    assert(r.clean.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 4L))
    val bad = r.quarantine.as[String].collect().toSet
    assert(bad == Set("""{"doc_id": 3, "text": "unterminated""", "not json at all"))
    assert(spark.sparkContext.getPersistentRDDs.size == pinnedBefore,
      "uncached read must not pin anything")
    // quarantine is write-ready: the reference's invalid_data/ contract
    val out = s"$dir/invalid"
    r.quarantine.write.mode("overwrite").text(out)
    assert(spark.read.text(out).count() == 2)

    // opt-in persistence: same results, and unpersist() releases the scan
    val p = JsonlSource.readWithQuarantine(spark, dir.toString, schema,
      Some(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    assert(p.clean.count() == 3 && p.quarantine.count() == 2)
    assert(spark.sparkContext.getPersistentRDDs.size > pinnedBefore)
    p.unpersist()
    assert(spark.sparkContext.getPersistentRDDs.size == pinnedBefore,
      "unpersist() must release the shared scan")
  }

  test("OrcSink round-trips with schema intact") {
    val dir = java.nio.file.Files.createTempDirectory("orc").toString
    new OrcSink(dir).append(docs, "corpus")
    val back = spark.read.orc(s"$dir/corpus")
    assert(back.schema == docs.schema)
    assert(back.agg(sum($"doc_id")).as[Long].head() ==
      docs.agg(sum($"doc_id")).as[Long].head())
  }
}
