package graft.aragon

import graft.SparkTestBase

/** S4/S5/S6 end-to-end: the SAME pipeline runs PipelineSpec exercises
  * against a parquet warehouse, here against a live JDBC warehouse on
  * embedded Derby (`jdbc:derby:memory:`). This is the production shape
  * of the reference (PostgreSQL at load_hhs.py:180-185 /
  * load_quality.py:161-166): key probes via spark.read.jdbc (S4),
  * appends through the batched JDBC writer (S5/S6, batchsize=500).
  * Golden counts are identical to the ParquetWarehouse run — the sink
  * is configuration, not pipeline code.
  */
class JdbcPipelineSpec extends SparkTestBase {

  private val hhsDir = "/root/reference/hhs_data"
  private val qualDir = "/root/reference/hospital_data"
  private def available = new java.io.File(hhsDir).isDirectory

  // Keep Derby's derby.log out of the repo root.
  System.setProperty("derby.system.home",
    java.nio.file.Files.createTempDirectory("derby-home").toString)

  private def derbyWarehouse(db: String): AragonPipeline.JdbcWarehouse = {
    val url = s"jdbc:derby:memory:$db;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    // Materialize the database before Spark executors race to open it.
    java.sql.DriverManager.getConnection(url).close()
    new AragonPipeline.JdbcWarehouse(url, props)
  }

  test("HHS pipeline round-trips through Derby with golden counts (S4/S5/S6)") {
    assume(available)
    val tmp = java.nio.file.Files.createTempDirectory("jdbcwh").toString
    val wh = derbyWarehouse("hhs_rt")

    // Fresh database: S4 probe must report no tables.
    assert(wh.table(spark, "hospitals").isEmpty)

    val m1 = AragonPipeline.runHhs(spark, s"$hhsDir/2022-09-23-hhs-data.csv", wh, s"$tmp/q1")
    assert(m1.hospitalsInserted == 4996L && m1.bedsInserted == 4995L)
    // Week 2 dedups against LIVE Derby state read back via S4.
    val m2 = AragonPipeline.runHhs(spark, s"$hhsDir/2022-09-30-hhs-data.csv", wh, s"$tmp/q2")
    assert(m2.hospitalsInserted == 2L && m2.bedsInserted == 4997L)

    // Read-back through spark.read.jdbc: same accumulated state as the
    // ParquetWarehouse golden run.
    assert(wh.table(spark, "hospitals").get.count() == 4998L)
    assert(wh.table(spark, "hospital_bed_information").get.count() == 9992L)
    val beds = wh.table(spark, "hospital_bed_information").get
    // schema survived the round-trip: date key + 8 double metrics
    import org.apache.spark.sql.types.{DateType, DoubleType}
    assert(beds.schema("collection_week").dataType == DateType)
    assert(beds.schema("total_icu_beds_7_day_avg").dataType == DoubleType)
    // quarantine CSV of run 2 is unchanged by the sink choice
    val q2 = spark.read.option("header", "true").csv(s"$tmp/q2/hhs")
    assert(q2.count() == 4995L && q2.columns.length == 127)
  }

  test("Quality pipeline dedups by (facility_id, data_date) against live Derby") {
    assume(available)
    val tmp = java.nio.file.Files.createTempDirectory("jdbcwh").toString
    val wh = derbyWarehouse("quality_rt")
    val f = s"$qualDir/Hospital_General_Information-2021-07.csv"

    val m1 = AragonPipeline.runQuality(spark, f, java.sql.Date.valueOf("2021-07-01"), wh, s"$tmp/q1")
    assert(m1.inserted == 5336L)
    val m2 = AragonPipeline.runQuality(spark, f, java.sql.Date.valueOf("2021-07-01"), wh, s"$tmp/q2")
    assert(m2.inserted == 0L && m2.duplicates == 5336L)
    val m3 = AragonPipeline.runQuality(spark, f, java.sql.Date.valueOf("2021-08-01"), wh, s"$tmp/q3")
    assert(m3.inserted == 5336L)

    val q = wh.table(spark, "hospital_quality_information").get
    assert(q.count() == 10672L)
    // boolean + date types survive Derby round-trip
    import org.apache.spark.sql.types.{BooleanType, DateType}
    assert(q.schema("emergency_services").dataType == BooleanType)
    assert(q.schema("data_date").dataType == DateType)
    // value fidelity spot-check: per-date counts match what went in
    val byDate = q.groupBy("data_date").count().collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(byDate == Map("2021-07-01" -> 5336L, "2021-08-01" -> 5336L))
  }

  test("AtomicJdbcSink: a mid-write failure leaves the target byte-identical and no stage behind") {
    import spark.implicits._
    import org.apache.spark.sql.Row
    val url = "jdbc:derby:memory:atomic_rt;create=true"
    val props = new java.util.Properties()
    java.sql.DriverManager.getConnection(url).close()
    val sink = new graft.sources.AtomicJdbcSink(url, props, numPartitions = 4)

    def tableCount(name: String): Long = {
      val conn = java.sql.DriverManager.getConnection(url, props)
      try {
        val rs = conn.createStatement().executeQuery(s"SELECT count(*) FROM $name")
        rs.next(); rs.getLong(1)
      } finally conn.close()
    }
    def allTables(): Seq[String] = {
      val conn = java.sql.DriverManager.getConnection(url, props)
      try {
        val rs = conn.getMetaData.getTables(null, "APP", "%", Array("TABLE"))
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        while (rs.next()) out += rs.getString("TABLE_NAME")
        out.toSeq
      } finally conn.close()
    }

    // success path: creates the target transactionally, rows land once
    val good = (1L to 100L).map(i => (i, s"row $i")).toDF("id", "v")
    sink.append(good, "atomic_target")
    assert(tableCount("atomic_target") == 100L)

    // poisoned frame: partition 3 throws on first pull — the staged
    // write fails mid-flight after other partitions committed to the
    // STAGE (exactly the partial-load scenario the plain per-partition
    // JdbcSink would leak into the target)
    val base = (101L to 200L).map(i => (i, s"row $i")).toDF("id", "v").repartition(4)
    val poisoned = spark.createDataFrame(
      base.rdd.mapPartitionsWithIndex { (i, it) =>
        if (i == 3) it.map[Row] { _ => Thread.sleep(50); throw new RuntimeException("boom") }
        else it
      }, base.schema)
    intercept[org.apache.spark.SparkException] {
      sink.append(poisoned, "atomic_target")
    }
    // target untouched: same 100 rows, same ids
    assert(tableCount("atomic_target") == 100L)
    // and NOTHING else remains — the partially-written stage is gone
    assert(allTables().filter(_.toLowerCase.contains("stg")).isEmpty,
      s"stage leaked: ${allTables().mkString(", ")}")

    // the sink recovers: a later good load publishes normally
    sink.append(good.withColumn("id", $"id" + 1000L), "atomic_target")
    assert(tableCount("atomic_target") == 200L)
  }
}
