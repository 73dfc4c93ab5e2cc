package graft.aragon

import graft.SparkTestBase

/** E1/E2 through the Warehouse/sink abstraction: sequential weekly
  * loads against a parquet warehouse, verifying persisted table state
  * and quarantine files — the full production shape minus the JDBC URL.
  */
class PipelineSpec extends SparkTestBase {

  private val hhsDir = "/root/reference/hhs_data"
  private val qualDir = "/root/reference/hospital_data"
  private def available = new java.io.File(hhsDir).isDirectory

  test("HHS pipeline persists accumulated state across weekly runs") {
    assume(available)
    val tmp = java.nio.file.Files.createTempDirectory("wh").toString
    val wh = new AragonPipeline.ParquetWarehouse(s"$tmp/tables")

    val m1 = AragonPipeline.runHhs(spark, s"$hhsDir/2022-09-23-hhs-data.csv", wh, s"$tmp/q1")
    assert(m1.hospitalsInserted == 4996L && m1.bedsInserted == 4995L)
    val m2 = AragonPipeline.runHhs(spark, s"$hhsDir/2022-09-30-hhs-data.csv", wh, s"$tmp/q2")
    assert(m2.hospitalsInserted == 2L && m2.bedsInserted == 4997L)

    assert(wh.table(spark, "hospitals").get.count() == 4998L)
    assert(wh.table(spark, "hospital_bed_information").get.count() == 9992L)
    // quarantine CSV of run 2 holds the 4995 dup rows with original text
    val q2 = spark.read.option("header", "true").csv(s"$tmp/q2/hhs")
    assert(q2.count() == 4995L)
    assert(q2.columns.length == 127) // full original width preserved
  }

  test("Quality pipeline persists and dedups by (facility_id, data_date)") {
    assume(available)
    val tmp = java.nio.file.Files.createTempDirectory("wh").toString
    val wh = new AragonPipeline.ParquetWarehouse(s"$tmp/tables")
    val f = s"$qualDir/Hospital_General_Information-2021-07.csv"

    val m1 = AragonPipeline.runQuality(spark, f, java.sql.Date.valueOf("2021-07-01"), wh, s"$tmp/q1")
    assert(m1.inserted == 5336L)
    // same file, same date → all dups; different date → all insert
    val m2 = AragonPipeline.runQuality(spark, f, java.sql.Date.valueOf("2021-07-01"), wh, s"$tmp/q2")
    assert(m2.inserted == 0L && m2.duplicates == 5336L)
    val m3 = AragonPipeline.runQuality(spark, f, java.sql.Date.valueOf("2021-08-01"), wh, s"$tmp/q3")
    assert(m3.inserted == 5336L)
    assert(wh.table(spark, "hospital_quality_information").get.count() == 10672L)
  }
}
