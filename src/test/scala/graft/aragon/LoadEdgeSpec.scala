package graft.aragon

import graft.SparkTestBase
import java.nio.file.Files

/** Edge semantics of the two loaders that the reference exercises only
  * implicitly: boolean-column insert rejection (quality) and multi-file
  * deterministic dedup order (HHS).
  */
class LoadEdgeSpec extends SparkTestBase {

  import spark.implicits._

  private def write(path: java.nio.file.Path, lines: String*): String = {
    Files.write(path, String.join("\n", lines: _*).getBytes("UTF-8"))
    path.toString
  }

  test("Quality: emergency_services outside {Yes,No,null} goes to the invalid split") {
    // The reference maps 'Not Available' → 0 (whole-frame replace,
    // load_quality.py:103); the boolean-column INSERT then rejects that
    // row into quarantine via the per-row fallback (:57-78). Here the
    // pre-validation routes it to invalid — same net row placement.
    val dir = Files.createTempDirectory("qedge")
    val csv = write(dir.resolve("q.csv"),
      "Facility ID,Hospital overall rating,Emergency Services,Hospital Type,Hospital Ownership",
      "F1,3,Yes,Acute,Private",
      "F2,2,Not Available,Acute,Private",
      "F3,4,,Acute,Private")
    val existing = Seq.empty[(String, java.sql.Date)].toDF("facility_id", "data_date")
    val r = QualityLoad.load(spark, csv, java.sql.Date.valueOf("2022-01-01"), existing)
    assert(r.metrics.totalRows == 3 && r.metrics.inserted == 2 && r.metrics.invalid == 1)
    val kept = r.quality.select("facility_id").as[String].collect().toSet
    assert(kept == Set("F1", "F3")) // empty string → null → insertable NULL
    val quarantined = r.quarantine.select("Facility ID").as[String].collect().toSet
    assert(quarantined == Set("F2"))
    r.unpersist()
  }

  test("HHS: multi-file input dedups deterministically in (file-name, file-order)") {
    val dir = Files.createTempDirectory("hedge")
    val header = ("hospital_pk,hospital_name,state,address,city,zip,fips_code," +
      "geocoded_hospital_address,collection_week," + AragonSchema.bedMetrics.mkString(","))
    def row(name: String, v: Int) =
      s"H1,$name,PA,addr,city,15213,42003,POINT (0 0),2022-01-07," +
        AragonSchema.bedMetrics.map(_ => v.toString).mkString(",")
    // b.csv holds the "later" duplicate — alphabetical file order must win
    write(dir.resolve("b.csv"), header, row("fromB", 2))
    write(dir.resolve("a.csv"), header, row("fromA", 1))
    val noPks = Seq.empty[String].toDF("hospital_pk")
    val noBeds = Seq.empty[(String, java.sql.Date)].toDF("hospital_pk", "collection_week")
    val r = HhsLoad.load(spark, s"$dir/*.csv", noPks, noPks, noBeds)
    assert(r.metrics.totalRows == 2 && r.metrics.hospitalsInserted == 1 &&
      r.metrics.bedsInserted == 1)
    assert(r.hospitals.select("hospital_name").as[String].head() == "fromA")
    assert(r.beds.select(AragonSchema.bedMetrics.head).as[Double].head() == 1.0)
    r.unpersist()
  }
}
