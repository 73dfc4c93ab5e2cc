package graft.aragon

import graft.SparkTestBase
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** End-to-end golden tests: run the E1/E2 pipelines over the reference's
  * own checked-in datasets (read-only at /root/reference) and assert the
  * exact insert/duplicate/invalid accounting the reference's loaders
  * would log (SURVEY.md §5) — numbers independently derived from the
  * CSVs:
  *   - 5 weekly HHS files, unique hospital_pk per file, one week each;
  *     new hospitals per file: 4996, 2, 1, 1, 2 (5002 total);
  *     exactly one row (file 1) fails the negative-bed-metric guard.
  *   - 3 CMS snapshots, unique facility ids, all rows insert.
  */
class AragonGoldenSpec extends SparkTestBase {

  private val hhsDir = "/root/reference/hhs_data"
  private val qualDir = "/root/reference/hospital_data"

  private def emptyDf(fields: (String, DataType)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(fields.map { case (n, t) => StructField(n, t) }))

  private def available: Boolean = new java.io.File(hhsDir).isDirectory

  test("E1: five sequential weekly HHS loads reproduce reference accounting") {
    assume(available)
    val weeks = Seq("2022-09-23", "2022-09-30", "2022-10-07", "2022-10-14", "2022-10-21")
    val expectedNew = Seq(4996L, 2L, 1L, 1L, 2L)
    val expectedTotal = Seq(4996L, 4997L, 4996L, 4995L, 4985L)
    // file 1 has the single negative-metric row
    val expectedInvalid = Seq(1L, 0L, 0L, 0L, 0L)

    var hospPks = emptyDf("hospital_pk" -> StringType)
    var locFks = emptyDf("hospital_fk" -> StringType)
    var bedKeys = emptyDf("hospital_fk" -> StringType, "collection_week" -> DateType)
    var bedsTotal = 0L

    weeks.zipWithIndex.foreach { case (w, i) =>
      val res = HhsLoad.load(spark, s"$hhsDir/$w-hhs-data.csv", hospPks, locFks, bedKeys)
      val m = res.metrics
      assert(m.totalRows == expectedTotal(i), s"week $w total")
      assert(m.hospitalsInserted == expectedNew(i), s"week $w hospitals")
      assert(m.locationsInserted == expectedNew(i), s"week $w locations")
      assert(m.bedsDup == 0L, s"week $w beds dups")
      assert(m.bedsInvalid == expectedInvalid(i), s"week $w beds invalid")
      assert(m.bedsInserted == m.totalRows - m.bedsInvalid, s"week $w beds inserted")
      bedsTotal += m.bedsInserted

      hospPks = hospPks.unionAll(res.hospitals.select("hospital_pk"))
      locFks = locFks.unionAll(res.locations.select("hospital_fk"))
      bedKeys = bedKeys.unionAll(res.beds.select("hospital_fk", "collection_week"))
    }

    assert(hospPks.count() == 5002L)
    assert(bedsTotal == 24968L)
  }

  test("E1: re-loading the same file is a full-duplicate no-op") {
    assume(available)
    val f = s"$hhsDir/2022-09-23-hhs-data.csv"
    val first = HhsLoad.load(spark, f,
      emptyDf("hospital_pk" -> StringType),
      emptyDf("hospital_fk" -> StringType),
      emptyDf("hospital_fk" -> StringType, "collection_week" -> DateType))
    val again = HhsLoad.load(spark, f,
      first.hospitals.select("hospital_pk"),
      first.locations.select("hospital_fk"),
      first.beds.select("hospital_fk", "collection_week"))
    assert(again.metrics.hospitalsInserted == 0L)
    assert(again.metrics.hospitalsDup == 4996L)
    assert(again.metrics.locationsInserted == 0L)
    // the one invalid row was never inserted, so its key is "fresh" again
    assert(again.metrics.bedsDup == 4995L)
    assert(again.metrics.bedsInserted == 0L)
    assert(again.metrics.bedsInvalid == 1L)
    // every row was dropped by at least one target → all quarantined
    assert(again.quarantine.count() == 4996L)
  }

  test("E2: three CMS snapshots load fully; same-date re-load all-dups") {
    assume(available)
    val snaps = Seq(
      ("Hospital_General_Information-2021-07.csv", "2021-07-01", 5336L),
      ("Hospital_General_Information-2022-01.csv", "2022-01-01", 5306L),
      ("Hospital_General_Information-2022-10.csv", "2022-10-01", 5307L))
    var keys = emptyDf("facility_id" -> StringType, "data_date" -> DateType)
    snaps.foreach { case (f, d, n) =>
      val res = QualityLoad.load(spark, s"$qualDir/$f", java.sql.Date.valueOf(d), keys)
      assert(res.metrics.totalRows == n, s"$f total")
      assert(res.metrics.inserted == n, s"$f inserted")
      assert(res.metrics.duplicates == 0L, s"$f dups")
      assert(res.metrics.invalid == 0L, s"$f invalid")
      keys = keys.unionAll(res.quality.select("facility_id", "data_date"))
    }
    // re-load snapshot 1 at its own date → every row is a duplicate
    val re = QualityLoad.load(spark, s"$qualDir/${snaps.head._1}",
      java.sql.Date.valueOf(snaps.head._2), keys)
    assert(re.metrics.inserted == 0L)
    assert(re.metrics.duplicates == snaps.head._3)
    assert(re.quarantine.count() == snaps.head._3)
  }

  test("E3: the nine reporting queries run over loaded tables") {
    assume(available)
    // load week 1+2 and snapshot 3 (enough signal, keeps the test fast)
    val empty3 = (emptyDf("hospital_pk" -> StringType),
      emptyDf("hospital_fk" -> StringType),
      emptyDf("hospital_fk" -> StringType, "collection_week" -> DateType))
    val r1 = HhsLoad.load(spark, s"$hhsDir/2022-09-23-hhs-data.csv",
      empty3._1, empty3._2, empty3._3)
    val r2 = HhsLoad.load(spark, s"$hhsDir/2022-09-30-hhs-data.csv",
      r1.hospitals.select("hospital_pk"), r1.locations.select("hospital_fk"),
      r1.beds.select("hospital_fk", "collection_week"))
    val hospitals = r1.hospitals.unionAll(r2.hospitals).select("hospital_pk", "hospital_name").cache()
    val locations = r1.locations.unionAll(r2.locations).drop("__row_id").cache()
    val beds = r1.beds.unionAll(r2.beds).cache()
    val quality = QualityLoad.load(spark,
      s"$qualDir/Hospital_General_Information-2022-10.csv",
      java.sql.Date.valueOf("2022-10-01"),
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("facility_id", StringType), StructField("data_date", DateType))))
    ).quality.cache()

    // Q1/Q2
    assert(Reporting.weeklyRecords(beds, "2022-09-30").head().getLong(0) == 4997L)
    val prior = Reporting.weeklyRecordsPrior(beds, "2022-09-30").collect()
    assert(prior.length == 1 && prior(0).getLong(1) == 4995L)
    // Q3/Q4 — values independently derived in DuckDB from the raw CSVs
    // (sentinel→NULL, negative-guard drop, decimal-exact rounded sums)
    val q3 = Reporting.bedSummaryAt(beds, "2022-09-23").head()
    assert(q3.getDouble(0) == 413559.5)  // available adult
    assert(q3.getDouble(1) == 39605.5)   // available pediatric
    assert(q3.getDouble(2) == 34825.0)   // used adult
    assert(q3.getDouble(3) == 27778.1)   // used pediatric
    assert(q3.getDouble(4) == 25600.6)   // used covid
    assert(Reporting.bedSummaryRecent4(beds).count() == 2L)
    // Q5
    val q5 = Reporting.ratingBedUse(quality, beds).collect()
    assert(q5.nonEmpty && q5.forall(r => r.isNullAt(1) || r.getDouble(1) > 0))
    // Q6 — pinned against the independent DuckDB derivation
    val q6 = Reporting.totalBedUsage(beds, "2022-09-30").collect()
    assert(q6.map(r => (r.getDouble(1), r.getDouble(2))).toSeq ==
      Seq((115831.3, 25600.6), (116608.3, 24142.5)))
    // Q7
    val q7 = Reporting.emergencyTop20(quality, hospitals, locations).collect()
    assert(q7.length == 20 && q7.head.getLong(1) >= q7.last.getLong(1))
    // Q8
    val q8 = Reporting.ownershipBedUse(quality, beds, "Proprietary").collect()
    assert(q8.length == 2 && q8.forall(_.getString(0) == "Proprietary"))
    // Q9
    val q9 = Reporting.topBottomStates(quality, locations, "2022-10-01").collect()
    assert(q9.length == 20)
    val tops = q9.filter(_.getString(2) == "top").map(_.getDouble(1))
    val bottoms = q9.filter(_.getString(2) == "bottom").map(_.getDouble(1))
    assert(tops.min >= bottoms.max)
  }
}
