package graft.aragon

/** Column vocabulary of the hospital domain (SURVEY.md §1.1, DDL in
  * reference design_table_schema.ipynb cells 0-3).
  */
object AragonSchema {

  /** The 8 FLOAT bed metrics of HospitalBedInformation (ipynb cell-2),
    * in DDL order — also the columns guarded by the non-negativity
    * validation (reference load_hhs.py:104-127).
    */
  val bedMetrics: Seq[String] = Seq(
    "all_adult_hospital_beds_7_day_avg",
    "all_pediatric_inpatient_beds_7_day_avg",
    "all_adult_hospital_inpatient_bed_occupied_7_day_coverage",
    "all_pediatric_inpatient_bed_occupied_7_day_avg",
    "total_icu_beds_7_day_avg",
    "icu_beds_used_7_day_avg",
    "inpatient_beds_used_covid_7_day_avg",
    "staffed_icu_adult_patients_confirmed_covid_7_day_avg")

  /** HospitalLocations payload columns (ipynb cell-1), minus the fk. */
  val locationCols: Seq[String] = Seq(
    "state", "address", "city", "zip", "fips_code", "geocoded_hospital_address")

  /** The 5 CMS quality columns consumed by the loader, as they appear in
    * the source CSV header (reference load_quality.py:98-99).
    */
  val qualitySourceCols: Seq[String] = Seq(
    "Facility ID", "Hospital overall rating", "Emergency Services",
    "Hospital Type", "Hospital Ownership")

  /** Numeric sentinel in the HHS feed (reference load_hhs.py:49). */
  val HhsSentinel: Double = -999999d
}
