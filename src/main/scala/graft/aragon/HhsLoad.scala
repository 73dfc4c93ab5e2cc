package graft.aragon

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{Cleaning, Dedup, Validate}
import AragonSchema._

/** The HHS weekly-capacity load pipeline (reference load_hhs.py,
  * SURVEY.md §3 E1) re-expressed as ONE declarative Spark job.
  *
  * Reference shape: pandas scan → vectorized clean → row-at-a-time loop
  * with up to 6 SQL round-trips per row (3 dup probes + 3 inserts).
  * Spark shape: single CSV scan (all columns as strings, so quarantined
  * rows keep their ORIGINAL text — the reference re-reads the file for
  * this, load_hhs.py:154; we carry it in the same scan) → typed
  * projections → anti-join dedup vs existing-key snapshots → validate-
  * split → three inserts + quarantine. Narrow except the dedup joins
  * (broadcast of key snapshots) and the intra-file firstPerKey (one
  * shuffle on the key).
  *
  * Semantic deltas vs the reference, knowingly accepted (SURVEY §7.3):
  * per-row insert-order dedup is reproduced deterministically by
  * firstPerKey on file position; per-file txn atomicity becomes
  * per-partition sink txns.
  */
object HhsLoad {

  private val RowId = "__row_id"

  /** Per-file load accounting (reference load_hhs.py:157-161). */
  final case class Metrics(
      totalRows: Long,
      hospitalsInserted: Long, hospitalsDup: Long,
      locationsInserted: Long, locationsDup: Long,
      bedsInserted: Long, bedsDup: Long, bedsInvalid: Long)

  /** The three normalized outputs + quarantine (original text rows). */
  final case class Result(
      hospitals: DataFrame, locations: DataFrame, beds: DataFrame,
      quarantine: DataFrame, metrics: Metrics)

  /** S1/S3: ONE scan — header'd CSV, `NA` literal → null, every column
    * kept as raw string; `__row_id` pins file order for deterministic
    * intra-file dedup and quarantine row recovery.
    */
  def readRaw(spark: SparkSession, csvPath: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("nullValue", "NA")
      .csv(csvPath)
      .withColumn(RowId, monotonically_increasing_id())

  /** P1-P4 over the raw frame: typed view of the 17 consumed columns.
    * Cast-then-sentinel: Spark cast is null-on-failure (stricter than
    * pandas astype(errors='ignore'); all supplied files are numeric in
    * these columns so outputs agree — SURVEY §4).
    */
  def clean(raw: DataFrame): DataFrame = {
    val casted = Cleaning.castColumns(raw, bedMetrics, DoubleType)
    val noSentinel = Cleaning.sentinelToNull(casted, bedMetrics, HhsSentinel)
    Cleaning.parseDates(noSentinel, Seq("collection_week"))
  }

  /** Full E1 pipeline for one weekly file.
    *
    * @param existingHospitalPks snapshot of Hospitals.hospital_pk
    * @param existingLocationFks snapshot of HospitalLocations.hospital_fk
    * @param existingBedKeys     snapshot of (hospital_fk, collection_week)
    */
  def load(spark: SparkSession, csvPath: String,
           existingHospitalPks: DataFrame,
           existingLocationFks: DataFrame,
           existingBedKeys: DataFrame): Result = {

    val raw = readRaw(spark, csvPath)
    val typed = clean(raw).cache()

    // --- Hospitals: key hospital_pk (D1) -------------------------------
    val hospCand = Dedup.firstPerKey(
      typed.select(col("hospital_pk"), col("hospital_name"), col(RowId)),
      Seq("hospital_pk"), col(RowId))
    val hospNew = Dedup.antiDedup(hospCand, Seq("hospital_pk"),
      existingHospitalPks.toDF("hospital_pk")).cache()

    // --- HospitalLocations: key hospital_fk (D1, same probe shape) -----
    val locCand = Dedup.firstPerKey(
      typed.select((col("hospital_pk").as("hospital_fk") +: locationCols.map(col) :+ col(RowId)): _*),
      Seq("hospital_fk"), col(RowId))
    val locNew = Dedup.antiDedup(locCand, Seq("hospital_fk"),
      existingLocationFks.toDF("hospital_fk")).cache()

    // --- HospitalBedInformation: key (fk, week) (D2) + validation (P9) -
    val bedCols = col("hospital_pk").as("hospital_fk") +: col("collection_week") +:
      bedMetrics.map(col) :+ col(RowId)
    val bedCand = Dedup.firstPerKey(typed.select(bedCols: _*),
      Seq("hospital_fk", "collection_week"), col(RowId)).cache()
    val bedFresh = Dedup.antiDedup(bedCand, Seq("hospital_fk", "collection_week"),
      existingBedKeys.toDF("hospital_fk", "collection_week")).cache()
    // reference guard is `int(x) < 0` — truncation toward zero, so
    // -0.5 passes; cast(long) reproduces exactly (load_hhs.py:104-127)
    val bedPreds = bedMetrics.map(c => col(c).isNull || col(c).cast(LongType) >= 0)
    val (bedValid, bedInvalid) = Validate.validateSplit(bedFresh, bedPreds)
    val bedNew = bedValid.cache()
    val bedInvalidC = bedInvalid.cache()

    // --- Quarantine: ORIGINAL rows of every dropped index (D4/S7) ------
    val keptIds = hospNew.select(RowId)
      .unionAll(locNew.select(RowId))
      .unionAll(bedNew.select(RowId))
    val allIds = typed.select(RowId)
    // a row is quarantined when ANY of its three target inserts dropped it:
    // i.e. it appears fewer than 3 times among kept ids
    val quarantineIds = allIds.join(
      keptIds.groupBy(RowId).agg(count(lit(1)).as("__kept")).filter(col("__kept") === 3),
      Seq(RowId), "left_anti")
    val quarantine = raw.join(quarantineIds, Seq(RowId), "left_semi").drop(RowId)

    val total = typed.count()
    val nHosp = hospNew.count()
    val nLoc = locNew.count()
    val nBedFresh = bedFresh.count()
    val metrics = Metrics(
      totalRows = total,
      hospitalsInserted = nHosp, hospitalsDup = total - nHosp,
      locationsInserted = nLoc, locationsDup = total - nLoc,
      bedsInserted = bedNew.count(),
      bedsDup = total - nBedFresh, // in-file later occurrences + existing keys
      bedsInvalid = bedInvalidC.count())

    // S8: load accounting to the engine log (reference: rotating-file
    // logger + stdout summary, load_hhs.py:157-161)
    org.slf4j.LoggerFactory.getLogger(getClass).info(
      s"HHS load $csvPath: rows=${metrics.totalRows} " +
        s"hospitals=+${metrics.hospitalsInserted}/${metrics.hospitalsDup}dup " +
        s"locations=+${metrics.locationsInserted}/${metrics.locationsDup}dup " +
        s"beds=+${metrics.bedsInserted}/${metrics.bedsDup}dup/${metrics.bedsInvalid}invalid")

    Result(
      hospitals = hospNew.drop(RowId),
      locations = locNew.drop(RowId),
      beds = bedNew.drop(RowId),
      quarantine = quarantine,
      metrics = metrics)
  }
}
