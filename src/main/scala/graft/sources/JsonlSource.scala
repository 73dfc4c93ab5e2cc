package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSONL ingestion with quarantine — the read-side complement of
  * [[JsonlSink]], and the same contract the reference's CSV loaders
  * give malformed rows (`load_hhs.py` → the invalid_data CSVs): a bad
  * line must never kill a 100 TB ingest NOR silently disappear.
  *
  * Spark's PERMISSIVE mode parses what it can and routes unparseable
  * lines to a corrupt-record column; `readWithQuarantine` splits that
  * into (clean rows, quarantined raw lines) in ONE scan — schema is
  * caller-declared (schema-on-read inference over 100 TB is a full
  * extra pass and nondeterministic under sampling; declared schemas
  * are also what keep downstream plans stable).
  */
object JsonlSource {

  val CorruptCol = "_corrupt_record"

  /** (clean, quarantine): `clean` has exactly `schema`'s columns for
    * every parseable line; `quarantine` is one raw-text line per
    * unparseable record, write-ready for an `invalid_data/` sink.
    */
  def readWithQuarantine(spark: SparkSession, path: String,
                         schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    val withCorrupt = StructType(
      schema.fields :+ StructField(CorruptCol, StringType, nullable = true))
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      // PERMISSIVE quirk: the corrupt column is only populated when
      // the parsed frame is materialized with it selected — keep the
      // split downstream of one shared scan
      .cache()
    val clean = raw.filter(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val quarantine = raw.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    (clean, quarantine)
  }
}
