package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, from_json, trim}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

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

  /** A quarantine-split read. `clean` has exactly the declared
    * schema's columns for every parseable line; `quarantine` is one
    * raw-text line per unparseable record, write-ready for an
    * `invalid_data/` sink. When the read was opened with a
    * StorageLevel, call [[unpersist]] once both sides are consumed —
    * the shared scan otherwise stays pinned for the session lifetime
    * (exactly what a 100 TB ingest must not do).
    */
  final case class QuarantinedRead(clean: DataFrame, quarantine: DataFrame,
                                   private val shared: Option[DataFrame]) {
    def unpersist(): Unit = shared.foreach(_.unpersist())
  }

  /** Split a JSONL path into (clean, quarantine) via a text scan +
    * `from_json` with a corrupt-record field. (A raw `.json(path)`
    * scan cannot serve the quarantine side uncached: Spark disallows
    * queries that reference ONLY the internal corrupt column of a raw
    * JSON scan — the text-scan formulation sidesteps that and gives
    * byte-faithful raw lines for the quarantine file.)
    *
    * Persistence is the CALLER's choice via `storageLevel`:
    *   - `None` (default): nothing is cached. Each side re-scans the
    *     source — the right trade at ingest scale, where both sides
    *     are written once and the corpus must not occupy the executor
    *     cache for the session lifetime.
    *   - `Some(level)`: the shared parsed scan persists at `level`
    *     (one parse feeding both sides); release it with
    *     [[QuarantinedRead.unpersist]] when done.
    */
  def readWithQuarantine(spark: SparkSession, path: String,
                         schema: StructType,
                         storageLevel: Option[StorageLevel] = None): QuarantinedRead = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    val withCorrupt = StructType(
      schema.fields :+ StructField(CorruptCol, StringType, nullable = true))
    val parsed = spark.read.text(path)
      // the json reader skips blank lines; match that contract
      .filter(trim(col("value")) =!= "")
      .select(col("value"),
        from_json(col("value"), withCorrupt,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> CorruptCol)).as("__r"))
    val raw = storageLevel.fold(parsed)(parsed.persist)
    val clean = raw.filter(col(s"__r.$CorruptCol").isNull)
      .select(schema.fieldNames.map(f => col(s"__r.$f").as(f)).toSeq: _*)
    val quarantine = raw.filter(col(s"__r.$CorruptCol").isNotNull)
      .select(col("value").as("raw_line"))
    QuarantinedRead(clean, quarantine, storageLevel.map(_ => raw))
  }
}
