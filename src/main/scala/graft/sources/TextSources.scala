package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-format ingestion beyond parquet: JSON-lines and CSV with
  * EXPLICIT schemas and corrupt-record CAPTURE.
  *
  * The reference's staging area holds raw scraped payloads (JSON API
  * responses, CSV control tables — collect-data.py stores both), so a
  * user switching to this engine ingests those formats on day one. Two
  * rules a 100 TB ingest needs, both encoded here:
  *
  *  - NEVER infer schemas: inference is a full extra pass over the
  *    data before the real read, and a schema drift silently retypes
  *    columns downstream. Callers pass the expected StructType.
  *  - NEVER drop or die on bad records: PERMISSIVE mode routes
  *    malformed lines into a corrupt-record column, and the split
  *    below quarantines them (the a9 error-writeback pattern applied
  *    at ingest) while good rows continue. A single mangled line in a
  *    terabyte staging load must cost one quarantined row, not a job.
  *
  * The one-pass contract: `split` persists the parsed frame before
  * filtering — Spark disallows filtering on the corrupt column of a
  * freshly-read JSON/CSV frame (the parser would need re-running), and
  * without the persist the good/bad branches would each re-read and
  * re-parse the files. Callers unpersist via the returned handle.
  */
object TextSources {

  /** Parsed staging load: good rows, quarantined raw lines, and the
    * persisted parse frame to release when done. */
  final case class ParsedLoad(good: DataFrame, quarantine: DataFrame, parsed: DataFrame) {
    def release(): Unit = parsed.unpersist()
  }

  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else schema.add(StructField(CorruptCol, StringType, nullable = true))

  private def split(df: DataFrame, schema: StructType): ParsedLoad = {
    val parsed = df.persist()
    val good = parsed.filter(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    val bad = parsed.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
      .withColumn("status", lit("error"))
    ParsedLoad(good, bad, parsed)
  }

  /** JSON-lines read with the declared schema; malformed lines (bad
    * JSON or wrong types) quarantine instead of failing the load. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): ParsedLoad =
    split(
      spark.read
        .schema(withCorrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CorruptCol)
        .json(path),
      schema)

  /** CSV read (with header) under the same contract. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): ParsedLoad =
    split(
      spark.read
        .schema(withCorrupt(schema))
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CorruptCol)
        .csv(path),
      schema)
}
