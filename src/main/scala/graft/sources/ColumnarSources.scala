package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC interchange beside the parquet default — the second columnar
  * format a lakehouse ingest layer meets in practice (Hive-era
  * warehouses hand over ORC; this engine reads them natively rather
  * than forcing a pre-conversion pass over 100 TB).
  *
  * Same discipline as TextSources: NEVER infer — the caller declares
  * the expected schema and the read enforces it (a silent upstream
  * column retype must fail the load at the boundary, not propagate).
  * ORC is self-describing, so enforcement is a structural check against
  * the file footer schema instead of TextSources' corrupt-record
  * quarantine (a malformed ORC stripe is a transfer error, not a data
  * row — retry territory, the a17/Jobs layer).
  *
  * Scale notes: Spark's native vectorized ORC reader supports the same
  * predicate pushdown + column pruning contract as parquet (the spec
  * plan-asserts both), and writes honor the session's partitioning —
  * the PartitionedSink layout applies unchanged.
  */
object ColumnarSources {

  /** Write `df` as ORC under `path`, optionally hive-partitioned. */
  def writeOrc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** Read ORC at `path`, enforcing the declared schema: every expected
    * field must exist with the expected type (extra file columns are
    * pruned away by the projection — additive evolution reads fine;
    * missing or retyped fields fail fast with a per-field message). */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val df = spark.read.orc(path)
    // honor the session's resolution mode: under the default
    // case-INsensitive analyzer a Hive-era file with O_ORDERKEY must
    // satisfy a declared o_orderkey, exactly as spark.read would
    val caseSensitive = spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
    def keyOf(n: String) = if (caseSensitive) n else n.toLowerCase(java.util.Locale.ROOT)
    val actual = df.schema.map(f => keyOf(f.name) -> f.dataType).toMap
    val problems = schema.fields.flatMap { f =>
      actual.get(keyOf(f.name)) match {
        case None => Some(s"missing column ${f.name}")
        case Some(t) if t != f.dataType => Some(s"${f.name}: expected ${f.dataType}, file has $t")
        case _ => None
      }
    }
    require(problems.isEmpty, s"ORC schema mismatch at $path: ${problems.mkString("; ")}")
    df.select(schema.fieldNames.map(df.col).toIndexedSeq: _*)
  }
}
