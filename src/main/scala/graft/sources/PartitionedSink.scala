package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Hive-partitioned parquet sink implementing the reference's
  * staging→raw layout (process-staging.py:38-44: source/.../y/m/d/h).
  *
  * Scale design: dynamic partition overwrite makes re-runs idempotent
  * (the Step Function's retry semantics); partitionBy keeps one
  * directory per (source, y, m, d) so downstream scans prune partitions
  * from the path alone.
  */
object PartitionedSink {

  /** Add the derived partition columns from an event-time column. */
  def withDatePartitions(df: DataFrame, tsCol: String): DataFrame =
    df.withColumn("y", year(col(tsCol)))
      .withColumn("m", month(col(tsCol)))
      .withColumn("d", dayofmonth(col(tsCol)))
      .withColumn("h", hour(col(tsCol)))

  /** Write df under outDir/source=…/y=…/m=…/d=…/ (hour kept as a data
    * column — hourly dirs would over-partition at 100 TB: millions of
    * tiny files; day-level dirs + row-group stats on h prune fine). */
  def promote(df: DataFrame, outDir: String, sourceCol: String, tsCol: String): Unit =
    withDatePartitions(df, tsCol)
      .withColumn("source", col(sourceCol))
      .write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("source", "y", "m", "d")
      .parquet(outDir)

  /** [[promote]] with a bounded file count per partition directory —
    * the small-files guard: without it, every upstream task writes one
    * file into every partition dir it touches, so a 10 000-task job
    * over 1 000 (source, day) partitions can emit 10 M tiny files.
    * Repartitioning on (partition cols, pmod(hash, filesPerDir))
    * routes each partition dir's rows to exactly `filesPerDir` tasks
    * → ≤ filesPerDir files per dir, sized by the data, one shuffle. */
  def promoteCompacted(df: DataFrame, outDir: String, sourceCol: String, tsCol: String,
                       filesPerDir: Int = 4): Unit = {
    val parted = withDatePartitions(df, tsCol).withColumn("source", col(sourceCol))
    val salt = pmod(hash(parted.columns.map(col): _*), lit(filesPerDir))
    parted
      .repartition(col("source"), col("y"), col("m"), col("d"), salt)
      .write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("source", "y", "m", "d")
      .parquet(outDir)
  }
}
