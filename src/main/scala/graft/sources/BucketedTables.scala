package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support — the co-located-join half of the engine's
  * 100 TB join strategy (SURVEY.md §5): two fact tables bucketed on the
  * same key into the same bucket count join WITHOUT any exchange — the
  * shuffle is paid ONCE at write time and amortized over every
  * subsequent join/aggregation on that key. This is the right layout
  * for fact tables that are repeatedly joined (orders ⨝ lineitem):
  * at 100 TB a single avoided shuffle dwarfs every other plan choice.
  *
  * Bucketing requires the session catalog (`saveAsTable`); bucket
  * metadata lives in the metastore, so `spark.table(name)` exposes the
  * bucketed output partitioning to the planner.
  */
object BucketedTables {

  /** Write `df` as a bucketed+sorted managed table on `key`. Sorting
    * within buckets additionally enables sort-merge joins with no sort
    * step. Overwrites any previous version (idempotent re-runs). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-key bucketed tables as a sort-merge join —
    * planner-verified shuffle-free AND sort-free (the spec asserts zero
    * Exchange nodes). The merge hint pins the join strategy: bucketing
    * exists for large-large fact joins, where a broadcast (which would
    * ignore the bucketed layout) is impossible anyway. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   leftKey: String, rightKey: String): DataFrame =
    spark.table(left).hint("merge").join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))
}
