package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch keyed MERGE/upsert sink (r6 verdict #6) — the reference's
  * update-control write-back (update-control.py:25-37) as a reusable
  * SINK, not just a computed frame: a2/a9 build merge FRAMES, and
  * `StreamingOps.compactStream` does the incremental foreachBatch
  * variant; this is the batch-job seam both share.
  *
  * Semantics (SQL MERGE with latest-wins):
  *  - key present only in target  → row kept,
  *  - key present only in updates → row inserted,
  *  - key in both → the row with the greatest `orderCols` tuple wins;
  *    ties (and `orderCols = Nil`) resolve to the UPDATES side — the
  *    "WHEN MATCHED THEN UPDATE" default.
  *
  * Durability is delegated to a pluggable [[TableFormat]]: the default
  * [[RenameTableFormat]] keeps the original tmp+rename swap (atomic on
  * local/HDFS, one non-atomic crash window between the two renames,
  * recovered on the next read); [[CommitLogTableFormat]] is the
  * object-store-safe log-append protocol with NO window — pass it for
  * concurrent readers or rename-less stores. The merge plan is
  * format-independent.
  *
  * Idempotence: re-running the SAME merge is a fixed point — latest-
  * wins over (target ∪ updates) with updates-preference is stable once
  * the updates are already in the target — so a retried job (the
  * reference's Step Function retry semantics) cannot corrupt the
  * table. Spec-asserted in SourcesStreamingSpec.
  *
  * Scale shape: ONE key-partitioned shuffle of |target| + |updates|
  * rows (row_number over the key window); no broadcast assumption on
  * either side (both are table-sized in the general case). At 100 TB,
  * pre-partition the stored table on the key (BucketedTables) so the
  * target side's exchange disappears and AQE skew-handles hot keys. */
object Sinks {

  /** Pure merge plan: latest row per key across target ∪ updates,
    * updates winning ties. Exposed separately so jobs can compose it
    * (e.g. dry-run audits) without the write. */
  def mergePlan(target: DataFrame, updates: DataFrame,
                keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "mergeByKey needs at least one key column")
    // updates outrank target on equal order keys: priority 1 vs 0
    val t = target.withColumn("__pri", lit(0))
    val u = updates.withColumn("__pri", lit(1))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc) :+ col("__pri").desc: _*)
    t.unionByName(u)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__pri")
  }

  /** MERGE `updates` into the table at `targetDir` in place. Creates
    * the table if absent. `token` names the commit attempt so
    * concurrent merges to DIFFERENT tables never collide (concurrent
    * merges to the same table are the caller's lock to take — the
    * format's optimistic commit detects a violated lock). Crash
    * recovery and atomic visibility are the format's contract
    * ([[TableFormat]]). */
  def mergeByKey(spark: SparkSession, targetDir: String, updates: DataFrame,
                 keyCols: Seq[String], orderCols: Seq[String] = Nil,
                 token: String = "merge",
                 format: TableFormat = RenameTableFormat): Unit = {
    val merged = format.read(spark, targetDir) match {
      case Some(target) => mergePlan(target, updates, keyCols, orderCols)
      case None         => mergePlan(updates.limit(0), updates, keyCols, orderCols)
    }
    format.commit(spark, targetDir, merged, token)
  }

  /** [[mergeByKey]] under OPTIMISTIC concurrency: rides
    * [[CommitLogTableFormat.commitWithRetry]], so a merge that loses a
    * commit race re-reads the winner's snapshot and re-merges instead
    * of aborting — concurrent merge sinks to the same table both land
    * without an external lock. Correct because the merge IS the rebase:
    * latest-per-key over (current ∪ updates) applied to the winner's
    * result preserves both writers' rows (the merge is commutative up
    * to the order keys, and a replay is a fixed point — the same
    * idempotence the retry contract already relies on). */
  def mergeByKeyRetrying(spark: SparkSession, targetDir: String, updates: DataFrame,
                         keyCols: Seq[String], orderCols: Seq[String] = Nil,
                         token: String = "merge", maxAttempts: Int = 5): Unit =
    CommitLogTableFormat.commitWithRetry(spark, targetDir,
      {
        case Some(target) => mergePlan(target, updates, keyCols, orderCols)
        case None         => mergePlan(updates.limit(0), updates, keyCols, orderCols)
      },
      token, maxAttempts)
}

/** Checked-rename helper shared by the tmp+swap sinks (mergeByKey,
  * StreamingOps.profileStream): HDFS-style rename reports failure via
  * a boolean, and a silently-false rename is a data-loss bug. */
object Swap {
  def renameOrThrow(fs: org.apache.hadoop.fs.FileSystem,
                    src: Path, dst: Path): Unit =
    if (!fs.rename(src, dst))
      throw new java.io.IOException(s"atomic-swap rename failed: $src -> $dst")
}
