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
  * Durability: merged output is written to `<target>.tmp-<token>` then
  * swapped via rename — atomic on local/HDFS filesystems, one
  * non-atomic window between the two renames (same contract as
  * compactStream, documented there). On object stores or with
  * concurrent readers, swap the rename for a table format with atomic
  * commit (Delta/Iceberg); the merge plan is the seam and is identical.
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

  /** MERGE `updates` into the parquet table at `targetDir` in place.
    * Creates the table if absent. `token` names the tmp/backup dirs so
    * concurrent merges to DIFFERENT tables never collide (concurrent
    * merges to the same table are the caller's lock to take, exactly
    * as with a table format's optimistic commit). */
  def mergeByKey(spark: SparkSession, targetDir: String, updates: DataFrame,
                 keyCols: Seq[String], orderCols: Seq[String] = Nil,
                 token: String = "merge"): Unit = {
    val snap = new Path(targetDir)
    val fs = snap.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(s"$targetDir.old-$token")
    // Crash-window recovery: a failure between the two swap renames
    // below leaves the table only under .old-<token>. Restore it before
    // reading, or the merge would silently rebuild from updates alone.
    if (!fs.exists(snap) && fs.exists(old)) Swap.renameOrThrow(fs, old, snap)
    val merged =
      if (fs.exists(snap))
        mergePlan(spark.read.parquet(targetDir), updates, keyCols, orderCols)
      else mergePlan(updates.limit(0), updates, keyCols, orderCols)
    val tmp = new Path(s"$targetDir.tmp-$token")
    merged.write.mode("overwrite").parquet(tmp.toString)
    // rename returns false (no exception) when the dest exists from a
    // prior failed attempt or on RawLocalFileSystem quirks — an ignored
    // false leaves a stale snapshot while the caller believes the merge
    // committed, so every rename result is checked.
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(snap)) Swap.renameOrThrow(fs, snap, old)
    Swap.renameOrThrow(fs, tmp, snap)
    fs.delete(old, true)
    ()
  }
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
