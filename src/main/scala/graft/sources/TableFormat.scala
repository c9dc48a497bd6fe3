package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pluggable snapshot-table commit protocol — the seam the tmp+rename
  * sinks documented ("on object stores or with concurrent readers,
  * swap the rename for a table format with atomic commit") now AS
  * working, tested code instead of a caveat. A TableFormat owns how a
  * logical table's current snapshot is resolved and how a full
  * replacement snapshot becomes visible; the MERGE/maintenance plans
  * (Sinks.mergePlan, Profiles.merge, compactStream's latest-per-key)
  * are format-independent and compose with any implementation.
  *
  * Contract:
  *  - `read` returns the last successfully committed snapshot (None
  *    before the first commit), recovering from any crash a prior
  *    `commit` of the SAME format may have left behind.
  *  - `commit` replaces the table content with `df`. After it returns,
  *    `read` sees exactly `df`; if the process dies anywhere inside
  *    `commit`, a later `read` sees either the previous snapshot or
  *    the new one — never a mixture, never partial files.
  *  - Concurrent commits to the SAME table are the caller's lock to
  *    take (the batch sinks run single-writer; streaming sinks are
  *    serialized by the checkpoint). [[CommitLogTableFormat]] detects
  *    a lost race and throws [[ConcurrentCommitException]] instead of
  *    silently dropping the other writer's commit — optimistic
  *    concurrency, the Delta/Iceberg posture.
  *
  * Reference: this layer re-expresses what the reference trusts S3
  * copy+delete to do for staged objects (process-staging.py:47-55 —
  * which is exactly the non-atomic window RenameTableFormat still
  * has, and CommitLogTableFormat closes). */
trait TableFormat {

  /** The current committed snapshot of `table`, or None if nothing has
    * been committed yet. Performs crash recovery if needed. */
  def read(spark: SparkSession, table: String): Option[DataFrame]

  /** Atomically replace `table`'s content with `df`. `token` names the
    * attempt (batch id / job token): retrying a failed commit with the
    * SAME token must be safe, and tokens of concurrent commits to
    * DIFFERENT tables never collide. */
  def commit(spark: SparkSession, table: String, df: DataFrame, token: String): Unit

  protected def fsOf(spark: SparkSession, table: String): FileSystem =
    new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
}

/** Another writer committed between this writer's read and commit.
  * The caller re-reads and re-derives its snapshot (or escalates —
  * the sinks here are single-writer by contract, so seeing this means
  * the caller's lock was violated). */
class ConcurrentCommitException(msg: String) extends java.io.IOException(msg)

/** The original tmp+rename swap as a TableFormat: the table IS a
  * plain parquet directory at `table` (any outside reader can
  * `spark.read.parquet` it), committed by write-to-tmp → rename the
  * live dir aside → rename tmp in.
  *
  * Durability: atomic per rename on local/HDFS filesystems, with ONE
  * non-atomic window between the two renames; a crash inside the
  * window leaves the table only under `.old-<token>`, which `read`
  * restores before resolving (and every rename result is checked —
  * Swap.renameOrThrow — because HDFS reports failure via a boolean
  * and a silently-false rename would strand a stale snapshot). This
  * is the right format for a single-writer pipeline on a real
  * filesystem where in-place readability matters more than a
  * zero-window swap. */
object RenameTableFormat extends TableFormat {

  override def read(spark: SparkSession, table: String): Option[DataFrame] = {
    val snap = new Path(table)
    val fs = fsOf(spark, table)
    if (!fs.exists(snap)) {
      // crash-window recovery: restore the newest backup (tokens are
      // compared length-then-lexicographic so numeric batch ids order
      // numerically)
      val olds = fs.globStatus(new Path(s"$table.old-*"))
      if (olds != null && olds.nonEmpty) {
        val newest = olds.maxBy { s =>
          val t = s.getPath.getName
          (t.length, t)
        }
        Swap.renameOrThrow(fs, newest.getPath, snap)
      }
    }
    if (fs.exists(snap)) Some(spark.read.parquet(table)) else None
  }

  override def commit(spark: SparkSession, table: String, df: DataFrame,
                      token: String): Unit = {
    val snap = new Path(table)
    val fs = fsOf(spark, table)
    val tmp = new Path(s"$table.tmp-$token")
    val old = new Path(s"$table.old-$token")
    fs.delete(tmp, true) // stale prior attempt of this very token
    fs.delete(old, true)
    // `df` may read the live snapshot lazily (merge plans do): the
    // write to tmp runs while the live dir is still in place
    df.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(snap)) Swap.renameOrThrow(fs, snap, old)
    Swap.renameOrThrow(fs, tmp, snap)
    // committed: every backup is now stale
    val olds = fs.globStatus(new Path(s"$table.old-*"))
    if (olds != null) olds.foreach(s => fs.delete(s.getPath, true))
  }
}

/** Log-based atomic commit: the table at `table/` is a directory of
  * immutable snapshot dirs (`data-v<N>-<token>`) plus a commit log
  * (`_log/<N>`, content = that version's data dir name). Readers
  * resolve ONLY through the log: the highest log entry names the
  * current snapshot.
  *
  * Commit = write the full new snapshot to a fresh data dir, stage
  * the log entry's CONTENT to `_log/.tmp-*`, then publish with ONE
  * rename to `_log/<N+1>` — the Delta-lake commit primitive. There is
  * NO non-atomic window: the entry is never visible without its
  * content (rename is atomic), a crash before the rename leaves only
  * an orphan data dir + tmp that no reader resolves (vacuumed by the
  * next commit), and a crash after it is a completed commit. Losing
  * the publish race (rename-fails-if-exists per the HDFS rename
  * contract, plus an exists pre-check for local filesystems whose
  * rename overwrites) throws [[ConcurrentCommitException]] — the
  * snapshot this writer derived is stale by construction, so
  * publishing it would silently drop the winner's commit. Readers
  * skip empty log entries (crashed commits from the legacy
  * create-then-write protocol) and fall back to the previous version.
  *
  * At 100 TB this is the object-store-friendly shape: data files are
  * written once and never renamed, visibility is one small-file move,
  * and the previous version stays readable for in-flight readers (the
  * last two versions are retained, older ones vacuumed on commit).
  * True object stores lack atomic rename-if-absent — there the
  * publish step needs the store's conditional-put or an external
  * lock, as Delta on S3 does; the HDFS-family contract is atomic. */
object CommitLogTableFormat extends TableFormat {

  private val LogDirName = "_log"

  private def entryContent(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
  }

  private def latest(fs: FileSystem, table: String): Option[(Long, String)] = {
    val log = new Path(new Path(table), LogDirName)
    val entries = fs.globStatus(new Path(log, "*"))
    if (entries == null) None
    else {
      val versions = entries.toSeq.flatMap { e =>
        scala.util.Try(e.getPath.getName.toLong).toOption.map(_ -> e.getPath)
      }
      // an empty entry is a crashed legacy create-then-write commit —
      // skip it and fall back to the previous version (the current
      // tmp+rename protocol never publishes an entry without content)
      versions.sortBy(-_._1).iterator
        .map { case (v, p) => (v, entryContent(fs, p)) }
        .find(_._2.nonEmpty)
    }
  }

  override def read(spark: SparkSession, table: String): Option[DataFrame] = {
    val fs = fsOf(spark, table)
    latest(fs, table).map { case (_, dataName) =>
      spark.read.parquet(new Path(new Path(table), dataName).toString)
    }
  }

  /** Committed versions still resolvable (the retained window —
    * current and previous after any commit's vacuum), ascending. */
  def versions(spark: SparkSession, table: String): Seq[Long] = {
    val fs = fsOf(spark, table)
    val listed = fs.globStatus(new Path(new Path(table, LogDirName), "*"))
    if (listed == null) Seq.empty
    else listed.toSeq.flatMap(e => scala.util.Try(e.getPath.getName.toLong).toOption).sorted
  }

  /** Time travel: read a specific committed version, None if it was
    * never committed or has been vacuumed out of the retained window.
    * This is what the log layout buys over rename-in-place — an
    * auditor can diff the current snapshot against the previous one
    * (the a21 snapshot-diff input) without racing the writer. */
  def readVersion(spark: SparkSession, table: String, version: Long): Option[DataFrame] = {
    val fs = fsOf(spark, table)
    val entry = new Path(new Path(table, LogDirName), version.toString)
    if (!fs.exists(entry)) None
    else {
      val dataName = entryContent(fs, entry)
      if (dataName.isEmpty) None // crashed legacy commit, never published
      else Some(spark.read.parquet(new Path(new Path(table), dataName).toString))
    }
  }

  /** Maintenance: rewrite the CURRENT snapshot into `targetFiles`
    * files and commit it as a new version with identical content — the
    * OPTIMIZE/small-file-compaction primitive (a25 *plans* which
    * partitions are worth this; this executes one). Rides the normal
    * commit path, so it inherits every guarantee: readers see the old
    * file layout or the new one, never a mixture; a concurrent real
    * commit wins the race and the compaction (whose snapshot would be
    * stale) throws [[ConcurrentCommitException]] instead of
    * resurrecting overwritten data. `coalesce` (narrow, no shuffle)
    * does the rewrite — compaction must not pay a corpus exchange.
    * None (no-op) before the first commit; otherwise the new version. */
  def compact(spark: SparkSession, table: String, token: String,
              targetFiles: Int = 1): Option[Long] = {
    read(spark, table).map { df =>
      commit(spark, table, df.coalesce(targetFiles), token)
      latest(fsOf(spark, table), table).get._1
    }
  }

  override def commit(spark: SparkSession, table: String, df: DataFrame,
                      token: String): Unit = {
    val root = new Path(table)
    val fs = fsOf(spark, table)
    fs.mkdirs(new Path(root, LogDirName))
    // recovery: delete empty numeric entries (crashed legacy
    // create-then-write commits) so they can't collide with the next
    // version; safe because the tmp+rename protocol never has an
    // empty entry in flight (log is <= 2 entries post-vacuum)
    val listed = fs.globStatus(new Path(new Path(root, LogDirName), "*"))
    if (listed != null)
      listed.filter(e => scala.util.Try(e.getPath.getName.toLong).isSuccess &&
          entryContent(fs, e.getPath).isEmpty)
        .foreach(e => fs.delete(e.getPath, true))
    val v = latest(fs, table).map(_._1).getOrElse(0L) + 1L
    val dataName = s"data-v$v-$token"
    // snapshot first — invisible until logged; `df` may lazily read
    // the current version, whose files are immutable, so no conflict
    df.write.mode("overwrite").parquet(new Path(root, dataName).toString)
    val entry = new Path(new Path(root, LogDirName), v.toString)
    // stage the entry CONTENT first, then publish with one rename: the
    // log entry is never visible without its content (a create-then-
    // write protocol exposes an empty highest version to readers and
    // bricks the next commit if the writer crashes mid-write). The
    // dot prefix keeps the tmp out of the version glob.
    val tmp = new Path(new Path(root, LogDirName), s".tmp-$v-$token")
    val out = fs.create(tmp, true)
    try out.write(dataName.getBytes(UTF_8)) finally out.close()
    // rename-fails-if-exists is the commit point (the HDFS rename
    // contract); the exists pre-check covers local filesystems whose
    // rename overwrites. On POSIX/RawLocal rename(2) OVERWRITES, so two
    // racers can both pass the pre-check and both rename "successfully"
    // — the later one silently replacing the earlier entry. Close that
    // TOCTOU window by re-reading the published entry: only the writer
    // whose CONTENT survived actually committed; the other sees a
    // foreign dataName and aborts instead of reporting a dropped commit
    // as success.
    val won = !fs.exists(entry) &&
      (try fs.rename(tmp, entry) catch { case _: java.io.IOException => false })
    val published = won &&
      (try entryContent(fs, entry) == dataName
       catch { case _: java.io.IOException => false })
    if (!published) {
      fs.delete(tmp, true)
      fs.delete(new Path(root, dataName), true) // lost the race: orphan
      throw new ConcurrentCommitException(
        s"version $v of $table was committed concurrently")
    }
    vacuum(fs, root, v)
  }

  /** Retain the committed and previous versions (in-flight readers);
    * drop older versions and every unreferenced (orphan) data dir.
    * Safe under the single-writer contract — there is no concurrent
    * not-yet-logged data dir to destroy. */
  private def vacuum(fs: FileSystem, root: Path, committed: Long): Unit = {
    val keepEntries = (committed - 1L) to committed
    val referenced = keepEntries.flatMap { v =>
      val p = new Path(new Path(root, LogDirName), v.toString)
      if (fs.exists(p)) {
        val in = fs.open(p)
        try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
        finally in.close()
      } else None
    }.toSet
    val dataDirs = fs.globStatus(new Path(root, "data-v*"))
    if (dataDirs != null)
      dataDirs.filterNot(d => referenced(d.getPath.getName))
        .foreach(d => fs.delete(d.getPath, true))
    val logEntries = fs.globStatus(new Path(new Path(root, LogDirName), "*"))
    if (logEntries != null)
      logEntries.filter(e =>
          scala.util.Try(e.getPath.getName.toLong).toOption.exists(_ < committed - 1L))
        .foreach(e => fs.delete(e.getPath, true))
    // staged entries from crashed writers (ours was renamed away).
    // Scope the sweep to stages AT OR BELOW the just-committed version
    // (the version is encoded in the `.tmp-<v>-<token>` name): a
    // concurrent writer may already have staged version v+1 between
    // this writer's rename and its vacuum, and deleting that fresh tmp
    // would force a spurious ConcurrentCommitException on a commit
    // that had no real version conflict.
    val tmps = fs.globStatus(new Path(new Path(root, LogDirName), ".tmp-*"))
    if (tmps != null)
      tmps.filter { t =>
        t.getPath.getName.stripPrefix(".tmp-").takeWhile(_ != '-') match {
          case v if v.nonEmpty && v.forall(_.isDigit) => v.toLong <= committed
          case _ => true // malformed stage name: legacy junk, sweep it
        }
      }.foreach(t => fs.delete(t.getPath, true))
  }
}
