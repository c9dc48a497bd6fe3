package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import graft.Tables
import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.Tar

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hadoop Configuration is not Serializable; this is the standard
  * writable-backed wrapper (Spark's own SerializableConfiguration is
  * private[spark]) so executors can open the destination filesystem. */
private[sources] class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** Physical tar-shard writer: materializes the e2/e17 shard layout as
  * REAL `.tar` archives on disk — the WebDataset export a multimodal
  * training job actually loads, not just the manifest that predicts it.
  * (Reference analog: process-staging.py:47-55 materializes real
  * objects in the promoted layout.)
  *
  * Layout: one archive per (source, shard_idx) at
  * `<versionDir>/<source>/shard-<%05d>.tar`, members named
  * `<doc_id>.bin` in doc_id order — exactly the framing e17 prices, so
  * every `member_offset` in the manifest seeks to that member's header
  * in the written file and `shard_tar_bytes` is the file's size
  * (spec-proven on written archives).
  *
  * SCALE SHAPE (the two structural guarantees this sink makes):
  *
  * 1. Corpus BYTES move exactly once, at full parallelism. The shard
  *    assignment (per-source running byte sum → shard_idx) is computed
  *    on a SLIM (doc_id, source, n_bytes) frame — the e2 manifest
  *    grain, integer math through the per-source window, never the
  *    payloads. The per-doc assignment then reduces to the SHARD-grain
  *    boundary table (first doc_id of each shard — one row per ~1 GB
  *    archive, so ~100k rows at 100 TB, the same bounded-driver-grain
  *    as [[writtenManifest]]'s listing), which broadcasts to every
  *    task; each payload row finds its shard with a binary search over
  *    its source's boundaries and shuffles ONCE on (source, shard_idx)
  *    straight into its writer task. The old shape — windowing the
  *    payload frame itself — pushed 100% of corpus bytes through a
  *    parallelism-=-#sources sort and then shuffled them AGAIN; at
  *    100 TB that single window task was the job.
  *
  * 2. The shard SET publishes atomically. Archives are staged into an
  *    immutable version dir `outDir/shards-v<N>-<token>/` that no
  *    reader resolves, then ONE rename publishes the commit-log entry
  *    `outDir/_log/<N>` naming it — [[CommitLogTableFormat]]'s
  *    stage→publish discipline applied to a tar export. A crash
  *    anywhere mid-export leaves the previous complete set current
  *    (orphan staging vacuumed by the next successful publish); a
  *    training loader never sees a MIX of new and stale archives. The
  *    per-archive writes inside the staged dir still use
  *    attempt-id tmp+rename so speculative/retried tasks never collide.
  *
  * Each writer task streams members straight to the filesystem via
  * [[Tar.writeTo]] — constant memory per member, never a whole archive
  * in RAM (a real shard is ~1 GB). Re-running `write` publishes a new
  * version with byte-identical archives (deterministic codec + layout),
  * so the sink is idempotent under the Step-Function retry contract
  * like every other sink here; the previous version is retained for
  * in-flight readers and older ones vacuumed, as the table format does.
  */
object TarShardSink {

  private val LogDirName = "_log"

  /** Per-doc shard assignment at the MANIFEST grain: (doc_id, source,
    * n_bytes, shard_idx) with e2's rule — a blob belongs to the shard
    * its START byte falls in (greedy fill, never split). This frame
    * carries NO payload column: `octet_length` on the string column IS
    * the UTF-8 byte count of the payload the writer later encodes, so
    * the running-sum window moves three scalars per doc, not the
    * corpus. (Plan-asserted in the spec: no binary column anywhere in
    * this plan, and no Window in the payload plan.) */
  def shardAssignments(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        octet_length(col("text")).cast("long").as("n_bytes"))
      .withColumn("end_byte", sum(col("n_bytes")).over(w))
      .withColumn("shard_idx",
        expr(s"(end_byte - n_bytes) div ${MultimodalOps.ShardBytes}"))
      .select(col("doc_id"), col("source"), col("n_bytes"), col("shard_idx"))
  }

  /** SHARD-grain boundary table: for each (source, shard_idx), the
    * first doc_id it contains, as per-source sorted parallel arrays
    * for binary search. Shard assignment is monotone in doc_id within
    * a source (the running sum only grows), so shards are contiguous
    * doc_id runs and "greatest boundary <= doc_id" recovers the
    * assignment exactly — including skipped shard numbers when one
    * blob spans several shard widths. Bounded by the ARCHIVE count
    * (corpus bytes / shard bytes: ~100k rows at 100 TB of 1 GB
    * shards), the same driver-side bound writtenManifest already
    * carries for its listing. */
  private def shardBounds(spark: SparkSession,
                          dir: String): Map[String, (Array[Long], Array[Long])] =
    shardAssignments(spark, dir)
      .groupBy(col("source"), col("shard_idx"))
      .agg(min(col("doc_id")).as("lo"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (src, rows) =>
        val sorted = rows.map(r => (r.getLong(2), r.getLong(1))).sortBy(_._1)
        src -> ((sorted.map(_._1).toArray, sorted.map(_._2).toArray))
      }

  /** The payload frame each writer task consumes: (source, shard_idx,
    * doc_id, payload) with shard_idx attached via a broadcast binary
    * search over the shard boundaries — NO window, NO join: the only
    * wide operation downstream of this frame is the one
    * (source, shard_idx) repartition into the writers, so corpus bytes
    * cross the wire exactly once. */
  def assignedPayloads(spark: SparkSession, dir: String): DataFrame = {
    val bounds = spark.sparkContext.broadcast(shardBounds(spark, dir))
    val shardOf = udf { (src: String, docId: Long) =>
      val (los, shards) = bounds.value(src)
      var lo = 0
      var hi = los.length - 1
      while (lo < hi) { // rightmost boundary <= docId
        val mid = (lo + hi + 1) >>> 1
        if (los(mid) <= docId) lo = mid else hi = mid - 1
      }
      shards(lo)
    }
    // raw scan, NOT the spread loader: the spread repartition would put
    // a doc_id-hash exchange under the payload, so corpus bytes crossed
    // the wire twice (spread + the writer's (source, shard_idx)
    // repartition). The writer repartition supplies the parallelism.
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text").cast("binary").as("payload"))
      .withColumn("shard_idx", shardOf(col("source"), col("doc_id")))
      .select(col("source"), col("shard_idx"), col("doc_id"), col("payload"))
  }

  private def entryContent(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
  }

  /** Highest committed (version, staged dir name), resolving ONLY
    * through the log — staged-but-unpublished exports are invisible. */
  private def latest(fs: FileSystem, outDir: String): Option[(Long, String)] = {
    val entries = fs.globStatus(new Path(new Path(outDir, LogDirName), "*"))
    if (entries == null) None
    else entries.toSeq
      .flatMap(e => scala.util.Try(e.getPath.getName.toLong).toOption.map(_ -> e.getPath))
      .sortBy(-_._1).iterator
      .map { case (v, p) => (v, entryContent(fs, p)) }
      .find(_._2.nonEmpty)
  }

  /** The currently published shard-set directory under `outDir`, or
    * None before the first complete export. This is the loader's entry
    * point: glob `shard-NNNNN.tar` under each source dir beneath it. */
  def currentShardDir(spark: SparkSession, outDir: String): Option[String] = {
    val fs = new Path(outDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    latest(fs, outDir).map { case (_, name) => new Path(outDir, name).toString }
  }

  /** Write every document's payload into its assigned shard archive
    * and publish the complete set as one new version under `outDir`.
    * Idempotent: a re-run publishes a new version with byte-identical
    * archives; a crash mid-export leaves the previous version current. */
  def write(spark: SparkSession, dir: String, outDir: String,
            token: String = "w"): Unit = {
    val fs = new Path(outDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = latest(fs, outDir).map(_._1).getOrElse(0L) + 1L
    val stagedName = s"shards-v$v-$token"
    val staged = new Path(outDir, stagedName)
    fs.delete(staged, true) // stale prior attempt of this very token
    val bconf = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val stagedStr = staged.toString
    assignedPayloads(spark, dir)
      .repartition(col("source"), col("shard_idx"))
      .sortWithinPartitions(col("source"), col("shard_idx"), col("doc_id"))
      .foreachPartition { (rows: Iterator[Row]) =>
        val pfs = new Path(stagedStr).getFileSystem(bconf.value.value)
        val attempt = Option(TaskContext.get()).map(_.taskAttemptId()).getOrElse(0L)
        val it = rows.buffered
        while (it.hasNext) {
          val (src, shard) = (it.head.getString(0), it.head.getLong(1))
          val srcDir = new Path(stagedStr, src)
          val finalPath = new Path(srcDir, f"shard-$shard%05d.tar")
          val tmp = new Path(srcDir, f".shard-$shard%05d.tar.tmp-$attempt")
          pfs.mkdirs(srcDir)
          // stream this (source, shard) run of the sorted iterator
          val members = new Iterator[(String, Array[Byte])] {
            def hasNext: Boolean = it.hasNext &&
              it.head.getString(0) == src && it.head.getLong(1) == shard
            def next(): (String, Array[Byte]) = {
              val r = it.next()
              (s"${r.getLong(2)}.bin", r.getAs[Array[Byte]](3))
            }
          }
          val out = new java.io.BufferedOutputStream(pfs.create(tmp, true), 1 << 16)
          try Tar.writeTo(out, members) finally out.close()
          // within the UNPUBLISHED staging dir: last attempt wins with
          // byte-identical content (deterministic codec + layout)
          pfs.delete(finalPath, false)
          if (!pfs.rename(tmp, finalPath))
            throw new java.io.IOException(s"cannot stage tar shard $finalPath")
        }
      }
    publish(fs, outDir, v, stagedName, token)
  }

  /** One-rename publish of version `v` (CommitLogTableFormat's
    * primitive, compacted: the tar export is single-writer by the same
    * sink contract, so a lost race — entry already present — means a
    * violated caller lock and throws). Then vacuum: retain the
    * committed and previous versions for in-flight loaders, sweep
    * older versions, orphaned stages, and crashed tmp entries. */
  private def publish(fs: FileSystem, outDir: String, v: Long,
                      stagedName: String, token: String): Unit = {
    val logDir = new Path(outDir, LogDirName)
    fs.mkdirs(logDir)
    val entry = new Path(logDir, v.toString)
    val tmp = new Path(logDir, s".tmp-$v-$token")
    val out = fs.create(tmp, true)
    try out.write(stagedName.getBytes(UTF_8)) finally out.close()
    val won = !fs.exists(entry) &&
      (try fs.rename(tmp, entry) catch { case _: java.io.IOException => false })
    val published = won &&
      (try entryContent(fs, entry) == stagedName
       catch { case _: java.io.IOException => false })
    if (!published) {
      fs.delete(tmp, true)
      fs.delete(new Path(outDir, stagedName), true)
      throw new ConcurrentCommitException(
        s"shard-set version $v of $outDir was committed concurrently")
    }
    // vacuum: referenced = entries v-1..v; everything else goes
    val referenced = (v - 1L to v).flatMap { k =>
      val p = new Path(logDir, k.toString)
      if (fs.exists(p)) Some(entryContent(fs, p)) else None
    }.toSet
    val dirs = fs.globStatus(new Path(outDir, "shards-v*"))
    if (dirs != null)
      dirs.filterNot(d => referenced(d.getPath.getName))
        .foreach(d => fs.delete(d.getPath, true))
    val entries = fs.globStatus(new Path(logDir, "*"))
    if (entries != null)
      entries.filter(e => scala.util.Try(e.getPath.getName.toLong).toOption
          .exists(_ < v - 1L))
        .foreach(e => fs.delete(e.getPath, true))
    val tmps = fs.globStatus(new Path(logDir, ".tmp-*"))
    if (tmps != null) tmps.foreach(t => fs.delete(t.getPath, true))
  }

  private def shardFiles(spark: SparkSession, outDir: String): Seq[(String, Long)] = {
    val fs = new Path(outDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    latest(fs, outDir) match {
      case None => Seq.empty
      case Some((_, name)) =>
        val listed = fs.globStatus(new Path(new Path(outDir, name), "*/shard-*.tar"))
        if (listed == null) Seq.empty
        else listed.toSeq.map(s => (s.getPath.toString, s.getLen))
    }
  }

  /** MEASURED manifest of the archives in the CURRENT PUBLISHED shard
    * set under `outDir`: per file, its (source, shard_idx) parsed from
    * the layout path, the member count from a streaming header walk
    * ([[Tar.walkStream]] — skips data, constant memory, verifying
    * every header checksum en route), and the file's byte size from
    * the filesystem. Resolution goes through the commit log, so a
    * crashed half-export is never visible. This is ground truth the
    * e17 predictions are graded against; the driver listing is one row
    * per ARCHIVE (bounded: 100 TB at 1 GB shards is ~100k entries),
    * the header walks run distributed. */
  def writtenManifest(spark: SparkSession, outDir: String): DataFrame = {
    import spark.implicits._
    val bconf = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val files = shardFiles(spark, outDir)
    val slices = math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism))
    spark.sparkContext.parallelize(files, slices).mapPartitions { part =>
      val conf = bconf.value.value
      part.map { case (p, len) =>
        val path = new Path(p)
        val shard = path.getName.stripPrefix("shard-").stripSuffix(".tar").toLong
        val in = path.getFileSystem(conf).open(path)
        val members = try Tar.walkStream(in) finally in.close()
        (path.getParent.getName, shard, members.size.toLong, len)
      }
    }.toDF("source", "shard_idx", "n_members", "tar_bytes")
      .orderBy(col("source"), col("shard_idx"))
  }

  /** Deterministic per-dataset export location for the e18 query entry
    * (re-runs publish new versions in place — idempotent). */
  def shardOutDir(dir: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    s"${System.getProperty("java.io.tmpdir")}/graft_tar_shards_$h"
  }

  /** e18: write the real shard archives, then return the manifest
    * MEASURED from the written files — the oracle predicts the same
    * rows from the documents table alone, so a pass proves disk
    * reality matches the e17 math end-to-end, THROUGH the committed
    * shard-set version (data skipping of uncommitted stages included). */
  def e18WrittenShards(spark: SparkSession, dir: String): DataFrame = {
    val out = shardOutDir(dir)
    write(spark, dir, out)
    writtenManifest(spark, out)
  }

  /** Member-grain index of the archives in the current published set:
    * one row per tar member with its MEASURED header offset and size
    * from the streaming header walk — exactly the seek index a
    * WebDataset loader builds once per shard and then random-accesses
    * by. Same distribution shape as [[writtenManifest]] (bounded
    * driver listing, distributed walks). */
  def tarIndex(spark: SparkSession, outDir: String): DataFrame = {
    import spark.implicits._
    val bconf = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val files = shardFiles(spark, outDir).map(_._1)
    val slices = math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism))
    spark.sparkContext.parallelize(files, slices).flatMap { p =>
      val path = new Path(p)
      val shard = path.getName.stripPrefix("shard-").stripSuffix(".tar").toLong
      val src = path.getParent.getName
      val in = path.getFileSystem(bconf.value.value).open(path)
      val members = try Tar.walkStream(in) finally in.close()
      members.map { case (name, size, off) => (src, shard, name, off, size) }
    }.toDF("source", "shard_idx", "member_name", "member_offset", "member_bytes")
      .orderBy(col("source"), col("shard_idx"), col("member_offset"))
  }

  /** e19: write the real shard archives (a fresh committed version
    * over e18's export dir), then return the MEASURED member-grain
    * seek index. The oracle derives the same rows from the documents
    * table via e17's framing math — a pass proves every member's
    * on-disk offset and size, member-for-member, not just per-shard
    * totals. */
  def e19TarIndex(spark: SparkSession, dir: String): DataFrame = {
    val out = shardOutDir(dir)
    write(spark, dir, out)
    tarIndex(spark, out)
  }

  /** Member-payload integrity of the current published set: stream
    * every archive member-by-member ([[Tar.mapMembersStream]] — memory
    * bounded by the largest member) and md5 each payload. One row per
    * member with the MEASURED digest and size. */
  def shardIntegrity(spark: SparkSession, outDir: String): DataFrame = {
    import spark.implicits._
    val bconf = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val files = shardFiles(spark, outDir).map(_._1)
    val slices = math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism))
    spark.sparkContext.parallelize(files, slices).flatMap { p =>
      val path = new Path(p)
      val shard = path.getName.stripPrefix("shard-").stripSuffix(".tar").toLong
      val src = path.getParent.getName
      val in = path.getFileSystem(bconf.value.value).open(path)
      try Tar.mapMembersStream(in, (name, data) => {
        val md5 = java.security.MessageDigest.getInstance("MD5").digest(data)
          .map("%02x".format(_)).mkString
        (src, shard, name, md5, data.length.toLong)
      }) finally in.close()
    }.toDF("source", "shard_idx", "member_name", "payload_md5", "member_bytes")
      .orderBy(col("source"), col("shard_idx"), col("member_name"))
  }

  /** e20: write the real shard archives, then return the MEASURED
    * per-member payload digests — the oracle computes md5(text) per
    * document with e17's shard assignment, so a pass proves the
    * written archives carry the exact corpus BYTES (e18 proved sizes,
    * e19 offsets; this closes content — the e13 checksum ledger
    * measured against disk instead of predicted). */
  def e20ShardIntegrity(spark: SparkSession, dir: String): DataFrame = {
    val out = shardOutDir(dir)
    write(spark, dir, out)
    shardIntegrity(spark, out)
  }

  val e20Sql: String =
    s"""WITH sized AS (
       |  SELECT doc_id, source, md5(text) AS payload_md5,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
       |  FROM documents),
       |laid AS (
       |  SELECT *, sum(n_bytes) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_bytes AS start_byte
       |  FROM sized)
       |SELECT source, CAST(start_byte // ${MultimodalOps.ShardBytes} AS BIGINT) AS shard_idx,
       |  doc_id || '.bin' AS member_name, payload_md5, n_bytes AS member_bytes
       |FROM laid ORDER BY source, shard_idx, member_name""".stripMargin

  val e19Sql: String =
    s"""WITH sized AS (
       |  SELECT doc_id, source, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
       |  FROM documents),
       |laid AS (
       |  SELECT *, sum(n_bytes) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_bytes AS start_byte
       |  FROM sized),
       |sharded AS (
       |  SELECT doc_id, source, n_bytes,
       |    CAST(start_byte // ${MultimodalOps.ShardBytes} AS BIGINT) AS shard_idx,
       |    512 + ((n_bytes + 511) // 512) * 512 AS framed
       |  FROM laid)
       |SELECT source, shard_idx,
       |  doc_id || '.bin' AS member_name,
       |  CAST(sum(framed) OVER (PARTITION BY source, shard_idx ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - framed AS BIGINT)
       |    AS member_offset,
       |  n_bytes AS member_bytes
       |FROM sharded ORDER BY source, shard_idx, member_offset""".stripMargin

  val e18Sql: String =
    s"""WITH sized AS (
       |  SELECT doc_id, source, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
       |  FROM documents),
       |laid AS (
       |  SELECT *, sum(n_bytes) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_bytes AS start_byte
       |  FROM sized),
       |sharded AS (
       |  SELECT source, CAST(start_byte // ${MultimodalOps.ShardBytes} AS BIGINT) AS shard_idx,
       |    512 + ((n_bytes + 511) // 512) * 512 AS framed
       |  FROM laid)
       |SELECT source, shard_idx,
       |  CAST(count(*) AS BIGINT) AS n_members,
       |  CAST(sum(framed) + 1024 AS BIGINT) AS tar_bytes
       |FROM sharded GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
