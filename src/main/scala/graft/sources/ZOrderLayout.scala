package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared parquet FOOTER statistics walk (no data pages touched) —
  * the measurement half of the zone-map machinery, used by
  * [[CommitLogTableFormat.fileStats]] on snapshots and by
  * [[ZOrderLayout]] on plain directories. */
private[graft] object ParquetFooters {

  /** JVM-local diagnostic: how many parquet FOOTERS this walker has
    * opened (incremented in [[footerStats]]/[[footerStringStats]],
    * wherever they run — in local mode that is one JVM, which is what
    * the persisted-stats spec needs: it asserts a pruned read over a
    * stats-bearing snapshot opens ZERO data-file footers). Not a
    * cluster-wide metric and never read by engine logic. */
  val opens = new java.util.concurrent.atomic.AtomicLong(0L)

  /** One file's combined footer stats, the unit the pruners evaluate:
    * per-column (min, max, nulls, rows) for INT32/INT64 columns and
    * (truncated lower, truncated upper, nulls, rows) for ASCII-safe
    * string columns — buildable from a live footer read OR from a
    * persisted `_stats` sidecar row set, so every prune predicate is
    * written once against this shape and cannot diverge between the
    * measured and persisted paths. */
  case class FileColStats(longs: Map[String, (Long, Long, Long, Long)],
                          strs: Map[String, (String, String, Long, Long)])

  /** Live-measured [[FileColStats]] of one file (two footer reads). */
  def fileColStats(path: Path, conf: Configuration): FileColStats =
    FileColStats(
      footerStats(path, conf).map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap,
      footerStringStats(path, conf).map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap)

  def dataFiles(fs: FileSystem, dataDir: Path): Seq[String] = {
    val listed = fs.globStatus(new Path(dataDir, "*.parquet"))
    if (listed == null) Seq.empty else listed.toSeq.map(_.getPath.toString)
  }

  /** Footer-only stats of one parquet file: for each INT64/INT32 leaf
    * column with valid statistics in EVERY row group, the file-level
    * (column, min, max, nulls, rows). */
  def footerStats(path: Path,
                  conf: Configuration): Seq[(String, Long, Long, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    opens.incrementAndGet()
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(path, conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      val perChunk = blocks.flatMap(_.getColumns.asScala.map { c =>
        val tn = c.getPrimitiveType.getPrimitiveTypeName
        val st = c.getStatistics
        val ok = (tn == INT64 || tn == INT32) && st != null && !st.isEmpty &&
          st.hasNonNullValue
        (c.getPath.toDotString,
          if (ok) Some((st.genericGetMin.asInstanceOf[Number].longValue,
            st.genericGetMax.asInstanceOf[Number].longValue,
            st.getNumNulls)) else None)
      })
      perChunk.groupBy(_._1).toSeq.collect {
        // a true bound requires stats in EVERY row-group chunk
        case (col, chunks) if chunks.forall(_._2.isDefined) =>
          val s = chunks.flatMap(_._2)
          (col, s.map(_._1).min, s.map(_._2).max, s.map(_._3).sum, rows)
      }.sortBy(_._1)
    } finally reader.close()
  }

  /** How many leading chars of a string bound the zone map keeps —
    * the Iceberg `truncate(16)` convention: long enough to separate
    * real key domains (sources, states, URL hosts), short enough that
    * a footer row stays tiny at 100 TB file counts. */
  val StringBoundChars = 16

  /** Footer-only STRING stats of one parquet file: for each
    * string-annotated BINARY leaf column with valid statistics in
    * EVERY row group, Iceberg-style truncated bounds —
    * `lower` = min truncated to [[StringBoundChars]] (truncation only
    * ever LOWERS a lower bound), `upper` = max truncated with its last
    * kept char incremented when truncation dropped anything (so it
    * stays a TRUE upper bound). Bounds with any non-ASCII byte are
    * skipped for that file (the file is KEPT by every pruner —
    * conservative): parquet orders binary stats by unsigned bytes
    * while java.lang.String compares UTF-16 code units, and the two
    * orders diverge outside ASCII, so only the ASCII range is safe to
    * compare across the two systems. */
  def footerStringStats(path: Path,
                        conf: Configuration): Seq[(String, String, String, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.BINARY
    import org.apache.parquet.schema.LogicalTypeAnnotation
    opens.incrementAndGet()
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(path, conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      val perChunk = blocks.flatMap(_.getColumns.asScala.map { c =>
        val pt = c.getPrimitiveType
        val isString = pt.getPrimitiveTypeName == BINARY &&
          pt.getLogicalTypeAnnotation != null &&
          pt.getLogicalTypeAnnotation.isInstanceOf[
            LogicalTypeAnnotation.StringLogicalTypeAnnotation]
        val st = c.getStatistics
        val ok = isString && st != null && !st.isEmpty && st.hasNonNullValue
        val bounds =
          if (!ok) None
          else {
            val mn = st.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes
            val mx = st.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes
            if (mn.exists(_ < 0) || mx.exists(_ < 0)) None // non-ASCII: skip
            else Some((new String(mn, "US-ASCII"), new String(mx, "US-ASCII"),
              st.getNumNulls))
          }
        (c.getPath.toDotString, bounds)
      })
      perChunk.groupBy(_._1).toSeq.collect {
        // a true bound requires comparable stats in EVERY row-group chunk
        case (col, chunks) if chunks.forall(_._2.isDefined) =>
          val s = chunks.flatMap(_._2)
          (col, truncateLower(s.map(_._1).min), truncateUpper(s.map(_._2).max),
            s.map(_._3).sum, rows)
      }.sortBy(_._1)
    } finally reader.close()
  }

  /** Truncation only lowers a LOWER bound — always safe. */
  private def truncateLower(s: String): String = s.take(StringBoundChars)

  /** An UPPER bound that was truncated must be bumped to stay above
    * everything it used to cover: increment the last kept char (ASCII
    * by construction, so +1 never overflows a char). */
  private def truncateUpper(s: String): String =
    if (s.length <= StringBoundChars) s
    else {
      val t = s.take(StringBoundChars)
      t.init + (t.last + 1).toChar
    }

  /** Per-(file, column) footer stats of every parquet file under
    * `dir`, walked distributed (bounded driver listing). */
  def stats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = dataFiles(fs, new Path(dir))
    val bconf = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val slices = math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism))
    spark.sparkContext.parallelize(files, slices)
      .flatMap(p => footerStats(new Path(p), bconf.value.value).map {
        case (c, mn, mx, nulls, rows) => (new Path(p).getName, c, mn, mx, nulls, rows)
      })
      .toDF("file", "column", "min_long", "max_long", "null_count", "n_rows")
      .orderBy(col("file"), col("column"))
  }
}

/** Z-order (Morton) layout EXECUTOR — a30 plans this pass at the
  * manifest grain; this runs it on data: rows are written in
  * interleaved-bit order of two query keys so a file's footer range on
  * EITHER key is tight, and a two-key box predicate prunes to
  * O(√files) instead of all of them (Delta/Iceberg OPTIMIZE ZORDER BY
  * semantics). The loop closes end-to-end in this repo: a30 plans →
  * [[write]] executes → [[ParquetFooters.stats]] measures the ranges →
  * [[CommitLogTableFormat.readPruned]]-style range tests prune.
  *
  * Scale shape: ONE range-shuffle on the z-value (repartitionByRange —
  * Spark samples split points, so files are balanced under skew) plus
  * a within-partition sort; data moves exactly once, and the sort keeps
  * row-group stats tight INSIDE each file too. [[pruneCount]] is the
  * planner-side consumer: footer ranges only, no data read. */
object ZOrderLayout {

  /** Morton z-value of two non-negative long keys, `bits` bits each
    * (key-a bits at even positions — a30's exact interleave). */
  def zvalue(a: Column, b: Column, bits: Int): Column = {
    def bit(c: Column, i: Int): Column = shiftright(c, i).bitwiseAND(lit(1L))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc + shiftleft(bit(a, i), 2 * i) + shiftleft(bit(b, i), 2 * i + 1)
    }
  }

  /** Write `df` under `outDir` as `nFiles` parquet files clustered in
    * z-order of (keyA, keyB). Keys must be non-negative and fit in
    * `bits` bits (callers bucket/clamp first — a30's mod-1024 shape). */
  def write(df: DataFrame, keyA: String, keyB: String, bits: Int,
            nFiles: Int, outDir: String): Unit =
    df.withColumn("__z", zvalue(col(keyA), col(keyB), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)

  /** Files under `dir` a (loA..hiA, loB..hiB) box predicate must read,
    * per the footer zone map on both keys: (kept, total). Files
    * lacking a bound on either key are kept — pruning never loses
    * rows. Layout-agnostic (HilbertLayout's measurements use it too). */
  def pruneCount(spark: SparkSession, dir: String, keyA: String, keyB: String,
                 loA: Long, hiA: Long, loB: Long, hiB: Long): (Int, Int) = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = ParquetFooters.dataFiles(fs, new Path(dir))
    val conf = spark.sparkContext.hadoopConfiguration
    val kept = files.count { p =>
      val st = ParquetFooters.footerStats(new Path(p), conf)
        .map(s => s._1 -> (s._2, s._3)).toMap
      def admits(k: String, lo: Long, hi: Long): Boolean = st.get(k) match {
        case Some((mn, mx)) => !(mx < lo || mn > hi)
        case None => true
      }
      admits(keyA, loA, hiA) && admits(keyB, loB, hiB)
    }
    (kept, files.size)
  }
}

/** Hilbert-curve layout executor — ZOrderLayout's successor key (the
  * Databricks-liquid-clustering / Iceberg-hilbert-sort-order move):
  * consecutive Hilbert positions are ALWAYS Manhattan-adjacent cells,
  * where Morton takes 2^k-sized diagonal jumps at power-of-two
  * boundaries — so the contiguous curve ranges that become files cover
  * tighter spatial boxes, footer ranges on both keys are tighter, and
  * a two-key box predicate prunes to fewer files on the same data,
  * same file count, same one-shuffle write (spec-proven never-worse on
  * the grid fixture, strictly better on diagonal-straddling boxes).
  *
  * The curve position comes from the native codegen'd
  * [[graft.functions.HilbertIndex]] expression — the per-level
  * rotate/reflect walk is iterative with carried state, which as
  * composed Column arithmetic would double the expression tree per bit
  * level. Same scale shape as ZOrderLayout: ONE range-shuffle on the
  * curve position + within-partition sort; bytes move exactly once. */
object HilbertLayout {

  /** Hilbert position of two non-negative long keys on the 2^bits grid
    * ([[graft.functions.HilbertIndex]]; keys must fit `bits` bits —
    * callers bucket/clamp first, the a30/ZOrder contract). */
  def hvalue(a: Column, b: Column, bits: Int): Column =
    call_function("hilbert_index", a, b, lit(bits))

  /** Write `df` under `outDir` as `nFiles` parquet files clustered in
    * Hilbert order of (keyA, keyB). */
  def write(df: DataFrame, keyA: String, keyB: String, bits: Int,
            nFiles: Int, outDir: String): Unit =
    df.withColumn("__h", hvalue(col(keyA), col(keyB), bits))
      .repartitionByRange(nFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
      .write.mode("overwrite").parquet(outDir)
}
