package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the star-schema test tables (one parquet file per table).
  *
  * Every loader is a plain parquet scan: column pruning and predicate
  * pushdown are left to Catalyst, so downstream operators only pay for
  * the columns/rows they reference.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  // graft.spreadAll: measurement-only knob (A/B the spread loader
  // across the whole suite); query code opts in explicitly instead.
  private def spreadAll = sys.props.get("graft.spreadAll").contains("1") ||
    sys.env.get("GRAFT_SPREAD_ALL").contains("1")
  def orders(spark: SparkSession, dir: String): DataFrame =
    if (spreadAll) spread(spark, dir, "orders", "o_orderkey")
    else apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame =
    if (spreadAll) spread(spark, dir, "lineitem", "l_orderkey")
    else apply(spark, dir, "lineitem")
  /** events.ts has shipped as TIMESTAMP(NANOS) (arrives as a long under
    * spark.sql.legacy.parquet.nanosAsLong=true — truncate to micros, the
    * same truncation DuckDB applies casting TIMESTAMP_NS → TIMESTAMP)
    * and as TIMESTAMP(MICROS) without UTC adjustment (arrives as
    * TIMESTAMP_NTZ). Either way, normalize to TIMESTAMP: the session
    * timezone is pinned UTC, so the NTZ→LTZ cast is a pure
    * reinterpretation and every downstream unix_micros/window operator
    * sees the one type the suite is built on. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val tz = spark.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC",
      s"Tables.events requires spark.sql.session.timeZone=UTC (got $tz): " +
        "the NTZ->LTZ ts cast is only a pure reinterpretation under UTC")
    val df = apply(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame =
    spread(spark, dir, "documents", "doc_id")
  /** Round-robin, not hash-on-vec_id: the vector family's plan specs
    * assert NO vec_id-keyed exchange anywhere (the in-row-argmax
    * guard), and no embeddings consumer reduces on vec_id anyway. */
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spread(spark, dir, "embeddings", key = null)

  /** Remembers, per (table path, file signature, target parallelism),
    * whether the scan under-splits — one cheap RDD-partition probe per
    * table per session lifetime, not per query. The signature
    * (length, mtime of the path) keeps the decision fresh if the file
    * is rewritten or regrown within one JVM. */
  private val spreadCache =
    scala.collection.concurrent.TrieMap.empty[(String, Long, Long, Int), Boolean]

  private def fileSignature(spark: SparkSession, path: String): (Long, Long) =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val st = p.getFileSystem(spark.sparkContext.hadoopConfiguration).getFileStatus(p)
      (st.getLen, st.getModificationTime)
    } catch { case _: Throwable => (-1L, -1L) }

  /** Spread an under-split table scan to the session's parallelism.
    *
    * Public for compute-heavy consumers (wide distinct aggregates,
    * DECIMAL(38) moment reduces, quadratic fan-outs): a single-split
    * scan otherwise runs the whole partial aggregation in ONE task
    * while 31 cores idle (measured r16: a20 4.9 s → 1.2 s, q87
    * 1.7 s → 0.9 s at sf0.1/local[32] from this alone). Multi-split
    * scans — any real corpus at scale — pass through untouched, so
    * the exchange only exists where the input under-splits.
    *
    * The text/vector tables ship as a single small parquet file with
    * ONE row group, so the scan yields ONE split and every downstream
    * map-heavy stage (tokenize + shingle explode, per-vector math)
    * serializes behind a single task while the rest of the machine
    * idles — the "one huge unsplittable file" input-skew case of the
    * optimization guide (§2.5: fix at the source if you can; otherwise
    * repartition immediately after the read).
    *
    * Scale-adaptive, not a local-mode constant: the trigger is `scan
    * splits < defaultParallelism`, so any real multi-file corpus (or a
    * file big enough that maxPartitionBytes splits it) returns the
    * frame untouched and pays zero extra exchange; the target is the
    * session's own parallelism, so lower-core runs spread to their own
    * width. Hash-distributing on the row key (not round-robin) skips
    * the sort-before-repartition pass and leaves the frame
    * HashPartitioning(key)-shaped, which downstream per-key reduces and
    * windows can reuse without a second exchange; a null key falls back
    * to round-robin. */
  def spread(spark: SparkSession, dir: String, name: String,
             key: String): DataFrame = {
    val df = apply(spark, dir, name)
    val target = spark.sparkContext.defaultParallelism
    val path = s"$dir/$name.parquet"
    val (len, mtime) = fileSignature(spark, path)
    val need = spreadCache.getOrElseUpdate((path, len, mtime, target),
      df.rdd.getNumPartitions < target)
    if (!need) df
    else if (key == null) df.repartition(target)
    else df.repartition(target, col(key))
  }

  /** Register every table as a session temp view (events through its
    * ts-normalizing loader), so `spark.sql("SELECT ... FROM lineitem
    * JOIN orders ...")` works beside the DataFrame API — the SQL half
    * of the engine's surface. Temp views are lazy plans, not copies:
    * Catalyst prunes/pushes into the parquet scan exactly as with the
    * loader frames, and re-registration is idempotent. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach {
      case "events" => events(spark, dir).createOrReplaceTempView("events")
      // documents/embeddings go through their spread loaders, exactly
      // like the DataFrame surface: a SQL query over a one-split corpus
      // file must not serialize behind a single task either
      case "documents" => documents(spark, dir).createOrReplaceTempView("documents")
      case "embeddings" => embeddings(spark, dir).createOrReplaceTempView("embeddings")
      case n => apply(spark, dir, n).createOrReplaceTempView(n)
    }
}
