package graft

import org.apache.spark.sql.SparkSession

/** Central session factory with the engine's tuned defaults.
  *
  * Design notes (100 TB posture): AQE handles runtime coalescing and
  * skew-join splitting; shuffle partitions default to the local core
  * count but are expected to be overridden (e.g. 2–4× total cores) on a
  * real cluster; broadcast threshold is raised so dimension tables
  * (region/nation/supplier/part) broadcast instead of shuffling facts.
  */
object GraftSession {
  def builder(appName: String = "graft",
              master: Option[String] = None,
              shufflePartitions: Int = Runtime.getRuntime.availableProcessors): SparkSession.Builder = {
    val b = SparkSession.builder().appName(appName)
    master.foreach(b.master)
    b.config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      // TIMESTAMP(NANOS) parquet (events.ts) reads as long; Tables.events converts.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // write timestamps as INT64 micros, not the deprecated INT96:
      // INT96 carries NO parquet statistics, so lake tables written
      // with it can never prune a time-range predicate (the footer
      // zone map and `_stats` sidecars record INT64 columns only) —
      // the Delta/Iceberg modern-encoding posture
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // wide aggregates (128-col minhash signatures) must stay in codegen
      .config("spark.sql.codegen.maxFields", "256")
  }

  def local(appName: String = "graft-local", cores: Int = Runtime.getRuntime.availableProcessors): SparkSession =
    builder(appName, Some(s"local[$cores]"), cores).config("spark.ui.enabled", "false").getOrCreate()
}
