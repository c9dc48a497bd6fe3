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
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
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
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")

  /** Register every table as a session temp view (events through its
    * ts-normalizing loader), so `spark.sql("SELECT ... FROM lineitem
    * JOIN orders ...")` works beside the DataFrame API — the SQL half
    * of the engine's surface. Temp views are lazy plans, not copies:
    * Catalyst prunes/pushes into the parquet scan exactly as with the
    * loader frames, and re-registration is idempotent. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach {
      case "events" => events(spark, dir).createOrReplaceTempView("events")
      case n => apply(spark, dir, n).createOrReplaceTempView(n)
    }
}
