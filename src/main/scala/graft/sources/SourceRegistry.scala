package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Config-driven source registry — the engine's form of the reference's
  * config.json + scraper_config.csv/api_config.csv (collect-data.py:42-64).
  *
  * A registry is a small DataFrame of named sources with their kind
  * (website/api), endpoint template, parameter list, and partition
  * columns; jobs join work-item tables against it (broadcast — it is
  * tiny by construction).
  */
object SourceRegistry {
  case class Source(name: String, kind: String, endpoint: String,
                    parameters: Seq[String], partitionCols: Seq[String])

  /** Load from a JSON config file shaped like the reference's
    * config.json: {kind: {name: {url|endpoint, parameters, ...}}}. */
  def fromJson(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val raw = spark.read.option("multiLine", "true").json(path)
    val perKind = raw.schema.fields.map { kindField =>
      val kind = kindField.name
      val sources = kindField.dataType.asInstanceOf[StructType]
      sources.fields.map { srcField =>
        val n = srcField.name
        val attrs = srcField.dataType.asInstanceOf[StructType].fieldNames.toSet
        val endpoint =
          if (attrs("url")) col(s"$kind.`$n`.url") else col(s"$kind.`$n`.endpoint")
        raw.select(
          lit(n).as("name"), lit(kind).as("kind"),
          endpoint.as("endpoint"),
          split(regexp_replace(col(s"$kind.`$n`.parameters"), " ", ""), ",").as("parameters"))
      }.reduce(_ unionAll _)
    }
    perKind.reduce(_ unionAll _)
  }

  /** Load from a CSV registry (scraper_config.csv / api_config.csv shape:
    * name, endpoint, parameters, s3_directory). */
  def fromCsv(spark: SparkSession, path: String, kind: String): DataFrame =
    spark.read.option("header", "true").csv(path)
      .withColumn("kind", lit(kind))

  /** Enrich a work-item table with its source's registry row. */
  def enrich(items: DataFrame, registry: DataFrame, itemSourceCol: String): DataFrame =
    items.join(broadcast(registry), items(itemSourceCol) === registry("name"), "left_outer")

  /** Resolve a source's control-row match columns from its registry
    * row's `s3_directory` field (update-control.py:25-30: the
    * comma-separated list of control columns — e.g. `state,city` —
    * whose event values identify the rows one update applies to).
    * Config lookup, one row — driver-side by design, like the
    * reference's config_df read. */
  def matchCols(registry: DataFrame, source: String,
                nameCol: String = "name"): Seq[String] =
    registry.filter(col(nameCol) === source)
      .select(col("s3_directory")).head().getString(0)
      .replace(" ", "").split(",").toSeq
}
