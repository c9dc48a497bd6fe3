package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Etl.a5CityScore(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Analytics.queries ++ Etl.queries ++ Events.queries ++
      TextOps.queries ++ DedupOps.queries ++ VectorOps.queries ++
      MultimodalOps.queries ++ CorpusOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Analytics.oracles ++ Etl.oracles ++ Events.oracles ++
      TextOps.oracles ++ DedupOps.oracles ++ VectorOps.oracles ++
      MultimodalOps.oracles ++ CorpusOps.oracles
}
