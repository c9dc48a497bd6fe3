package graft.jobs

import graft.Cols.dec2
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable column profiles — the incremental-statistics pattern
  * behind a12/a20: every field of the profile is a commutative monoid
  * (counts add, mins min, maxes max, DECIMAL sums add), so per-batch
  * partials combine into the corpus profile WITHOUT reprocessing
  * earlier batches. This is how a 100 TB table keeps fresh stats: each
  * ingested partition contributes one tiny partial row-set; the live
  * profile is a fold over partials (associative + commutative — any
  * tree shape, any order, same result; spec-proven).
  *
  * Deliberately absent: exact distinct counts — they do NOT merge
  * (|A ∪ B| ≠ |A| + |B|). The mergeable replacement is the HLL sketch
  * (q17/a27's machinery), whose binary sketches union losslessly;
  * exact distincts remain a full-scan statistic (a12/a20).
  *
  * Numeric-column contract: values are profiled through DECIMAL(18,2)
  * (exact, order-independent sums — the Cols.dec2 discipline). */
object Profiles {

  /** One profile partial for a batch: per column, a single row
    * (column_name, n_rows, n_nulls, min_val, max_val, sum_val). */
  def partial(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = Seq(count(lit(1)).as("__rows")) ++ cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        min(dec2(col(c), 18)).as(s"${c}_min"),
        max(dec2(col(c), 18)).as(s"${c}_max"),
        sum(dec2(col(c), 18)).as(s"${c}_sum"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(
        lit(c).as("column_name"),
        col("__rows").as("n_rows"),
        col(s"${c}_nulls").as("n_nulls"),
        col(s"${c}_min").as("min_val"),
        col(s"${c}_max").as("max_val"),
        col(s"${c}_sum").as("sum_val"))
    }
    wide.select(explode(array(stacked: _*)).as("p")).select(col("p.*"))
  }

  /** Fold any number of partials into one profile. Associative and
    * commutative: merge(a, b) == merge(b, a) and nesting order is
    * irrelevant — partials can combine bottom-up across partitions,
    * days, or clusters. */
  def merge(parts: DataFrame*): DataFrame = {
    require(parts.nonEmpty, "merge needs at least one partial")
    parts.reduce(_.unionByName(_))
      .groupBy(col("column_name"))
      .agg(
        sum(col("n_rows")).as("n_rows"),
        sum(col("n_nulls")).as("n_nulls"),
        min(col("min_val")).as("min_val"),
        max(col("max_val")).as("max_val"),
        sum(col("sum_val")).as("sum_val"))
  }

  /** Reader view: the profile with the mean derived from the exact
    * monoid fields (never a stored, unmergeable average). */
  def withMean(profile: DataFrame): DataFrame =
    profile.withColumn("mean_val",
      (col("sum_val") / (col("n_rows") - col("n_nulls"))).cast("double"))
}
