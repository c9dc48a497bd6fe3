package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratchpad for optimization experiments (not part of the
  * engine surface). Edit freely between runs. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark: SparkSession = GraftSession
      .builder("graft-scratch", Some(s"local[$cpus]"), cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(label: String, reps: Int = 3)(f: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $label%-40s " + ts.map(t => f"$t%6.2f").mkString(" "))
    }

    val li = Tables.lineitem(spark, sfDir)
    time("floor: lineitem sum(qty)") { li.agg(sum(col("l_quantity"))) }
    time("floor: lineitem groupBy(flag) sum") {
      li.groupBy(col("l_returnflag")).agg(sum(col("l_quantity")))
    }
    time("q17 as-is: 2x HLL rsd=0.01") {
      li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.01).as("ap"),
          approx_count_distinct(col("l_orderkey"), 0.01).as("ao"))
    }
    time("q17 rsd=0.05") {
      li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.05).as("ap"),
          approx_count_distinct(col("l_orderkey"), 0.05).as("ao"))
    }
    time("q17 repartitioned input") {
      li.select(col("l_returnflag"), col("l_partkey"), col("l_orderkey"))
        .repartition(cpus)
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.01).as("ap"),
          approx_count_distinct(col("l_orderkey"), 0.01).as("ao"))
    }
    val ord = Tables.orders(spark, sfDir)
    time("a20 as-is shape (8 distinct aggs)") {
      graft.operators.Etl.a20SchemaDrift(spark, sfDir)
    }
    time("a20 with repartitioned input probe") {
      val loadA = year(col("o_orderdate")) % 2 === 0
      val base = ord.select(col("o_custkey"), col("o_orderpriority"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"))
        .repartition(cpus)
      val aggs = Seq("o_custkey", "o_orderpriority", "o_orderstatus", "o_totalprice").flatMap { c =>
        Seq(count_distinct(when(loadA, col(c))).as(s"${c}_da"),
          count_distinct(when(!loadA, col(c))).as(s"${c}_db"))
      }
      base.agg(aggs.head, aggs.tail: _*)
    }
    spark.stop()
  }
}
