package graft

import org.apache.spark.sql.SparkSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark: SparkSession = GraftSession
      .builder("graft-scratch", Some("local[8]"), 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.operators.Analytics.q89Mahalanobis(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    val s = df.queryExecution.executedPlan.toString
    println("[scratch] q89 stages: " +
      "ShuffleQueryStage [0-9]+".r.findAllIn(s).toSeq.groupBy(identity)
        .map { case (k, v) => s"$k x${v.size}" }.mkString(", "))
    println("[scratch] scans: " + "Scan parquet".r.findAllIn(s).length)
    s.split("\n").filter(l => l.contains("ShuffleQueryStage") || l.contains("Exchange") || l.contains("Scan parquet")).take(12).foreach(l => println("[scratch] " + l.take(150)))
    spark.stop()
  }
}
