package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: dump `explain("formatted")` for every registered query so
  * plan regressions (lost pushdown, surprise shuffles, missing
  * broadcasts) are visible per round. Run:
  *   sbt "runMain graft.PlanAudit /root/testdata/sf0.01 /tmp/plans"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = GraftSession.builder("graft-plans", Some("local[4]"), 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/$name.txt"), plan)
      } catch {
        case e: Throwable => System.err.println(s"[plans] $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
