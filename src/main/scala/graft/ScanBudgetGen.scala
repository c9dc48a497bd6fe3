package graft

/** Dev utility (regeneration recipe for the suite-wide scan-budget
  * lock): build every registered query and print its physical-plan
  * parquet-scan count, one `name count` line per query. Run:
  *   sbt "runMain graft.ScanBudgetGen /root/testdata/sf0.001 /tmp/scan_budgets.txt"
  * then adjudicate diffs against src/test/resources/scan_budgets.txt.
  */
object ScanBudgetGen {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outFile) = args
    val spark = GraftSession.builder("graft-scanbudget", Some("local[4]"), 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val lines = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val n =
        try PlanAudit.uniqueScans(fn(spark, sfDir))
        catch { case e: Throwable =>
          System.err.println(s"[scanbudget] $name: ${e.getMessage}"); -1
        }
      System.err.println(s"[scanbudget] $name $n")
      s"$name $n"
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile),
      lines.mkString("", "\n", "\n"))
    spark.stop()
  }
}
