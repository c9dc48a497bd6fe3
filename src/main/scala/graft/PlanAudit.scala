package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: dump `explain("formatted")` for every registered query so
  * plan regressions (lost pushdown, surprise shuffles, missing
  * broadcasts) are visible per round. Run:
  *   sbt "runMain graft.PlanAudit /root/testdata/sf0.01 /tmp/plans"
  */
object PlanAudit {

  /** Physical parquet-scan count of a query plan, modeling ACTUAL I/O
    * per execution (the scan-budget metric):
    *  - every FileSourceScanExec node counts once — a duplicated
    *    branch (the c49-class regression) shows up as 2;
    *  - a cached relation (InMemoryTableScan) counts its inner scans
    *    ONCE per distinct relation — it materializes once however many
    *    times the plan reads it (plain text counting over the plan
    *    string inflates these: the cached plan is INLINED at every
    *    occurrence, e.g. d68's tree prints 513 textual scans for what
    *    executes as 3);
    *  - AQE wrappers and subquery plans are walked through; reused
    *    exchanges/subqueries are leaves, so a reused subtree counts
    *    where it materializes, once. */
  def uniqueScans(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[AnyRef, java.lang.Boolean]())
    var n = 0
    def visit(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => visit(a.executedPlan)
        case _: FileSourceScanExec => n += 1
        case t: InMemoryTableScanExec =>
          if (seen.add(t.relation)) visit(t.relation.cachedPlan)
        case other => other.children.foreach(visit)
      }
      // dynamic pruning / scalar / IN subqueries carry their own plans
      p.expressions.foreach(_.foreach {
        case sub: ExecSubqueryExpression => visit(sub.plan.child)
        case _ => ()
      })
    }
    visit(df.queryExecution.executedPlan)
    n
  }

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
