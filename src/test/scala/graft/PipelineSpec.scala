package graft

import graft.jobs.Jobs
import graft.operators.Etl
import graft.sources.{Ingest, PartitionedSink}
import org.apache.spark.sql.functions._

/** End-to-end integration of the reference's collection loop, entirely
  * through library components: pending selection → retried batched
  * collection (connector seam) → status writeback incl. the error
  * branch → date-partitioned promotion — i.e. what collect-data.py +
  * update-control.py + process-staging.py do, as one Spark job.
  */
class PipelineSpec extends GraftSpec {

  test("reference loop: pending -> collect (retry) -> writeback -> promote") {
    import spark.implicits._
    val control = Seq(
      (1L, "cityA", "https://x/cityA.html", ""),
      (2L, "cityB", "https://x/invalid.html", ""),
      (3L, "cityC", "https://x/cityC.html", "completed"))
      .toDF("id", "source", "url", "status")

    // 1. pending work selection (empty status), typed into work items
    val pending = control
      .filter(col("status") === "" || col("status").isNull)
      .select(col("id"), col("source"), col("url"))
      .as[Ingest.WorkItem]

    // 2. collection behind the step-function retry layer: the first
    // attempt dies (transient infra failure), the re-run converges
    val attempts = new java.util.concurrent.atomic.AtomicInteger
    val payloads = Jobs.runWithRetry(Jobs.RetryPolicy(intervalMs = 0), sleep = _ => ()) {
      if (attempts.incrementAndGet() == 1) throw new RuntimeException("transient")
      Ingest.collect(spark, pending, new Ingest.StubConnector).collect().toSeq
    }
    assert(attempts.get == 2)
    assert(payloads.size == 2)
    assert(payloads.count(_.status == "error") == 1)

    // 3. status writeback: completed and error branches merge into the
    // control table; untouched rows keep their status
    val pay = payloads.toDF()
    val upd = pay.select(col("id").as("u_id"), col("status").as("new_status"),
      when(col("status") === "completed", lit("2026-08-12")).as("completed_at"))
    val merged = Etl.statusWriteback(control, upd,
        col("id"), col("u_id"), col("status"), col("new_status"), col("completed_at"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(merged == Map(1L -> "completed", 2L -> "error", 3L -> "completed"))

    // 4. successful payloads promote under the hive date layout
    val raw = pay.filter(col("status") === "completed")
      .withColumn("ts", lit("2026-08-12 10:30:00").cast("timestamp"))
    val out = java.nio.file.Files.createTempDirectory("graft_pipe").toString
    PartitionedSink.promote(raw, out, "source", "ts")
    val back = spark.read.parquet(out)
    assert(back.count() == 1)
    assert(back.select("source").head.getString(0) === "cityA")
    assert(new java.io.File(s"$out/source=cityA/y=2026/m=8/d=12").exists())
    // idempotent re-run (dynamic overwrite): same state, not doubled
    PartitionedSink.promote(raw, out, "source", "ts")
    assert(spark.read.parquet(out).count() === 1)
  }
}
