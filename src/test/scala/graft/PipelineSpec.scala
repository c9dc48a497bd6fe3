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

  test("corpus pipeline: dedup-materialize -> pack survivors -> sharded write") {
    import graft.operators.{CorpusOps, TextOps}
    // 1. final keep set — d32's exact-canonical ∧ cluster-canonical rule
    val kept = CorpusOps.d32DedupCorpus(spark, sfDir).select("doc_id")
    val curated = Tables.documents(spark, sfDir).join(kept, "doc_id")
    // 2. pack ONLY the survivors with the same math as d24
    val packed = CorpusOps.packOf(curated).cache()
    // token mass conserved survivor-for-survivor
    val tokTotal = curated
      .select(size(TextOps.tokens(col("text"))).as("n")).filter(col("n") > 0)
      .agg(sum(col("n").cast("long"))).head.getLong(0)
    assert(packed.agg(sum(col("n_tokens").cast("long"))).head.getLong(0) == tokTotal)
    // per-source packing is gapless: last end_tok == token sum, and the
    // sequence count is exactly ceil(tokens / SeqLen)
    val perSrc = packed.groupBy("source").agg(
      sum(col("n_tokens").cast("long")).as("toks"),
      max(col("start_tok") + col("n_tokens")).as("last_end"),
      max("last_seq").as("max_seq"))
    assert(perSrc.filter(col("last_end") =!= col("toks")).count() == 0)
    assert(perSrc.filter(col("max_seq") =!=
      expr(s"(toks + ${CorpusOps.SeqLen - 1}) div ${CorpusOps.SeqLen} - 1")).count() == 0)
    // 3. manifest lands source-partitioned and re-reads losslessly
    val out = java.nio.file.Files.createTempDirectory("graft_pack").toString
    packed.write.mode("overwrite").partitionBy("source").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == packed.count())
    assert(back.select("source").distinct().count() ==
      packed.select("source").distinct().count())
    packed.unpersist()
  }
}
