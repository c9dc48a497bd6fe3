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

  test("fixture HTTP loop: 404/503 taxonomy -> retry -> JSONL staging -> promote") {
    import spark.implicits._
    import graft.sources.TextSources
    // --- the fixture "server": a directory standing in for the remote ---
    val root = java.nio.file.Files.createTempDirectory("graft_httpfix")
    def put(name: String, body: String) =
      java.nio.file.Files.write(root.resolve(name), body.getBytes("UTF-8"))
    put("cityA.html", """<html><div id="m1">alpha-metrics</div></html>""")
    put("cityC.html", """<html><div id="m1">gamma-metrics</div></html>""")
    put("cityC.html.flaky", "") // first fetch of cityC returns HTTP 503
    val control = Seq(
      (1L, "cityA", "https://fixture.local/cityA.html", ""),
      (2L, "cityB", "https://fixture.local/cityB.html", ""), // no fixture → 404
      (3L, "cityC", "https://fixture.local/cityC.html", ""))
      .toDF("id", "source", "url", "status")
    val conn = new Ingest.FixtureHttpConnector(root.toString)

    // --- round 1 behind the job-level retry layer: first ATTEMPT dies
    // (transient infra), the re-run fetches; per-ITEM failures come
    // back as error rows, never exceptions ---
    val attempts = new java.util.concurrent.atomic.AtomicInteger
    def collectPending(items: org.apache.spark.sql.Dataset[Ingest.WorkItem]) =
      Jobs.runWithRetry(Jobs.RetryPolicy(intervalMs = 0), sleep = _ => ()) {
        if (attempts.incrementAndGet() == 1) throw new RuntimeException("transient infra")
        Ingest.collect(spark, items, conn).collect().toSeq
      }
    val pending = control.filter(col("status") === "")
      .select(col("id"), col("source"), col("url")).as[Ingest.WorkItem]
    val round1 = collectPending(pending)
    assert(attempts.get == 2) // job-level retry exercised
    assert(round1.find(_.source == "cityA").exists(_.status == "completed"))
    assert(round1.find(_.source == "cityB").exists(p =>
      p.status == "error" && p.body.contains("HTTP 404")))
    assert(round1.find(_.source == "cityC").exists(p =>
      p.status == "error" && p.body.contains("HTTP 503")))

    // --- a17's ErrorEquals routing: 503 retries, 404 dead-letters ---
    val retryable = round1.filter(p => p.status == "error" && p.body.contains("HTTP 503"))
      .map(p => Ingest.WorkItem(p.id, p.source, p.url)).toDS()
    val round2 = collectPending(retryable)
    assert(round2.size == 1 && round2.head.status == "completed",
      "the consumed .flaky marker must make the retry succeed")

    // --- status writeback over both rounds (latest wins) ---
    val all = (round1.filter(_.status == "completed") ++ round2 ++
      round1.filter(p => p.body.contains("HTTP 404"))).toDF()
    val upd = all.select(col("id").as("u_id"), col("status").as("new_status"),
      when(col("status") === "completed", lit("2026-08-14")).as("completed_at"))
    val merged = Etl.statusWriteback(control, upd,
        col("id"), col("u_id"), col("status"), col("new_status"), col("completed_at"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(merged == Map(1L -> "completed", 2L -> "error", 3L -> "completed"))

    // --- JSONL staging of the fetched payloads, read back through
    // TextSources' quarantine contract (one planted corrupt line) ---
    val stage = java.nio.file.Files.createTempDirectory("graft_httpstage")
    val lines = (round1.filter(_.status == "completed") ++ round2).map(p =>
      s"""{"id":${p.id},"source":"${p.source}","body":"${p.body.replace("\"", "'")}"}""")
    java.nio.file.Files.write(stage.resolve("staged.jsonl"),
      (lines :+ """{"id":BROKEN,not json""").mkString("\n").getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("body", org.apache.spark.sql.types.StringType)))
    val load = TextSources.readJsonl(spark, stage.resolve("staged.jsonl").toString, schema)
    try {
      assert(load.quarantine.count() == 1, "the corrupt line quarantines, never kills the load")
      assert(load.good.count() == 2)
      // a14-style element extraction works on the fetched bodies
      val got = load.good
        .withColumn("content", regexp_extract(col("body"), "id='m1'>([^<]*)", 1))
        .select("source", "content").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got == Map("cityA" -> "alpha-metrics", "cityC" -> "gamma-metrics"))
      // --- promotion into the hive date layout (a3), idempotent ---
      val out = java.nio.file.Files.createTempDirectory("graft_httpraw").toString
      val raw = load.good.withColumn("ts", lit("2026-08-14 09:00:00").cast("timestamp"))
      PartitionedSink.promote(raw, out, "source", "ts")
      PartitionedSink.promote(raw, out, "source", "ts") // re-run: dynamic overwrite
      assert(spark.read.parquet(out).count() == 2)
      assert(new java.io.File(s"$out/source=cityA/y=2026/m=8/d=14").exists())
    } finally load.release()
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
