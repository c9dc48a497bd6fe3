package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming forms of the engine's event operators
  * (SURVEY.md §2.C): the same logic as the batch versions, executed
  * incrementally with watermarks and state.
  *
  * Input contract: a streaming DataFrame with the events schema
  * (event_id long, ts timestamp, user_id long, event_type string,
  * value double) — from readStream on files, Kafka, or MemoryStream in
  * tests.
  */
object StreamingOps {

  /** Tumbling 1-hour windowed aggregation with a 2-hour watermark —
    * streaming twin of Events.c1HourlyWindow. Late events beyond the
    * watermark are dropped; state is bounded. */
  def hourlyWindow(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                      event_type: String, value: Double)
  case class SessionState(sessionStart: Long, lastTs: Long, nEvents: Long)
  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                        session_end: java.sql.Timestamp, n_events: Long)

  /** Stateful gap-based sessionization (30-min inactivity) via
    * flatMapGroupsWithState — streaming twin of Events.c2Sessionize.
    * Event-time timeouts: a session closes when the WATERMARK passes
    * lastTs + gap (deterministic — no wall-clock dependence), or
    * immediately when a same-user event arrives beyond the gap. */
  def sessionize(spark: SparkSession, events: Dataset[EventRow],
                 gapMs: Long = 30L * 60 * 1000,
                 watermarkDelay: String = "10 seconds"): Dataset[SessionOut] = {
    import spark.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, new java.sql.Timestamp(s.sessionStart),
              new java.sql.Timestamp(s.lastTs), s.nEvents))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs <= gapMs =>
                  cur = Some(s.copy(lastTs = t, nEvents = s.nEvents + 1))
                case Some(s) =>
                  closed += SessionOut(userId, new java.sql.Timestamp(s.sessionStart),
                    new java.sql.Timestamp(s.lastTs), s.nEvents)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // CLAMP vs the watermark: a late same-user event can leave
              // lastTs + gap at/below the current watermark, and
              // setTimeoutTimestamp rejects non-future timestamps with
              // an IllegalArgumentException that kills the whole query.
              // Clamped sessions time out on the next watermark advance —
              // the same emission the un-clamped timestamp would produce.
              val floor = state.getCurrentWatermarkMs() + 1
              state.setTimeoutTimestamp(math.max(s.lastTs + gapMs, floor))
            }
            closed.result().iterator
          }
      }
  }

  /** Gap-based sessionization via the NATIVE session_window aggregation
    * — the declarative alternative to [[sessionize]]'s explicit state
    * machine. Same 30-min-gap semantics, but Catalyst owns the session
    * state (merge/expiry handled by the engine, works identically in
    * batch and streaming). Prefer this form unless the session logic
    * needs custom state the aggregation can't express. */
  def sessionizeWindowed(events: DataFrame,
                         gap: String = "30 minutes",
                         watermarkDelay: String = "10 seconds"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"))

  /** Streaming staging→raw promotion: continuous file-sink twin of
    * PartitionedSink.promote — each micro-batch appends into the same
    * hive date layout (source/y/m/d), exactly-once via the checkpoint.
    * Downstream batch readers see the identical partition-pruned
    * layout whether rows arrived in batch or on the stream. */
  def promoteStream(events: DataFrame, outDir: String, checkpointDir: String,
                    sourceCol: String = "event_type", tsCol: String = "ts") = {
    import graft.sources.PartitionedSink
    PartitionedSink.withDatePartitions(events, tsCol)
      .withColumn("source", col(sourceCol))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("source", "y", "m", "d")
      .outputMode(OutputMode.Append)
  }

  case class FunnelState(viewTs: Long, clickTs: Long, purchaseTs: Long)
  case class StageReach(user_id: Long, stage: String, ts: java.sql.Timestamp)

  /** Streaming ordered funnel (view → click → purchase) — incremental
    * twin of Events.c6Funnel/funnelOf. Per-user state keeps the first
    * qualifying timestamp per stage; a STAGE-REACH record is emitted in
    * append mode the first time a user attains each stage, so
    * `count(distinct user) per stage` downstream equals the batch
    * funnel counts. Stage order is enforced exactly like the batch
    * cumulative windows: a click qualifies only with a view at-or-before
    * it in (ts, event_id) order, a purchase only with a qualifying
    * click at-or-before it.
    *
    * State is bounded: users idle past `horizon` (event time, judged
    * against the watermark) have their state expired — an expiry emits
    * nothing, it only frees memory. Events within one micro-batch are
    * sorted by (ts, event_id).
    *
    * Equivalence contract (STRONGER than a watermark bound): stage
    * decisions are made per batch and never revisited, so exact
    * equality with the batch funnel requires PER-USER IN-ORDER DELIVERY
    * ACROSS BATCHES. Any cross-batch regression diverges — e.g. a view
    * with an earlier ts arriving one batch after its user's click was
    * rejected loses that click permanently here, while the batch funnel
    * (which sees all events at once) counts it; this happens even when
    * the view is NOT watermark-late. Sources that preserve per-key
    * order (e.g. a log partitioned by user) satisfy the contract;
    * otherwise use [[funnelStagesBuffered]], which buffers events per
    * user until the watermark passes them before applying stage logic
    * (exact batch equivalence for any non-late arrival order, at one
    * watermark delay of latency + bounded in-flight state). */
  def funnelStages(spark: SparkSession, events: Dataset[EventRow],
                   watermarkDelay: String = "10 seconds",
                   horizonMs: Long = 24L * 3600 * 1000): Dataset[StageReach] = {
    import spark.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var s = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
            val out = Seq.newBuilder[StageReach]
            var lastTs = Long.MinValue
            rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val t = e.ts.getTime
              lastTs = math.max(lastTs, t)
              e.event_type match {
                case "view" if s.viewTs < 0 =>
                  s = s.copy(viewTs = t); out += StageReach(userId, "view", e.ts)
                case "click" if s.clickTs < 0 && s.viewTs >= 0 =>
                  s = s.copy(clickTs = t); out += StageReach(userId, "click", e.ts)
                case "purchase" if s.purchaseTs < 0 && s.clickTs >= 0 =>
                  s = s.copy(purchaseTs = t); out += StageReach(userId, "purchase", e.ts)
                case _ => ()
              }
            }
            state.update(s)
            val floor = state.getCurrentWatermarkMs() + 1
            state.setTimeoutTimestamp(math.max(
              (if (lastTs == Long.MinValue) floor else lastTs) + horizonMs, floor))
            out.result().iterator
          }
      }
  }

  /** Latest record per key under (orderCols DESC) — the a7 compaction
    * rule as a reusable transform. */
  private def latestPerKey(df: DataFrame, keyCols: Seq[String],
                           orderCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Streaming CDC compaction into a keyed snapshot — the streaming
    * twin of Etl.a7CdcCompact (latest record per key wins). "Latest per
    * UNBOUNDED key" is inexpressible in append mode (keys never close)
    * and complete mode re-emits the world, so production engines
    * express it as an incremental UPSERT sink; this is that shape via
    * foreachBatch: each micro-batch is compacted WITHIN the batch,
    * merged latest-wins against the current snapshot, and the snapshot
    * is swapped via write-to-tmp + rename. Batches execute serially
    * under the checkpoint; a replayed batch re-merges idempotently
    * (latest-wins over the same inputs is a fixed point), so the
    * snapshot is exactly-once per committed batch.
    *
    * Durability is the pluggable [[graft.sources.TableFormat]]
    * contract (the batch mergeByKey shares it): the default
    * RenameTableFormat keeps the tmp+rename swap (atomic on
    * local/HDFS, one non-atomic crash window, recovered on the next
    * read); CommitLogTableFormat is the object-store-safe log-append
    * protocol with NO window. The merge logic is the seam and stays
    * identical. At 100 TB the merge is one key-partitioned shuffle per
    * batch of |snapshot| + |batch| rows; partition the snapshot on the
    * key so AQE can skip untouched partitions. */
  def compactStream(events: DataFrame, snapshotDir: String, checkpointDir: String,
                    keyCols: Seq[String], orderCols: Seq[String],
                    format: graft.sources.TableFormat = graft.sources.RenameTableFormat) =
    events.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val newest = latestPerKey(batch, keyCols, orderCols)
        val merged = format.read(spark, snapshotDir) match {
          case Some(snap) => latestPerKey(snap.unionByName(newest), keyCols, orderCols)
          case None       => newest
        }
        format.commit(spark, snapshotDir, merged, batchId.toString)
      }

  /** Streaming right-to-be-forgotten executor: erasure REQUESTS (one
    * key per row) arrive on a stream, and each micro-batch applies one
    * deletion-vector erase to the governed commit-log table — a37's
    * `dv` decision wired to a live request feed, completing the
    * GDPR path end-to-end (plan → executor → stream). Each micro-batch
    * applies ONE join-form erase — the request frame passes straight
    * through to `CommitLogTableFormat.erase(keys=...)`, whose hit scan
    * is a LEFT SEMI join against the distributed batch, so the request
    * set NEVER collects to the driver and a bulk-backfill batch of 10⁶
    * keys costs a co-partitioned join (AQE broadcasts the human-rate
    * common case), not a 10⁶-term `isin` expression. Per micro-batch:
    * one data-dir scan + one small sidecar write, never a rewrite.
    * At-least-once replay is safe: an erase whose keys are already
    * covered is a no-op (no new version, returns 0). */
  def eraseStream(requests: DataFrame, table: String, checkpointDir: String,
                  requestKeyCol: String, tableKeyCol: String) =
    requests.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.sources.CommitLogTableFormat.erase(
            batch.sparkSession, table, batch, requestKeyCol, tableKeyCol, s"req$batchId")
          ()
        }
      }

  case class FunnelEv(ts: Long, id: Long, typ: String)
  case class FunnelBufState(viewTs: Long, clickTs: Long, purchaseTs: Long,
                            pending: Seq[FunnelEv])

  /** Watermark-buffered ordered funnel: the EXACT-equivalence variant of
    * [[funnelStages]]. Plain funnelStages decides stages per batch and
    * never revisits, so ANY cross-batch reordering diverges from the
    * batch funnel (a view with an earlier ts arriving one batch after
    * its user's click was rejected loses that click permanently). Here
    * events BUFFER in state until the watermark passes them; only then
    * does the stage machine consume them, in (ts, event_id) order — so
    * the output equals the batch funnel for every input with no
    * watermark-late events, under any arrival order. The price: one
    * watermark delay of emission latency and O(events-in-flight) state
    * per user (bounded by rate × delay).
    *
    * Timeout discipline: while events are pending the state re-arms at
    * watermark+1 (process the newly-ready prefix each time the
    * watermark advances); with an empty buffer it falls back to the
    * idle horizon like funnelStages, so state stays bounded. */
  def funnelStagesBuffered(spark: SparkSession, events: Dataset[EventRow],
                           watermarkDelay: String = "10 seconds",
                           horizonMs: Long = 24L * 3600 * 1000): Dataset[StageReach] = {
    import spark.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[FunnelBufState]) =>
          val wm = state.getCurrentWatermarkMs()
          var s = state.getOption.getOrElse(FunnelBufState(-1L, -1L, -1L, Nil))
          val all = (s.pending ++ rows.map(e => FunnelEv(e.ts.getTime, e.event_id, e.event_type)))
            .sortBy(e => (e.ts, e.id))
          val (ready, pending) = all.partition(_.ts < wm)
          val out = Seq.newBuilder[StageReach]
          ready.foreach { e =>
            e.typ match {
              case "view" if s.viewTs < 0 =>
                s = s.copy(viewTs = e.ts)
                out += StageReach(userId, "view", new java.sql.Timestamp(e.ts))
              case "click" if s.clickTs < 0 && s.viewTs >= 0 =>
                s = s.copy(clickTs = e.ts)
                out += StageReach(userId, "click", new java.sql.Timestamp(e.ts))
              case "purchase" if s.purchaseTs < 0 && s.clickTs >= 0 =>
                s = s.copy(purchaseTs = e.ts)
                out += StageReach(userId, "purchase", new java.sql.Timestamp(e.ts))
              case _ => ()
            }
          }
          s = s.copy(pending = pending)
          if (state.hasTimedOut && pending.isEmpty) {
            state.remove()
          } else {
            state.update(s)
            val lastSeen = (Seq(s.viewTs, s.clickTs, s.purchaseTs) ++ pending.map(_.ts)).max
            val floor = wm + 1
            state.setTimeoutTimestamp(
              if (pending.nonEmpty) floor
              else math.max(lastSeen + horizonMs, floor))
          }
          out.result().iterator
      }
  }

  case class TouchEv(ts: Long, id: Long, typ: String, value: Double)
  case class TouchState(lastTs: Long, lastKind: String, pending: Seq[TouchEv])
  case class CreditOut(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
                       touch_type: String, value: Double)

  /** Streaming last-touch attribution — Events.c11's live twin: each
    * purchase is credited to the user's latest prior view/click within
    * the lookback window, 'none' otherwise, emitted as one credited
    * row per purchase (the c11 report is a stateless rollup of these).
    *
    * Exact batch equivalence under ANY cross-batch arrival order (the
    * funnelStagesBuffered discipline): events buffer in state until
    * the watermark passes them, then the credit machine consumes them
    * in (ts, is-purchase, event_id) order — the SAME total order as
    * c11's window sort, so a purchase and its same-timestamp touch
    * resolve identically (touch first), and among same-timestamp
    * touches the highest event_id wins, in both engines. Emission
    * therefore lags one watermark delay.
    *
    * State per user: ONE (ts, kind) last-touch pair plus the
    * not-yet-ready buffer (bounded by rate × watermark delay). An idle
    * user's state times out once the watermark passes lastTouch +
    * lookback — at that point the touch could never credit again and
    * a later purchase credits 'none' exactly as if the state were
    * still there, so removal is invisible. State is NOT the 7-day
    * event history: the lookback needs only the latest touch, which is
    * what keeps this bounded at 100 TB event rates. */
  def attributionStream(spark: SparkSession, events: Dataset[EventRow],
                        watermarkDelay: String = "10 seconds",
                        lookbackMs: Long = 7L * 86400L * 1000L): Dataset[CreditOut] = {
    import spark.implicits._
    events
      .filter(col("event_type").isin("view", "click", "purchase")).as[EventRow]
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[TouchState]) =>
          val wm = state.getCurrentWatermarkMs()
          var s = state.getOption.getOrElse(TouchState(-1L, "", Nil))
          val all = (s.pending ++ rows.map(e =>
              TouchEv(e.ts.getTime, e.event_id, e.event_type, e.value)))
            .sortBy(e => (e.ts, if (e.typ == "purchase") 1 else 0, e.id))
          val (ready, pending) = all.partition(_.ts < wm)
          val out = Seq.newBuilder[CreditOut]
          ready.foreach { e =>
            if (e.typ == "purchase") {
              val t = if (s.lastTs >= 0 && e.ts - s.lastTs <= lookbackMs) s.lastKind
                      else "none"
              out += CreditOut(e.id, userId, new java.sql.Timestamp(e.ts), t, e.value)
            } else s = s.copy(lastTs = e.ts, lastKind = e.typ)
          }
          s = s.copy(pending = pending)
          if (state.hasTimedOut && pending.isEmpty) {
            state.remove()
          } else {
            state.update(s)
            val floor = wm + 1
            state.setTimeoutTimestamp(
              if (pending.nonEmpty) floor
              else math.max(s.lastTs + lookbackMs, floor))
          }
          out.result().iterator
      }
  }

  case class CoverState(blkStart: Long, blkEnd: Long, nEvents: Long,
                        pending: Seq[(Long, Long)])
  case class CoverBlock(user_id: Long, block_start_us: Long, block_end_us: Long,
                        n_events: Long)

  /** Streaming interval-union coverage — Events.c34's live twin: each
    * event opens a 30-minute activity interval; overlapping intervals
    * merge into blocks, and each CLOSED block is emitted once (the c34
    * per-user report — n_blocks / covered / max block — is a stateless
    * rollup of these rows).
    *
    * The buffered exact-equivalence discipline (funnelStagesBuffered /
    * attributionStream): events buffer until the watermark passes
    * them, then merge in (t, event_id) order — the same total order as
    * c34's sweep windows. A block closes either when a ready event
    * starts past its end (within-order, exact) or when the WATERMARK
    * passes its end with nothing pending — at that point no admissible
    * future event can extend it (anything later-arriving below the
    * watermark is dropped by contract), so emission is final and
    * append-safe. State per user: one open block triple + the bounded
    * not-yet-ready buffer — never the event history. */
  def coverageStream(spark: SparkSession, events: Dataset[EventRow],
                     watermarkDelay: String = "10 seconds",
                     lenUs: Long = 1800L * 1000000L): Dataset[CoverBlock] = {
    import spark.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[CoverState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var s = state.getOption.getOrElse(CoverState(-1L, -1L, 0L, Nil))
          val all = (s.pending ++ rows.map(e => (e.ts.getTime * 1000L, e.event_id)))
            .sortBy(identity)
          val (ready, pending) = all.partition(_._1 < wmUs)
          val out = Seq.newBuilder[CoverBlock]
          ready.foreach { case (t, _) =>
            if (s.blkStart >= 0 && t <= s.blkEnd)
              s = s.copy(blkEnd = math.max(s.blkEnd, t + lenUs), nEvents = s.nEvents + 1)
            else {
              if (s.blkStart >= 0)
                out += CoverBlock(userId, s.blkStart, s.blkEnd, s.nEvents)
              s = CoverState(t, t + lenUs, 1L, Nil)
            }
          }
          // watermark already past the open block's end: final, emit now
          if (s.blkStart >= 0 && s.blkEnd < wmUs && pending.isEmpty) {
            out += CoverBlock(userId, s.blkStart, s.blkEnd, s.nEvents)
            s = CoverState(-1L, -1L, 0L, Nil)
          }
          s = s.copy(pending = pending)
          if (s.blkStart < 0 && pending.isEmpty) {
            state.remove()
          } else {
            state.update(s)
            val floorMs = state.getCurrentWatermarkMs() + 1
            state.setTimeoutTimestamp(
              if (pending.nonEmpty) floorMs
              else math.max(s.blkEnd / 1000L + 1, floorMs))
          }
          out.result().iterator
      }
  }

  /** Streaming trending top-k: per sliding window, the k most frequent
    * event types — the "what's hot right now" dashboard feed. TWO
    * chained stateful aggregations in append mode (multiple-stateful-
    * operator support, Spark ≥ 3.4): (1) counts per (sliding window,
    * event_type); (2) per-window bounded top-k via the TopKAgg
    * aggregate — map-side partials reduce each partition to ≤ k entries
    * before the exchange, the same scale argument as the ANN ranking
    * path (a collect_list+sort would buffer EVERY type per window).
    *
    * Chained streaming aggs re-window via window_time (window.end − 1µs),
    * so the second agg buckets at `slide` granularity: distinct sliding
    * windows have distinct ends (multiples of the slide), hence land in
    * distinct slide buckets — no two windows ever merge — and the
    * original bounds are recovered as [bucket.end − dur, bucket.end).
    *
    * TopKAgg carries LONG ids, so types ride through as
    * xxhash64(event_type); names come back via a stream-static join on
    * `typeDim` (the source registry's dims frame) — stateless and
    * append-safe after the aggregation. */
  def trendingTopK(events: DataFrame, typeDim: DataFrame, k: Int = 3,
                   windowDur: String = "1 hour", slide: String = "30 minutes",
                   watermarkDelay: String = "1 hour"): DataFrame = {
    val counts = events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    counts
      .select(col("w"), xxhash64(col("event_type")).as("type_hash"), col("n"))
      .groupBy(window(col("w"), slide).as("wb"))
      .agg(call_function("topk_by_score",
        col("n").cast("double"), col("type_hash"), lit(k)).as("tk"))
      .select(col("wb"), posexplode(col("tk")).as(Seq("i", "e")))
      .select(
        (col("wb.end") - expr(s"INTERVAL $windowDur")).as("window_start"),
        col("wb.end").as("window_end"),
        (col("i") + 1).as("rank"),
        col("e.id").as("type_hash"),
        col("e.score").cast("long").as("n_events"))
      .join(typeDim.select(col("event_type"),
        xxhash64(col("event_type")).as("type_hash")), "type_hash")
      .drop("type_hash")
  }

  /** Streaming ingest-time corpus curation — the row-local subset of
    * the batch curation pipeline applied to an UNBOUNDED document
    * stream: quality flagging (d3's exact rule via
    * TextOps.qualityProfile), deterministic per-source downsampling
    * (d16's salted-md5 rule via TextOps.sampleFilter), and PII
    * scrubbing (d18's regexes via TextOps.piiScrub). Every step is a
    * STATELESS codegen'd projection/filter — no aggregation, no
    * watermark, no state store — so the stream is append-mode by
    * construction and matches the batch composition row-for-row on
    * the same input (asserted in the spec across multiple
    * micro-batches). The STATEFUL curation stages stay separate by
    * design: exact dedup → dedupStream (watermarked state), near-dup
    * clustering → the batch d6/d25 pipeline over compacted storage.
    *
    * Input: streaming frame with (doc_id long, source string,
    * text string). Output: curated docs with quality + sampling
    * provenance and the scrubbed text. */
  def curateStream(docs: DataFrame): DataFrame = {
    import graft.operators.TextOps
    // one linear projection pipeline — a self-join of stream
    // projections would be a stream-stream join (state + watermarks)
    // for rows that never needed one
    TextOps.withPiiScrub(
      TextOps.sampleFilter(docs)
        .withColumn("quality_flag", TextOps.qualityFlagOf(col("text")))
        .filter(col("quality_flag") === "ok"))
      .select(col("doc_id"), col("source"), col("sample_bucket"),
        col("rate_permille"), col("quality_flag"),
        col("n_emails"), col("n_phones"), col("scrubbed"))
  }

  /** Streaming dedup on a content key with watermarked state —
    * streaming twin of TextOps.d5DedupExact. Deduplicates on the KEY
    * COLUMNS ALONE (same content at different event times collapses to
    * its first arrival), with state bounded by the watermark:
    * dropDuplicatesWithinWatermark expires a key's state once the
    * watermark passes its event time + delay. */
  def dedupStream(events: DataFrame, keyCols: Seq[String], watermarkCol: String,
                  delay: String = "1 hour"): DataFrame =
    events.withWatermark(watermarkCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  case class MomState(n: Long, s: Long, ssq: BigDecimal,
                      open: Map[Long, Long], closedUpTo: Long)
  case class DayFlag(event_type: String, day: java.sql.Date, cnt: Long,
                     flagged: Boolean, n_prior: Long, mean_prior: Double)

  /** Streaming daily-volume anomaly flags — the ONLINE twin of batch
    * c12: per event type, a day's count is flagged iff |c − μ| > 2σ
    * against the moments of the days CLOSED BEFORE it (batch c12 tests
    * against all-days stats — an online detector only has the past;
    * the contrast is the point, like capStream vs d30). The test is
    * division- and sqrt-free in exact integer arithmetic (BigInt dev²
    * vs 4·variance-term, c12's rule), so flags are bit-deterministic.
    *
    * One fMGWS directly on the watermarked event stream (fMGWS after a
    * windowed aggregation is an unsupported streaming shape): state per
    * type = closed-day moments (n, s, ssq) + counts of the OPEN days
    * still inside the watermark horizon — bounded by #types ×
    * (horizon/day + 3 numbers), regardless of stream length. A day
    * closes when the watermark passes its end (late stragglers are
    * ignored exactly as a windowed agg would drop them); closures fold
    * in ascending day order, so flag decisions never depend on batch
    * boundaries. ssq rides a DECIMAL(38,18) state column — exact to
    * ~10²⁰; a corpus beyond that swaps in a two-long 128-bit encoding
    * without touching the plan. */
  def anomalyStream(spark: SparkSession, events: Dataset[EventRow],
                    watermarkDelay: String = "1 hour"): Dataset[DayFlag] = {
    import spark.implicits._
    val DayMs = 86400000L
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (typ: String, rows: Iterator[EventRow], state: GroupState[MomState]) =>
          val st0 = state.getOption.getOrElse(
            MomState(0L, 0L, BigDecimal(0), Map.empty, Long.MinValue))
          var open = st0.open
          rows.foreach { e =>
            val d = Math.floorDiv(e.ts.getTime, DayMs)
            if (d > st0.closedUpTo) open = open.updated(d, open.getOrElse(d, 0L) + 1L)
          }
          val wm = state.getCurrentWatermarkMs()
          val toClose = open.keys.filter(d => (d + 1) * DayMs <= wm).toSeq.sorted
          var (n, s, ssq) = (st0.n, st0.s, st0.ssq)
          var closedUpTo = st0.closedUpTo
          val out = Seq.newBuilder[DayFlag]
          toClose.foreach { d =>
            val cnt = open(d)
            val dev = BigInt(cnt) * BigInt(n) - BigInt(s)
            val varTerm = BigInt(n) * ssq.toBigInt - BigInt(s) * BigInt(s)
            val flagged = n >= 2 && dev * dev > 4 * varTerm
            out += DayFlag(typ, java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(d)),
              cnt, flagged, n, if (n == 0) 0.0 else s.toDouble / n)
            n += 1; s += cnt; ssq += BigDecimal(BigInt(cnt) * BigInt(cnt))
            open -= d
            closedUpTo = math.max(closedUpTo, d)
          }
          state.update(MomState(n, s, ssq, open, closedUpTo))
          if (open.nonEmpty)
            state.setTimeoutTimestamp(
              math.max(open.keys.map(d => (d + 1) * DayMs).min, wm + 1))
          out.result().iterator
      }
  }

  case class BurstState(open: Map[Long, Long], closed: Map[Long, Long],
                        closedUpTo: Long)
  case class HourFlag(event_type: String, hour_idx: Long, cnt: Long,
                      base_hours: Long, base_cnt: Long, burst: Boolean)

  /** Streaming hourly burst detection — the ONLINE twin of
    * Events.c25BurstDetect: the batch form finds yesterday's floods;
    * an alerting pipeline needs the flag when the hour CLOSES. Hours
    * accumulate open counts; when the watermark passes an hour's end
    * the hour closes IN ORDER and is tested against the same trailing
    * rule as batch c25 — count over the OBSERVED hours of the trailing
    * [[graft.operators.Events.BurstBaselineHours]]-hour window, the
    * identical cross-multiplied integer test, ≥ BurstMinBaseline
    * observed hours — so the flagged set is equal by construction
    * (spec-proven across micro-batch splits). Every closed hour is
    * emitted with its flag (the online consumer wants the negative
    * rows too); filter `burst` for c25's frame.
    *
    * State per type is the open-hours map plus the trailing ≤ 24
    * closed (hour, cnt) pairs — bounded regardless of stream length;
    * closed hours older than the window prune on close. Late data
    * beyond the watermark drops (the batch/stream delta is the
    * watermark, measured by outOfOrderStream). */
  def burstStream(spark: SparkSession, events: Dataset[EventRow],
                  watermarkDelay: String = "1 hour"): Dataset[HourFlag] = {
    import spark.implicits._
    import graft.operators.Events.{BurstBaselineHours, BurstMinBaseline}
    val HourMs = 3600000L
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (typ: String, rows: Iterator[EventRow], state: GroupState[BurstState]) =>
          val st0 = state.getOption.getOrElse(
            BurstState(Map.empty, Map.empty, Long.MinValue))
          var open = st0.open
          rows.foreach { e =>
            val h = Math.floorDiv(e.ts.getTime, HourMs)
            if (h > st0.closedUpTo) open = open.updated(h, open.getOrElse(h, 0L) + 1L)
          }
          val wm = state.getCurrentWatermarkMs()
          val toClose = open.keys.filter(h => (h + 1) * HourMs <= wm).toSeq.sorted
          var closed = st0.closed
          var closedUpTo = st0.closedUpTo
          val out = Seq.newBuilder[HourFlag]
          toClose.foreach { h =>
            val cnt = open(h)
            val base = closed.filter { case (hb, _) =>
              hb >= h - BurstBaselineHours && hb <= h - 1 }
            val baseHours = base.size.toLong
            val baseCnt = base.values.sum
            val burst = baseHours >= BurstMinBaseline &&
              cnt * baseHours > 3 * baseCnt
            out += HourFlag(typ, h, cnt, baseHours, baseCnt, burst)
            closed = closed.updated(h, cnt)
              .filter { case (hb, _) => hb >= h - BurstBaselineHours + 1 }
            open -= h
            closedUpTo = math.max(closedUpTo, h)
          }
          state.update(BurstState(open, closed, closedUpTo))
          if (open.nonEmpty)
            state.setTimeoutTimestamp(
              math.max(open.keys.map(h => (h + 1) * HourMs).min, wm + 1))
          out.result().iterator
      }
  }

  case class DomainDoc(domain: String, doc_id: Long)

  /** Streaming per-domain admission quota — the streaming twin of
    * d30's crawl cap, applied at INGEST time: admit at most `cap`
    * documents per domain over the stream's lifetime, then drop. One
    * long of state per domain (flatMapGroupsWithState, no timeout —
    * a crawl quota is permanent for the run; recycle via a new
    * checkpoint), so state is bounded by #domains regardless of
    * stream length. Semantics differ from batch d30 BY DESIGN and the
    * contrast is the point: the batch cap selects a deterministic
    * salted-hash subset (rerun-stable, order-free), while a streaming
    * quota must decide ONLINE and admits in arrival order ((batch,
    * doc_id) — doc_id-sorted within a micro-batch for determinism).
    * The spec pins both: exact per-domain counts and
    * first-arrival-wins across batches. */
  def capStream(spark: SparkSession, docs: Dataset[DomainDoc],
                cap: Int): Dataset[DomainDoc] = {
    import spark.implicits._
    docs.groupByKey(_.domain)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[DomainDoc], state: GroupState[Long]) =>
          var admitted = state.getOption.getOrElse(0L)
          val out = Seq.newBuilder[DomainDoc]
          rows.toSeq.sortBy(_.doc_id).foreach { d =>
            if (admitted < cap) { admitted += 1; out += d }
          }
          state.update(admitted)
          out.result().iterator
      }
  }

  /** Streaming admission filter against a STATIC corpus — the streaming
    * twin of d42's incremental dedup at the exact-duplicate layer: drop
    * incoming documents whose normalized content hash (d5's rule)
    * already exists in the admitted corpus. A stream-static LEFT ANTI
    * join is STATELESS on the stream side — no watermark, no state
    * store; the static side is re-resolved per micro-batch — so the
    * stream stays append-mode and the filter matches the batch
    * anti-join row-for-row (asserted in the spec). The near-dup layer
    * composes the same way: stream-static equi-join on the corpus band
    * index, then the verify filter. At 100 TB the static side is a
    * bucketed table on the hash key, so each micro-batch probes
    * without a full-corpus shuffle. */
  def admitAgainstCorpus(docs: DataFrame, corpus: DataFrame): DataFrame = {
    def contentHash(df: DataFrame): DataFrame =
      df.withColumn("content_hash", md5(trim(lower(col("text")))))
    contentHash(docs)
      .join(contentHash(corpus).select(col("content_hash")),
        Seq("content_hash"), "left_anti")
  }

  case class AdmitFlag(doc_id: Long, is_dup: Boolean,
                       match_id: Option[Long], jaccard: Option[Double])

  /** Static corpus near-dup index for [[admitAgainstCorpusNearDup]]:
    * one row per (band hash, candidate) with the candidate's distinct
    * shingle-hash set attached for the verify step. Built with the
    * batch machinery (exploded shingles → one-pass minhash128 agg →
    * 32×4 band keys — bit-identical to DedupOps.bandBuckets). Callers
    * should persist this (or store it bucketed by `bh`) — a
    * stream-static join re-resolves the static side every micro-batch. */
  def corpusBandIndex(corpus: DataFrame): DataFrame = {
    import graft.operators.DedupOps.{NumBands, RowsPerBand}
    val sh = graft.operators.DedupOps.explodedShinglesOf(corpus)
      .select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
    val sigs = sh.groupBy(col("doc_id"))
      .agg(call_function("minhash128", col("shingle")).as("sig"),
        collect_list(col("shingle")).as("cand_sh"))
    val bandCols = (0 until NumBands).map { j =>
      val rows = (j * RowsPerBand until (j + 1) * RowsPerBand)
        .map(i => element_at(col("sig"), i + 1))
      xxhash64((lit(j) +: rows): _*)
    }
    sigs.select(col("doc_id").as("cand_id"), col("cand_sh"),
      explode(array(bandCols: _*)).as("bh"))
  }

  /** Streaming NEAR-dup admission against a static corpus — the
    * missing layer above [[admitAgainstCorpus]] (r7 verdict gap #1):
    * the exact-hash gate admits paraphrased dupes until the next batch
    * sweep; this flags them at ingest with the SAME decision rule as
    * batch d42 (MinHash 128-perm, 32×4 LSH bands, exact-Jaccard verify
    * at τ). Output is one flag row per incoming doc — (is_dup,
    * best match_id, jaccard), d42's report shape — so admission is
    * `filter(!is_dup)` and the rejects keep their evidence.
    *
    * Shape, stream side (must stay stateless for append mode — no
    * windows, no aggregates): shingle hashes, the 128-seed signature,
    * and the 32 band keys are all computed ROW-LOCALLY with
    * higher-order functions. The hash chain is bit-identical to the
    * batch pipeline (xxhash64(shingle_hash, k) ≡ MinHashAgg's
    * hashInt(k, hashLong(h, 42)); band keys reuse bandBuckets'
    * xxhash64(j, sig…) construction), so stream band keys equi-join
    * the batch-built index. HOFs evaluate interpreted — acceptable
    * because they touch ONLY the incoming micro-batch, never the
    * corpus (the batch side's explicit non-HOF adjudication stands).
    *
    * The probe is a stream-static LEFT OUTER equi-join on the band
    * hash (stateless, no state store, no watermark); verification is
    * row-local exact Jaccard over the two distinct shingle-hash sets
    * (identical integer inter/union arithmetic to
    * DedupOps.jaccardForPairs, so jaccard values match d42's to the
    * bit). A doc's ≤32 band rows all derive from one input row — one
    * micro-batch — so the per-doc regroup is a flatMapGroupsWithState
    * that emits one flag row per doc and NEVER updates state: the
    * state store stays empty, there is nothing to time out, and the
    * query is append-safe. Each doc_id is assumed to appear once in
    * the stream (the ingest grain, as capStream).
    *
    * At 100 TB: store the index bucketed on `bh` (BucketedTables) —
    * each micro-batch then shuffles only its own band rows; candidate
    * verification touches only colliding buckets, exactly the batch
    * pipeline's economics. Spec proves flag-equality with batch d42
    * across micro-batch splits plus a planted paraphrase. */
  def admitAgainstCorpusNearDup(spark: SparkSession, docs: DataFrame,
                                corpus: DataFrame,
                                tau: Double = 0.5): Dataset[AdmitFlag] = {
    import spark.implicits._
    import graft.operators.DedupOps.{NumBands, RowsPerBand}
    val index = corpusBandIndex(corpus)
    val t = graft.operators.TextOps.tokens(col("text"))
    val shArr = array_distinct(
      when(size(t) >= 3, transform(sequence(lit(1), size(t) - 2),
        i => xxhash64(concat_ws(" ",
          element_at(t, i), element_at(t, i + 1), element_at(t, i + 2)))))
        .otherwise(array().cast("array<bigint>")))
    val sigArr = transform(sequence(lit(0), lit(127)),
      k => array_min(transform(col("sh"), x => xxhash64(x, k))))
    val bandCols = (0 until NumBands).map { j =>
      val rows = (j * RowsPerBand until (j + 1) * RowsPerBand)
        .map(i => element_at(col("sig"), i + 1))
      xxhash64((lit(j) +: rows): _*)
    }
    val banded = docs
      .withColumn("sh", shArr)
      .withColumn("sig", sigArr)
      .withColumn("band", explode_outer(
        when(size(col("sh")) > 0, array(bandCols: _*))
          .otherwise(array().cast("array<bigint>"))))
      .select(col("doc_id"), col("sh"), col("band").as("bh"))
    val inter = size(array_intersect(col("sh"), col("cand_sh")))
    banded
      .join(index, Seq("bh"), "left_outer")
      .select(col("doc_id"), col("cand_id"),
        (inter.cast("double") /
          (size(col("sh")) + size(col("cand_sh")) - inter)).as("jacc"))
      .as[(Long, Option[Long], Option[Double])]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (doc: Long, rows: Iterator[(Long, Option[Long], Option[Double])],
         _: GroupState[Boolean]) =>
          val hits = rows
            .flatMap(r => for (c <- r._2; j <- r._3 if j >= tau) yield (c, j))
            .toSeq.distinct
          if (hits.isEmpty) Iterator.single(AdmitFlag(doc, is_dup = false, None, None))
          else {
            val (cand, jac) = hits.minBy { case (c, j) => (-j, c) }
            Iterator.single(AdmitFlag(doc, is_dup = true, Some(cand), Some(jac)))
          }
      }
  }

  /** Streaming incremental profile maintenance — the live form of the
    * a12/a20 statistics: each micro-batch contributes one
    * `Profiles.partial` (a per-column monoid row-set), which merges
    * into the stored profile via the tmp+rename swap (compactStream's
    * durability contract). Because every profile field is a
    * commutative monoid (Profiles' invariant, spec-proven), the stored
    * profile after N batches equals the batch profile of all data.
    *
    * Replay safety: foreachBatch is AT-LEAST-ONCE — a batch replayed
    * after the snapshot swap committed but before the checkpoint did
    * would merge its additive counters (n_rows/n_nulls/sums) TWICE.
    * Unlike compactStream's latest-wins merge, Profiles.merge is not a
    * replay fixed point, so the last merged batchId is persisted IN the
    * snapshot (`_batch_id` column, constant across rows) and any batch
    * with batchId <= stored is skipped as a replay. Crash recovery and
    * atomic visibility are the [[graft.sources.TableFormat]] contract
    * (default RenameTableFormat: newest-`.old` restore + checked
    * renames; CommitLogTableFormat has no crash window at all).
    *
    * At 100 TB: the profile table is |columns| rows — the merge cost
    * per batch is the partial's aggregation of the batch alone; the
    * historical data is never rescanned. That is the entire point. */
  def profileStream(rows: DataFrame, cols: Seq[String],
                    profileDir: String, checkpointDir: String,
                    format: graft.sources.TableFormat = graft.sources.RenameTableFormat) =
    rows.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        profileMergeBatch(batch, batchId, cols, profileDir, format)
      }

  /** One profileStream micro-batch merge, exposed so the replay path
    * (same batchId twice) is directly testable. See [[profileStream]]
    * for the contract. */
  def profileMergeBatch(batch: DataFrame, batchId: Long, cols: Seq[String],
                        profileDir: String,
                        format: graft.sources.TableFormat = graft.sources.RenameTableFormat): Unit = {
    val spark = batch.sparkSession
    val stored = format.read(spark, profileDir)
    val lastMerged = stored
      .filter(_.columns.contains("_batch_id"))
      .map(_.agg(max(col("_batch_id"))).head.getLong(0))
    if (!lastMerged.exists(_ >= batchId)) {
      val part = graft.jobs.Profiles.partial(batch, cols)
      val merged = stored match {
        case Some(prev) => graft.jobs.Profiles.merge(prev.drop("_batch_id"), part)
        case None       => part
      }
      format.commit(spark, profileDir,
        merged.withColumn("_batch_id", lit(batchId)), batchId.toString)
    }
  }

  case class OooOut(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
                    out_of_order: Boolean, lag_sec: Long)

  /** Out-of-order arrival monitor — the STREAMING twin of
    * Etl.a28LateDataAudit: a28 profiles synthetic lag offline to size
    * the watermark; this measures actual arrival disorder live. Per
    * user, one long of state (the max event-time seen); each arriving
    * event is flagged if its event time is behind that high-water mark,
    * with the regression distance in seconds. Feed the flags into the
    * a28-style day rollup to get the same report incrementally.
    *
    * Arrival order within a micro-batch is made deterministic by the
    * generator's monotone ingest sequence (event_id) — the iterator
    * order Spark hands the state function is not a contract.
    * State: ONE long per user, no timeout needed — bounded by the user
    * universe, the smallest state of any op in this family. */
  def outOfOrderStream(spark: SparkSession, events: Dataset[EventRow]): Dataset[OooOut] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[Long]) =>
          val sorted = rows.toSeq.sortBy(_.event_id)
          var maxTs = state.getOption.getOrElse(Long.MinValue)
          val out = sorted.map { e =>
            val t = e.ts.getTime
            val ooo = t < maxTs
            val lag = if (ooo) (maxTs - t) / 1000 else 0L
            if (t > maxTs) maxTs = t
            OooOut(e.event_id, userId, e.ts, ooo, lag)
          }
          state.update(maxTs)
          out.iterator
      }
  }

  /** Watermarked stream-stream interval join (the clicks⨝purchases
    * shape): a left event matches right events with the same key whose
    * timestamp falls in [left.ts, left.ts + window]. Both sides carry a
    * watermark and the join condition bounds the time range in BOTH
    * directions, so Spark can expire buffered rows — state stays
    * O(window × rate), the only shape that survives unbounded streams.
    * The two timestamp columns must be named differently. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   delay: String = "30 seconds",
                   window: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, delay)
    val r = right.withWatermark(rightTs, delay).withColumnRenamed(key, s"${key}_r")
    l.join(r,
      col(key) === col(s"${key}_r") &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $window"))
      .drop(s"${key}_r")
  }

  /** Streaming point-in-time dimension enrichment — a34's live twin
    * (the CDC-consumer pattern: every incoming fact picks up the
    * dimension version that was valid AT ITS EVENT TIME, not the
    * current one — enriching a replayed backlog with `is_current`
    * state is the classic silent corruption). Stream-static LEFT
    * OUTER join against an a24-shaped SCD2 frame on
    * (entity, ts ∈ [valid_from, valid_to)): stateless on the stream
    * side (append-safe, no watermark needed), and the non-equi
    * interval predicate is fine for stream-STATIC joins — the
    * stream-stream variant would need [[intervalJoin]]'s bounded
    * window instead. The static side is re-resolved every
    * micro-batch: callers persist it (or store it bucketed by the
    * entity key) exactly like [[corpusBandIndex]]. Events before the
    * entity's first version (or for unknown entities) pass through
    * with NULL version/state — the left-outer contract. */
  def pitStream(events: DataFrame, scd2: DataFrame): DataFrame = {
    val dim = scd2.select(col("user_id").as("pit_user_id"),
      col("version"), col("event_type").as("state"),
      col("valid_from"), col("valid_to"))
    events.join(dim,
        events("user_id") === dim("pit_user_id") &&
          events("ts") >= dim("valid_from") &&
          (dim("valid_to").isNull || events("ts") < dim("valid_to")),
        "left_outer")
      .drop("pit_user_id", "valid_to")
  }

  /** Incremental daily-active-users — c31's top-line metric live.
    * Two chained stateful steps, both watermark-bounded: exact
    * per-day user dedup (`dropDuplicatesWithinWatermark` on
    * (user, epoch-day) — state evicts once the watermark passes the
    * day) feeding a 1-day tumbling-window count. Day identity is the
    * same UTC epoch-day integer the batch c31 uses, so the final
    * per-day rows equal batch DAU for every day the watermark has
    * closed; late events beyond the delay are dropped exactly as the
    * batch distinct would NOT drop them — the delay is the
    * correctness horizon, sized like a28's late-data audit says.
    *
    * `delayDays` is structurally ≥ 1: the dedup key spans a FULL day,
    * so its state must outlive the day — with a sub-day watermark
    * delay, a user active at 00:30 and 23:00 would lose the morning's
    * dedup entry once the watermark passed it mid-day and be counted
    * TWICE in a perfectly in-order stream. Days, not an arbitrary
    * interval string, make that bug unrepresentable. */
  def dauStream(events: DataFrame, delayDays: Int = 1): DataFrame = {
    require(delayDays >= 1,
      s"dauStream needs a watermark delay of >= 1 day (got $delayDays): " +
        "the (user, day) dedup state must outlive the day it keys")
    events
      .withWatermark("ts", s"$delayDays days")
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .dropDuplicatesWithinWatermark(Seq("user_id", "day"))
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("dau"))
      .select(expr("unix_micros(w.start) div 86400000000").as("day"), col("dau"))
  }

  case class GapDay(event_type: String, day: Long, n_events: Long,
                    is_gap: Boolean, filled_n: Long)
  case class GapFillState(open: Map[Long, Long], lastClosed: Long, lastN: Long)

  /** Streaming calendar gap-fill — c33's live twin (Events.c33GapFill):
    * the dense daily series with zero rows for event-less days,
    * maintained incrementally. Days close in ascending order when the
    * WATERMARK passes their end; a closed day with no events emits the
    * ZERO row batch c33 would synthesize (is_gap=true, forward-filled
    * count) — the one row shape a downstream dashboard or c35-style
    * autocorrelation needs but no event ever carries. Interior-only
    * contract: a zero day closes only when a LATER event day is already
    * open (so every emitted row lies inside c33's observed span and the
    * closed prefix equals the batch frame by construction — spec-proven
    * across micro-batch splits); trailing silence is [[silenceStream]]'s
    * job, not a gap row. State per type: the open day-count map (bounded
    * by the watermark horizon) + 2 longs. */
  def gapFillStream(spark: SparkSession, events: Dataset[EventRow],
                    watermarkDelay: String = "1 hour"): Dataset[GapDay] = {
    import spark.implicits._
    val DayMs = 86400000L
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (typ: String, rows: Iterator[EventRow], state: GroupState[GapFillState]) =>
          val st0 = state.getOption.getOrElse(GapFillState(Map.empty, Long.MinValue, 0L))
          var open = st0.open
          rows.foreach { e =>
            val d = Math.floorDiv(e.ts.getTime, DayMs)
            if (d > st0.lastClosed) open = open.updated(d, open.getOrElse(d, 0L) + 1L)
          }
          val wm = state.getCurrentWatermarkMs()
          var lastClosed = st0.lastClosed
          var lastN = st0.lastN
          val out = Seq.newBuilder[GapDay]
          if (open.nonEmpty) {
            val maxOpen = open.keys.max
            var d = if (lastClosed == Long.MinValue) open.keys.min else lastClosed + 1
            while (d <= maxOpen && (d + 1) * DayMs <= wm) {
              val cnt = open.getOrElse(d, 0L)
              val gap = !open.contains(d)
              if (!gap) lastN = cnt
              out += GapDay(typ, d, cnt, gap, lastN)
              open -= d
              lastClosed = d
              d += 1
            }
          }
          state.update(GapFillState(open, lastClosed, lastN))
          // next pending close boundary: lastClosed+1 may be an interior
          // gap day with no open entry (the sloBurnStream fix)
          if (open.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              if (lastClosed == Long.MinValue) (open.keys.min + 1) * DayMs
              else (lastClosed + 2) * DayMs,
              wm + 1))
          out.result().iterator
      }
  }

  case class EwmaFlag(event_type: String, day: Long, n_events: Long,
                      baseline_milli: Long, spike: Boolean)
  case class EwmaState(open: Map[Long, Long], closed: Map[Long, Long],
                       firstDay: Long, lastClosed: Long)

  /** Streaming EWMA control chart — c41's live twin
    * (Events.c41EwmaControl): the dyadic-weighted recency baseline,
    * maintained incrementally so the spike flag exists when the day
    * CLOSES, not on tomorrow's batch run. Days close in ascending
    * order when the watermark passes their end (gapFillStream's
    * interior-only contract, so gap days enter the baseline as the
    * real zeros batch c41 sees on the spine); the first
    * [[graft.operators.Events.EwmaDays]] days per type are burn-in
    * exactly as in batch. State per type: the open day-count map +
    * the trailing ≤[[graft.operators.Events.EwmaDays]] closed counts
    * + 2 longs — bounded regardless of stream length. The closed
    * prefix equals the batch frame by construction (spec-proven
    * against the REAL batch operator across micro-batch splits);
    * late data beyond the watermark drops, the one batch/stream
    * delta (measured by outOfOrderStream). */
  case class KmvEstimate(event_type: String, sketch_size: Int, est_distinct: Long)

  /** The c50/d101 hash, computed JVM-side: first 15 hex chars of the
    * md5 of the key's decimal string, as a 60-bit long — bit-identical
    * to Spark's `conv(substring(md5(cast(x as string)), 1, 15), 16, 10)`
    * so streaming and batch sketches agree element-for-element. */
  private[graft] def kmvHash(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.take(8).map(b => f"$b%02x").mkString // 16 hex chars, need 15
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Streaming KMV distinct-cardinality maintenance — the live twin of
    * the c50/d101 sketch layer (real-time "how many distinct users has
    * this feed seen", the question exact distinct can only answer with
    * an unbounded state set): per key, the k smallest distinct hashes
    * ride in LITERAL-bounded state (≤k longs — state size never grows
    * with true cardinality, the whole point of the sketch), and every
    * micro-batch that touches a key re-emits its current estimate
    * (Update mode — a monitoring feed, not a changelog). Because a KMV
    * sketch is a set union (order-free, idempotent per element), the
    * state after ANY micro-batch split equals the batch [[graft.functions.KmvAgg]]
    * fold over the same rows — equivalence by construction, spec-proven
    * across splits. Estimates are the same integral
    * (k−1)·2⁶⁰ div kth-min rule (BigInt here; DECIMAL(38) in batch),
    * with sub-k keys exact. */
  case class DocBlob(doc_id: Long, source: String, n_bytes: Long)
  case class ShardAssign(doc_id: Long, source: String, n_bytes: Long,
                         shard_idx: Long, offset_in_shard: Long)

  /** Streaming shard assignment — the live twin of
    * [[graft.operators.MultimodalOps.e2BlobShard]] for a continuously
    * arriving multimodal corpus (the ingest loop that feeds
    * [[graft.sources.TarShardSink]] without waiting for a batch
    * horizon): per SOURCE, a single running byte offset rides in state
    * (ONE long — bounded regardless of stream length), and every
    * arriving blob is assigned the shard its start byte falls in plus
    * its offset inside that shard, e2's greedy-fill rule verbatim.
    *
    * Ordering contract: blobs arrive append-only per source in doc_id
    * order ACROSS micro-batches (the ingest sequence); WITHIN a
    * micro-batch the group iterator carries no order, so rows sort by
    * doc_id before assignment — making the output invariant under any
    * micro-batch split and equal to the batch manifest row-for-row
    * (spec-proven against the real e2 operator). The per-batch sort is
    * bounded by the micro-batch's rows for one (source) group. */
  def shardStream(spark: SparkSession, docs: Dataset[DocBlob],
                  shardBytes: Long = graft.operators.MultimodalOps.ShardBytes
                 ): Dataset[ShardAssign] = {
    import spark.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[DocBlob], state: GroupState[Long]) =>
          var off = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_.doc_id).map { d =>
            val a = ShardAssign(d.doc_id, src, d.n_bytes,
              off / shardBytes, off % shardBytes)
            off += d.n_bytes
            a
          }
          state.update(off)
          out.iterator
      }
  }

  def kmvStream(spark: SparkSession, events: Dataset[EventRow],
                k: Int = 256): Dataset[KmvEstimate] = {
    import spark.implicits._
    val H = BigInt(1152921504606846976L) // 2^60
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (t: String, rows: Iterator[EventRow], state: GroupState[Array[Long]]) =>
          var set = scala.collection.immutable.TreeSet.empty[Long] ++
            state.getOption.getOrElse(Array.empty[Long])
          rows.foreach { r =>
            val h = kmvHash(r.user_id.toString)
            if (set.size < k || h < set.max) {
              set += h
              if (set.size > k) set -= set.max
            }
          }
          state.update(set.toArray)
          val est =
            if (set.size < k) set.size.toLong
            else ((BigInt(k - 1) * H) / BigInt(set.max)).toLong
          Iterator.single(KmvEstimate(t, set.size, est))
      }
  }

  def ewmaStream(spark: SparkSession, events: Dataset[EventRow],
                 watermarkDelay: String = "1 hour"): Dataset[EwmaFlag] = {
    import spark.implicits._
    import graft.operators.Events.{EwmaDays, EwmaMinCount, EwmaSpikeFactor}
    val DayMs = 86400000L
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (typ: String, rows: Iterator[EventRow], state: GroupState[EwmaState]) =>
          val st0 = state.getOption.getOrElse(
            EwmaState(Map.empty, Map.empty, Long.MinValue, Long.MinValue))
          var open = st0.open
          rows.foreach { e =>
            val d = Math.floorDiv(e.ts.getTime, DayMs)
            if (d > st0.lastClosed) open = open.updated(d, open.getOrElse(d, 0L) + 1L)
          }
          val wm = state.getCurrentWatermarkMs()
          var closed = st0.closed
          var firstDay = st0.firstDay
          var lastClosed = st0.lastClosed
          val out = Seq.newBuilder[EwmaFlag]
          if (open.nonEmpty) {
            val maxOpen = open.keys.max
            if (firstDay == Long.MinValue) firstDay = open.keys.min
            var d = if (lastClosed == Long.MinValue) firstDay else lastClosed + 1
            while (d <= maxOpen && (d + 1) * DayMs <= wm) {
              val cnt = open.getOrElse(d, 0L)
              if (d - firstDay >= EwmaDays) {
                val num = (1 to EwmaDays)
                  .map(k => closed.getOrElse(d - k, 0L) * (1L << (EwmaDays - k))).sum
                val spike = cnt * 255L > EwmaSpikeFactor * num && cnt >= EwmaMinCount
                out += EwmaFlag(typ, d, cnt, num * 1000L / 255L, spike)
              }
              closed = closed.updated(d, cnt).filter(_._1 >= d - EwmaDays + 1)
              open -= d
              lastClosed = d
              d += 1
            }
          }
          state.update(EwmaState(open, closed, firstDay, lastClosed))
          // next pending close boundary: lastClosed+1 may be an interior
          // gap day with no open entry (the sloBurnStream fix)
          if (open.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              if (lastClosed == Long.MinValue) (open.keys.min + 1) * DayMs
              else (lastClosed + 2) * DayMs,
              wm + 1))
          out.result().iterator
      }
  }

  case class DiurnalState(open: Map[Long, Long], sHod: Seq[Long], ssq: Long,
                          hodMask: Int, firstDay: Long, lastClosed: Long)
  case class DiurnalOut(event_type: String, day: Long, n_days: Long, total: Long,
                        present_hours: Long, eta2_milli: Long)

  /** Streaming diurnality strength — c51's live twin: the running η²
    * (how much of the hourly variance the clock explains) re-emitted
    * as each day CLOSES at the watermark, so "has this feed become
    * diurnal" is a live signal, not a backfill read. Days close in
    * event-time order with interior gap days folding in as the real
    * zero days batch c51's span accounting counts (they change n_days
    * and nothing else — exactly the batch semantics). State per type
    * is LITERAL-bounded: 24 hour-of-day sums + one Σcnt² long + a
    * 24-bit presence mask + the open cells inside the watermark
    * window. η² uses the identical integral formula (BigInt here,
    * DECIMAL(38) in batch), so the emissions are split-invariant and a
    * type whose data ends at its last closed day matches batch c51
    * verbatim (both spec-proven). The one honest delta: trailing
    * interior gap days — the stream counts a zero day the moment a
    * LATER event day closes past it, while a batch over the truncated
    * prefix cannot know the series continues (the gapFillStream
    * interior-only contract, here surfacing as a span difference the
    * spec replays exactly). Days whose closed prefix still has zero
    * variance emit nothing (batch's den > 0 filter).
    *
    * Σcnt² rides a Long: fine to ~3·10⁹ events per cell; at true
    * 100 TB rates feed merged per-(type, day, hod) pre-counts (the
    * sloBurnStream sharding note) — the state machine is unchanged. */
  def diurnalityStream(spark: SparkSession, events: Dataset[EventRow],
                       watermarkDelay: String = "1 hour"): Dataset[DiurnalOut] = {
    import spark.implicits._
    val DayMs = 86400000L
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (typ: String, rows: Iterator[EventRow], state: GroupState[DiurnalState]) =>
          val st0 = state.getOption.getOrElse(
            DiurnalState(Map.empty, Seq.fill(24)(0L), 0L, 0, Long.MinValue, Long.MinValue))
          var open = st0.open
          rows.foreach { e =>
            val ms = e.ts.getTime
            val d = Math.floorDiv(ms, DayMs)
            if (d > st0.lastClosed) {
              val k = d * 24 + (Math.floorDiv(ms, 3600000L) % 24)
              open = open.updated(k, open.getOrElse(k, 0L) + 1L)
            }
          }
          val wm = state.getCurrentWatermarkMs()
          val sHod = st0.sHod.toArray
          var ssq = st0.ssq
          var mask = st0.hodMask
          var firstDay = st0.firstDay
          var lastClosed = st0.lastClosed
          val out = Seq.newBuilder[DiurnalOut]
          if (open.nonEmpty) {
            val maxOpen = open.keys.max / 24
            if (firstDay == Long.MinValue) firstDay = open.keys.min / 24
            var d = if (lastClosed == Long.MinValue) firstDay else lastClosed + 1
            while (d <= maxOpen && (d + 1) * DayMs <= wm) {
              var h = 0
              while (h < 24) {
                val c = open.getOrElse(d * 24 + h, 0L)
                if (c > 0) { sHod(h) += c; ssq += c * c; mask |= (1 << h) }
                h += 1
              }
              open = open.filter(_._1 / 24 != d)
              lastClosed = d
              val nDays = lastClosed - firstDay + 1
              val s = sHod.map(BigInt(_)).sum
              val sh2 = sHod.map(v => BigInt(v) * BigInt(v)).sum
              val num = 1000 * (576 * sh2 - 24 * s * s)
              val den = 24 * (24 * BigInt(nDays) * BigInt(ssq) - s * s)
              if (den > 0)
                out += DiurnalOut(typ, d, nDays, s.toLong,
                  Integer.bitCount(mask).toLong, (num / den).toLong)
              d += 1
            }
          }
          state.update(DiurnalState(open, sHod.toSeq, ssq, mask, firstDay, lastClosed))
          if (open.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              if (lastClosed == Long.MinValue) (open.keys.min / 24 + 1) * DayMs
              else (lastClosed + 2) * DayMs,
              wm + 1))
          out.result().iterator
      }
  }

  case class SloHourOut(hour: Long, n_events: Long, n_errors: Long,
                        err_ppm: Long, burn_fast_milli: Long,
                        burn_slow_milli: Long, page: Boolean)
  case class SloState(open: Map[Long, (Long, Long)],
                      closed: Map[Long, (Long, Long)], lastClosed: Long)

  /** Streaming SLO burn-rate pager — c43's live twin
    * (Events.c43SloBurnOf): the multi-window burn-rate alert (Google
    * SRE Workbook ch.5) evaluated when each hour CLOSES, because an
    * SLO pager that only runs in backfill is not a pager. Hours close
    * in ascending event-time order once the watermark passes their
    * end (the ewmaStream/gapFillStream contract); interior gap hours
    * close as the real zeros batch c43 puts on its dense spine, so
    * the trailing-[[graft.operators.Events.SloSlowWindowHours]]h slow
    * window sums the SAME values and every closed hour's
    * fast/slow/page fields equal the batch row by construction
    * (spec-proven across micro-batch splits, planted error storm
    * included). Identical integer arithmetic — truncating div on ppm
    * and milli, no floats.
    *
    * The SLO series is GLOBAL, so the state machine is one group
    * (key = unit): open hour → (n, err) pairs + the trailing ≤
    * SloSlowWindowHours closed pairs — bounded regardless of stream
    * length. At 100 TB event rates the single-group funnel is the
    * honest cost of an exact global alert; production shards an
    * upstream keyed pre-count per (shard, hour) and feeds the merged
    * per-hour partials here (the per-hour traffic into this state
    * machine is then |shards| rows/hour, not the event stream). Late
    * data beyond the watermark drops — the one batch/stream delta
    * (measured by outOfOrderStream). */
  def sloBurnStream(spark: SparkSession, events: Dataset[EventRow],
                    watermarkDelay: String = "1 hour"): Dataset[SloHourOut] = {
    import spark.implicits._
    import graft.operators.Events.{SloBudgetPpm, SloFastBurnMilli,
      SloSlowBurnMilli, SloSlowWindowHours}
    val HourMs = 3600000L
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Int, rows: Iterator[EventRow], state: GroupState[SloState]) =>
          val st0 = state.getOption.getOrElse(
            SloState(Map.empty, Map.empty, Long.MinValue))
          var open = st0.open
          rows.foreach { e =>
            val h = Math.floorDiv(e.ts.getTime, HourMs)
            if (h > st0.lastClosed) {
              val (n, err) = open.getOrElse(h, (0L, 0L))
              open = open.updated(h,
                (n + 1L, err + (if (e.event_type == "error") 1L else 0L)))
            }
          }
          val wm = state.getCurrentWatermarkMs()
          var closed = st0.closed
          var lastClosed = st0.lastClosed
          val out = Seq.newBuilder[SloHourOut]
          if (open.nonEmpty) {
            val maxOpen = open.keys.max
            var h = if (lastClosed == Long.MinValue) open.keys.min else lastClosed + 1
            while (h <= maxOpen && (h + 1) * HourMs <= wm) {
              val (n, err) = open.getOrElse(h, (0L, 0L))
              closed = closed.updated(h, (n, err))
              val win = (0 until SloSlowWindowHours)
                .map(k => closed.getOrElse(h - k, (0L, 0L)))
              val n6 = win.map(_._1).sum
              val err6 = win.map(_._2).sum
              val errPpm = if (n == 0L) 0L else err * 1000000L / n
              val fast = if (n == 0L) 0L else errPpm * 1000L / SloBudgetPpm
              val slow = if (n6 == 0L) 0L
                         else (err6 * 1000000L / n6) * 1000L / SloBudgetPpm
              out += SloHourOut(h, n, err, errPpm, fast, slow,
                fast > SloFastBurnMilli && slow > SloSlowBurnMilli)
              closed = closed.filter(_._1 >= h - SloSlowWindowHours + 1)
              open -= h
              lastClosed = h
              h += 1
            }
          }
          state.update(SloState(open, closed, lastClosed))
          // wake at the NEXT pending close boundary — lastClosed+1 may
          // be an interior gap hour with no open entry, and keying the
          // timeout to open.keys.min would skip past its close time
          if (open.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              if (lastClosed == Long.MinValue) (open.keys.min + 1) * HourMs
              else (lastClosed + 2) * HourMs,
              wm + 1))
          out.result().iterator
      }
  }

  case class CusumOut(event_type: String, day_idx: Long, cnt: Long,
                      target: Long, slack: Long, s_cusum: Long, alarm: Boolean)
  case class CusumState(open: Map[Long, Long], firstDay: Long,
                        lastClosed: Long, baseSum: Long, cum: Long,
                        minCum: Long)

  /** Streaming tabular CUSUM changepoint detector — c44's live twin
    * (Events.c44CusumShiftOf): the sequential drift alarm evaluated
    * the moment each day CLOSES, which is the whole point of CUSUM —
    * its guarantee is optimal average DETECTION DELAY, and a detector
    * whose delay includes "wait for tomorrow's batch run" forfeits it.
    * Days close per type in ascending event-time order at the
    * watermark (the ewmaStream contract; interior gap days close as
    * the real zeros batch c44 puts on its dense spine — a dark feed
    * must drive the statistic down). The first
    * [[graft.operators.Events.CusumBaselineDays]] dense days fold
    * into the baseline sum; from then on the state carries the classic
    * recursion directly — S_t = max(0, S_{t−1} + y_t) via the same
    * prefix identity the batch form windows (cum and its running min,
    * two longs) — so every closed day's (target, slack, s_cusum,
    * alarm) equals the batch row by construction (spec-proven against
    * the REAL batch operator across micro-batch splits, planted level
    * shift included). All integer arithmetic, truncating div.
    *
    * State per type: the open day-count map (bounded by the watermark
    * horizon) + 5 longs — bounded regardless of stream length. Late
    * data beyond the watermark drops, the one batch/stream delta
    * (measured by outOfOrderStream). */
  def cusumStream(spark: SparkSession, events: Dataset[EventRow],
                  watermarkDelay: String = "1 hour"): Dataset[CusumOut] = {
    import spark.implicits._
    import graft.operators.Events.{CusumBaselineDays, CusumHFactor, CusumSlackDenom}
    val DayMs = 86400000L
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (typ: String, rows: Iterator[EventRow], state: GroupState[CusumState]) =>
          val st0 = state.getOption.getOrElse(
            CusumState(Map.empty, Long.MinValue, Long.MinValue, 0L, 0L, Long.MaxValue))
          var open = st0.open
          rows.foreach { e =>
            val d = Math.floorDiv(e.ts.getTime, DayMs)
            if (d > st0.lastClosed) open = open.updated(d, open.getOrElse(d, 0L) + 1L)
          }
          val wm = state.getCurrentWatermarkMs()
          var firstDay = st0.firstDay
          var lastClosed = st0.lastClosed
          var baseSum = st0.baseSum
          var cum = st0.cum
          var minCum = st0.minCum
          val out = Seq.newBuilder[CusumOut]
          if (open.nonEmpty) {
            val maxOpen = open.keys.max
            if (firstDay == Long.MinValue) firstDay = open.keys.min
            var d = if (lastClosed == Long.MinValue) firstDay else lastClosed + 1
            while (d <= maxOpen && (d + 1) * DayMs <= wm) {
              val cnt = open.getOrElse(d, 0L)
              if (d - firstDay < CusumBaselineDays) baseSum += cnt
              else {
                val target = baseSum / CusumBaselineDays
                val slack = math.max(1L, target / CusumSlackDenom)
                cum += cnt - target - slack
                minCum = math.min(minCum, cum)
                val s = cum - math.min(minCum, 0L)
                out += CusumOut(typ, d, cnt, target, slack, s,
                  s > slack * CusumHFactor)
              }
              open -= d
              lastClosed = d
              d += 1
            }
          }
          state.update(CusumState(open, firstDay, lastClosed, baseSum, cum, minCum))
          // next pending close boundary: lastClosed+1 may be an interior
          // gap day with no open entry (the sloBurnStream fix)
          if (open.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              if (lastClosed == Long.MinValue) (open.keys.min + 1) * DayMs
              else (lastClosed + 2) * DayMs,
              wm + 1))
          out.result().iterator
      }
  }

  case class DrawdownOut(event_type: String, day_idx: Long, n_events: Long,
                         peak_n: Long, drawdown: Long, drawdown_bp: Long,
                         is_worst: Boolean)
  case class DrawdownState(open: Map[Long, Long], firstDay: Long,
                           lastClosed: Long, peak: Long, worstDd: Long,
                           worstDay: Long)

  /** Streaming drawdown monitor — c55's live twin: "how far below its
    * own peak is this feed RIGHT NOW" evaluated as each day closes,
    * because a demand-loss signal read in tomorrow's backfill is a
    * post-mortem, not a monitor. Days close per type in ascending
    * event-time order at the watermark (interior gap days close as
    * the real zeros of c55's dense spine — a dark day IS the deepest
    * drawdown); state carries the running peak and the worst
    * (drawdown, earliest-day) seen, so each emitted row's
    * peak/drawdown/bp equal the batch prefix by construction and
    * `is_worst` marks rows that set a new maximum — the alert edge.
    * State per type: the open day map (watermark-bounded) + 4 longs. */
  def drawdownStream(spark: SparkSession, events: Dataset[EventRow],
                     watermarkDelay: String = "1 hour"): Dataset[DrawdownOut] = {
    import spark.implicits._
    val DayMs = 86400000L
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (typ: String, rows: Iterator[EventRow], state: GroupState[DrawdownState]) =>
          val st0 = state.getOption.getOrElse(
            DrawdownState(Map.empty, Long.MinValue, Long.MinValue, 0L, -1L, Long.MinValue))
          var open = st0.open
          rows.foreach { e =>
            val d = Math.floorDiv(e.ts.getTime, DayMs)
            if (d > st0.lastClosed) open = open.updated(d, open.getOrElse(d, 0L) + 1L)
          }
          val wm = state.getCurrentWatermarkMs()
          var firstDay = st0.firstDay
          var lastClosed = st0.lastClosed
          var peak = st0.peak
          var worstDd = st0.worstDd
          var worstDay = st0.worstDay
          val out = Seq.newBuilder[DrawdownOut]
          if (open.nonEmpty) {
            val maxOpen = open.keys.max
            if (firstDay == Long.MinValue) firstDay = open.keys.min
            var d = if (lastClosed == Long.MinValue) firstDay else lastClosed + 1
            while (d <= maxOpen && (d + 1) * DayMs <= wm) {
              val cnt = open.getOrElse(d, 0L)
              peak = math.max(peak, cnt)
              val dd = peak - cnt
              val isWorst = dd > worstDd
              if (isWorst) { worstDd = dd; worstDay = d }
              out += DrawdownOut(typ, d, cnt, peak, dd,
                if (peak > 0) dd * 10000 / peak else 0L, isWorst)
              open -= d
              lastClosed = d
              d += 1
            }
          }
          state.update(DrawdownState(open, firstDay, lastClosed, peak, worstDd, worstDay))
          if (open.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              if (lastClosed == Long.MinValue) (open.keys.min + 1) * DayMs
              else (lastClosed + 2) * DayMs,
              wm + 1))
          out.result().iterator
      }
  }

  case class MkOut(event_type: String, day_idx: Long, n_days: Long,
                   s_stat: Long, var18: Long, verdict: String)
  case class MkState(open: Map[Long, Long], closedVals: Map[Long, Long],
                     firstDay: Long, lastClosed: Long, s: Long)

  /** Streaming Mann–Kendall trend monitor — c53's live twin
    * (Events.c53MannKendallOf): the directed monotone-trend verdict
    * re-evaluated the moment each day CLOSES, so "this feed started
    * growing" pages while it is still growing, not in tomorrow's
    * batch. The O(d²) pair sweep batch c53 runs is replaced by the
    * incremental identity: when a day with count x joins a series
    * whose closed daily counts have value-multiset M, S gains
    * #{v ∈ M: v < x} − #{v ∈ M: v > x} — the new day's pairs against
    * every older day, nothing else changes. Days close per type in
    * ascending event-time order at the watermark; interior gap days
    * close as the real zeros c53 puts on its dense spine (a dark feed
    * IS a trend signal). The tie-corrected variance and the exact
    * ±1-continuity 5% verdict (11250·(|S|−1)² vs 2401·var18, BigInt —
    * the batch integers verbatim) are recomputed per close from the
    * value-count map, so every emitted row equals batch c53 run over
    * the closed prefix by construction (spec-proven across
    * micro-batch splits).
    *
    * State per type: open day-counts (watermark-horizon-bounded) + the
    * closed VALUE-count map — bounded by distinct daily totals, ≤ the
    * calendar day count, never corpus-sized — + 3 longs. */
  def mannKendallStream(spark: SparkSession, events: Dataset[EventRow],
                        watermarkDelay: String = "1 hour"): Dataset[MkOut] = {
    import spark.implicits._
    val DayMs = 86400000L
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (typ: String, rows: Iterator[EventRow], state: GroupState[MkState]) =>
          val st0 = state.getOption.getOrElse(
            MkState(Map.empty, Map.empty, Long.MinValue, Long.MinValue, 0L))
          var open = st0.open
          rows.foreach { e =>
            val d = Math.floorDiv(e.ts.getTime, DayMs)
            if (d > st0.lastClosed) open = open.updated(d, open.getOrElse(d, 0L) + 1L)
          }
          val wm = state.getCurrentWatermarkMs()
          var closedVals = st0.closedVals
          var firstDay = st0.firstDay
          var lastClosed = st0.lastClosed
          var s = st0.s
          val out = Seq.newBuilder[MkOut]
          if (open.nonEmpty) {
            val maxOpen = open.keys.max
            if (firstDay == Long.MinValue) firstDay = open.keys.min
            var d = if (lastClosed == Long.MinValue) firstDay else lastClosed + 1
            while (d <= maxOpen && (d + 1) * DayMs <= wm) {
              val cnt = open.getOrElse(d, 0L)
              var below = 0L
              var above = 0L
              closedVals.foreach { case (v, c) =>
                if (v < cnt) below += c else if (v > cnt) above += c
              }
              s += below - above
              closedVals = closedVals.updated(cnt, closedVals.getOrElse(cnt, 0L) + 1L)
              open -= d
              lastClosed = d
              val n = lastClosed - firstDay + 1
              var tieTerm = BigInt(0)
              closedVals.valuesIterator.foreach { t =>
                tieTerm += BigInt(t) * (t - 1) * (2 * t + 5)
              }
              val var18 = BigInt(n) * (n - 1) * (2 * n + 5) - tieTerm
              val lhs = BigInt(11250) * (s.abs - 1) * (s.abs - 1)
              val verdict =
                if (var18 == 0) "degenerate"
                else if (s > 0 && lhs > BigInt(2401) * var18) "trend_up"
                else if (s < 0 && lhs > BigInt(2401) * var18) "trend_down"
                else "no_trend"
              out += MkOut(typ, d, n, s, var18.toLong, verdict)
              d += 1
            }
          }
          state.update(MkState(open, closedVals, firstDay, lastClosed, s))
          if (open.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              if (lastClosed == Long.MinValue) (open.keys.min + 1) * DayMs
              else (lastClosed + 2) * DayMs,
              wm + 1))
          out.result().iterator
      }
  }

  /** One silence/recovery alert. `kind` ∈ {"silent", "resumed"};
    * downtime_ms is the crossed threshold for "silent" (actual outage
    * length unknown at detection time) and the measured last-seen →
    * first-new gap for "resumed". */
  case class SilenceOut(event_type: String, kind: String,
                        last_seen: java.sql.Timestamp, n_events: Long,
                        downtime_ms: Long)
  case class SilenceState(lastTs: Long, nEvents: Long, silentEmitted: Boolean)

  /** Heartbeat/silence detector per event type — the on-call alert a
    * scheduled scraper fleet needs most ("source X stopped sending"; the
    * reference polls sources on `scrape_interval`, a11 finds DUE
    * sources batch-side — this detects DEAD ones live). A type that was
    * flowing goes silent when the WATERMARK passes last_seen + the
    * silence threshold — event-time timeouts, so detection is
    * deterministic and replay-stable, never wall-clock — and emits ONE
    * "silent" alert (no re-alerting while down: alert fatigue is a
    * bug); the first event after a detected silence emits "resumed"
    * with the measured downtime. State per type is three fields —
    * |types|-bounded, trivially outliving 100 TB/day throughput; the
    * only shuffle is the groupByKey on the type. */
  case class StickOut(week: Long, n_days: Long, n_events: Long, wau: Long,
                      dau_sum: Long, stickiness_bp: Long)
  case class StickState(days: Map[Long, Set[Long]], counts: Map[Long, Long])

  /** Streaming weekly stickiness — c56's live twin
    * (Events.c56WeeklyStickinessOf): the DAU/WAU engagement row emitted
    * the moment a week CLOSES (watermark past its last day), instead
    * of in the next batch run. Keyed by week, so a week's group folds
    * exactly the events batch c56 would give it; the next week's
    * traffic advances the watermark and the closed week emits via
    * event-time timeout — one row per week, append-mode clean.
    *
    * State per OPEN week (typically one, two at a boundary): per-day
    * active-id sets + per-day counts — the c56 exact-tier bound
    * (O(weekly active ids); the same sets `bitset_agg` holds as
    * 1/64th-size word maps — encode them so if weekly actives warrant
    * it; the unbounded-domain tier remains kmvStream). Every emitted
    * row equals batch c56 over that week by construction — the fold
    * IS the definition (exact distinct per day, exact union per
    * week), spec-proven across micro-batch splits. */
  def stickinessStream(spark: SparkSession, events: Dataset[EventRow],
                       watermarkDelay: String = "1 hour"): Dataset[StickOut] = {
    import spark.implicits._
    val DayMs = 86400000L
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(e => Math.floorDiv(Math.floorDiv(e.ts.getTime, DayMs), 7L))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (week: Long, rows: Iterator[EventRow], state: GroupState[StickState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            val nDays = s.days.size.toLong
            val dauSum = s.days.valuesIterator.map(_.size.toLong).sum
            val wau = s.days.valuesIterator.foldLeft(Set.empty[Long])(_ ++ _).size.toLong
            Iterator.single(StickOut(week, nDays, s.counts.valuesIterator.sum,
              wau, dauSum,
              if (nDays > 0 && wau > 0) dauSum * 10000 / (nDays * wau) else 0L))
          } else {
            var s = state.getOption.getOrElse(StickState(Map.empty, Map.empty))
            rows.foreach { e =>
              val d = Math.floorDiv(e.ts.getTime, DayMs)
              s = StickState(
                s.days.updated(d, s.days.getOrElse(d, Set.empty[Long]) + e.user_id),
                s.counts.updated(d, s.counts.getOrElse(d, 0L) + 1L))
            }
            state.update(s)
            // close when the watermark passes the week's last day
            state.setTimeoutTimestamp(math.max((week + 1) * 7 * DayMs,
              state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  case class TurnoverOut(day: Long, dau: Long, prev_dau: java.lang.Long,
                         common: java.lang.Long, retained_bp: java.lang.Long,
                         new_users: java.lang.Long, churned_users: java.lang.Long)
  case class TurnoverState(open: Map[Long, Set[Long]], lastClosed: Long,
                           prevSet: Set[Long])

  /** Streaming day-over-day turnover — c59's live twin
    * (Events.c59UserTurnoverOf): retained/churned/new user counts
    * emitted the moment each day CLOSES at the watermark, so "we
    * churned half of yesterday" pages today. Days close in event-time
    * order; each closed day's active set is intersected with the
    * previous CLOSED day's set only when they are calendar-adjacent —
    * a dark gap reports NULLs exactly as batch c59 does (same
    * calendar-honesty contract), and the gap itself is silence/
    * downtime territory.
    *
    * Global series = one state group (the sloBurn honesty note): open
    * day id-sets + ONE previous closed set — O(DAU) per open day, the
    * c59/c56 exact-tier bound; production shards an upstream keyed
    * pre-aggregation. Every emitted row equals the batch operator
    * over the closed prefix by construction (the fold IS the
    * definition), spec-proven across micro-batch splits. */
  def turnoverStream(spark: SparkSession, events: Dataset[EventRow],
                     watermarkDelay: String = "1 hour"): Dataset[TurnoverOut] = {
    import spark.implicits._
    val DayMs = 86400000L
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Int, rows: Iterator[EventRow], state: GroupState[TurnoverState]) =>
          val st0 = state.getOption.getOrElse(
            TurnoverState(Map.empty, Long.MinValue, Set.empty))
          var open = st0.open
          rows.foreach { e =>
            val d = Math.floorDiv(e.ts.getTime, DayMs)
            if (d > st0.lastClosed)
              open = open.updated(d, open.getOrElse(d, Set.empty[Long]) + e.user_id)
          }
          val wm = state.getCurrentWatermarkMs()
          var lastClosed = st0.lastClosed
          var prevSet = st0.prevSet
          val out = Seq.newBuilder[TurnoverOut]
          open.keys.toSeq.sorted.foreach { d =>
            if ((d + 1) * DayMs <= wm) {
              val cur = open(d)
              val adjacent = lastClosed == d - 1
              if (adjacent) {
                val common = (cur & prevSet).size.toLong
                val prevN = prevSet.size.toLong
                out += TurnoverOut(d, cur.size.toLong, prevN, common,
                  if (prevN > 0) common * 10000 / prevN else 0L,
                  cur.size.toLong - common, prevN - common)
              } else
                out += TurnoverOut(d, cur.size.toLong, null, null, null, null, null)
              prevSet = cur
              lastClosed = d
              open -= d
            }
          }
          state.update(TurnoverState(open, lastClosed, prevSet))
          if (open.nonEmpty)
            state.setTimeoutTimestamp(math.max((open.keys.min + 1) * DayMs, wm + 1))
          out.result().iterator
      }
  }

  /** Streaming INGEST into a CommitLog table — the append half of the
    * lakehouse loop live (compactStream maintains a MERGED snapshot;
    * this is the raw landing table a daily/streaming load feeds): each
    * micro-batch lands as ONE `append` version (O(batch), never a
    * table rewrite) through `appendIdempotent`, so foreachBatch's
    * at-least-once replay becomes exactly-once in the table — the
    * batch id IS the idempotence token, durable in the dir name the
    * log entry lists. Readers see whole batches or nothing (the
    * format's atomic publish); `erase`/`compact`/time travel all
    * compose on the result. */
  def ingestStream(rows: DataFrame, table: String, checkpointDir: String) =
    rows.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sources.CommitLogTableFormat.appendIdempotent(
          batch.sparkSession, table, batch, s"b$batchId")
        ()
      }

  /** Streaming MERGE-ON-READ upsert into the CommitLog table — the
    * CDC-consumer sink: each micro-batch is the new truth for the keys
    * it carries (`upsertByKey` — matched rows DV-hidden, the batch
    * appended as one dir, ONE atomic version per batch, O(batch + key
    * hit scan) never a rewrite), exactly-once under foreachBatch's
    * at-least-once replay via `upsertIdempotent`'s durable batch
    * token. The streaming twin of a7's batch CDC compaction with the
    * table format doing the heavy lifting: readers see whole batches
    * or nothing, time travel sees pre-batch truth, `changesBetween`
    * turns any batch transition back into its insert/delete feed. */
  def upsertStream(rows: DataFrame, table: String, keyCol: String,
                   checkpointDir: String) =
    rows.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sources.CommitLogTableFormat.upsertIdempotent(
          batch.sparkSession, table, batch, keyCol, s"b$batchId")
        ()
      }

  /** Streaming CHECKED ingest with a dead-letter table — the DLQ
    * pattern a production feed needs (rejecting a whole micro-batch
    * for one bad row stalls the pipeline; silently dropping bad rows
    * destroys evidence): each micro-batch splits on the conjunction
    * of the declared constraints (NULL = violation, the commitChecked
    * contract), passing rows append to the MAIN CommitLog table and
    * violating rows — with a `_violated` column naming every failed
    * constraint — to the QUARANTINE table, each via its own
    * `appendIdempotent` token so replay is exactly-once on BOTH
    * sides. Quarantine rows retain full payload: a fixed upstream can
    * re-ingest them (TextSources' quarantine discipline at the table
    * grain). */
  def checkedIngestStream(rows: DataFrame, table: String, quarantine: String,
                          constraints: Seq[(String, org.apache.spark.sql.Column)],
                          checkpointDir: String) = {
    import org.apache.spark.sql.functions.{array, array_compact, coalesce, lit, when}
    rows.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ok = constraints
          .map { case (_, c) => coalesce(c, lit(false)) }
          .reduceOption(_ && _).getOrElse(lit(true))
        val tagged = batch.withColumn("_violated", array_compact(array(
          constraints.map { case (name, c) =>
            when(!coalesce(c, lit(false)), lit(name))
          }: _*)))
          // persist: the split drives up to THREE actions (count + two
          // appends) over the same batch plan — without it each action
          // re-runs the source's batch read, and a source whose re-read
          // is not perfectly deterministic could hand the good and bad
          // appends DIVERGING splits of the same micro-batch (the
          // staged-validate discipline TableFormat already applies)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // ONE aggregation serves both emptiness decisions, and an
          // empty side skips its append entirely: a violation-only
          // batch must not churn an empty-dir version onto the main
          // table (nor a clean batch onto the quarantine) — skipping
          // is itself replayable, so exactly-once holds on both sides
          val row = tagged.agg(
            count(lit(1)).as("n"),
            sum(when(size(col("_violated")) > 0, 1L).otherwise(0L)).as("nbad"))
            .head()
          val n = row.getLong(0)
          val nBad = if (row.isNullAt(1)) 0L else row.getLong(1)
          if (n - nBad > 0)
            graft.sources.CommitLogTableFormat.appendIdempotent(
              batch.sparkSession, table, tagged.filter(ok).drop("_violated"),
              s"b$batchId")
          if (nBad > 0)
            graft.sources.CommitLogTableFormat.appendIdempotent(
              batch.sparkSession, quarantine, tagged.filter(!ok), s"b$batchId")
        } finally { tagged.unpersist(); () }
        ()
      }
  }

  case class PeakOut(event_type: String, day: Long, n_events: Long,
                     prev_cnt: Long, next_cnt: Long, trailing7: Long)
  case class PeakState(firstDay: Long, lastClosed: Long, ring: Seq[Long],
                       open: Map[Long, Long])

  /** c61's streaming twin: daily peak detection per event type with
    * the SAME dense-grid semantics — a day's verdict needs its NEXT
    * day's count, so day d is judged once the watermark closes d+1;
    * silent days zero-fill exactly as the batch grid does (the state
    * walks every calendar day from the last closed one to the
    * watermark, absent days counting 0). State per type: the open
    * day→count map plus the trailing ring of the last 8 CLOSED daily
    * counts (7-day window + the prev inside it — constant size; the
    * grid is contiguous after zero-fill so days are implicit). Emits
    * exactly the batch c61 rows for any in-order feed whose first
    * event lands on the batch grid's first day; the full-window rule
    * (nwin = 7) is enforced by requiring 8 closed counts before the
    * first verdict. */
  def peakStream(spark: SparkSession, events: Dataset[EventRow],
                 watermarkDelay: String = "1 hour"): Dataset[PeakOut] = {
    import spark.implicits._
    val DayMs = 86400000L
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (typ: String, rows: Iterator[EventRow], state: GroupState[PeakState]) =>
          var st = state.getOption.getOrElse(
            PeakState(Long.MinValue, Long.MinValue, Seq.empty, Map.empty))
          rows.foreach { e =>
            val d = Math.floorDiv(e.ts.getTime, DayMs)
            if (st.firstDay == Long.MinValue)
              st = st.copy(firstDay = d, lastClosed = d - 1)
            if (d > st.lastClosed)
              st = st.copy(open = st.open.updated(d, st.open.getOrElse(d, 0L) + 1L))
          }
          val out = Seq.newBuilder[PeakOut]
          if (st.firstDay != Long.MinValue) {
            val wm = state.getCurrentWatermarkMs()
            val wmDay = Math.floorDiv(wm, DayMs) // days < wmDay are closed
            var d = st.lastClosed + 1
            while (d < wmDay) {
              val cnt = st.open.getOrElse(d, 0L)
              val ring = (st.ring :+ cnt).takeRight(8)
              // judge x = d - 1: the 8 ring entries are days d-7 .. d,
              // i.e. x's FULL trailing week (x-6 .. x = idx 0..6), its
              // prev inside it (idx 5) and its next (idx 7) — exactly
              // batch c61's nwin = 7 rule, first verdict at day
              // firstDay + 6 like the batch grid
              if (ring.size == 8) {
                val x = d - 1
                val cntX = ring(6)
                val prev = ring(5)
                val next = ring(7)
                val sum7 = ring.take(7).sum
                if (cntX > prev && cntX >= next && cntX * 70 >= sum7 * 12)
                  out += PeakOut(typ, x, cntX, prev, next, sum7)
              }
              st = st.copy(lastClosed = d, ring = ring, open = st.open - d)
              d += 1
            }
            state.update(st)
            state.setTimeoutTimestamp(math.max((st.lastClosed + 2) * DayMs, wm + 1))
          } else state.update(st)
          out.result().iterator
      }
  }

  case class SampleDoc(doc_id: Long, source: String, weight: Long)
  case class SampleOut(source: String, rank: Long, doc_id: Long,
                       weight: Long, priority: Long)
  case class SampleState(best: Seq[(Long, Long, Long)]) // (priority, doc_id, weight)

  /** d111's streaming twin: the weighted reservoir — per source, keep
    * the K smallest deterministic Efraimidis–Spirakis priorities seen
    * so far (ONE K-row state per source, independent of stream
    * length — the textbook streaming property of priority sampling:
    * the sample over any prefix equals the batch sample over that
    * prefix, because "top-K by a per-item priority" commutes with
    * arrival order). Emits each source's refreshed sample whenever a
    * batch touches it (Update mode). Same integer priority as the
    * batch d111, so replaying a corpus through this stream ends in
    * EXACTLY d111's rows. */
  def weightedSampleStream(spark: SparkSession, docs: Dataset[SampleDoc],
                           k: Int = graft.operators.TextOps.SampleK)
      : Dataset[SampleOut] = {
    import spark.implicits._
    val M = graft.operators.TextOps.SampleMod
    docs.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[SampleDoc], state: GroupState[SampleState]) =>
          var best = state.getOption.map(_.best).getOrElse(Seq.empty)
          rows.foreach { doc =>
            val u = Math.floorMod(doc.doc_id * 2654435761L, M)
            val pri = (M - u) * 1000000000L / doc.weight
            best = ((pri, doc.doc_id, doc.weight) +: best)
              .sortBy(t => (t._1, t._2)).take(k)
          }
          state.update(SampleState(best))
          best.zipWithIndex.iterator.map { case ((pri, id, w), i) =>
            SampleOut(src, i + 1L, id, w, pri)
          }
      }
  }

  def silenceStream(spark: SparkSession, events: Dataset[EventRow],
                    silenceMs: Long = 3600000L,
                    watermarkDelay: String = "10 seconds"): Dataset[SilenceOut] = {
    import spark.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (typ: String, rows: Iterator[EventRow], state: GroupState[SilenceState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            // mark silent, keep state for the recovery edge; no new
            // timeout — one alert per outage, the next event re-arms
            state.update(s.copy(silentEmitted = true))
            Iterator.single(SilenceOut(typ, "silent",
              new java.sql.Timestamp(s.lastTs), s.nEvents, silenceMs))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val out = Seq.newBuilder[SilenceOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) =>
                  if (s.silentEmitted)
                    out += SilenceOut(typ, "resumed",
                      new java.sql.Timestamp(s.lastTs), s.nEvents,
                      math.max(0L, t - s.lastTs))
                  cur = Some(SilenceState(math.max(s.lastTs, t), s.nEvents + 1,
                    silentEmitted = false))
                case None =>
                  cur = Some(SilenceState(t, 1, silentEmitted = false))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // clamp vs the watermark (the sessionize discipline):
              // non-future timeout timestamps kill the query
              val floor = state.getCurrentWatermarkMs() + 1
              state.setTimeoutTimestamp(math.max(s.lastTs + silenceMs, floor))
            }
            out.result().iterator
          }
      }
  }
}
