package graft.operators

import graft.{Cols, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series operators over the events stream table (SURVEY.md §2.C).
  * Batch forms here; Structured Streaming equivalents live in
  * graft.streaming (same logic, incremental execution).
  */
object Events {
  import Cols._

  /** Tumbling-window aggregation (1 hour) per event type. At scale this
    * is a single map-side-combined shuffle on (window, type). */
  def c1HourlyWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(dec2(col("value"))).cast("double").as("total_value"))
      .orderBy(col("window_start"), col("event_type"))

  val c1Sql: String =
    """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value FROM events)
      |SELECT date_trunc('hour', ts) AS window_start, event_type,
      |  count(*) AS n_events, count(DISTINCT user_id) AS n_users,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Gap-based sessionization (30-minute inactivity gap): lag over a
    * per-user window marks session starts; one shuffle on user_id. */
  def c2Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > 1800L * 1000000L, lit(1))
          .otherwise(lit(0)))
      .groupBy(col("user_id"))
      .agg(countIf(col("new_sess") === 1).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  val c2Sql: String =
    """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id FROM events),
      |flagged AS (
      |  SELECT user_id,
      |    CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, count(CASE WHEN new_sess = 1 THEN 1 END) AS n_sessions, count(*) AS n_events
      |FROM flagged GROUP BY user_id ORDER BY user_id""".stripMargin

  /** As-of join: for each purchase, the latest click at-or-before it by
    * the same user. Implemented as union + single per-user window pass
    * (last_value ignoreNulls) — ONE shuffle, no range cross-join, which
    * is the only shape that survives 100 TB.
    *
    * Tie rule: a click at exactly the purchase ts counts (≤), so clicks
    * sort before purchases at equal ts via the is_purchase flag.
    */
  def c3AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val tagged = e.filter(col("event_type").isin("click", "purchase"))
      .withColumn("is_purchase", (col("event_type") === "purchase").cast("int"))
      .withColumn("click_ts", when(col("event_type") === "click", col("ts")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_purchase"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
      .filter(col("is_purchase") === 1)
      .select(col("event_id"), col("user_id"), col("ts"), col("last_click_ts"))
      .orderBy(col("event_id"))
  }

  val c3Sql: String =
    """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events)
      |SELECT p.event_id, p.user_id, p.ts,
      |  (SELECT max(c.ts) FROM e c
      |   WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts) AS last_click_ts
      |FROM e p WHERE p.event_type = 'purchase' ORDER BY p.event_id""".stripMargin

  /** Semi-structured extraction: pull typed fields out of the JSON
    * props column and aggregate — all codegen'd (get_json_object). */
  def c4JsonExtract(spark: SparkSession, dir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(k).as("k_sum"),
        (sum(k).cast("double") / count(lit(1))).as("k_avg"),
        min(k).as("k_min"),
        max(k).as("k_max"))
      .orderBy(col("event_type"))
  }

  val c4Sql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum,
      |  CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS DOUBLE) / count(*) AS k_avg,
      |  min(CAST(props->>'$.k' AS BIGINT)) AS k_min,
      |  max(CAST(props->>'$.k' AS BIGINT)) AS k_max
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Range join: clicks within [purchase − 10 min, purchase] per user.
    * Scalable shape: equi-join on (user, 10-min bucket) with the probe
    * side exploded to its two covering buckets, then the exact range
    * filter — never an unbounded inequality join. */
  def c5RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val bucketLen = 600L * 1000000L
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
      .withColumn("b0", floor(unix_micros(col("ts")) / bucketLen))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"))
      .withColumn("b", floor(unix_micros(col("cts")) / bucketLen))
    val counts = p.withColumn("b", explode(array(col("b0"), col("b0") - 1)))
      .join(c, Seq("user_id", "b"))
      .filter(col("cts") >= col("ts") - expr("INTERVAL 10 MINUTES") && col("cts") <= col("ts"))
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_recent_clicks"))
    p.select(col("event_id"), col("user_id"), col("ts"))
      .join(counts, Seq("event_id"), "left_outer")
      .withColumn("n_recent_clicks", coalesce(col("n_recent_clicks"), lit(0L)))
      .orderBy(col("event_id"))
  }

  val c5Sql: String =
    """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events)
      |SELECT p.event_id, p.user_id, p.ts,
      |  (SELECT count(*) FROM e c WHERE c.user_id = p.user_id AND c.event_type = 'click'
      |     AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts <= p.ts) AS n_recent_clicks
      |FROM e p WHERE p.event_type = 'purchase' ORDER BY p.event_id""".stripMargin

  /** c6: ordered funnel analysis — users progressing view → click →
    * purchase IN ORDER. A stage event qualifies if a qualified
    * previous-stage event precedes it in (ts, event_id) order.
    *
    * Shape: ONE shuffle on user_id; the stage dependency is two
    * cumulative-window passes over the SAME (partition, sort) spec —
    * no self-joins, no per-stage re-scan of the events table (the
    * classic 3-join funnel re-shuffles the corpus once per stage). */
  def c6Funnel(spark: SparkSession, dir: String): DataFrame =
    funnelOf(Tables.events(spark, dir))

  /** Funnel counts over ANY events-shaped frame (the batch reference the
    * streaming twin cross-checks against). */
  def funnelOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = events
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .withColumn("first_view",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("qclick", col("event_type") === "click" && col("first_view").isNotNull)
      .withColumn("first_qclick", min(when(col("qclick"), col("ts"))).over(w))
    staged.agg(
      countDistinct(when(col("event_type") === "view", col("user_id"))).as("users_view"),
      countDistinct(when(col("qclick"), col("user_id"))).as("users_click"),
      countDistinct(when(col("event_type") === "purchase" && col("first_qclick").isNotNull,
        col("user_id"))).as("users_purchase"))
  }

  val c6Sql: String =
    """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |s1 AS (
      |  SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS first_view
      |  FROM e),
      |s2 AS (
      |  SELECT *, event_type = 'click' AND first_view IS NOT NULL AS qclick FROM s1),
      |s3 AS (
      |  SELECT *, min(CASE WHEN qclick THEN ts END)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS first_qclick
      |  FROM s2)
      |SELECT
      |  count(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS users_view,
      |  count(DISTINCT CASE WHEN qclick THEN user_id END) AS users_click,
      |  count(DISTINCT CASE WHEN event_type = 'purchase' AND first_qclick IS NOT NULL
      |    THEN user_id END) AS users_purchase
      |FROM s3""".stripMargin

  /** c7: weekly cohort retention — the classic product-analytics
    * matrix: users grouped by the week of their FIRST event (cohort),
    * counted per subsequent week offset. Two user_id-keyed exchanges:
    * the per-user min aggregate and the (cohort, offset) count-distinct;
    * the per-user first-week frame joins back on user_id (shuffle-
    * bucketed — at 100 TB the per-user side is user-cardinality-sized,
    * not broadcastable). Week truncation and the day-diff/7 offset are
    * integer-exact and engine-portable (both engines truncate weeks to
    * Monday 00:00, so the day difference is always divisible by 7). */
  def c7CohortRetention(spark: SparkSession, dir: String): DataFrame = {
    // cohort = min week over an unordered per-user window: ONE user_id
    // exchange and ONE events scan (the agg+join-back form costs a
    // second scan and a second user_id exchange for the same rows)
    val perUser = Window.partitionBy(col("user_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
      .withColumn("cohort_week", min(col("wk")).over(perUser))
      .groupBy(col("cohort_week"),
        (datediff(col("wk"), col("cohort_week")) / 7).cast("int").as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  val c7Sql: String =
    """WITH e AS (
      |  SELECT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk FROM events),
      |first AS (
      |  SELECT user_id, min(wk) AS cohort_week FROM e GROUP BY user_id)
      |SELECT cohort_week,
      |  CAST(date_diff('day', cohort_week, wk) // 7 AS INTEGER) AS week_offset,
      |  count(DISTINCT user_id) AS n_users
      |FROM e JOIN first USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** c8: inter-event gap distribution — per-user time between
    * consecutive events (lag over a user-keyed window, (ts, event_id)
    * tie-break for determinism), summarized per event type of the LATER
    * event with EXACT discrete percentiles (q21's rank-selection idiom:
    * the value at rank ⌈q·n⌉ — no interpolation, so results are
    * integers both engines agree on bit-for-bit). Two exchanges: the
    * user window, then the type window; the final per-type aggregate
    * reuses the type partitioning. Exact per-type percentiles need a
    * per-type total order — the ~handful of event types makes that the
    * right price here; at 100 TB-per-type cardinalities the sketch twin
    * (q22 approx_percentile) is the scale path, same as q21 vs q22. */
  def c8InterEvent(spark: SparkSession, dir: String): DataFrame = {
    val wUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gaps = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(wUser))
      .filter(col("prev_ts").isNotNull)
      .select(col("event_type"),
        (unix_micros(col("ts")) - unix_micros(col("prev_ts"))).as("gap_us"))
    val wT = Window.partitionBy(col("event_type"))
    gaps
      .withColumn("rn", row_number().over(wT.orderBy(col("gap_us"))))
      .withColumn("cnt", count(lit(1)).over(wT))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_gaps"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"),
        max(when(col("rn") === ceil(col("cnt") / 2.0), col("gap_us"))).as("p50_us"),
        max(when(col("rn") === ceil(col("cnt") * 9 / lit(10.0)), col("gap_us"))).as("p90_us"))
      .orderBy(col("event_type"))
  }

  val c8Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
      |gaps AS (
      |  SELECT event_type,
      |    epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
      |      AS gap_us
      |  FROM e),
      |r AS (
      |  SELECT event_type, gap_us,
      |    row_number() OVER (PARTITION BY event_type ORDER BY gap_us) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS cnt
      |  FROM gaps WHERE gap_us IS NOT NULL)
      |SELECT event_type, count(*) AS n_gaps,
      |  min(gap_us) AS min_gap_us, max(gap_us) AS max_gap_us,
      |  max(CASE WHEN rn = CAST(ceil(cnt / 2.0) AS BIGINT) THEN gap_us END) AS p50_us,
      |  max(CASE WHEN rn = CAST(ceil(cnt * 9 / 10.0) AS BIGINT) THEN gap_us END) AS p90_us
      |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin

  /** c9: RFM segmentation — the user-value classification behind
    * retention/marketing analytics: per user, Recency (days since last
    * event vs the corpus as-of — max event date, no wall clock, a11's
    * reproducibility rule), Frequency (event count) and Monetary
    * (DECIMAL-exact value sum), each cut into quartiles and composed
    * into the classic 3-digit segment. The as-of comes from an
    * unpartitioned max over the ALREADY-REDUCED per-user frame (no
    * 1-row broadcast join), and the ntile windows run over the same
    * reduced frame — one corpus scan, one user exchange. Quartile
    * ties break on user_id, so segments are deterministic. ntile
    * needs a total order over users; at 100 TB-user cardinalities the
    * scale path is sketch cutpoints (q22's approx_percentile) applied
    * as a broadcast map — same output schema. */
  def c9RfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        max(to_date(col("ts"))).as("last_date"),
        count(lit(1)).as("frequency"),
        sum(dec2(col("value"))).as("mon_dec"))
      .withColumn("asof_date", max(col("last_date")).over(Window.partitionBy()))
      .withColumn("recency_days", datediff(col("asof_date"), col("last_date")))
    per
      .withColumn("r_q", ntile(4).over(Window.orderBy(col("recency_days"), col("user_id"))))
      .withColumn("f_q", ntile(4).over(Window.orderBy(col("frequency").desc, col("user_id"))))
      .withColumn("m_q", ntile(4).over(Window.orderBy(col("mon_dec").desc, col("user_id"))))
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("mon_dec").cast("double").as("monetary"),
        col("r_q"), col("f_q"), col("m_q"),
        concat(col("r_q"), col("f_q"), col("m_q")).as("segment"))
      .orderBy(col("user_id"))
  }

  val c9Sql: String =
    """WITH per AS (
      |  SELECT user_id, max(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS last_date,
      |    count(*) AS frequency,
      |    sum(CAST(value AS DECIMAL(12,2))) AS mon_dec
      |  FROM events GROUP BY user_id),
      |w AS (
      |  SELECT *, date_diff('day', last_date, max(last_date) OVER ()) AS recency_days
      |  FROM per),
      |q AS (
      |  SELECT *,
      |    ntile(4) OVER (ORDER BY recency_days, user_id) AS r_q,
      |    ntile(4) OVER (ORDER BY frequency DESC, user_id) AS f_q,
      |    ntile(4) OVER (ORDER BY mon_dec DESC, user_id) AS m_q
      |  FROM w)
      |SELECT user_id, CAST(recency_days AS INTEGER) AS recency_days, frequency,
      |  CAST(mon_dec AS DOUBLE) AS monetary,
      |  CAST(r_q AS INTEGER) AS r_q, CAST(f_q AS INTEGER) AS f_q, CAST(m_q AS INTEGER) AS m_q,
      |  concat(r_q, f_q, m_q) AS segment
      |FROM q ORDER BY user_id""".stripMargin

  /** c10: per-session outcome stats — c2 counts sessions; this keeps
    * the SESSION as the row (the grain funnel/conversion analytics
    * live at): same 30-min-gap rule, session ids via a cumulative sum
    * of c2's new-session flags over the SAME user window (both windows
    * share one user_id exchange), then one (user, session) aggregate:
    * event count, duration (integer epoch-micros math), and whether
    * the session converted (contains a purchase). */
  def c10SessionStats(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > 1800L * 1000000L, lit(1))
          .otherwise(lit(0)))
      .withColumn("session_seq", sum(col("new_sess")).over(wRun))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        expr("(unix_micros(max(ts)) - unix_micros(min(ts))) div 1000000").as("duration_sec"),
        (countIf(col("event_type") === "purchase") > 0).as("converted"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  val c10Sql: String =
    """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events),
      |f AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM f)
      |SELECT user_id, session_seq, count(*) AS n_events,
      |  (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS duration_sec,
      |  count(CASE WHEN event_type = 'purchase' THEN 1 END) > 0 AS converted
      |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** c11: last-touch attribution — each purchase credited to the most
    * recent preceding marketing touch (view or click) by the same user
    * within a 7-day lookback, else 'none'. The c3 as-of shape: union
    * the touch and purchase streams through ONE per-user cumulative
    * window (`last` ignoreNulls over (ts, is_purchase, event_id) — a
    * touch at exactly the purchase ts counts, ties between touches
    * break on event_id), never a per-purchase range self-join. The two
    * `last` columns pick from the same row because their null sets
    * coincide. Output is the attribution report: purchases and
    * DECIMAL-exact revenue per touch type. */
  def c11Attribution(spark: SparkSession, dir: String): DataFrame =
    c11AttributionOf(Tables.events(spark, dir))

  /** c11 over ANY events frame (the streaming twin's equivalence spec
    * drives it with the exact rows fed to attributionStream). */
  def c11AttributionOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_purchase"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .filter(col("event_type").isin("view", "click", "purchase"))
      .withColumn("is_purchase", (col("event_type") === "purchase").cast("int"))
      .withColumn("touch_ts", when(col("is_purchase") === 0, col("ts")))
      .withColumn("touch_kind", when(col("is_purchase") === 0, col("event_type")))
      .withColumn("last_ts", last(col("touch_ts"), ignoreNulls = true).over(w))
      .withColumn("last_kind", last(col("touch_kind"), ignoreNulls = true).over(w))
      .filter(col("is_purchase") === 1)
      .select(
        when(col("last_ts").isNotNull &&
          unix_micros(col("ts")) - unix_micros(col("last_ts")) <= 7L * 86400L * 1000000L,
          col("last_kind")).otherwise(lit("none")).as("touch_type"),
        col("value"))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(dec2(col("value"))).cast("double").as("total_value"))
      .orderBy(col("touch_type"))
  }

  val c11Sql: String =
    """WITH e AS (
      |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
      |  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
      |t AS (
      |  SELECT *, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_purchase,
      |    CASE WHEN event_type <> 'purchase' THEN ts END AS touch_ts,
      |    CASE WHEN event_type <> 'purchase' THEN event_type END AS touch_kind
      |  FROM e),
      |lt AS (
      |  SELECT *,
      |    last_value(touch_ts IGNORE NULLS) OVER w AS last_ts,
      |    last_value(touch_kind IGNORE NULLS) OVER w AS last_kind
      |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_purchase, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |p AS (
      |  SELECT CASE WHEN last_ts IS NOT NULL
      |      AND epoch_us(ts) - epoch_us(last_ts) <= 604800000000
      |    THEN last_kind ELSE 'none' END AS touch_type, value
      |  FROM lt WHERE is_purchase = 1)
      |SELECT touch_type, count(*) AS n_purchases,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      |FROM p GROUP BY 1 ORDER BY 1""".stripMargin

  /** c12: daily volume anomalies — days whose event count deviates from
    * the per-type mean by more than 2 population std-devs. The test is
    * DIVISION- and SQRT-FREE: with n days, s = Σc, ssq = Σc², flag iff
    * (c·n − s)² > 4·(n·ssq − s²) — algebraically |c − μ| > 2σ with both
    * sides scaled by n², all in DECIMAL(38,0) integer arithmetic (long²
    * overflows once daily counts pass ~3·10⁹ at 100 TB), so the flag is
    * bit-identical in any engine at any parallelism. Shape: one scan →
    * (type, day) map-side-combined count; the moment windows run over
    * the REDUCED frame (≤ types × days rows), not the corpus. */
  def c12DailyAnomaly(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def d38(c: Column): Column = c.cast(DecimalType(38, 0))
    val wT = Window.partitionBy(col("event_type"))
    Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("n", count(lit(1)).over(wT))
      .withColumn("s", sum(col("cnt")).over(wT))
      .withColumn("ssq", sum(d38(col("cnt")) * d38(col("cnt"))).over(wT))
      .withColumn("dev", d38(col("cnt")) * d38(col("n")) - d38(col("s")))
      .filter(col("dev") * col("dev") >
        lit(4) * (d38(col("n")) * col("ssq") - d38(col("s")) * d38(col("s"))))
      .select(col("event_type"), col("day"), col("cnt"),
        (col("s").cast("double") / col("n")).as("mean_cnt"))
      .orderBy(col("event_type"), col("day"))
  }

  val c12Sql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT *, count(*) OVER w AS n, sum(cnt) OVER w AS s,
      |    sum(CAST(cnt AS HUGEINT) * CAST(cnt AS HUGEINT)) OVER w AS ssq
      |  FROM daily WINDOW w AS (PARTITION BY event_type))
      |SELECT event_type, day, cnt, CAST(s AS DOUBLE) / n AS mean_cnt
      |FROM m
      |WHERE (CAST(cnt AS HUGEINT) * n - s) * (CAST(cnt AS HUGEINT) * n - s)
      |  > 4 * (n * ssq - CAST(s AS HUGEINT) * CAST(s AS HUGEINT))
      |ORDER BY event_type, day""".stripMargin

  /** c13: event-type transition matrix — the first-order Markov view of
    * user behavior (what follows what): per-user consecutive event
    * pairs via ONE lag window ((ts, event_id) tie-break, c8's idiom),
    * reduced to (prev, curr) counts, row-normalized into transition
    * probabilities with a count window over the REDUCED matrix frame
    * (≤ |types|² rows — never the corpus). One scan, one user
    * exchange, integer counts with a single final division per cell. */
  def c13Transitions(spark: SparkSession, dir: String): DataFrame = {
    val wUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("event_type"), 1).over(wUser))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("curr"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        col("n").cast("double") / sum(col("n")).over(Window.partitionBy(col("prev"))))
      .orderBy(col("prev"), col("curr"))
  }

  val c13Sql: String =
    """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events),
      |pairs AS (
      |  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
      |    event_type AS curr
      |  FROM e),
      |m AS (
      |  SELECT prev, curr, count(*) AS n FROM pairs WHERE prev IS NOT NULL GROUP BY 1, 2)
      |SELECT prev, curr, n,
      |  CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev) AS p
      |FROM m ORDER BY prev, curr""".stripMargin

  /** c14: hopping-window trending top-k — the batch/backfill twin of
    * streaming `trendingTopK` (same 1 h window / 30 min slide): per
    * overlapping window, the k most frequent event types. Batch
    * `window()` explodes each event into exactly W/S = 2 hop windows
    * (map-side, no self-join), counts reduce on (window, type), and the
    * per-window top-k is a row_number ≤ k over the REDUCED counts frame
    * — compiles to WindowGroupLimit, so each shuffle side keeps ≤ k
    * rows per window. Boundaries ship as epoch-second longs: integer
    * window identity is engine-portable, timestamp-vs-timezone
    * semantics are not. Deterministic (n desc, event_type) tie-break —
    * the streaming twin breaks ties by type hash, which is why the
    * exact-equivalence cross-check lives there and the oracle here. */
  def c14TrendingTopk(spark: SparkSession, dir: String): DataFrame = {
    val k = 3
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("long").as("window_start"),
        col("w.end").cast("long").as("window_end"), col("event_type"), col("n"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("window_start")).orderBy(col("n").desc, col("event_type"))))
      .filter(col("rnk") <= k)
      .select(col("window_start"), col("window_end"), col("rnk"), col("event_type"), col("n"))
      .orderBy(col("window_start"), col("rnk"))
  }

  val c14Sql: String =
    """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
      |hopped AS (
      |  SELECT event_type, unnest([s0, s0 - 1]) AS slot
      |  FROM (SELECT event_type, epoch_us(ts) // 1800000000 AS s0 FROM e)),
      |counts AS (
      |  SELECT slot * 1800 AS window_start, slot * 1800 + 3600 AS window_end,
      |    event_type, count(*) AS n
      |  FROM hopped GROUP BY 1, 2, 3),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY window_start
      |    ORDER BY n DESC, event_type) AS rnk
      |  FROM counts)
      |SELECT window_start, window_end, rnk, event_type, n
      |FROM ranked WHERE rnk <= 3 ORDER BY window_start, rnk""".stripMargin

  /** c15: funnel conversion by signup cohort — c7's cohort rule (first
    * event week) × c6's ordered-funnel rule (view → click-after-view →
    * purchase-after-qualified-click), the "did later cohorts convert
    * better?" table every growth dashboard starts with. The cohort
    * window (unordered per-user min) and both funnel windows (ordered
    * per-user cumulative) share ONE user_id exchange — same partition
    * key, so Catalyst plans a single shuffle feeding all three Window
    * nodes; then one reduce on the ≤ #weeks cohort frame. The final
    * rate is a single double division per cohort row. */
  def c15CohortFunnel(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perUser = Window.partitionBy(col("user_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .withColumn("cohort_week",
        min(date_trunc("week", col("ts")).cast("date")).over(perUser))
      .withColumn("first_view",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("qclick", col("event_type") === "click" && col("first_view").isNotNull)
      .withColumn("first_qclick", min(when(col("qclick"), col("ts"))).over(w))
      .groupBy(col("cohort_week"))
      .agg(
        countDistinct(col("user_id")).as("users"),
        countDistinct(when(col("event_type") === "view", col("user_id"))).as("users_view"),
        countDistinct(when(col("qclick"), col("user_id"))).as("users_click"),
        countDistinct(when(col("event_type") === "purchase" && col("first_qclick").isNotNull,
          col("user_id"))).as("users_purchase"))
      .withColumn("purchase_rate",
        col("users_purchase").cast("double") / col("users"))
      .orderBy(col("cohort_week"))
  }

  val c15Sql: String =
    """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |coh AS (
      |  SELECT user_id, CAST(min(date_trunc('week', ts)) AS DATE) AS cohort_week
      |  FROM e GROUP BY user_id),
      |s1 AS (
      |  SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS first_view
      |  FROM e),
      |s2 AS (
      |  SELECT *, event_type = 'click' AND first_view IS NOT NULL AS qclick FROM s1),
      |s3 AS (
      |  SELECT *, min(CASE WHEN qclick THEN ts END)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS first_qclick
      |  FROM s2)
      |SELECT c.cohort_week,
      |  count(DISTINCT s3.user_id) AS users,
      |  count(DISTINCT CASE WHEN event_type = 'view' THEN s3.user_id END) AS users_view,
      |  count(DISTINCT CASE WHEN qclick THEN s3.user_id END) AS users_click,
      |  count(DISTINCT CASE WHEN event_type = 'purchase' AND first_qclick IS NOT NULL
      |    THEN s3.user_id END) AS users_purchase,
      |  CAST(count(DISTINCT CASE WHEN event_type = 'purchase' AND first_qclick IS NOT NULL
      |    THEN s3.user_id END) AS DOUBLE) / count(DISTINCT s3.user_id) AS purchase_rate
      |FROM s3 JOIN coh c ON s3.user_id = c.user_id
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** c16: frequent path mining — the sequence view one step past c13's
    * first-order transitions: the top-K most common 3-event paths users
    * actually walk (the "what funnels exist" discovery input c6/c15
    * consume as a hand-written stage list). BOTH lookahead steps come
    * from one (user_id; ts, event_id) window — a single exchange+sort,
    * c8's tie-break idiom — then paths reduce to counts (≤ |types|³
    * rows) and the share denominator is a window over that reduced
    * frame (q11 idiom). Top-K is sort+limit → TakeOrderedAndProject,
    * deterministic under count ties via the path itself. */
  def c16TopPaths(spark: SparkSession, dir: String): DataFrame = {
    val wUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("s2", lead(col("event_type"), 1).over(wUser))
      .withColumn("s3", lead(col("event_type"), 2).over(wUser))
      .filter(col("s3").isNotNull)
      .groupBy(col("event_type").as("step1"), col("s2").as("step2"), col("s3").as("step3"))
      .agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over(Window.partitionBy()))
      .select(col("step1"), col("step2"), col("step3"), col("n"),
        expr("(n * 10000) div total").as("share_bp"))
      .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
      .limit(20)
  }

  val c16Sql: String =
    """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events),
      |hops AS (
      |  SELECT user_id, event_type AS step1,
      |    lead(event_type, 1) OVER w AS step2,
      |    lead(event_type, 2) OVER w AS step3
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |paths AS (
      |  SELECT step1, step2, step3, count(*) AS n FROM hops
      |  WHERE step3 IS NOT NULL GROUP BY 1, 2, 3),
      |t AS (SELECT *, CAST(sum(n) OVER () AS BIGINT) AS total FROM paths)
      |SELECT step1, step2, step3, n, (n * 10000) // total AS share_bp
      |FROM t ORDER BY n DESC, step1, step2, step3 LIMIT 20""".stripMargin

  /** c17: daily bounce rate — the engagement-quality card next to c10's
    * per-session stats: a session that contains exactly ONE event is a
    * bounce; per calendar day (of the session's first event) report
    * session count, bounce count, and the integer-bp bounce share.
    *
    * Shape: rides c2/c10's single user-keyed exchange (lag → new_sess →
    * running session_seq all share one Window sort), then the session
    * grain reduce and a ≤#days reduce. No new corpus-sized exchange
    * beyond the session-frame family's adjudicated one. */
  def c17BounceRate(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > 1800L * 1000000L, lit(1))
          .otherwise(lit(0)))
      .withColumn("session_seq", sum(col("new_sess")).over(wRun))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("start_ts"))
      .select(to_date(col("start_ts")).as("day"), col("n_events"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1L, 1L).otherwise(0L)).as("n_bounces"))
      .select(col("day"), col("n_sessions"), col("n_bounces"),
        expr("(n_bounces * 10000) div n_sessions").as("bounce_bp"))
      .orderBy(col("day"))
  }

  val c17Sql: String =
    """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id FROM events),
      |f AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM f),
      |sess AS (
      |  SELECT user_id, session_seq, count(*) AS n_events, min(ts) AS start_ts
      |  FROM s GROUP BY 1, 2),
      |d AS (
      |  SELECT CAST(start_ts AS DATE) AS day, count(*) AS n_sessions,
      |    CAST(count(CASE WHEN n_events = 1 THEN 1 END) AS BIGINT) AS n_bounces
      |  FROM sess GROUP BY 1)
      |SELECT day, n_sessions, n_bounces,
      |  (n_bounces * 10000) // n_sessions AS bounce_bp
      |FROM d ORDER BY day""".stripMargin

  /** c18: dwell-time profile — seconds from each event to the SAME
    * user's next event (lead over the per-user window), profiled per
    * event type: events with a successor, mean dwell (exact integer
    * quotient through doubles), and the exact discrete p50/p95. The
    * percentiles come from the q46 crossing pattern: dwell seconds
    * reduce FIRST to (type, dwell_sec) counts (bounded cardinality —
    * dwell is integer seconds), then one cumulative window over the
    * reduced frame finds the smallest value whose cumulative count
    * reaches the rank — never a row_number over fact rows.
    *
    * Shape: one events scan, one user-keyed exchange for the lead,
    * then a two-level reduce; the percentile windows run over the
    * ≤ |types|·|distinct seconds| frame. */
  def c18DwellTime(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val dwell = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .filter(col("next_ts").isNotNull)
      .select(col("event_type"),
        expr("(unix_micros(next_ts) - unix_micros(ts)) div 1000000L").as("dwell_sec"))
    val byVal = dwell.groupBy(col("event_type"), col("dwell_sec"))
      .agg(count(lit(1)).as("n"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("dwell_sec"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("event_type"))
    val ranked = byVal
      .withColumn("cum", sum(col("n")).over(wCum))
      .withColumn("total", sum(col("n")).over(wAll))
      .withColumn("wsum", sum(col("dwell_sec") * col("n")).over(wAll))
    ranked
      .groupBy(col("event_type"))
      .agg(
        max(col("total")).as("n_dwells"),
        (max(col("wsum")).cast("double") / max(col("total"))).as("mean_dwell_sec"),
        min(when(col("cum") * 2 >= col("total"), col("dwell_sec"))).as("p50_dwell_sec"),
        min(when(col("cum") * 20 >= col("total") * 19, col("dwell_sec"))).as("p95_dwell_sec"))
      .orderBy(col("event_type"))
  }

  val c18Sql: String =
    """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events),
      |d AS (
      |  SELECT event_type,
      |    (epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
      |      - epoch_us(ts)) // 1000000 AS dwell_sec
      |  FROM e),
      |v AS (
      |  SELECT event_type, dwell_sec, count(*) AS n FROM d
      |  WHERE dwell_sec IS NOT NULL GROUP BY 1, 2),
      |r AS (
      |  SELECT *,
      |    CAST(sum(n) OVER (PARTITION BY event_type ORDER BY dwell_sec
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |    CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS total,
      |    CAST(sum(dwell_sec * n) OVER (PARTITION BY event_type) AS BIGINT) AS wsum
      |  FROM v)
      |SELECT event_type, max(total) AS n_dwells,
      |  CAST(max(wsum) AS DOUBLE) / max(total) AS mean_dwell_sec,
      |  min(CASE WHEN cum * 2 >= total THEN dwell_sec END) AS p50_dwell_sec,
      |  min(CASE WHEN cum * 20 >= total * 19 THEN dwell_sec END) AS p95_dwell_sec
      |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin

  /** c19: peak session concurrency per day — the capacity-planning
    * number (max simultaneously-active sessions): c10's sessions
    * become [start_ts, end_ts] intervals, each interval is SPLIT at
    * midnight boundaries (sequence-explode over its day span — the
    * standard interval-to-partition alignment, so the sweep
    * parallelizes by day instead of one global ordered pass), and a
    * per-day sweep line (+1 at segment start, -1 at segment end,
    * starts before ends at equal instants) takes the running-sum max.
    *
    * Shape: the sweep window partitions by DAY over ≤ 2·sessions
    * rows — at 100 TB each day's boundary list is independent and the
    * hot-day bound is sessions/day, not corpus size. Cross-midnight
    * sessions count toward every day they touch (the capacity
    * question's definition). */
  def c19PeakConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > 1800L * 1000000L, lit(1))
          .otherwise(lit(0)))
      .withColumn("session_seq", sum(col("new_sess")).over(wRun))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"))
    val segs = sess
      .withColumn("day", explode(sequence(to_date(col("start_ts")), to_date(col("end_ts")))))
      .select(col("day"),
        greatest(col("start_ts"), col("day").cast("timestamp")).as("seg_start"),
        least(col("end_ts"),
          timestamp_micros(unix_micros(date_add(col("day"), 1).cast("timestamp")) - 1))
          .as("seg_end"))
    // explode, not union: unioning two projections of `segs` would
    // re-evaluate the whole scan→window→explode lineage once per side
    val deltas = segs
      .select(col("day"), explode(array(
        struct(col("seg_start").as("t"), lit(1).as("delta")),
        struct(col("seg_end").as("t"), lit(-1).as("delta")))).as("x"))
      .select(col("day"), col("x.t").as("t"), col("x.delta").as("delta"))
    val wSweep = Window.partitionBy(col("day")).orderBy(col("t"), col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("active", sum(col("delta")).over(wSweep))
      .groupBy(col("day"))
      .agg(max(col("active")).cast("long").as("peak_concurrency"),
        (count(lit(1)) / 2).cast("long").as("n_sessions"))
      .orderBy(col("day"))
  }

  val c19Sql: String =
    """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id FROM events),
      |f AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM f),
      |sess AS (
      |  SELECT user_id, session_seq, min(ts) AS start_ts, max(ts) AS end_ts
      |  FROM s GROUP BY 1, 2),
      |segs AS (
      |  SELECT unnest(generate_series(CAST(start_ts AS DATE), CAST(end_ts AS DATE),
      |           INTERVAL 1 DAY))::DATE AS day, start_ts, end_ts
      |  FROM sess),
      |clipped AS (
      |  SELECT day,
      |    greatest(start_ts, CAST(day AS TIMESTAMP)) AS seg_start,
      |    least(end_ts, CAST(day + 1 AS TIMESTAMP) - INTERVAL 1 MICROSECOND) AS seg_end
      |  FROM segs),
      |deltas AS (
      |  SELECT day, seg_start AS t, 1 AS delta FROM clipped
      |  UNION ALL
      |  SELECT day, seg_end AS t, -1 AS delta FROM clipped),
      |sw AS (
      |  SELECT day, CAST(sum(delta) OVER (PARTITION BY day ORDER BY t, delta DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS active
      |  FROM deltas)
      |SELECT day, max(active) AS peak_concurrency,
      |  count(*) // 2 AS n_sessions
      |FROM sw GROUP BY day ORDER BY day""".stripMargin

  /** c20: longest weekly-activity streak per user — the engagement
    * "islands" metric (consecutive active weeks): distinct active
    * epoch-weeks per user, the classic week − row_number island key
    * (consecutive weeks share one key), island lengths reduce to the
    * per-user max + active-week count. Everything integer (epoch-day
    * div 7 — no calendar-week engine disagreements).
    *
    * Shape: one scan → distinct (user, week) reduce (map-side
    * combined) → row_number over the per-user ≤ |weeks| frame →
    * two nested tiny reduces, all on the same user key — one corpus
    * exchange total. */
  def c20ActiveStreaks(spark: SparkSession, dir: String): DataFrame = {
    val weeks = Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_date(to_date(ts)) div 7").as("wk"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("wk"))
    weeks
      .withColumn("island", col("wk") - row_number().over(w))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(sum(col("len")).as("n_active_weeks"),
        max(col("len")).as("max_streak_weeks"),
        count(lit(1)).as("n_streaks"))
      .orderBy(col("user_id"))
  }

  val c20Sql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |wks AS (
      |  SELECT DISTINCT user_id,
      |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS wk
      |  FROM e),
      |isl AS (
      |  SELECT user_id, wk,
      |    wk - row_number() OVER (PARTITION BY user_id ORDER BY wk) AS island
      |  FROM wks),
      |lens AS (
      |  SELECT user_id, island, count(*) AS len FROM isl GROUP BY 1, 2)
      |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_weeks,
      |  max(len) AS max_streak_weeks, count(*) AS n_streaks
      |FROM lens GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Day-bucket pre-split gap (seconds) shared by c21 and its spec. */
  val SessionGapSec = 1800L

  /** c21: SALTED sessionization — c2's documented skew escape hatch as
    * working code, producing BIT-IDENTICAL results (its oracle IS
    * c2Sql). The per-user window in c2 needs every event of a user in
    * one partition — a pathologically hot user (bot, SDK key) is
    * bounded by one executor. Here the window key is (user, DAY): the
    * hot user's events split across days, sessionization runs within
    * each bucket, and sessions that straddle midnight are stitched by
    * counting boundary MERGES — consecutive-day buckets whose
    * last/first events are within the gap — and subtracting:
    * n_sessions = Σ within-bucket sessions − merges. A ≤ 30 min gap
    * can only bridge ADJACENT days, so the merge join on
    * (user, day+1) is exact, and chained multi-day sessions reduce
    * correctly (each merge joins two distinct bucket-sessions:
    * count −1 per merge, no cycles).
    *
    * Shape: the corpus exchange is keyed (user, day) — the skew bound
    * drops from events-per-user to events-per-user-per-day; the merge
    * join runs on the ≤ |user·active-days| reduced frame. The same
    * stitch generalizes to any bucket grain (hour for streaming-rate
    * bots). */
  def c21SessionizeSalted(spark: SparkSession, dir: String): DataFrame = {
    val gapUs = SessionGapSec * 1000000L
    val wB = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    val byBucket = Tables.events(spark, dir)
      .withColumn("day", to_date(col("ts")))
      .withColumn("prev_ts", lag(col("ts"), 1).over(wB))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > gapUs, lit(1))
          .otherwise(lit(0)))
      .groupBy(col("user_id"), col("day"))
      .agg(sum(col("new_sess")).as("n_sess_b"), count(lit(1)).as("n_events_b"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
    // boundary merges via a lag window over the REDUCED (user, day)
    // frame — a (user, day+1) self-join would re-evaluate byBucket's
    // whole scan+window lineage once per reference (3 scans); this is
    // one pass, and the per-user window here is day-grain (≤ active
    // days per user), not the event-grain window salting removed
    val wU = Window.partitionBy(col("user_id")).orderBy(col("day"))
    byBucket
      .withColumn("prev_day", lag(col("day"), 1).over(wU))
      .withColumn("prev_last", lag(col("last_ts"), 1).over(wU))
      .withColumn("merged",
        when(col("prev_day") === date_sub(col("day"), 1) &&
          unix_micros(col("first_ts")) - unix_micros(col("prev_last")) <= gapUs, 1L)
          .otherwise(0L))
      .groupBy(col("user_id"))
      .agg((sum(col("n_sess_b")) - sum(col("merged"))).as("n_sessions"),
        sum(col("n_events_b")).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** c22: FORWARD as-of join — time-to-conversion: for each click, the
    * first purchase at-or-after it by the same user (c3 is the backward
    * direction). Same union + single per-user window discipline — the
    * mirror frame: `first` ignoreNulls over (current row →
    * unbounded FOLLOWING) on the ascending (ts, is_purchase, event_id)
    * order. Tie rule: a purchase at exactly the click ts counts, so
    * clicks sort BEFORE purchases at equal ts (is_purchase ascending)
    * and the click's following frame includes it. One shuffle, no
    * per-click range probe — the only 100 TB shape.
    */
  def c22AsofForward(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val tagged = e.filter(col("event_type").isin("click", "purchase"))
      .withColumn("is_purchase", (col("event_type") === "purchase").cast("int"))
      .withColumn("purchase_ts", when(col("event_type") === "purchase", col("ts")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_purchase"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    tagged
      .withColumn("next_purchase_ts", first(col("purchase_ts"), ignoreNulls = true).over(w))
      .filter(col("is_purchase") === 0)
      .select(col("event_id"), col("user_id"), col("ts"), col("next_purchase_ts"),
        expr("(unix_micros(next_purchase_ts) - unix_micros(ts)) div 1000000")
          .as("ttc_sec"))
      .orderBy(col("event_id"))
  }

  val c22Sql: String =
    """WITH e AS (
      |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |t AS (
      |  SELECT *, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_purchase,
      |    CASE WHEN event_type = 'purchase' THEN ts END AS purchase_ts
      |  FROM e),
      |n AS (
      |  SELECT *,
      |    first_value(purchase_ts IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY ts, is_purchase, event_id
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_purchase_ts
      |  FROM t)
      |SELECT event_id, user_id, ts, next_purchase_ts,
      |  (epoch_us(next_purchase_ts) - epoch_us(ts)) // 1000000 AS ttc_sec
      |FROM n WHERE is_purchase = 0 ORDER BY event_id""".stripMargin

  /** c23: user lifetime card — the per-user lifecycle summary feeding
    * churn/LTV models: first/last seen, tenure (inclusive days),
    * distinct active days, event volume. ONE scan, one user-keyed
    * exchange; the distinct-day count is exact (bounded per user) —
    * at extreme churn cardinalities the sketch twin is q17's HLL. */
  def c23UserLifetime(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"),
        countDistinct(to_date(col("ts"))).as("n_active_days"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("first_ts"), col("last_ts"),
        (datediff(to_date(col("last_ts")), to_date(col("first_ts"))) + 1)
          .cast("long").as("tenure_days"),
        col("n_active_days"), col("n_events"))
      .orderBy(col("user_id"))

  val c23Sql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
      |SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts,
      |  datediff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE)) + 1 AS tenure_days,
      |  count(DISTINCT CAST(ts AS DATE)) AS n_active_days,
      |  count(*) AS n_events
      |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin

  /** c24: day-of-week seasonality profile per event type — the weekly
    * rhythm card behind staffing/alert thresholds. The weekday index
    * is CALENDAR-CONVENTION-FREE: epoch-day mod 7 (0 ≡ Thursday, the
    * 1970-01-01 anchor) — `dayofweek`/`isodow` disagree across engines
    * (Sunday=1 vs Monday=1) and a convention mismatch silently rotates
    * the whole profile. Share within type in exact bp.
    *
    * Shape: one scan → (type, dow) reduce (≤ |types|·7 rows) → window
    * over the reduced frame. */
  def c24DowProfile(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(spark, dir)
      .select(col("event_type"),
        pmod(expr("unix_date(to_date(ts))"), lit(7)).as("dow_idx"))
      .groupBy(col("event_type"), col("dow_idx"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("event_type"))
    counts
      .withColumn("total", sum(col("n_events")).over(w))
      .select(col("event_type"), col("dow_idx"), col("n_events"),
        expr("(n_events * 10000) div total").as("share_bp"))
      .orderBy(col("event_type"), col("dow_idx"))
  }

  val c24Sql: String =
    """WITH e AS (
      |  SELECT event_type,
      |    datediff('day', DATE '1970-01-01', CAST(CAST(ts AS TIMESTAMP) AS DATE)) % 7 AS dow_idx
      |  FROM events),
      |c AS (SELECT event_type, dow_idx, count(*) AS n_events FROM e GROUP BY 1, 2),
      |t AS (
      |  SELECT *, CAST(sum(n_events) OVER (PARTITION BY event_type) AS BIGINT) AS total
      |  FROM c)
      |SELECT event_type, dow_idx, n_events,
      |  (n_events * 10000) // total AS share_bp
      |FROM t ORDER BY event_type, dow_idx""".stripMargin

  /** Trailing baseline span (hours) and minimum observed baseline hours
    * for c25 — a burst needs an established rate to burst against. */
  val BurstBaselineHours = 24
  val BurstMinBaseline = 6

  /** c25: hourly burst detection per event type (Kleinberg-lite — the
    * rate-spike view c12's per-day z-test can't see: a 1-hour flood
    * inside an average day disappears at day grain): an hour bursts
    * when its count exceeds 3× the trailing-24h mean rate, with a
    * ≥ [[BurstMinBaseline]]-hour observed baseline so cold starts never
    * flag. The test is cross-multiplied integers
    * (`cnt · base_hours > 3 · base_cnt`) — no float rate, engine-exact.
    * Hours ride as integer epoch-hour indexes (the c14 portability
    * idiom), and the trailing window is RANGE over that index, so
    * missing hours (sparse types) count toward time correctly rather
    * than sliding over 24 populated ROWS.
    *
    * Scale shape: one scan reduced map-side to (type, hour) counts;
    * the range window runs over that ≤ |types|·|hours| frame — at
    * 100 TB a year of hours × thousands of types is ~10⁷ rows, nothing
    * against the corpus. Per-type partitions are hour-grain (bounded),
    * so no hot-key hazard. */
  def c25BurstDetect(spark: SparkSession, dir: String): DataFrame = {
    val tw = Window.partitionBy(col("event_type")).orderBy(col("hour_idx"))
      .rangeBetween(-BurstBaselineHours, -1)
    Tables.events(spark, dir)
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hour_idx"))
      .groupBy(col("event_type"), col("hour_idx"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("base_hours", count(lit(1)).over(tw))
      .withColumn("base_cnt", coalesce(sum(col("cnt")).over(tw), lit(0L)))
      .filter(col("base_hours") >= BurstMinBaseline &&
        col("cnt") * col("base_hours") > lit(3) * col("base_cnt"))
      .select(col("event_type"), col("hour_idx"), col("cnt"),
        col("base_hours"), col("base_cnt"))
      .orderBy(col("event_type"), col("hour_idx"))
  }

  val c25Sql: String =
    s"""WITH e AS (
       |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hour_idx
       |  FROM events),
       |h AS (SELECT event_type, hour_idx, count(*) AS cnt FROM e GROUP BY 1, 2),
       |b AS (
       |  SELECT *, count(*) OVER tw AS base_hours,
       |    COALESCE(sum(cnt) OVER tw, 0) AS base_cnt
       |  FROM h WINDOW tw AS (PARTITION BY event_type ORDER BY hour_idx
       |    RANGE BETWEEN $BurstBaselineHours PRECEDING AND 1 PRECEDING))
       |SELECT event_type, hour_idx, cnt,
       |  CAST(base_hours AS BIGINT) AS base_hours, CAST(base_cnt AS BIGINT) AS base_cnt
       |FROM b WHERE base_hours >= $BurstMinBaseline AND cnt * base_hours > 3 * base_cnt
       |ORDER BY event_type, hour_idx""".stripMargin

  /** Level-shift window span (days each side) and minimum observed days
    * per side for c26 — a shift needs established levels on BOTH sides. */
  val ShiftSpanDays = 7
  val ShiftMinDays = 5
  val ShiftTopK = 3

  /** c26: level-shift (change-point) ranking per event type — the
    * SUSTAINED regime change neither sibling sees: c12's per-day z-test
    * flags single outlier days, c25 flags 1-hour floods; a deploy or
    * traffic migration shifts the whole daily level and stays there.
    * Each day is scored by the symmetric ratio of its trailing-7d vs
    * leading-7d mean daily rate (max/min of the two cross-products, so
    * up- and down-shifts rank on one scale), and the top
    * [[ShiftTopK]] days per type are emitted with direction. The ratio
    * is ONE IEEE division of exact int64 cross-products (the d62
    * discipline — deterministic on any engine); ordering ties break on
    * day_idx. Days are integer epoch-day indexes (the c24
    * calendar-convention-free idiom) and both windows are RANGE over
    * that index, so sparse types weight missing days correctly.
    *
    * Scale shape: one scan reduced map-side to (type, day) counts; all
    * windows run over that ≤ |types|·|days| frame (~10⁶ rows for years
    * × thousands of types — nothing against the corpus), partitioned by
    * type so no single-partition collapse. */
  def c26LevelShift(spark: SparkSession, dir: String): DataFrame = {
    val base = Window.partitionBy(col("event_type")).orderBy(col("day_idx"))
    val wb = base.rangeBetween(-ShiftSpanDays, -1)
    val wa = base.rangeBetween(1, ShiftSpanDays)
    val scored = Tables.events(spark, dir)
      .select(col("event_type"), expr("unix_date(to_date(ts))").as("day_idx"))
      .groupBy(col("event_type"), col("day_idx"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("before_days", count(lit(1)).over(wb))
      .withColumn("before_cnt", coalesce(sum(col("cnt")).over(wb), lit(0L)))
      .withColumn("after_days", count(lit(1)).over(wa))
      .withColumn("after_cnt", coalesce(sum(col("cnt")).over(wa), lit(0L)))
      .filter(col("before_days") >= ShiftMinDays && col("after_days") >= ShiftMinDays &&
        col("before_cnt") > 0 && col("after_cnt") > 0)
      .withColumn("up_x", col("after_cnt") * col("before_days"))
      .withColumn("dn_x", col("before_cnt") * col("after_days"))
      .withColumn("shift_ratio",
        greatest(col("up_x"), col("dn_x")).cast("double") / least(col("up_x"), col("dn_x")))
    scored
      .withColumn("rnk", row_number().over(Window.partitionBy(col("event_type"))
        .orderBy(col("shift_ratio").desc, col("day_idx"))))
      .filter(col("rnk") <= ShiftTopK)
      .select(col("event_type"), col("day_idx"), col("cnt"),
        col("before_days"), col("before_cnt"), col("after_days"), col("after_cnt"),
        col("shift_ratio"),
        when(col("up_x") >= col("dn_x"), lit("up")).otherwise(lit("down")).as("direction"),
        col("rnk"))
      .orderBy(col("event_type"), col("rnk"))
  }

  val c26Sql: String =
    s"""WITH e AS (
       |  SELECT event_type,
       |    datediff('day', DATE '1970-01-01', CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS day_idx
       |  FROM events),
       |d AS (SELECT event_type, day_idx, count(*) AS cnt FROM e GROUP BY 1, 2),
       |w AS (
       |  SELECT *, count(*) OVER wb AS before_days,
       |    COALESCE(sum(cnt) OVER wb, 0) AS before_cnt,
       |    count(*) OVER wa AS after_days,
       |    COALESCE(sum(cnt) OVER wa, 0) AS after_cnt
       |  FROM d WINDOW
       |    wb AS (PARTITION BY event_type ORDER BY day_idx
       |      RANGE BETWEEN $ShiftSpanDays PRECEDING AND 1 PRECEDING),
       |    wa AS (PARTITION BY event_type ORDER BY day_idx
       |      RANGE BETWEEN 1 FOLLOWING AND $ShiftSpanDays FOLLOWING)),
       |s AS (
       |  SELECT event_type, day_idx, cnt,
       |    CAST(before_days AS BIGINT) AS before_days, CAST(before_cnt AS BIGINT) AS before_cnt,
       |    CAST(after_days AS BIGINT) AS after_days, CAST(after_cnt AS BIGINT) AS after_cnt,
       |    CAST(after_cnt * before_days AS BIGINT) AS up_x,
       |    CAST(before_cnt * after_days AS BIGINT) AS dn_x
       |  FROM w
       |  WHERE before_days >= $ShiftMinDays AND after_days >= $ShiftMinDays
       |    AND before_cnt > 0 AND after_cnt > 0),
       |r AS (
       |  SELECT *, CAST(greatest(up_x, dn_x) AS DOUBLE) / least(up_x, dn_x) AS shift_ratio
       |  FROM s),
       |k AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY event_type
       |    ORDER BY shift_ratio DESC, day_idx) AS INTEGER) AS rnk
       |  FROM r)
       |SELECT event_type, day_idx, cnt, before_days, before_cnt, after_days, after_cnt,
       |  shift_ratio, CASE WHEN up_x >= dn_x THEN 'up' ELSE 'down' END AS direction, rnk
       |FROM k WHERE rnk <= $ShiftTopK
       |ORDER BY event_type, rnk""".stripMargin

  /** c27: audience-overlap card — per event-type pair, the exact
    * distinct-USER Jaccard (plus both audience sizes): the frame a
    * funnel designer or cross-sell targeter reads before assuming two
    * behaviors share (or don't share) an audience. d55's one-exchange
    * shape at (user, type) grain: ONE event scan, per-user sorted
    * distinct type set (collect_set dedups map-side — a prior
    * (user, type) DISTINCT would be a wasted corpus-wide shuffle),
    * ordered pairs generated ROW-LOCALLY with the diagonal riding
    * along so audience sizes come from two windows over the
    * ≤ |types|² reduced frame — never a corpus self-join. Zero-overlap
    * pairs have no row by construction. */
  def c27AudienceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val pairsWithDiag = {
      val ts = col("typs")
      val pairs = flatten(transform(ts, (x, i) =>
        transform(slice(ts, i + lit(2), size(ts)),
          y => struct(x.as("a"), y.as("b")))))
      val diag = transform(ts, x => struct(x.as("a"), x.as("b")))
      concat(pairs, diag)
    }
    val red = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"))
      .groupBy(col("user_id")).agg(sort_array(collect_set(col("event_type"))).as("typs"))
      .select(explode(pairsWithDiag).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
    val wa = Window.partitionBy(col("a"))
    val wb = Window.partitionBy(col("b"))
    red
      .withColumn("n_a", max(when(col("a") === col("b"), col("cnt"))).over(wa))
      .withColumn("n_b", max(when(col("a") === col("b"), col("cnt"))).over(wb))
      .filter(col("a") < col("b"))
      .select(col("a").as("type_a"), col("b").as("type_b"),
        col("cnt").as("n_shared_users"), col("n_a"), col("n_b"),
        expr("(cnt * 10000) div (n_a + n_b - cnt)").as("jaccard_bp"))
      .orderBy(col("type_a"), col("type_b"))
  }

  val c27Sql: String =
    """WITH uv AS (SELECT DISTINCT user_id, event_type FROM events),
      |sz AS (SELECT event_type, count(*) AS n FROM uv GROUP BY 1),
      |pr AS (
      |  SELECT x.event_type AS type_a, y.event_type AS type_b, count(*) AS n_shared_users
      |  FROM uv x JOIN uv y ON x.user_id = y.user_id AND x.event_type < y.event_type
      |  GROUP BY 1, 2)
      |SELECT type_a, type_b, n_shared_users,
      |  za.n AS n_a, zb.n AS n_b,
      |  (n_shared_users * 10000) // (za.n + zb.n - n_shared_users) AS jaccard_bp
      |FROM pr
      |JOIN sz za ON type_a = za.event_type
      |JOIN sz zb ON type_b = zb.event_type
      |ORDER BY type_a, type_b""".stripMargin

  /** c29: conversion-latency profile by click hour-of-day — the card
    * closing c22's per-click question at the cohort grain (is checkout
    * slow at peak hours? does overnight traffic convert at all?): per
    * hour 0-23, click volume, converted count + exact bp rate, and
    * exact discrete p50/p90/max time-to-convert in MINUTES. Composes
    * c22's forward as-of (one per-user window exchange — no new
    * corpus work beyond it); latency reduces FIRST to (hour, minute)
    * counts — the value-space-bounded frame (≤ 24 × observed-minutes
    * rows at ANY corpus size, the c18/d74 discipline) — and the
    * crossing-pattern quantile windows walk that reduced frame only.
    * Never-converted clicks (no following purchase) count in the
    * conversion rate and stay out of the quantiles by construction.
    * The oracle composes c22's replayed SQL verbatim (d15 idiom). */
  def c29TimeToConvert(spark: SparkSession, dir: String): DataFrame = {
    val wCum = Window.partitionBy(col("click_hour")).orderBy(col("ttc_min"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wH = Window.partitionBy(col("click_hour"))
    c22AsofForward(spark, dir)
      .select(hour(col("ts")).cast("long").as("click_hour"),
        expr("ttc_sec div 60").as("ttc_min"))
      .groupBy(col("click_hour"), col("ttc_min"))
      .agg(count(lit(1)).as("n"))
      .withColumn("conv", when(col("ttc_min").isNotNull, col("n")).otherwise(lit(0L)))
      .withColumn("cum", sum(col("conv")).over(wCum))
      .withColumn("total_conv", sum(col("conv")).over(wH))
      .groupBy(col("click_hour"))
      .agg(
        sum(col("n")).as("n_clicks"),
        sum(col("conv")).as("n_converted"),
        min(when(col("ttc_min").isNotNull && col("cum") * 2 >= col("total_conv"),
          col("ttc_min"))).as("p50_ttc_min"),
        min(when(col("ttc_min").isNotNull && col("cum") * 10 >= col("total_conv") * 9,
          col("ttc_min"))).as("p90_ttc_min"),
        max(col("ttc_min")).as("max_ttc_min"))
      .select(col("click_hour"), col("n_clicks"), col("n_converted"),
        expr("(n_converted * 10000) div n_clicks").as("conv_bp"),
        col("p50_ttc_min"), col("p90_ttc_min"), col("max_ttc_min"))
      .orderBy(col("click_hour"))
  }

  val c29Sql: String =
    s"""WITH c AS ($c22Sql),
       |m AS (
       |  SELECT hour(ts) AS click_hour, ttc_sec // 60 AS ttc_min, count(*) AS n
       |  FROM c GROUP BY 1, 2),
       |x AS (
       |  SELECT *, CASE WHEN ttc_min IS NOT NULL THEN n ELSE 0 END AS conv
       |  FROM m),
       |w AS (
       |  SELECT *,
       |    CAST(sum(conv) OVER (PARTITION BY click_hour ORDER BY ttc_min
       |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
       |    CAST(sum(conv) OVER (PARTITION BY click_hour) AS BIGINT) AS total_conv
       |  FROM x),
       |a AS (
       |  SELECT click_hour,
       |    CAST(sum(n) AS BIGINT) AS n_clicks,
       |    CAST(sum(conv) AS BIGINT) AS n_converted,
       |    min(CASE WHEN ttc_min IS NOT NULL AND cum * 2 >= total_conv THEN ttc_min END) AS p50_ttc_min,
       |    min(CASE WHEN ttc_min IS NOT NULL AND cum * 10 >= total_conv * 9 THEN ttc_min END) AS p90_ttc_min,
       |    max(ttc_min) AS max_ttc_min
       |  FROM w GROUP BY 1)
       |SELECT click_hour, n_clicks, n_converted,
       |  (n_converted * 10000) // n_clicks AS conv_bp,
       |  p50_ttc_min, p90_ttc_min, max_ttc_min
       |FROM a ORDER BY click_hour""".stripMargin

  /** c30: VARIANT-native semi-structured extraction — c4's modern twin
    * on Spark 4's VariantType (the headline semi-structured feature):
    * `parse_json` decodes each payload ONCE into the binary variant
    * encoding and every `variant_get` is a cheap typed path read —
    * where c4's `get_json_object` RE-PARSES the JSON string per field
    * access (at 100 TB and k fields that's k string parses per row vs
    * one decode). Adds what the legacy path glosses over: a
    * missing-path probe (typed NULL, counted per group) — the schema-
    * drift signal a permissive payload pipeline watches.
    *
    * One scan, one group exchange; DuckDB oracles through its JSON
    * type (`->>` with typed casts — same decode-once economics). */
  def c30VariantExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), parse_json(col("props")).as("v"))
      .select(col("event_type"),
        expr("variant_get(v, '$.k', 'bigint')").as("k"),
        expr("variant_get(v, '$.q', 'bigint')").as("q"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("k_sum"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"),
        sum(when(col("q").isNull, 1L).otherwise(0L)).as("n_missing"))
      .orderBy(col("event_type"))

  val c30Sql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum,
      |  min(CAST(props->>'$.k' AS BIGINT)) AS k_min,
      |  max(CAST(props->>'$.k' AS BIGINT)) AS k_max,
      |  CAST(sum(CASE WHEN props->>'$.q' IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** c31: rolling active users (DAU / trailing-7-day WAU / stickiness)
    * — the canonical product-analytics card (c23 profiles lifetimes;
    * this is the daily top-line). Exact distinct users per day and per
    * trailing 7-day window, stickiness = DAU/WAU in exact bp.
    *
    * Shape — windowed DISTINCT without a windowed-distinct operator
    * (which neither engine has): the corpus reduces ONCE to distinct
    * (user, day) — the only corpus-sized exchange — then each row
    * fans out row-locally to the ≤7 future days it keeps the user
    * active in (c14's bounded hop-explode idiom), and a second
    * distinct-reduce at (day, user) grain collapses multi-day users
    * before the per-day count. Day boundaries are integer epoch-days
    * (c24's convention-free rule). Days outside the observed span are
    * clipped so the fan-out adds no phantom days. */
  /** Distinct (user, epoch-day) activity pairs — the shared reduce
    * c31 and c32 both ride (one definition so the day-boundary
    * convention can never silently diverge between them). */
  private def userDayDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()

  def c31ActiveUsers(spark: SparkSession, dir: String): DataFrame = {
    val ud = userDayDistinct(spark, dir)
    // span clip as a 1-row broadcast scalar (q27 idiom) — an
    // unpartitioned max window here would single-partition the
    // corpus-scale (user, day) frame (it is NOT value-space-bounded,
    // unlike d77/d79's wAll frames)
    val mx = ud.agg(max(col("day")).as("max_day"))
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = ud
      .crossJoin(broadcast(mx))
      .select(col("user_id"), explode(expr("sequence(day, least(day + 6, max_day))")).as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        expr("(dau * 10000) div wau").as("stickiness_bp"))
      .orderBy(col("day"))
  }

  val c31Sql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
      |  FROM events),
      |mx AS (SELECT max(day) AS max_day FROM ud),
      |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day),
      |f AS (
      |  SELECT DISTINCT user_id, unnest(range(day, least(day + 6, max_day) + 1)) AS day
      |  FROM ud CROSS JOIN mx),
      |wau AS (SELECT day, CAST(count(*) AS BIGINT) AS wau FROM f GROUP BY day)
      |SELECT day, dau, wau, (dau * 10000) // wau AS stickiness_bp
      |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin

  /** c32: new-vs-returning daily split (acquisition vs retention — the
    * second half of c31's top-line): per day, active users, first-ever-
    * seen users, returning share in exact bp. The per-user first day is
    * a min aggregate over the SAME distinct (user, day) reduce c31
    * uses; the join back is ids-only. */
  def c32NewVsReturning(spark: SparkSession, dir: String): DataFrame = {
    val ud = userDayDistinct(spark, dir)
    val first = ud.groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
    ud.join(first, "user_id")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("day") === col("first_day"), 1L).otherwise(0L)).as("n_new"))
      .select(col("day"), col("n_active"), col("n_new"),
        expr("((n_active - n_new) * 10000) div n_active").as("returning_bp"))
      .orderBy(col("day"))
  }

  val c32Sql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
      |  FROM events),
      |fs AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY user_id)
      |SELECT day,
      |  CAST(count(*) AS BIGINT) AS n_active,
      |  CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
      |  CAST(((count(*) - sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)) * 10000) // count(*) AS BIGINT) AS returning_bp
      |FROM ud JOIN fs USING (user_id)
      |GROUP BY day ORDER BY day""".stripMargin

  /** Rounds and score scale (parts-per-trillion) for c28's integer
    * PageRank power iteration. */
  val PageRankRounds = 10
  val PageRankScale = 1000000000000L

  /** c28: event-type PageRank — the stationary-importance ranking of
    * the behavior graph c13's transition matrix only describes locally
    * (c13 answers "where do users go FROM here"; this answers "where
    * does the process CONCENTRATE"). Classic damped PageRank
    * (d = 0.85, dangling mass redistributed uniformly) run for
    * [[PageRankRounds]] rounds in EXACT integer arithmetic: scores are
    * parts-per-trillion BIGINTs, every per-edge contribution is
    * `(score · n) div out_total` and the damping update is
    * `(15·base + 85·(contrib + dangling div N)) div 100` — no floats
    * anywhere, so the fixed number of rounds is bit-identical on any
    * engine and at any parallelism.
    *
    * Scale shape: the corpus pays ONE scan — the same per-user lag
    * window as c13 — reducing to the ≤ |types|² edge-count matrix.
    * The k-round fixed point then runs DRIVER-SIDE over that
    * value-space-bounded aggregate (the bounded Lloyd-collect pattern,
    * VectorOps:325: event-type vocabularies are dozens at any corpus
    * size, so the collected frame is O(|types|²) regardless of SF;
    * iterating relationally would schedule k no-op jobs over a
    * 25-row frame). The DuckDB oracle replays all k rounds via
    * generated per-round CTEs with the identical `//` arithmetic;
    * every round CTE is MATERIALIZED — each round references the
    * previous scores twice (contrib + dangling mass), so plain
    * inlining would expand the chain 2^k-fold (the SQL-side twin of
    * the d25 lineage lesson, CorpusOps.scala:336). */
  def c28TypePagerank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val edgeRows = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("event_type"), 1).over(wUser))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev").as("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("n"))
      .collect() // ≤ |types|² aggregated rows — bounded by the type vocabulary
    val edges = edgeRows.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted.toSeq
    val nN = nodes.length.toLong
    require(nN > 0, "c28: no transitions in the event stream")
    val outN: Map[String, Long] =
      edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val base = PageRankScale / nN
    // BigInt ≡ DuckDB HUGEINT: products exceed int64 once corpus edge
    // counts pass ~1e6 at this scale, so the wide type is load-bearing.
    var score: Map[String, Long] = nodes.map(t => t -> base).toMap
    for (_ <- 1 to PageRankRounds) {
      val dang = nodes.filterNot(outN.contains).map(score).sum
      val contrib = scala.collection.mutable.Map.empty[String, BigInt].withDefaultValue(BigInt(0))
      for ((s, d, n) <- edges)
        contrib(d) += BigInt(score(s)) * n / outN(s)
      score = nodes.map { t =>
        t -> ((BigInt(base) * 15 + (contrib(t) + dang / nN) * 85) / 100).toLong
      }.toMap
    }
    nodes.map(t => (t, score(t))).toDF("event_type", "score_ppt")
      .orderBy(col("score_ppt").desc, col("event_type"))
  }

  val c28Sql: String = {
    val sb = new StringBuilder
    sb ++= s"""WITH ev AS (
              |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events),
              |eg AS MATERIALIZED (
              |  SELECT prev AS src, event_type AS dst, count(*) AS n FROM (
              |    SELECT event_type,
              |      lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
              |    FROM ev)
              |  WHERE prev IS NOT NULL GROUP BY 1, 2),
              |nodes AS MATERIALIZED (SELECT DISTINCT t AS type FROM
              |  (SELECT src AS t FROM eg UNION ALL SELECT dst FROM eg)),
              |nn AS MATERIALIZED (SELECT count(*) AS n_nodes FROM nodes),
              |outn AS MATERIALIZED (SELECT src, CAST(sum(n) AS BIGINT) AS out_n FROM eg GROUP BY src),
              |s0 AS MATERIALIZED (SELECT type,
              |  (SELECT CAST($PageRankScale // n_nodes AS BIGINT) FROM nn) AS score FROM nodes)""".stripMargin
    for (r <- 1 to PageRankRounds) {
      sb ++= s""",
                |d$r AS MATERIALIZED (
                |  SELECT COALESCE(CAST(sum(s.score) AS BIGINT), 0) AS dang
                |  FROM s${r - 1} s LEFT JOIN outn o ON o.src = s.type WHERE o.src IS NULL),
                |c$r AS MATERIALIZED (
                |  SELECT e.dst AS type,
                |    sum((CAST(s.score AS HUGEINT) * e.n) // o.out_n) AS contrib
                |  FROM s${r - 1} s JOIN eg e ON e.src = s.type JOIN outn o ON o.src = e.src
                |  GROUP BY 1),
                |s$r AS MATERIALIZED (
                |  SELECT n.type,
                |    CAST(((SELECT $PageRankScale // n_nodes FROM nn) * 15
                |      + (COALESCE(c.contrib, 0)
                |         + (SELECT dang FROM d$r) // (SELECT n_nodes FROM nn)) * 85) // 100
                |      AS BIGINT) AS score
                |  FROM nodes n LEFT JOIN c$r c ON c.type = n.type)""".stripMargin
    }
    sb ++= s"""
              |SELECT type AS event_type, score AS score_ppt FROM s$PageRankRounds
              |ORDER BY score_ppt DESC, event_type""".stripMargin
    sb.toString
  }

  /** c33: calendar gap-fill — the dense daily spine every dashboard and
    * every autocorrelation/seasonality model (c12/c24/c35) assumes but
    * raw event data doesn't provide: days with zero events exist in the
    * OUTPUT even though no row carries them. Per type, the spine spans
    * [first observed day, last observed day]; `filled_n` forward-fills
    * the last observed day's count across gaps (the standard ffill).
    * Integer epoch-days end-to-end (the c31 day idiom — no date-type
    * portability risk). See [[zeroFilledDays]] for the one-scan shape. */
  /** Shared by c33/c35: the zero-filled daily spine from ONE corpus
    * scan. Observed days reduce map-side to (type, day, n); each
    * observed row then carries its preceding gap run inline —
    * transform(sequence(prev_day+1, day)) builds the missing days plus
    * itself as one array, exploded once — so there is no second scan,
    * no union of a duplicated subtree (the static planner does not
    * dedupe union branches; this keeps the plan at one scan + two
    * reduced-frame exchanges), and the forward-fill is free: every gap
    * day's last observed count IS the run's left endpoint (`prev_n`). */
  private def zeroFilledDays(spark: SparkSession, dir: String): DataFrame =
    zeroFilledDaysOf(Tables.events(spark, dir))

  private[graft] def zeroFilledDaysOf(events: DataFrame): DataFrame = {
    val byDay = events
      .groupBy(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    byDay
      .withColumn("prev_day", lag(col("day"), 1).over(w))
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .select(col("event_type"), explode(transform(
        sequence(coalesce(col("prev_day") + 1, col("day")), col("day")),
        d => struct(
          d.as("day"),
          when(d === col("day"), col("n")).otherwise(lit(0L)).as("n_events"),
          (d =!= col("day")).as("is_gap"),
          when(d === col("day"), col("n")).otherwise(col("prev_n")).as("filled_n"))))
        .as("r"))
      .select(col("event_type"), col("r.day"), col("r.n_events"),
        col("r.is_gap"), col("r.filled_n"))
  }

  def c33GapFill(spark: SparkSession, dir: String): DataFrame =
    zeroFilledDays(spark, dir).orderBy(col("event_type"), col("day"))

  val c33Sql: String =
    """WITH e AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day FROM events),
      |byday AS (SELECT event_type, day, count(*) AS n FROM e GROUP BY 1, 2),
      |spans AS (SELECT event_type, min(day) AS lo, max(day) AS hi FROM byday GROUP BY 1),
      |spine AS (SELECT event_type, unnest(generate_series(lo, hi)) AS day FROM spans),
      |j AS (
      |  SELECT s.event_type, s.day, b.n
      |  FROM spine s LEFT JOIN byday b USING (event_type, day))
      |SELECT event_type, day, coalesce(n, 0) AS n_events, n IS NULL AS is_gap,
      |  last_value(n IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_n
      |FROM j ORDER BY event_type, day""".stripMargin

  /** c34: interval-union coverage per user — total time actually covered
    * when each event opens a 30-minute activity interval and overlaps
    * merge (the "union of intervals" primitive behind billable-time,
    * uptime, and exposure metrics; c2 counts sessions, this measures
    * their union exactly). Classic sweep: a block opens when the event's
    * start exceeds the running max end of everything before it
    * (max-over-preceding window — ends can arrive out of order when a
    * long interval swallows later short ones, so lag(end) alone is
    * wrong); block id = running sum of opens; then two plain aggs.
    * Epoch-micros integers end-to-end.
    *
    * Shape: ONE user-keyed exchange serves both windows (same
    * partition+order); the block and user reductions ride map-side
    * combine. Skewed users bound at user volume — the c21 salted
    * sessionizer is the documented escape for pathological keys. */
  def c34IntervalUnion(spark: SparkSession, dir: String): DataFrame =
    c34IntervalUnionOf(Tables.events(spark, dir))

  /** c34 over ANY events frame (coverageStream's equivalence spec
    * drives it with the exact rows fed to the stream). */
  def c34IntervalUnionOf(events: DataFrame): DataFrame = {
    val lenUs = 1800L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t"))
      .withColumn("e_end", col("t") + lit(lenUs))
      .withColumn("prev_end", max(col("e_end")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("nb", when(col("prev_end").isNull || col("t") > col("prev_end"), 1L).otherwise(0L))
      .withColumn("blk", sum(col("nb")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("blk"))
      .agg(min(col("t")).as("s"), max(col("e_end")).as("e"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(col("e") - col("s")).as("covered_us"),
        max(col("e") - col("s")).as("max_block_us"))
      .orderBy(col("user_id"))
  }

  val c34Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events),
      |m AS (
      |  SELECT user_id, event_id, t, t + 1800000000 AS e_end,
      |    max(t + 1800000000) OVER (PARTITION BY user_id ORDER BY t, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      |  FROM e),
      |f AS (
      |  SELECT user_id, event_id, t, e_end,
      |    CASE WHEN prev_end IS NULL OR t > prev_end THEN 1 ELSE 0 END AS nb
      |  FROM m),
      |b AS (
      |  SELECT user_id, t, e_end,
      |    sum(nb) OVER (PARTITION BY user_id ORDER BY t, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS blk
      |  FROM f),
      |g AS (SELECT user_id, blk, min(t) AS s, max(e_end) AS e FROM b GROUP BY 1, 2)
      |SELECT user_id, count(*) AS n_blocks,
      |  CAST(sum(e - s) AS BIGINT) AS covered_us,
      |  max(e - s) AS max_block_us
      |FROM g GROUP BY 1 ORDER BY user_id""".stripMargin

  /** c35: lag-1 autocorrelation of the daily volume series per type —
    * the "is today predictive of tomorrow" statistic behind anomaly
    * thresholds (c12) and capacity forecasts. The series is c33's
    * zero-filled spine (statistically honest: missing days are real
    * zeros, and skipping them would pair non-adjacent days), so every
    * (day, day+1) pair is consecutive by construction via lead over the
    * spine. Pearson over the pairs from exact integer moments, the q26
    * discipline: sums in DECIMAL(38,0) (daily-count products pass 2⁶³
    * at 100 TB), ONE double formula application at the end — bit-stable
    * at any parallelism, portable across engines.
    *
    * Shape: ONE corpus scan ([[zeroFilledDays]]); lead + moments run on
    * the reduced spine frame. */
  def c35DailyAutocorr(spark: SparkSession, dir: String): DataFrame = {
    val filled = zeroFilledDays(spark, dir)
      .select(col("event_type"), col("day"), col("n_events").cast(DecimalType(38, 0)).as("x"))
    val wLead = Window.partitionBy(col("event_type")).orderBy(col("day"))
    filled
      .withColumn("y", lead(col("x"), 1).over(wLead))
      .filter(col("y").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("event_type"), col("n_pairs"),
        ((col("n_pairs") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n_pairs") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n_pairs") * col("syy") - col("sy") * col("sy")).cast("double"))))
          .as("autocorr"))
      .orderBy(col("event_type"))
  }

  val c35Sql: String =
    """WITH e AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day FROM events),
      |byday AS (SELECT event_type, day, count(*) AS n FROM e GROUP BY 1, 2),
      |spans AS (SELECT event_type, min(day) AS lo, max(day) AS hi FROM byday GROUP BY 1),
      |spine AS (SELECT event_type, unnest(generate_series(lo, hi)) AS day FROM spans),
      |filled AS (
      |  SELECT s.event_type, s.day, CAST(coalesce(b.n, 0) AS HUGEINT) AS x
      |  FROM spine s LEFT JOIN byday b USING (event_type, day)),
      |pairs AS (
      |  SELECT event_type, x,
      |    lead(x) OVER (PARTITION BY event_type ORDER BY day) AS y
      |  FROM filled),
      |m AS (
      |  SELECT event_type, count(*) AS n_pairs,
      |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
      |    sum(x * x) AS sxx, sum(y * y) AS syy
      |  FROM pairs WHERE y IS NOT NULL GROUP BY 1)
      |SELECT event_type, n_pairs,
      |  CAST(n_pairs * sxy - sx * sy AS DOUBLE)
      |    / (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
      |       * sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE))) AS autocorr
      |FROM m ORDER BY event_type""".stripMargin

  /** c36 decay horizon in days, and the ppm weight of an offset-0 touch;
    * offset d gets ppm >> d — exact integer exponential decay. */
  val DecayDays = 7
  val DecayPpm = 1048576L // 2^20: shifts stay exact through offset 6

  /** c36: time-decay attribution — the third member of the attribution
    * family (c11 does last-touch; this spreads credit over every touch
    * in the window, halving per day of age — position-based models are
    * a weight-vector swap away). DAY-grain decomposition makes it
    * relational: one (user, day) reduce carries purchase and per-type
    * touch counts side by side (the touch-type set is the operator's
    * LITERAL config, so columns, not rows), and each purchase-day reads
    * its 0..6-day-old touch counts through exact-offset RANGE frames
    * (rangeBetween(−a, −a) on the integer day — day gaps can't
    * misalign it the way lag(a) rows would) — ONE user exchange serves
    * all 14 frames, and there is no purchase⋈touch join at all.
    * credit = np·cnt·(2²⁰ ppm >> age) in exact integers; same-day
    * touches count at full weight (day grain can't order within the
    * day; the tie rule is documented, deterministic, identical in both
    * engines). Output per touch type: weighted credit, share in bp,
    * contributing (purchase-day, touch-day) cell count.
    *
    * Shape: ONE corpus scan → map-side (user, day) reduce → one user
    * exchange for the windows → a23-style literal-array stacking →
    * ≤|types| result rows. The oracle replays the INDEPENDENT
    * probe-explode + join formulation — result equality across the two
    * shapes is part of what the gate proves. */
  def c36DecayAttribution(spark: SparkSession, dir: String): DataFrame = {
    val perUD = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .groupBy(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(countIf(col("event_type") === "purchase").as("np"),
        countIf(col("event_type") === "view").as("nv"),
        countIf(col("event_type") === "click").as("nc"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val shifted = (0 until DecayDays).foldLeft(perUD) { (df, a) =>
      df.withColumn(s"v$a", sum(col("nv")).over(w.rangeBetween(-a, -a)))
        .withColumn(s"c$a", sum(col("nc")).over(w.rangeBetween(-a, -a)))
    }
    // weighted sliding dot product over the shifted counts; DECIMAL(38,0)
    // promotion because day-grain count products times the 2^20 ppm
    // scale pass 2^63 on extreme keys at 100 TB
    def credit(pfx: String): Column =
      (0 until DecayDays).map(a =>
        coalesce(col(s"$pfx$a"), lit(0L)) * lit(DecayPpm >> a)).reduce(_ + _)
    def cells(pfx: String): Column =
      (0 until DecayDays).map(a =>
        when(coalesce(col(s"$pfx$a"), lit(0L)) > 0, 1L).otherwise(0L)).reduce(_ + _)
    shifted.filter(col("np") > 0)
      .select(col("np").cast(DecimalType(38, 0)).as("np"),
        credit("v").cast(DecimalType(38, 0)).as("cv"), cells("v").as("kv"),
        credit("c").cast(DecimalType(38, 0)).as("cc"), cells("c").as("kc"))
      .select(explode(array(
        struct(lit("view").as("event_type"), (col("np") * col("cv")).as("credit"),
          col("kv").as("k")),
        struct(lit("click").as("event_type"), (col("np") * col("cc")).as("credit"),
          col("kc").as("k")))).as("s"))
      .groupBy(col("s.event_type").as("event_type"))
      .agg(sum(col("s.credit")).as("credit_ppm"), sum(col("s.k")).as("n_cells"))
      .filter(col("n_cells") > 0)
      .withColumn("total", sum(col("credit_ppm")).over(Window.partitionBy()))
      .select(col("event_type"), col("credit_ppm").cast("long").as("credit_ppm"),
        expr("(credit_ppm * 10000) div total").as("share_bp"), col("n_cells"))
      .orderBy(col("event_type"))
  }

  val c36Sql: String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day, event_type
       |  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
       |byday AS (
       |  SELECT user_id, day, event_type, count(*) AS cnt FROM e GROUP BY 1, 2, 3),
       |touches AS (SELECT * FROM byday WHERE event_type <> 'purchase'),
       |purch AS (
       |  SELECT user_id, day AS pday, cnt AS np FROM byday WHERE event_type = 'purchase'),
       |probes AS (
       |  SELECT user_id, pday - age AS day, np, age
       |  FROM purch, range(0, $DecayDays) AS u(age)),
       |credit AS (
       |  SELECT t.event_type,
       |    sum(p.np * t.cnt * ($DecayPpm >> p.age)) AS credit_ppm,
       |    count(*) AS n_cells
       |  FROM probes p JOIN touches t ON t.user_id = p.user_id AND t.day = p.day
       |  GROUP BY 1),
       |tot AS (SELECT sum(credit_ppm) AS total FROM credit)
       |SELECT event_type, CAST(credit_ppm AS BIGINT) AS credit_ppm,
       |  CAST((credit_ppm * 10000) // total AS BIGINT) AS share_bp,
       |  n_cells
       |FROM credit, tot ORDER BY event_type""".stripMargin

  /** c37: seasonality-aware daily anomaly — c12's upgrade for data
    * with a weekly rhythm (c24 shows this stream has one): a Monday is
    * judged against OTHER MONDAYS, not the all-days mean that flags
    * every normal weekend. Baseline per (type, day-of-week) is
    * LEAVE-ONE-OUT (s′ = s − cnt, k′ = k − 1, ssq′ = ssq − cnt² — a
    * genuinely extreme day must not vouch for itself by inflating its
    * own σ), and the test is c12's division/sqrt-free cross-multiplied
    * form on the deflated moments: (cnt·k′ − s′)² > 4·(k′·ssq′ − s′²),
    * DECIMAL(38,0) throughout; dows with k′ < 2 can't flag (no
    * variance estimate from one neighbor). Day-of-week from the
    * integer epoch day ((day+4) mod 7, epoch day 0 = Thursday — no
    * locale/WEEKSTART portability risk).
    *
    * Shape: one scan → (type, day) map-side reduce; the moment windows
    * partition by (type, dow) over the reduced frame. */
  def c37SeasonalAnomaly(spark: SparkSession, dir: String): DataFrame = {
    def d38c(c: Column): Column = c.cast(DecimalType(38, 0))
    val wTD = Window.partitionBy(col("event_type"), col("dow"))
    Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("dow", pmod(col("day") + 4, lit(7)))
      .withColumn("k1", count(lit(1)).over(wTD) - 1)
      .withColumn("s1", sum(col("cnt")).over(wTD) - col("cnt"))
      .withColumn("ssq1",
        sum(d38c(col("cnt")) * d38c(col("cnt"))).over(wTD) - d38c(col("cnt")) * d38c(col("cnt")))
      .filter(col("k1") >= 2)
      .withColumn("dev", d38c(col("cnt")) * d38c(col("k1")) - d38c(col("s1")))
      .filter(col("dev") * col("dev") >
        lit(4) * (d38c(col("k1")) * col("ssq1") - d38c(col("s1")) * d38c(col("s1"))))
      .select(col("event_type"), col("day"), col("dow"), col("cnt"),
        col("k1").as("peer_days"), col("s1").as("peer_total"))
      .orderBy(col("event_type"), col("day"))
  }

  val c37Sql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
      |    count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |d AS (SELECT *, (day + 4) % 7 AS dow FROM daily),
      |m AS (
      |  SELECT *, count(*) OVER w - 1 AS k1,
      |    sum(cnt) OVER w - cnt AS s1,
      |    sum(CAST(cnt AS HUGEINT) * cnt) OVER w - CAST(cnt AS HUGEINT) * cnt AS ssq1
      |  FROM d WINDOW w AS (PARTITION BY event_type, dow))
      |SELECT event_type, day, dow, cnt,
      |  CAST(k1 AS BIGINT) AS peer_days, CAST(s1 AS BIGINT) AS peer_total
      |FROM m
      |WHERE k1 >= 2
      |  AND (CAST(cnt AS HUGEINT) * k1 - s1) * (CAST(cnt AS HUGEINT) * k1 - s1)
      |    > 4 * (k1 * ssq1 - CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT))
      |ORDER BY event_type, day""".stripMargin

  /** c38: robust daily anomaly count — the median/MAD twin of c12's
    * mean/σ rule (Hampel's robust statistics: one outlier day inflates
    * the mean AND the σ that is supposed to catch it, so z-score rules
    * go blind exactly when they matter; the median and the median
    * absolute deviation have 50% breakdown). Per type, over c33's
    * zero-filled daily spine (missing days are real zeros — skipping
    * them would bias the median): med, MAD, and how many days deviate
    * beyond 3·MAD.
    *
    * Exactness: Spark's sort-based `percentile` is the q41 adjudication
    * (parallelism-independent, and interpolation between INTEGERS
    * yields dyadic doubles — .5 steps for med, .25 for the MAD — so
    * every downstream comparison is exact in both engines; DuckDB's
    * quantile_cont interpolates identically). No mean, no σ, no
    * overflow-prone squares — the c12 DECIMAL(38,0) machinery simply
    * disappears under the robust rule.
    *
    * Shape: ONE corpus scan ([[zeroFilledDays]]); both percentile
    * windows and the final reduce share the single event_type
    * exchange over the days-bounded spine frame. */
  def c38MadAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val wT = Window.partitionBy(col("event_type"))
    zeroFilledDays(spark, dir)
      .select(col("event_type"), col("day"), col("n_events"))
      .withColumn("med", expr("percentile(n_events, 0.5D)").over(wT))
      .withColumn("dev", abs(col("n_events").cast("double") - col("med")))
      .withColumn("mad", expr("percentile(dev, 0.5D)").over(wT))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(col("dev") > col("mad") * 3, 1L).otherwise(0L)).as("n_anomalies"))
      .orderBy(col("event_type"))
  }

  val c38Sql: String =
    """WITH e AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day FROM events),
      |byday AS (SELECT event_type, day, count(*) AS n FROM e GROUP BY 1, 2),
      |spans AS (SELECT event_type, min(day) AS lo, max(day) AS hi FROM byday GROUP BY 1),
      |spine AS (SELECT event_type, unnest(generate_series(lo, hi)) AS day FROM spans),
      |daily AS (
      |  SELECT s.event_type, s.day, coalesce(b.n, 0) AS n_events
      |  FROM spine s LEFT JOIN byday b USING (event_type, day)),
      |m AS (
      |  SELECT *, quantile_cont(n_events, 0.5) OVER (PARTITION BY event_type) AS med
      |  FROM daily),
      |d AS (SELECT *, abs(n_events - med) AS dev FROM m),
      |md AS (
      |  SELECT *, quantile_cont(dev, 0.5) OVER (PARTITION BY event_type) AS mad
      |  FROM d)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
      |  max(med) AS med, max(mad) AS mad,
      |  CAST(sum(CASE WHEN dev > 3 * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
      |FROM md GROUP BY 1 ORDER BY 1""".stripMargin

  /** c39: A/B conversion report with Wilson 95% intervals — the
    * experimentation-analytics readout (the capability c30's variant
    * extraction feeds): per variant, users, converters, exact
    * conversion bp, and the Wilson score interval (Wilson 1927 — the
    * standard small-n-safe binomial CI; the normal approximation lies
    * near 0/1 rates). The experimental UNIT is the user, not the
    * event (per-event rates double-count heavy users — the classic
    * A/B analysis bug), so the corpus reduces to per-user conversion
    * flags first. Variant = user_id mod 2, the deterministic
    * hash-bucket stand-in for an assignment table (d16's salted-md5
    * idiom is the production form; mod keeps the oracle trivial).
    *
    * Determinism: the CI uses only +,−,×,÷,sqrt on identical operand
    * trees — every step correctly rounded in both engines (the d88
    * rule; no pow, no ln) — so even the float bounds hash-match
    * exactly. Shape: one scan, per-user reduce (map-side combinable),
    * per-variant reduce to 2 rows, CI math row-local. */
  def c39AbLift(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.events(spark, dir)
      .select(col("user_id"), pmod(col("user_id"), lit(2L)).as("variant"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("p"))
      .groupBy(col("user_id"), col("variant"))
      .agg(max(col("p")).as("conv"))
    val n = col("n_users").cast("double")
    val p = col("n_conv").cast("double") / n
    val z = lit(1.96)
    val z2 = z * z
    val denom = lit(1.0) + z2 / n
    val center = p + z2 / (lit(2.0) * n)
    val half = z * sqrt(p * (lit(1.0) - p) / n + z2 / (lit(4.0) * n * n))
    per.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"), sum(col("conv")).as("n_conv"))
      .select(col("variant"), col("n_users"), col("n_conv"),
        expr("(n_conv * 10000) div n_users").as("conv_bp"),
        ((center - half) / denom).as("ci_lo"),
        ((center + half) / denom).as("ci_hi"))
      .orderBy(col("variant"))
  }

  val c39Sql: String =
    """WITH per AS (
      |  SELECT user_id, user_id % 2 AS variant,
      |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      |  FROM events GROUP BY 1, 2),
      |v AS (
      |  SELECT variant, count(*) AS n_users, CAST(sum(conv) AS BIGINT) AS n_conv
      |  FROM per GROUP BY 1)
      |SELECT variant, n_users, n_conv,
      |  CAST((n_conv * 10000) // n_users AS BIGINT) AS conv_bp,
      |  ((CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE)
      |      + (1.96 * 1.96) / (2.0 * CAST(n_users AS DOUBLE)))
      |    - 1.96 * sqrt(CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE)
      |        * (1.0 - CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE))
      |        / CAST(n_users AS DOUBLE)
      |      + (1.96 * 1.96) / (4.0 * CAST(n_users AS DOUBLE) * CAST(n_users AS DOUBLE))))
      |    / (1.0 + (1.96 * 1.96) / CAST(n_users AS DOUBLE)) AS ci_lo,
      |  ((CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE)
      |      + (1.96 * 1.96) / (2.0 * CAST(n_users AS DOUBLE)))
      |    + 1.96 * sqrt(CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE)
      |        * (1.0 - CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE))
      |        / CAST(n_users AS DOUBLE)
      |      + (1.96 * 1.96) / (4.0 * CAST(n_users AS DOUBLE) * CAST(n_users AS DOUBLE))))
      |    / (1.0 + (1.96 * 1.96) / CAST(n_users AS DOUBLE)) AS ci_hi
      |FROM v ORDER BY variant""".stripMargin

  /** Channel universe for c40 (the event-type taxonomy minus the
    * conversion event — pinned like c6/c16 pin theirs; in production
    * this comes from the source registry). */
  val AttributionChannels = Seq("click", "error", "signup", "view")
  /** Finite iteration horizon for the absorption solve: paths longer
    * than this contribute no mass. The ORACLE replays the same k, so
    * the gate is exact regardless of convergence distance. */
  val AttributionRounds = 24

  /** c40: Markov removal-effect attribution — the data-driven channel
    * attribution model (Anderl et al. 2016; the standard upgrade from
    * rule-based credit): user journeys become a first-order Markov
    * chain over channels with CONV/NULL absorbing states; a channel's
    * credit is its REMOVAL EFFECT — how much total conversion
    * probability disappears when every visit to it is treated as
    * failing — normalized across channels. Completes the attribution
    * triad: c11 last-touch (positional), c36 time-decay (heuristic),
    * this one causal-ish from observed transitions.
    *
    * Exactness: the absorption system is solved by [[AttributionRounds]]
    * fixed-point rounds in integer ppm — per state,
    * Σ cnt(s→t)·p(t) div row_total(s), floor division on nonnegative
    * operands — bit-identical in Scala and the DuckDB oracle's
    * MATERIALIZED per-round CTEs (the c28 replay pattern; plain CTE
    * inlining would blow up exponentially). Removal pins the
    * channel's p to 0 inside the same iteration; all five scenarios
    * (full + 4 removals) iterate over one (scenario, state) table.
    *
    * Shape: ONE corpus scan; journeys truncate at the first purchase
    * (prefix property keeps lag valid after the filter); each event
    * row emits its step edge — and, via a conditional array explode
    * (never a union of branches — the c33 lesson), the terminal
    * →NULL edge on last non-converting rows; the corpus reduces to
    * the ≤(channels+1)×(channels+2) edge matrix; the solve runs
    * driver-side over that value-space-bounded aggregate (the c28/
    * Lloyd bounded-collect pattern — never corpus rows). */
  def c40MarkovAttribution(spark: SparkSession, dir: String): DataFrame = {
    val wU = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wAllU = Window.partitionBy(col("user_id"))
    val kept = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("rn", row_number().over(wU))
      .withColumn("firstp",
        min(when(col("event_type") === "purchase", col("rn"))).over(wAllU))
      .filter(col("firstp").isNull || col("rn") <= col("firstp"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(wU))
      .withColumn("last_rn", max(col("rn")).over(wAllU))
    val stepEdge = struct(
      when(col("rn") === 1, lit("START")).otherwise(col("prev_type")).as("from_state"),
      when(col("event_type") === "purchase", lit("CONV")).otherwise(col("event_type")).as("to_state"))
    val termEdge = struct(col("event_type").as("from_state"), lit("NULL").as("to_state"))
    val edgeRows = kept
      .select(explode(when(col("rn") === col("last_rn") && col("event_type") =!= "purchase",
        array(stepEdge, termEdge)).otherwise(array(stepEdge))).as("e"))
      .groupBy(col("e.from_state").as("from_state"), col("e.to_state").as("to_state"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val rowTotals = edgeRows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    def solve(pinned: Option[String]): Long = {
      val states = "START" +: AttributionChannels :+ "CONV" :+ "NULL"
      var p = states.map(s => s -> (if (s == "CONV") 1000000L else 0L)).toMap
      for (_ <- 1 to AttributionRounds) {
        p = p.map { case (s, _) =>
          s -> (s match {
            case "CONV" => 1000000L
            case "NULL" => 0L
            case x if pinned.contains(x) => 0L
            case x => rowTotals.get(x) match {
              case Some(tot) =>
                edgeRows.filter(_._1 == x).map(e => e._3 * p.getOrElse(e._2, 0L)).sum / tot
              case None => 0L
            }
          })
        }
      }
      p("START")
    }
    val pFull = solve(None)
    val removals = AttributionChannels.map(c => c -> (pFull - solve(Some(c))))
    val totRem = math.max(1L, removals.map(_._2).sum)
    import spark.implicits._
    removals.map { case (c, rc) =>
      (c, pFull, pFull - rc, rc, rc * 10000L / totRem)
    }.toDF("channel", "p_conv_ppm", "p_without_ppm", "removal_ppm", "attribution_bp")
      .orderBy(col("channel"))
  }

  val c40Sql: String = {
    val chans = AttributionChannels
    val stateVals = ("START" +: chans :+ "CONV" :+ "NULL").map(s => s"('$s')").mkString(",")
    val scenVals = ("none" +: chans).map(s => s"('$s')").mkString(",")
    val rounds = (1 to AttributionRounds).map { r =>
      s"""p$r AS MATERIALIZED (
         |  SELECT s.scenario, s.state,
         |    CASE WHEN s.state = 'CONV' THEN 1000000
         |         WHEN s.state = 'NULL' THEN 0
         |         WHEN s.state = s.scenario THEN 0
         |         ELSE coalesce((
         |           SELECT CAST(sum(e.cnt * pp.ppm) // max(e.row_total) AS BIGINT)
         |           FROM edges e JOIN p${r - 1} pp
         |             ON pp.state = e.to_state AND pp.scenario = s.scenario
         |           WHERE e.from_state = s.state), 0)
         |    END AS ppm
         |  FROM p${r - 1} s)""".stripMargin
    }.mkString(",\n")
    s"""WITH ev AS (
       |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
       |  FROM ev),
       |fp AS (
       |  SELECT *, min(CASE WHEN event_type = 'purchase' THEN rn END)
       |    OVER (PARTITION BY user_id) AS firstp
       |  FROM r),
       |kept AS (SELECT * FROM fp WHERE firstp IS NULL OR rn <= firstp),
       |lagd AS (
       |  SELECT user_id, rn, event_type,
       |    lag(event_type) OVER (PARTITION BY user_id ORDER BY rn) AS prev_type,
       |    max(rn) OVER (PARTITION BY user_id) AS last_rn
       |  FROM kept),
       |edges0 AS (
       |  SELECT CASE WHEN rn = 1 THEN 'START' ELSE prev_type END AS from_state,
       |         CASE WHEN event_type = 'purchase' THEN 'CONV' ELSE event_type END AS to_state
       |  FROM lagd
       |  UNION ALL
       |  SELECT event_type, 'NULL' FROM lagd WHERE rn = last_rn AND event_type <> 'purchase'),
       |edges AS (
       |  SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS cnt,
       |    CAST(sum(count(*)) OVER (PARTITION BY from_state) AS BIGINT) AS row_total
       |  FROM edges0 GROUP BY 1, 2),
       |states(state) AS (VALUES $stateVals),
       |scen(scenario) AS (VALUES $scenVals),
       |p0 AS (
       |  SELECT scenario, state, CASE WHEN state = 'CONV' THEN 1000000 ELSE 0 END AS ppm
       |  FROM scen CROSS JOIN states),
       |$rounds,
       |fin AS (
       |  SELECT scenario AS channel, ppm AS p_without
       |  FROM p$AttributionRounds WHERE state = 'START' AND scenario <> 'none'),
       |pf AS (
       |  SELECT ppm AS p_full FROM p$AttributionRounds
       |  WHERE state = 'START' AND scenario = 'none'),
       |remv AS (
       |  SELECT channel, p_full, p_without, p_full - p_without AS removal_ppm
       |  FROM fin CROSS JOIN pf),
       |tot AS (SELECT greatest(1, sum(removal_ppm)) AS t FROM remv)
       |SELECT channel, CAST(p_full AS BIGINT) AS p_conv_ppm,
       |  CAST(p_without AS BIGINT) AS p_without_ppm,
       |  CAST(removal_ppm AS BIGINT) AS removal_ppm,
       |  CAST((removal_ppm * 10000) // t AS BIGINT) AS attribution_bp
       |FROM remv CROSS JOIN tot ORDER BY channel""".stripMargin
  }

  /** c41 burn-in: days of history the EWMA baseline requires before a
    * day is judged (standard control-chart practice — partial windows
    * produce unstable limits). Also the number of dyadic weight terms. */
  val EwmaDays = 8
  /** Multiplicative spike threshold (today > 3× baseline). */
  val EwmaSpikeFactor = 3L
  /** Floor below which a day never flags — a 3×-of-nothing spike on a
    * near-zero series is noise, not an incident. */
  val EwmaMinCount = 5L

  /** c41: EWMA control chart over daily volumes per type — the
    * exponentially-weighted smoothing baseline (Roberts 1959;
    * Hunter 1986) that completes the anomaly triad: c12 flags against
    * a global mean/σ, c38 against median/MAD, this against a RECENCY-
    * WEIGHTED local baseline that adapts to drift (a level shift stops
    * flagging once absorbed, which the global detectors never do).
    *
    * Determinism — the dyadic-α trick: α = 1/2 makes every EWMA weight
    * a power of two, so the 8-term truncated EWMA is the INTEGER
    * weighted sum Σ n_{t-k}·2^(8-k) over denominator 255 — no doubles,
    * no pow(), identical in both engines; the spike test cross-
    * multiplies (n·255 > 3·num) instead of dividing. The spine is
    * c33's zero-filled one (missing days are real zeros — skipping
    * them would compare today against week-old volume).
    *
    * Shape: ONE corpus scan (the shared zeroFilledDays spine: map-side
    * (type, day) reduce + inline gap explode), then the 8 lags ride a
    * single type-keyed window exchange over the days-bounded frame.
    * First EwmaDays days per type are burn-in (dropped, as a control
    * chart does). */
  def c41EwmaControl(spark: SparkSession, dir: String): DataFrame =
    c41EwmaControlOf(Tables.events(spark, dir))

  /** c41 over ANY events-shaped frame (ewmaStream's equivalence spec
    * drives it with the exact rows fed to the stream). */
  def c41EwmaControlOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val lagged = zeroFilledDaysOf(events)
      .select(col("event_type"), col("day"), col("n_events"))
      .withColumn("num",
        (1 to EwmaDays).map(k =>
          lag(col("n_events"), k).over(w) * lit(1L << (EwmaDays - k))).reduce(_ + _))
    lagged
      .filter(col("num").isNotNull)
      .select(col("event_type"), col("day"), col("n_events"),
        expr("(num * 1000) div 255").as("baseline_milli"),
        (col("n_events") * lit(255L) > lit(EwmaSpikeFactor) * col("num") &&
          col("n_events") >= EwmaMinCount).as("spike"))
      .orderBy(col("event_type"), col("day"))
  }

  val c41Sql: String = {
    val lagCols = (1 to EwmaDays).map(k => s"lag(n_events, $k) OVER w AS l$k").mkString(", ")
    val numExpr = (1 to EwmaDays).map(k => s"l$k * ${1L << (EwmaDays - k)}").mkString(" + ")
    s"""WITH e AS (
       |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day FROM events),
       |byday AS (SELECT event_type, day, count(*) AS n FROM e GROUP BY 1, 2),
       |spans AS (SELECT event_type, min(day) AS lo, max(day) AS hi FROM byday GROUP BY 1),
       |spine AS (SELECT event_type, unnest(generate_series(lo, hi)) AS day FROM spans),
       |j AS (
       |  SELECT s.event_type, s.day, coalesce(b.n, 0) AS n_events
       |  FROM spine s LEFT JOIN byday b USING (event_type, day)),
       |l AS (
       |  SELECT event_type, day, n_events, $lagCols
       |  FROM j WINDOW w AS (PARTITION BY event_type ORDER BY day)),
       |k AS (
       |  SELECT event_type, day, n_events, $numExpr AS num
       |  FROM l WHERE l$EwmaDays IS NOT NULL)
       |SELECT event_type, day, CAST(n_events AS BIGINT) AS n_events,
       |  CAST((num * 1000) // 255 AS BIGINT) AS baseline_milli,
       |  (n_events * 255 > $EwmaSpikeFactor * num AND n_events >= $EwmaMinCount) AS spike
       |FROM k ORDER BY event_type, day""".stripMargin
  }

  /** Terminal life-table bucket for c42: session durations clamp to
    * this many minutes, so the life-table domain is LITERAL-bounded
    * (a pathological always-on key cannot grow the frame the
    * unpartitioned windows and ppm folds run over). */
  val KmMaxDurationMin = 240L

  /** c42: Kaplan–Meier survival life table over SESSION durations
    * (Kaplan & Meier 1958) — "how long does a session last", with
    * RIGHT-CENSORING done honestly: a session whose last event is
    * within the 30-min session gap of the corpus end may still be
    * running, so counting it as ended biases survival down (the c7/
    * c23 class of retention error, here fixed by the censoring
    * column rather than by construction). Sessions are c2's (30-min
    * inactivity gap); duration = last−first event, integer minutes,
    * clamped to the [[KmMaxDurationMin]] terminal bucket. Per
    * duration t: ended d_t, censored c_t, at-risk n_t (sessions with
    * duration ≥ t), hazard d_t/n_t, and the KM survival estimate
    * Π_{s≤t}(1 − d_s/n_s).
    *
    * Determinism — the c40 integer-ppm discipline: hazards are ppm by
    * truncating div, the survival product is a left fold in ppm
    * (acc·(1e6−h) div 1e6), identical in both engines; no doubles, no
    * product-of-float windows.
    *
    * Shape: one corpus scan → the c2 user-keyed session window →
    * per-session reduce (both ride ONE user exchange) + the a36/d85
    * slim scalar scan for the corpus-end broadcast (1-row BNLJ,
    * allowlisted); durations then reduce to the ≤[[KmMaxDurationMin]]
    * literal-bounded life table, where the suffix-sum window, the
    * collect into ONE bounded array row, and the per-row ppm folds
    * (≤|buckets|² long ops total) all run — nothing corpus-sized past
    * the session reduce. */
  def c42SurvivalKm(spark: SparkSession, dir: String): DataFrame = {
    val gapUs = SessionGapSec * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
    val endRow = Tables.events(spark, dir).agg(max(unix_micros(col("ts"))).as("end_t"))
    val sessions = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t"))
      .withColumn("prev_t", lag(col("t"), 1).over(w))
      .withColumn("nb",
        when(col("prev_t").isNull || col("t") - col("prev_t") > gapUs, 1L).otherwise(0L))
      .withColumn("sess",
        sum(col("nb")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess"))
      .agg(min(col("t")).as("s_start"), max(col("t")).as("s_end"))
    val tbl = sessions.crossJoin(broadcast(endRow))
      .select(
        least(expr("(s_end - s_start) div 60000000"), lit(KmMaxDurationMin)).as("t"),
        (col("s_end") + gapUs <= col("end_t")).as("ev"))
      .groupBy(col("t"))
      .agg(countIf(col("ev")).as("churned"), countIf(!col("ev")).as("censored"))
    val life = tbl
      .withColumn("n_at_risk",
        sum(col("churned") + col("censored")).over(
          Window.orderBy(col("t").desc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("hazard_ppm", expr("(churned * 1000000) div n_at_risk"))
    life
      .agg(sort_array(collect_list(struct(
        col("t"), col("churned"), col("censored"),
        col("n_at_risk"), col("hazard_ppm")))).as("rows"))
      .withColumn("hs", expr("transform(rows, x -> x.hazard_ppm)"))
      .select(col("hs"), posexplode(col("rows")).as(Seq("pos", "r")))
      .select(col("r.t").as("duration_min"), col("r.churned").as("churned"),
        col("r.censored").as("censored"), col("r.n_at_risk").as("n_at_risk"),
        col("r.hazard_ppm").as("hazard_ppm"),
        expr("""aggregate(slice(hs, 1, pos + 1), cast(1000000 as bigint),
                (acc, h) -> (acc * (1000000 - h)) div 1000000)""").as("survival_ppm"))
      .orderBy(col("duration_min"))
  }

  val c42Sql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events),
       |endr AS (SELECT max(t) AS end_t FROM e),
       |m AS (
       |  SELECT user_id, event_id, t,
       |    lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS prev_t
       |  FROM e),
       |f AS (
       |  SELECT user_id, t,
       |    CASE WHEN prev_t IS NULL OR t - prev_t > ${SessionGapSec * 1000000L}
       |         THEN 1 ELSE 0 END AS nb,
       |    event_id
       |  FROM m),
       |b AS (
       |  SELECT user_id, t,
       |    sum(nb) OVER (PARTITION BY user_id ORDER BY t, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
       |  FROM f),
       |s AS (SELECT user_id, sess, min(t) AS s_start, max(t) AS s_end FROM b GROUP BY 1, 2),
       |dur AS (
       |  SELECT least((s_end - s_start) // 60000000, $KmMaxDurationMin) AS t,
       |    s_end + ${SessionGapSec * 1000000L} <= end_t AS ev
       |  FROM s CROSS JOIN endr),
       |tbl AS (
       |  SELECT t, count(CASE WHEN ev THEN 1 END) AS churned,
       |    count(CASE WHEN NOT ev THEN 1 END) AS censored
       |  FROM dur GROUP BY 1),
       |life AS (
       |  SELECT t, churned, censored,
       |    sum(churned + censored) OVER (ORDER BY t DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_at_risk
       |  FROM tbl),
       |h AS (
       |  SELECT t, churned, censored, n_at_risk,
       |    (churned * 1000000) // n_at_risk AS hazard_ppm,
       |    row_number() OVER (ORDER BY t) AS rn
       |  FROM life),
       |arr AS (SELECT list(hazard_ppm ORDER BY t) AS hs FROM h)
       |SELECT t AS duration_min, CAST(churned AS BIGINT) AS churned,
       |  CAST(censored AS BIGINT) AS censored, CAST(n_at_risk AS BIGINT) AS n_at_risk,
       |  CAST(hazard_ppm AS BIGINT) AS hazard_ppm,
       |  CAST(list_reduce(list_prepend(CAST(1000000 AS BIGINT), list_slice(hs, 1, rn)),
       |    (acc, x) -> (acc * (1000000 - x)) // 1000000) AS BIGINT) AS survival_ppm
       |FROM h CROSS JOIN arr ORDER BY duration_min""".stripMargin

  /** c43 error budget: allowed error share in ppm. Production SLOs run
    * 99.9%+ (budget 1000 ppm); the synthetic corpus carries a ~20%
    * uniform error-type share, so the demo budget is 25% — the
    * arithmetic is identical, only the literal moves. */
  val SloBudgetPpm = 250000L
  /** Fast/slow burn thresholds in milli-budget (Google SRE workbook
    * multi-window multi-burn-rate alerting, adapted to the 1h/6h
    * grain): page only when BOTH the last hour burns >2× budget and
    * the trailing 6h burns >1.5× — the two-window AND suppresses both
    * blips (fast-only) and stale pages (slow-only). */
  val SloFastBurnMilli = 2000L
  val SloSlowBurnMilli = 1500L
  val SloSlowWindowHours = 6

  /** c43: SLO error-budget burn-rate alerting over the event stream —
    * the SRE readout (Beyer et al., Site Reliability Workbook ch. 5)
    * that turns c12/c38/c41-style anomaly counts into an actionable
    * page signal: per hour, the error share of all events, the burn
    * rate (error share ÷ budget, milli: 1000 = exactly on budget),
    * the trailing-6h burn, and the multi-window page flag.
    *
    * Determinism: shares in ppm and burns in milli via the truncating
    * integer div; empty hours are real zero-traffic hours (burn 0 by
    * the explicit CASE, not engine-specific NULL propagation).
    *
    * Shape: ONE corpus scan → hourly conditional agg (map-side) →
    * the c33 inline gap explode densifies the spine — so the rolling
    * 6h frame is 6 ROWS exactly — and every window (gap lag, rolling
    * sums) is unpartitioned over the ≤|span-hours| reduced frame
    * (value-bounded; the c31 rule). */
  def c43SloBurn(spark: SparkSession, dir: String): DataFrame =
    c43SloBurnOf(Tables.events(spark, dir))

  /** c43 over ANY events-shaped frame (the planted-error-storm spec
    * drives the page path, which the steady synthetic mix never
    * reaches: its slow burn sits at ~0.8× budget by construction). */
  def c43SloBurnOf(events: DataFrame): DataFrame = {
    val w = Window.orderBy(col("hr"))
    val byHour = events
      .groupBy(expr("unix_micros(ts) div 3600000000").as("hr"))
      .agg(count(lit(1)).as("n"), countIf(col("event_type") === "error").as("err"))
    val dense = byHour
      .withColumn("prev_hr", lag(col("hr"), 1).over(w))
      .select(explode(transform(
        sequence(coalesce(col("prev_hr") + 1, col("hr")), col("hr")),
        h => struct(
          h.as("hour"),
          when(h === col("hr"), col("n")).otherwise(lit(0L)).as("n_events"),
          when(h === col("hr"), col("err")).otherwise(lit(0L)).as("n_errors"))))
        .as("r"))
      .select(col("r.hour").as("hour"), col("r.n_events").as("n_events"),
        col("r.n_errors").as("n_errors"))
    val wSlow = Window.orderBy(col("hour"))
      .rowsBetween(-(SloSlowWindowHours - 1), Window.currentRow)
    dense
      .withColumn("n6", sum(col("n_events")).over(wSlow))
      .withColumn("err6", sum(col("n_errors")).over(wSlow))
      .select(col("hour"), col("n_events"), col("n_errors"),
        expr("case when n_events = 0 then 0 else (n_errors * 1000000) div n_events end")
          .as("err_ppm"),
        expr(s"""case when n_events = 0 then 0
                 else ((n_errors * 1000000) div n_events) * 1000 div $SloBudgetPpm end""")
          .as("burn_fast_milli"),
        expr(s"""case when n6 = 0 then 0
                 else ((err6 * 1000000) div n6) * 1000 div $SloBudgetPpm end""")
          .as("burn_slow_milli"))
      .withColumn("page",
        col("burn_fast_milli") > SloFastBurnMilli &&
          col("burn_slow_milli") > SloSlowBurnMilli)
      .orderBy(col("hour"))
  }

  val c43Sql: String =
    s"""WITH byhour AS (
       |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr,
       |    count(*) AS n, count(CASE WHEN event_type = 'error' THEN 1 END) AS err
       |  FROM events GROUP BY 1),
       |l AS (SELECT *, lag(hr) OVER (ORDER BY hr) AS prev_hr FROM byhour),
       |dense AS (
       |  SELECT unnest(generate_series(coalesce(prev_hr + 1, hr), hr)) AS hour,
       |    hr, n, err FROM l),
       |d AS (
       |  SELECT hour,
       |    CASE WHEN hour = hr THEN n ELSE 0 END AS n_events,
       |    CASE WHEN hour = hr THEN err ELSE 0 END AS n_errors
       |  FROM dense),
       |r AS (
       |  SELECT hour, n_events, n_errors,
       |    sum(n_events) OVER (ORDER BY hour
       |      ROWS BETWEEN ${SloSlowWindowHours - 1} PRECEDING AND CURRENT ROW) AS n6,
       |    sum(n_errors) OVER (ORDER BY hour
       |      ROWS BETWEEN ${SloSlowWindowHours - 1} PRECEDING AND CURRENT ROW) AS err6
       |  FROM d),
       |k AS (
       |  SELECT hour, n_events, n_errors,
       |    CASE WHEN n_events = 0 THEN 0
       |         ELSE (n_errors * 1000000) // n_events END AS err_ppm,
       |    CASE WHEN n_events = 0 THEN 0
       |         ELSE ((n_errors * 1000000) // n_events) * 1000 // $SloBudgetPpm END AS burn_fast_milli,
       |    CASE WHEN n6 = 0 THEN 0
       |         ELSE ((err6 * 1000000) // n6) * 1000 // $SloBudgetPpm END AS burn_slow_milli
       |  FROM r)
       |SELECT hour, CAST(n_events AS BIGINT) AS n_events,
       |  CAST(n_errors AS BIGINT) AS n_errors, CAST(err_ppm AS BIGINT) AS err_ppm,
       |  CAST(burn_fast_milli AS BIGINT) AS burn_fast_milli,
       |  CAST(burn_slow_milli AS BIGINT) AS burn_slow_milli,
       |  burn_fast_milli > $SloFastBurnMilli AND burn_slow_milli > $SloSlowBurnMilli AS page
       |FROM k ORDER BY hour""".stripMargin

  /** c44 burn-in: days whose mean sets the CUSUM target. */
  val CusumBaselineDays = 7
  /** c44 slack: the drift allowance k = max(1, target/4) — shifts
    * smaller than a quarter of the baseline rate are noise. */
  val CusumSlackDenom = 4L
  /** c44 decision interval: alarm when S exceeds h = 8·slack (the
    * ~4σ-equivalent of the classic tabular CUSUM at these rates). */
  val CusumHFactor = 8L

  def c44CusumShift(spark: SparkSession, dir: String): DataFrame =
    c44CusumShiftOf(Tables.events(spark, dir))

  /** c44: tabular CUSUM changepoint detection per event type (Page
    * 1954; Montgomery's tabular form) — the sequential drift detector
    * c26's two-window contrast cannot replace: a level shift SMALLER
    * than the window contrast threshold still accumulates in the
    * one-sided CUSUM until it alarms, with provably optimal average
    * detection delay. Per type: the first [[CusumBaselineDays]] dense
    * days set target = mean (integer div) and slack k = max(1,
    * target/[[CusumSlackDenom]]); each later day contributes
    * y = cnt − target − k, and the alarm statistic is the classic
    * recursion S_t = max(0, S_{t−1} + y_t) — computed RELATIONALLY via
    * the prefix identity S_t = cum_t − min(0, min_{j≤t} cum_j), which
    * turns the sequential recursion into two windows over the reduced
    * day spine (the q23 running-total discipline; no iterative state
    * anywhere). Alarm when S > h = [[CusumHFactor]]·k. All integer
    * arithmetic — counts, sums, truncating div — so both engines and
    * the local replay agree bit-for-bit.
    *
    * Shape: ONE corpus scan → (type, day) reduce with map-side
    * partials → the c33 inline gap explode densifies each type's
    * spine (gap days are real zeros — a silent feed going dark MUST
    * drive the statistic down) → every window (gap lag, baseline sum,
    * prefix cum/min) is over the ≤|types|·|span-days| reduced frame
    * (the c31 rule). Types with fewer than [[CusumBaselineDays]]+1
    * dense days emit nothing (burn-in only). */
  def c44CusumShiftOf(events: DataFrame): DataFrame = {
    val wSpine = Window.partitionBy(col("event_type")).orderBy(col("day_idx"))
    val byDay = events
      .groupBy(col("event_type"), expr("unix_date(to_date(ts))").as("day_idx"))
      .agg(count(lit(1)).as("cnt"))
    val dense = byDay
      .withColumn("prev_day", lag(col("day_idx"), 1).over(wSpine))
      .select(col("event_type"), explode(transform(
        sequence(coalesce(col("prev_day") + 1, col("day_idx")), col("day_idx")),
        d => struct(d.as("day_idx"),
          when(d === col("day_idx"), col("cnt")).otherwise(lit(0L)).as("cnt"))))
        .as("r"))
      .select(col("event_type"), col("r.day_idx").as("day_idx"), col("r.cnt").as("cnt"))
    val wType = Window.partitionBy(col("event_type"))
    val withBase = dense
      .withColumn("rn", row_number().over(wSpine) - 1)
      .withColumn("base_sum",
        sum(when(col("rn") < CusumBaselineDays, col("cnt")).otherwise(lit(0L))).over(wType))
      .withColumn("n_days", count(lit(1)).over(wType))
      .filter(col("n_days") > CusumBaselineDays && col("rn") >= CusumBaselineDays)
      .withColumn("target", expr(s"base_sum div $CusumBaselineDays"))
      .withColumn("slack", greatest(lit(1L), expr(s"target div $CusumSlackDenom")))
    val wCum = wSpine.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withBase
      .withColumn("cum", sum(col("cnt") - col("target") - col("slack")).over(wCum))
      .withColumn("s_cusum", col("cum") - least(min(col("cum")).over(wCum), lit(0L)))
      .select(col("event_type"), col("day_idx"), col("cnt"), col("target"),
        col("slack"), col("s_cusum"),
        (col("s_cusum") > col("slack") * CusumHFactor).as("alarm"))
      .orderBy(col("event_type"), col("day_idx"))
  }

  val c44Sql: String =
    s"""WITH e AS (
       |  SELECT event_type,
       |    datediff('day', DATE '1970-01-01', CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS day_idx
       |  FROM events),
       |d AS (SELECT event_type, day_idx, count(*) AS cnt FROM e GROUP BY 1, 2),
       |l AS (SELECT *, lag(day_idx) OVER (PARTITION BY event_type ORDER BY day_idx) AS prev_day FROM d),
       |dense AS (
       |  SELECT event_type,
       |    unnest(generate_series(coalesce(prev_day + 1, day_idx), day_idx)) AS day,
       |    day_idx, cnt FROM l),
       |z AS (
       |  SELECT event_type, day AS day_idx,
       |    CASE WHEN day = day_idx THEN cnt ELSE 0 END AS cnt
       |  FROM dense),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY day_idx) - 1 AS rn
       |  FROM z),
       |b AS (
       |  SELECT *,
       |    sum(CASE WHEN rn < $CusumBaselineDays THEN cnt ELSE 0 END)
       |      OVER (PARTITION BY event_type) AS base_sum,
       |    count(*) OVER (PARTITION BY event_type) AS n_days
       |  FROM r),
       |t AS (
       |  SELECT event_type, day_idx, cnt,
       |    CAST(base_sum // $CusumBaselineDays AS BIGINT) AS target,
       |    greatest(1, CAST(base_sum // $CusumBaselineDays AS BIGINT) // $CusumSlackDenom) AS slack
       |  FROM b WHERE n_days > $CusumBaselineDays AND rn >= $CusumBaselineDays),
       |c AS (
       |  SELECT *,
       |    sum(cnt - target - slack) OVER (PARTITION BY event_type ORDER BY day_idx
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM t),
       |s AS (
       |  SELECT event_type, day_idx, cnt, target, slack,
       |    CAST(cum - least(min(cum) OVER (PARTITION BY event_type ORDER BY day_idx
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS BIGINT) AS s_cusum,
       |    slack AS sl
       |  FROM c)
       |SELECT event_type, day_idx, CAST(cnt AS BIGINT) AS cnt, target,
       |  CAST(slack AS BIGINT) AS slack, s_cusum,
       |  s_cusum > slack * $CusumHFactor AS alarm
       |FROM s ORDER BY event_type, day_idx""".stripMargin

  /** c45 backtest lookback: same-weekday observations per forecast. */
  val BacktestWeeks = 4

  def c45DowBacktest(spark: SparkSession, dir: String): DataFrame =
    c45DowBacktestOf(Tables.events(spark, dir))

  /** c45: seasonal-naive forecast backtest per event type — the
    * capacity-planning loop every ops team runs before trusting a
    * volume forecast: predict each day's count as the mean of the
    * previous [[BacktestWeeks]] same-weekday counts (the seasonal
    * naive baseline every fancier model must beat), then score the
    * whole history: MAPE and signed bias in exact basis points, plus
    * the worst single day. Division-free error arithmetic — the
    * comparison is |4·actual − Σforecast| against Σforecast, so the
    * mean never truncates before the error does (one final
    * truncating div per row, identical in both engines).
    *
    * Gap days are real zeros on the c33 dense spine — a dark feed
    * must wreck the forecast score, not vanish from it. Only days
    * with a FULL lookback (all [[BacktestWeeks]] prior same-weekday
    * spine days) are scored, so early-history rows never dilute.
    *
    * Shape: ONE corpus scan → (type, day) reduce → dense spine
    * (inline gap explode) → the lookback is a RANGE window over the
    * (type, dow) partition (rows 7 apart, frame [-28, -7] catches
    * exactly the 4 prior weeks) → final ≤|types| reduce. Every window
    * runs on the reduced day spine (the c31 rule). */
  def c45DowBacktestOf(events: DataFrame): DataFrame = {
    val wSpine = Window.partitionBy(col("event_type")).orderBy(col("day_idx"))
    val byDay = events
      .groupBy(col("event_type"), expr("unix_date(to_date(ts))").as("day_idx"))
      .agg(count(lit(1)).as("cnt"))
    val dense = byDay
      .withColumn("prev_day", lag(col("day_idx"), 1).over(wSpine))
      .select(col("event_type"), explode(transform(
        sequence(coalesce(col("prev_day") + 1, col("day_idx")), col("day_idx")),
        d => struct(d.as("day_idx"),
          when(d === col("day_idx"), col("cnt")).otherwise(lit(0L)).as("cnt"))))
        .as("r"))
      .select(col("event_type"), col("r.day_idx").as("day_idx"), col("r.cnt").as("cnt"))
    val wDow = Window.partitionBy(col("event_type"), expr("day_idx % 7"))
      .orderBy(col("day_idx")).rangeBetween(-7L * BacktestWeeks, -7L)
    dense
      .withColumn("f_sum", sum(col("cnt")).over(wDow))
      .withColumn("f_cnt", count(lit(1)).over(wDow))
      .filter(col("f_cnt") === BacktestWeeks)
      .withColumn("err", col("cnt") * BacktestWeeks - col("f_sum"))
      .withColumn("ae_bp", expr("(abs(err) * 10000) div greatest(1L, f_sum)"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        expr("sum(ae_bp) div count(1)").as("mape_bp"),
        expr("(sum(err) * 10000) div greatest(1L, sum(f_sum))").as("bias_bp"),
        max(col("ae_bp")).as("worst_bp"))
      .orderBy(col("event_type"))
  }

  val c45Sql: String =
    s"""WITH e AS (
       |  SELECT event_type,
       |    datediff('day', DATE '1970-01-01', CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS day_idx
       |  FROM events),
       |d AS (SELECT event_type, day_idx, count(*) AS cnt FROM e GROUP BY 1, 2),
       |l AS (SELECT *, lag(day_idx) OVER (PARTITION BY event_type ORDER BY day_idx) AS prev_day FROM d),
       |dense AS (
       |  SELECT event_type,
       |    unnest(generate_series(coalesce(prev_day + 1, day_idx), day_idx)) AS day,
       |    day_idx, cnt FROM l),
       |z AS (
       |  SELECT event_type, day AS day_idx,
       |    CASE WHEN day = day_idx THEN cnt ELSE 0 END AS cnt
       |  FROM dense),
       |f AS (
       |  SELECT *,
       |    sum(cnt) OVER w AS f_sum, count(*) OVER w AS f_cnt
       |  FROM z WINDOW w AS (PARTITION BY event_type, day_idx % 7 ORDER BY day_idx
       |    RANGE BETWEEN ${7 * BacktestWeeks} PRECEDING AND 7 PRECEDING)),
       |s AS (
       |  SELECT event_type, cnt * $BacktestWeeks - f_sum AS err,
       |    (abs(cnt * $BacktestWeeks - f_sum) * 10000) // greatest(1, f_sum) AS ae_bp,
       |    f_sum
       |  FROM f WHERE f_cnt = $BacktestWeeks)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
       |  CAST(sum(ae_bp) // count(*) AS BIGINT) AS mape_bp,
       |  CAST((sum(err) * 10000) // greatest(1, sum(f_sum)) AS BIGINT) AS bias_bp,
       |  CAST(max(ae_bp) AS BIGINT) AS worst_bp
       |FROM s GROUP BY 1 ORDER BY event_type""".stripMargin

  /** c46 outage threshold: idle minutes between consecutive ACTIVE
    * minutes at which a silence becomes an outage (1 hour). */
  val OutageIdleMin = 60L

  def c46DowntimeReport(spark: SparkSession, dir: String): DataFrame =
    c46DowntimeReportOf(Tables.events(spark, dir))

  /** c46: downtime/availability report per event type — the batch SLA
    * rollup behind silenceStream's live alerts (alerting says "it is
    * down NOW"; this answers the monthly-review question "how down
    * WAS it"): activity is quantized to MINUTE grain (any event in a
    * minute makes it active), a run of ≥[[OutageIdleMin]] fully-idle
    * minutes between consecutive active minutes is an outage, and the
    * report gives per type: active minutes, observed span, outage
    * count, total + longest downtime, and availability in exact ppm
    * over the span. Quantization is the SCALE decision, not a
    * shortcut: gaps computed by lag over raw events would need a
    * per-TYPE window over the corpus — \|types\| is tiny, so those
    * partitions are exactly the hot keys the c31 rule exists to keep
    * out of window sorts. The minute reduce first makes the window
    * frame ≤\|types\|·span-minutes — calendar-bounded at any SF — for
    * the price of sub-minute blindness an SLA report never needed.
    *
    * All integer: epoch minutes, idle = gap − 1 full idle minutes,
    * truncating-div ppm. Boundary exact: idle == threshold IS an
    * outage (spec-pinned). Leading/trailing silence is out of scope
    * by construction (span starts/ends at observed activity —
    * detecting a feed that never came back is silenceStream's job).
    *
    * Shape: ONE scan → distinct (type, minute) reduce (map-side
    * partial) → per-type lag + conditional agg over the reduced
    * frame → ≤\|types\| rows. */
  def c46DowntimeReportOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("minute"))
    events
      .select(col("event_type"), expr("unix_micros(ts) div 60000000").as("minute"))
      .distinct()
      .withColumn("idle", col("minute") - lag(col("minute"), 1).over(w) - 1)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("active_min"),
        (max(col("minute")) - min(col("minute")) + 1).as("span_min"),
        countIf(col("idle") >= OutageIdleMin).as("n_outages"),
        sum(when(col("idle") >= OutageIdleMin, col("idle")).otherwise(0L)).as("downtime_min"),
        max(when(col("idle") >= OutageIdleMin, col("idle")).otherwise(0L)).as("longest_min"))
      .select(col("event_type"), col("active_min"), col("span_min"),
        col("n_outages"), col("downtime_min"), col("longest_min"),
        expr("((span_min - downtime_min) * 1000000) div span_min").as("availability_ppm"))
      .orderBy(col("event_type"))
  }

  val c46Sql: String =
    s"""WITH m AS (
       |  SELECT DISTINCT event_type,
       |    epoch_us(CAST(ts AS TIMESTAMP)) // 60000000 AS minute
       |  FROM events),
       |g AS (
       |  SELECT event_type,
       |    minute - lag(minute) OVER (PARTITION BY event_type ORDER BY minute) - 1 AS idle,
       |    minute
       |  FROM m),
       |a AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS active_min,
       |    CAST(max(minute) - min(minute) + 1 AS BIGINT) AS span_min,
       |    CAST(sum(CASE WHEN idle >= $OutageIdleMin THEN 1 ELSE 0 END) AS BIGINT) AS n_outages,
       |    CAST(sum(CASE WHEN idle >= $OutageIdleMin THEN idle ELSE 0 END) AS BIGINT) AS downtime_min,
       |    CAST(max(CASE WHEN idle >= $OutageIdleMin THEN idle ELSE 0 END) AS BIGINT) AS longest_min
       |  FROM g GROUP BY 1)
       |SELECT event_type, active_min, span_min, n_outages, downtime_min, longest_min,
       |  CAST(((span_min - downtime_min) * 1000000) // span_min AS BIGINT) AS availability_ppm
       |FROM a ORDER BY event_type""".stripMargin

  def c47AnomalyEnsemble(spark: SparkSession, dir: String): DataFrame =
    c47AnomalyEnsembleOf(Tables.events(spark, dir))

  /** c47: anomaly ENSEMBLE feed — the pager-noise answer to "which of
    * my three detectors do I believe": the c12 global-moment rule, the
    * c38 MAD rule, and the c41 EWMA recency rule all scored per
    * (type, day) over ONE shared zero-filled day spine, emitting only
    * flagged days with a `page` consensus bit (≥2 of 3 agree). Running
    * detectors in committee is the standard on-call de-noising move —
    * a single detector's false positives rarely survive a vote, while
    * a real incident trips the moment AND robust AND recency views at
    * once. Sharing the spine is deliberate: each member sees the SAME
    * series (c12 standalone scores observed days only; here gap days
    * are real zeros for all three — a silent feed can page).
    *
    * Determinism: the moment rule is DECIMAL(38)-exact (c12's
    * dev² > 4·(n·ssq − s²) form); MAD compares doubles built from the
    * identical operand tree in both engines (c38 rule); EWMA is the
    * c41 dyadic-integer test with burn-in rows scoring false (FALSE
    * AND NULL = FALSE in both engines — no coalesce needed).
    *
    * Shape: ONE scan → (type, day) reduce (map-side partial) → the
    * c33 inline gap explode densifies the spine → all three detectors
    * as windows PARTITIONED BY type over the calendar-bounded frame
    * (the c31 rule: day grain, never corpus grain) → filter to the
    * alert feed. No detector re-scans the corpus; the committee costs
    * one extra percentile window over the spine vs running c41 alone. */
  def c47AnomalyEnsembleOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def d38c(c: Column): Column = c.cast(DecimalType(38, 0))
    val wT = Window.partitionBy(col("event_type"))
    val wD = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val dev12 = d38c(col("n_events")) * d38c(col("n_days")) - d38c(col("s"))
    zeroFilledDaysOf(events)
      .select(col("event_type"), col("day"), col("n_events"))
      .withColumn("n_days", count(lit(1)).over(wT))
      .withColumn("s", sum(col("n_events")).over(wT))
      .withColumn("ssq", sum(d38c(col("n_events")) * d38c(col("n_events"))).over(wT))
      .withColumn("z_flag", dev12 * dev12 >
        lit(4) * (d38c(col("n_days")) * col("ssq") - d38c(col("s")) * d38c(col("s"))))
      .withColumn("med", expr("percentile(n_events, 0.5D)").over(wT))
      .withColumn("dev", abs(col("n_events").cast("double") - col("med")))
      .withColumn("mad", expr("percentile(dev, 0.5D)").over(wT))
      .withColumn("mad_flag", col("dev") > col("mad") * 3)
      .withColumn("num",
        (1 to EwmaDays).map(k =>
          lag(col("n_events"), k).over(wD) * lit(1L << (EwmaDays - k))).reduce(_ + _))
      .withColumn("ewma_flag",
        col("num").isNotNull &&
          col("n_events") * lit(255L) > lit(EwmaSpikeFactor) * col("num") &&
          col("n_events") >= EwmaMinCount)
      .withColumn("n_flags", col("z_flag").cast("long") +
        col("mad_flag").cast("long") + col("ewma_flag").cast("long"))
      .filter(col("n_flags") >= 1)
      .select(col("event_type"), col("day"), col("n_events"),
        col("z_flag"), col("mad_flag"), col("ewma_flag"),
        col("n_flags"), (col("n_flags") >= 2).as("page"))
      .orderBy(col("event_type"), col("day"))
  }

  val c47Sql: String = {
    val lagCols = (1 to EwmaDays).map(k => s"lag(n_events, $k) OVER wd AS l$k").mkString(", ")
    val numExpr = (1 to EwmaDays).map(k => s"l$k * ${1L << (EwmaDays - k)}").mkString(" + ")
    s"""WITH e AS (
       |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day FROM events),
       |byday AS (SELECT event_type, day, count(*) AS n FROM e GROUP BY 1, 2),
       |spans AS (SELECT event_type, min(day) AS lo, max(day) AS hi FROM byday GROUP BY 1),
       |spine AS (SELECT event_type, unnest(generate_series(lo, hi)) AS day FROM spans),
       |j AS (
       |  SELECT s.event_type, s.day, coalesce(b.n, 0) AS n_events
       |  FROM spine s LEFT JOIN byday b USING (event_type, day)),
       |m AS (
       |  SELECT *, count(*) OVER wt AS n_days, sum(n_events) OVER wt AS s,
       |    sum(CAST(n_events AS HUGEINT) * CAST(n_events AS HUGEINT)) OVER wt AS ssq,
       |    quantile_cont(n_events, 0.5) OVER wt AS med,
       |    $lagCols
       |  FROM j WINDOW wt AS (PARTITION BY event_type),
       |    wd AS (PARTITION BY event_type ORDER BY day)),
       |d AS (SELECT *, abs(n_events - med) AS dev, $numExpr AS num FROM m),
       |md AS (
       |  SELECT *, quantile_cont(dev, 0.5) OVER (PARTITION BY event_type) AS mad
       |  FROM d),
       |f AS (
       |  SELECT event_type, day, n_events,
       |    (CAST(n_events AS HUGEINT) * n_days - s) * (CAST(n_events AS HUGEINT) * n_days - s)
       |      > 4 * (n_days * ssq - CAST(s AS HUGEINT) * CAST(s AS HUGEINT)) AS z_flag,
       |    dev > 3 * mad AS mad_flag,
       |    (num IS NOT NULL AND n_events * 255 > $EwmaSpikeFactor * num
       |      AND n_events >= $EwmaMinCount) AS ewma_flag
       |  FROM md),
       |g AS (
       |  SELECT *, CAST((CASE WHEN z_flag THEN 1 ELSE 0 END)
       |    + (CASE WHEN mad_flag THEN 1 ELSE 0 END)
       |    + (CASE WHEN ewma_flag THEN 1 ELSE 0 END) AS BIGINT) AS n_flags
       |  FROM f)
       |SELECT event_type, day, CAST(n_events AS BIGINT) AS n_events,
       |  z_flag, mad_flag, ewma_flag, n_flags, n_flags >= 2 AS page
       |FROM g WHERE n_flags >= 1 ORDER BY event_type, day""".stripMargin
  }

  def c48Dispersion(spark: SparkSession, dir: String): DataFrame =
    c48DispersionOf(Tables.events(spark, dir))

  /** c48: index-of-dispersion (Fano factor) per event type — the
    * PROCESS classifier the per-day detectors (c12/c38/c41/c47)
    * presuppose but never test: is this stream Poisson-like (variance
    * ≈ mean, dispersion ≈ 1), BURSTY (over-dispersed — arrivals
    * clump, so day-grain thresholds fire on clumps that are normal
    * for this feed), or REGULAR (under-dispersed — a scheduler, not
    * organic traffic)? Cox & Lewis 1966's first diagnostic for point
    * processes; the answer decides whether c25's burst test or c41's
    * EWMA is even the right tool per feed. Per type over the
    * zero-filled day spine: days, total, mean (milli), population
    * variance→Fano = n·(n·ssq − s²) / (n²·s) in milli by DECIMAL(38)
    * integral cross-multiplication — no doubles, no divide-then-
    * divide rounding drift — and the verdict at the ±20% band
    * (spec-pinned boundaries).
    *
    * Shape: ONE scan → (type, day) reduce → c33 inline gap explode
    * (zeros are real days — omitting them inflates regularity) →
    * per-type 1-row aggregate. ≤|types| rows out. */
  def c48DispersionOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def d38c(c: Column): Column = c.cast(DecimalType(38, 0))
    zeroFilledDaysOf(events)
      .select(col("event_type"), col("n_events"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("n_events")).as("total"),
        sum(d38c(col("n_events")) * d38c(col("n_events"))).as("ssq"))
      .filter(col("total") > 0)
      .withColumn("num",
        lit(1000) * (d38c(col("n_days")) * col("ssq") - d38c(col("total")) * d38c(col("total"))))
      .withColumn("den", d38c(col("n_days")) * d38c(col("total")))
      .select(col("event_type"), col("n_days"), col("total"),
        expr("(total * 1000) div n_days").as("mean_milli"),
        // fano_milli = 1000·var/mean = 1000·(n·ssq − s²) div (n·s) —
        // integral div (nonnegative operands), not decimal `/` whose
        // scale-6 HALF_UP could bump across the truncation boundary
        expr("num div den").as("fano_milli"))
      .withColumn("verdict",
        when(col("fano_milli") > 1200, lit("bursty"))
          .when(col("fano_milli") < 800, lit("regular"))
          .otherwise(lit("poisson_like")))
      .orderBy(col("event_type"))
  }

  val c48Sql: String =
    """WITH e AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day FROM events),
      |byday AS (SELECT event_type, day, count(*) AS n FROM e GROUP BY 1, 2),
      |spans AS (SELECT event_type, min(day) AS lo, max(day) AS hi FROM byday GROUP BY 1),
      |spine AS (SELECT event_type, unnest(generate_series(lo, hi)) AS day FROM spans),
      |j AS (
      |  SELECT s.event_type, s.day, coalesce(b.n, 0) AS n_events
      |  FROM spine s LEFT JOIN byday b USING (event_type, day)),
      |a AS (
      |  SELECT event_type, count(*) AS n_days, sum(n_events) AS total,
      |    sum(CAST(n_events AS HUGEINT) * CAST(n_events AS HUGEINT)) AS ssq
      |  FROM j GROUP BY 1),
      |f AS (
      |  SELECT event_type, CAST(n_days AS BIGINT) AS n_days, CAST(total AS BIGINT) AS total,
      |    CAST((total * 1000) // n_days AS BIGINT) AS mean_milli,
      |    CAST((1000 * (n_days * ssq - CAST(total AS HUGEINT) * CAST(total AS HUGEINT)))
      |      // (CAST(n_days AS HUGEINT) * total) AS BIGINT) AS fano_milli
      |  FROM a WHERE total > 0)
      |SELECT event_type, n_days, total, mean_milli, fano_milli,
      |  CASE WHEN fano_milli > 1200 THEN 'bursty'
      |       WHEN fano_milli < 800 THEN 'regular'
      |       ELSE 'poisson_like' END AS verdict
      |FROM f ORDER BY event_type""".stripMargin

  def c49CoBurst(spark: SparkSession, dir: String): DataFrame =
    c49CoBurstOf(Tables.events(spark, dir))

  /** c49: co-burst correlation matrix — "which feeds flood TOGETHER":
    * for every ordered pair of event types, the Jaccard overlap of
    * their c41 spike-day sets (plus both marginals and the joint
    * count). The on-call read: a high co-burst pair shares a root
    * cause (one incident, one page — route them to the same alert
    * group); a type that bursts alone is its own failure domain. The
    * member flags are EXACTLY c41's (same spine, same dyadic-integer
    * test, same burn-in), so the matrix is consistent with the
    * control chart the operator already watches.
    *
    * Shape: ONE scan — the c27/d55 idiom, because a naive self-join +
    * two marginal joins re-derives the c41 lineage FOUR times (the
    * static planner does not dedupe branches; plan-audited): filter
    * the c41 frame to SPIKE days (reduced — flags are rare by
    * construction) → per-day sorted type set → ordered pairs
    * generated ROW-LOCALLY with the diagonal riding along → pair
    * reduce → marginals read off the diagonal rows by two windows
    * over the ≤|types|² frame. Zero-overlap pairs have no row (the
    * c27 convention). */
  def c49CoBurstOf(events: DataFrame): DataFrame = {
    val spikes = c41EwmaControlOf(events)
      .filter(col("spike"))
      .select(col("event_type"), col("day"))
    val ts = col("ts")
    val pairsWithDiag = flatten(transform(ts, (x, i) =>
      transform(slice(ts, i + lit(1), size(ts)),
        y => struct(x.as("t1"), y.as("t2")))))
    val w1 = Window.partitionBy(col("t1"))
    val w2 = Window.partitionBy(col("t2"))
    spikes
      .groupBy(col("day"))
      .agg(sort_array(collect_set(col("event_type"))).as("ts"))
      .select(explode(pairsWithDiag).as("p"))
      .groupBy(col("p.t1").as("t1"), col("p.t2").as("t2"))
      .agg(count(lit(1)).as("n_joint"))
      .withColumn("n1", max(when(col("t1") === col("t2"), col("n_joint"))).over(w1))
      .withColumn("n2", max(when(col("t1") === col("t2"), col("n_joint"))).over(w2))
      .filter(col("t1") < col("t2"))
      .select(col("t1"), col("t2"), col("n1"), col("n2"), col("n_joint"),
        expr("(n_joint * 10000) div (n1 + n2 - n_joint)").as("jaccard_bp"))
      .orderBy(col("t1"), col("t2"))
  }

  val c49Sql: String = {
    val lagCols = (1 to EwmaDays).map(k => s"lag(n_events, $k) OVER w AS l$k").mkString(", ")
    val numExpr = (1 to EwmaDays).map(k => s"l$k * ${1L << (EwmaDays - k)}").mkString(" + ")
    s"""WITH e AS (
       |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day FROM events),
       |byday AS (SELECT event_type, day, count(*) AS n FROM e GROUP BY 1, 2),
       |spans AS (SELECT event_type, min(day) AS lo, max(day) AS hi FROM byday GROUP BY 1),
       |spine AS (SELECT event_type, unnest(generate_series(lo, hi)) AS day FROM spans),
       |j AS (
       |  SELECT s.event_type, s.day, coalesce(b.n, 0) AS n_events
       |  FROM spine s LEFT JOIN byday b USING (event_type, day)),
       |l AS (
       |  SELECT event_type, day, n_events, $lagCols
       |  FROM j WINDOW w AS (PARTITION BY event_type ORDER BY day)),
       |k AS (
       |  SELECT event_type, day, n_events, $numExpr AS num
       |  FROM l WHERE l$EwmaDays IS NOT NULL),
       |sp AS (
       |  SELECT event_type, day FROM k
       |  WHERE n_events * 255 > $EwmaSpikeFactor * num AND n_events >= $EwmaMinCount),
       |cnt AS (SELECT event_type, count(*) AS n FROM sp GROUP BY 1),
       |pr AS (
       |  SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS n_joint
       |  FROM sp a JOIN sp b ON a.day = b.day AND a.event_type < b.event_type
       |  GROUP BY 1, 2)
       |SELECT t1, t2, CAST(c1.n AS BIGINT) AS n1, CAST(c2.n AS BIGINT) AS n2,
       |  CAST(n_joint AS BIGINT) AS n_joint,
       |  CAST((n_joint * 10000) // (c1.n + c2.n - n_joint) AS BIGINT) AS jaccard_bp
       |FROM pr JOIN cnt c1 ON t1 = c1.event_type JOIN cnt c2 ON t2 = c2.event_type
       |ORDER BY t1, t2""".stripMargin
  }

  /** Sketch size for c50 — 256 min-values ⇒ ~1/√256 ≈ 6% relative
    * error on distinct estimates (Beyer et al. 2007), 2 KB per key. */
  val KmvK = 256
  private val KmvH = 1152921504606846976L // 2^60 — the 15-hex-digit hash space

  def c50OverlapSketch(spark: SparkSession, dir: String): DataFrame =
    c50OverlapSketchOf(Tables.events(spark, dir))

  /** c50: audience-overlap SKETCH card — c27's 100 TB twin: per type
    * pair, distinct-user and union estimates plus the KMV-estimated
    * Jaccard, from k-minimum-values sketches (Bar-Yossef et al. 2002;
    * Beyer et al. 2007's (k−1)/U_(k) estimator) instead of exact
    * distinct sets. c27 is exact because (user, type) reduces small at
    * any SF; the SKETCH is what survives when the overlap question is
    * asked of a key that does NOT reduce (pages, queries, items): each
    * group folds to k=[[KmvK]] longs in ONE pass through the custom
    * [[graft.functions.KmvAgg]] TypedImperativeAggregate — bounded
    * buffer, map-side combinable, no per-key sort window (the
    * relational distinct→row_number form is exactly the c31-banned
    * hot-partition sort at scale). All set math afterwards is
    * row-local over ≤2k-element arrays on the ≤|types|² frame.
    *
    * Determinism: the hash is the d22 md5-prefix idiom (60-bit,
    * nonnegative) so DuckDB replays the EXACT sketch, estimates and
    * all — a sketch operator with a hash-exact oracle, not a
    * tolerance check; estimates use integral div in DECIMAL(38)
    * ((k−1)·2⁶⁰ overflows Long). Union estimate from the merged
    * sketch's k-th min; Jaccard = |K ∩ A ∩ B| / |K| (the standard KMV
    * set-operation rule). Sub-k keys fall back to exact counts.
    *
    * Shape: ONE scan → per-type kmv_sketch aggregate (|types| rows of
    * k longs) → ONE collected row → row-local pair explode (c27's
    * idiom) → pair math. Nothing corpus-sized past the aggregate. */
  def c50OverlapSketchOf(events: DataFrame): DataFrame = {
    val estOf = (sk: String) => when(size(col(sk)) < KmvK, size(col(sk)).cast("long"))
      .otherwise(expr(s"(cast(${KmvK - 1} as decimal(38,0)) * $KmvH) " +
        s"div element_at($sk, size($sk))"))
    val arr = col("arr")
    val pairs = flatten(transform(arr, (x, i) =>
      transform(slice(arr, i + lit(2), size(arr)),
        y => struct(x.as("a"), y.as("b")))))
    events
      .select(col("event_type"),
        expr("cast(conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10) as bigint)")
          .as("h"))
      .groupBy(col("event_type"))
      .agg(expr(s"kmv_sketch(h, $KmvK)").as("sk"))
      .select(col("event_type"), col("sk"), estOf("sk").as("est_users"))
      .groupBy()
      .agg(sort_array(collect_list(struct(col("event_type"), col("sk"),
        col("est_users")))).as("arr"))
      .select(explode(pairs).as("p"))
      .select(col("p.a.event_type").as("t1"), col("p.b.event_type").as("t2"),
        col("p.a.est_users").as("est_users_1"), col("p.b.est_users").as("est_users_2"),
        col("p.a.sk").as("sa"), col("p.b.sk").as("sb"))
      .withColumn("ku", slice(array_sort(array_distinct(concat(col("sa"), col("sb")))),
        1, KmvK))
      .withColumn("kk", size(col("ku")).cast("long"))
      .withColumn("inter_k",
        size(array_intersect(array_intersect(col("ku"), col("sa")), col("sb"))).cast("long"))
      .select(col("t1"), col("t2"), col("est_users_1"), col("est_users_2"),
        when(col("kk") < KmvK, col("kk"))
          .otherwise(expr(s"(cast(${KmvK - 1} as decimal(38,0)) * $KmvH) " +
            "div element_at(ku, size(ku))")).as("est_union"),
        col("inter_k"),
        expr("(10000 * inter_k) div kk").as("jaccard_bp"))
      .orderBy(col("t1"), col("t2"))
  }

  val c50Sql: String = {
    val pow16 = (0 until 15).map(i => math.pow(16, 14 - i).toLong)
    val digit = pow16.zipWithIndex.map { case (p, i) =>
      s"CAST(strpos('0123456789abcdef', m[${i + 1}]) - 1 AS BIGINT) * $p"
    }.mkString(" + ")
    s"""WITH hx AS (
       |  SELECT DISTINCT event_type, ($digit) AS h
       |  FROM (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS m FROM events)),
       |r AS (
       |  SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
       |    count(*) OVER (PARTITION BY event_type) AS nh
       |  FROM hx),
       |sk AS (SELECT event_type, h, nh FROM r WHERE rn <= $KmvK),
       |est AS (
       |  SELECT event_type,
       |    CAST(CASE WHEN max(nh) < $KmvK THEN max(nh)
       |      ELSE (CAST(${KmvK - 1} AS HUGEINT) * $KmvH) // max(h) END AS BIGINT) AS est_users
       |  FROM sk GROUP BY 1),
       |pairs AS (
       |  SELECT a.event_type AS t1, b.event_type AS t2
       |  FROM est a JOIN est b ON a.event_type < b.event_type),
       |pu AS (
       |  SELECT p.t1, p.t2, s.h,
       |    max(CASE WHEN s.event_type = p.t1 THEN 1 ELSE 0 END) AS in_a,
       |    max(CASE WHEN s.event_type = p.t2 THEN 1 ELSE 0 END) AS in_b
       |  FROM pairs p JOIN sk s ON s.event_type = p.t1 OR s.event_type = p.t2
       |  GROUP BY 1, 2, 3),
       |pr AS (
       |  SELECT t1, t2, h, in_a, in_b,
       |    row_number() OVER (PARTITION BY t1, t2 ORDER BY h) AS rn
       |  FROM pu),
       |ks AS (
       |  SELECT t1, t2, count(*) AS kk,
       |    sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS inter_k,
       |    max(h) AS maxh
       |  FROM pr WHERE rn <= $KmvK GROUP BY 1, 2)
       |SELECT t1, t2, e1.est_users AS est_users_1, e2.est_users AS est_users_2,
       |  CAST(CASE WHEN kk < $KmvK THEN kk
       |    ELSE (CAST(${KmvK - 1} AS HUGEINT) * $KmvH) // maxh END AS BIGINT) AS est_union,
       |  CAST(inter_k AS BIGINT) AS inter_k,
       |  CAST((10000 * inter_k) // kk AS BIGINT) AS jaccard_bp
       |FROM ks JOIN est e1 ON t1 = e1.event_type JOIN est e2 ON t2 = e2.event_type
       |ORDER BY t1, t2""".stripMargin
  }

  def c51Diurnality(spark: SparkSession, dir: String): DataFrame =
    c51DiurnalityOf(Tables.events(spark, dir))

  /** c51: diurnality strength — "is this feed actually diurnal?", the
    * one-way variance decomposition (η², Fisher's correlation ratio)
    * of hourly counts by hour-of-day: η² = SS_between/SS_total over
    * the (day × hour) cell grid, in exact milli. c24 SHOWS the
    * day-of-week profile and c37 models seasonality; this puts a
    * NUMBER on how much of the hourly variance the clock explains —
    * the gate before fitting any seasonal baseline at all (η² ≈ 0
    * means c37's seasonal model is noise-fitting; η² high means
    * un-deseasonalized thresholds will page every rush hour).
    *
    * Exactness without a spine: zero cells contribute nothing to any
    * hour-group sum or to Σcnt², so the grid never materializes —
    * only observed (day, hod) cells reduce; D comes from the day
    * span, and absent hour-of-day GROUPS enter SS_between analytically
    * as (24−present)·S² (each missing group's (24·s_h − S)² with
    * s_h = 0). Everything integral: with equal group sizes D,
    * η²_milli = 1000·Σ_h(24·s_h − S)² div (24·(24D·Σcnt² − S²)) — one
    * DECIMAL(38) division, no floats (the c48 discipline).
    *
    * Shape: ONE scan → (type, day, hod) reduce (map-side partial) →
    * (type, hod) reduce carrying day extremes → per-type 1-row fold
    * over ≤24 rows. ≤|types| rows out. */
  def c51DiurnalityOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def d38c(c: Column): Column = c.cast(DecimalType(38, 0))
    events
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        expr("(unix_micros(ts) div 3600000000) % 24").as("hod"))
      .groupBy(col("event_type"), col("day"), col("hod"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("event_type"), col("hod"))
      .agg(sum(col("cnt")).as("s_h"),
        sum(d38c(col("cnt")) * d38c(col("cnt"))).as("ssq_h"),
        min(col("day")).as("lo"), max(col("day")).as("hi"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("present_hours"),
        sum(col("s_h")).as("total"),
        sum(col("ssq_h")).as("ssq"),
        (max(col("hi")) - min(col("lo")) + 1).as("n_days"),
        sum(d38c(col("s_h")) * d38c(col("s_h"))).as("sh2"))
      // Σ_h(24·s_h − S)² over ALL 24 groups (absent groups contribute
      // S²) collapses via Σ_present s_h = S to 576·Σs_h² − 24·S²
      .withColumn("num",
        lit(1000) * (lit(576) * col("sh2")
          - lit(24) * d38c(col("total")) * d38c(col("total"))))
      .withColumn("den",
        lit(24) * (lit(24) * d38c(col("n_days")) * col("ssq")
          - d38c(col("total")) * d38c(col("total"))))
      .filter(col("den") > 0)
      .select(col("event_type"), col("n_days"), col("total"), col("present_hours"),
        expr("num div den").as("eta2_milli"))
      .withColumn("verdict",
        when(col("eta2_milli") >= 300, lit("diurnal"))
          .when(col("eta2_milli") >= 100, lit("weakly_diurnal"))
          .otherwise(lit("flat")))
      .orderBy(col("event_type"))
  }

  val c51Sql: String =
    """WITH e AS (
      |  SELECT event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
      |    (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24 AS hod
      |  FROM events),
      |cells AS (SELECT event_type, day, hod, count(*) AS cnt FROM e GROUP BY 1, 2, 3),
      |hg AS (
      |  SELECT event_type, hod, sum(cnt) AS s_h,
      |    sum(CAST(cnt AS HUGEINT) * CAST(cnt AS HUGEINT)) AS ssq_h,
      |    min(day) AS lo, max(day) AS hi
      |  FROM cells GROUP BY 1, 2),
      |t AS (
      |  SELECT event_type, count(*) AS present_hours, sum(s_h) AS total,
      |    sum(ssq_h) AS ssq, max(hi) - min(lo) + 1 AS n_days,
      |    sum(CAST(s_h AS HUGEINT) * CAST(s_h AS HUGEINT)) AS sh2
      |  FROM hg GROUP BY 1),
      |f AS (
      |  SELECT event_type, n_days, total, present_hours,
      |    1000 * (576 * sh2 - 24 * CAST(total AS HUGEINT) * total) AS num,
      |    24 * (24 * CAST(n_days AS HUGEINT) * ssq
      |      - CAST(total AS HUGEINT) * total) AS den
      |  FROM t)
      |SELECT event_type, CAST(n_days AS BIGINT) AS n_days, CAST(total AS BIGINT) AS total,
      |  CAST(present_hours AS BIGINT) AS present_hours,
      |  CAST(num // den AS BIGINT) AS eta2_milli,
      |  CASE WHEN num // den >= 300 THEN 'diurnal'
      |       WHEN num // den >= 100 THEN 'weakly_diurnal'
      |       ELSE 'flat' END AS verdict
      |FROM f WHERE den > 0 ORDER BY event_type""".stripMargin

  def c52RunsTest(spark: SparkSession, dir: String): DataFrame =
    c52RunsTestOf(Tables.events(spark, dir))

  /** c52: Wald–Wolfowitz runs test on the daily series — the
    * RANDOMNESS diagnostic completing the process-classifier family
    * (c48 asks "Poisson or bursty?" from the count DISTRIBUTION; this
    * asks "is the day-to-day ORDERING random?", which distribution
    * stats can't see — a rising trend and a random shuffle can share
    * identical daily counts): per type over the zero-filled day spine,
    * each day classifies above/≤ the exact discrete median (q21's
    * lower-median rule — deterministic under ties); R = number of
    * maximal same-side runs in day order. Under H0, E[R] = 1+2·n1·n2/n
    * and Var[R] = 2n1n2(2n1n2−n)/(n²(n−1)) (Wald & Wolfowitz 1940);
    * too FEW runs = clustering/trend (regime drift the c44 CUSUM
    * should then locate), too MANY = oscillation (load-balancer
    * flapping, day-parity batch jobs).
    *
    * Determinism: the 5% two-sided test |R−E| > 1.96·√Var runs as an
    * EXACT integer comparison — with A = R·n−(2n1n2+n) (sign of R−E,
    * ×n), the verdict inequality squares to 625·A²·(n−1) >
    * 4802·n1·n2·(2n1n2−n) (1.96² = 2401/625 exact) in DECIMAL(38) —
    * no doubles anywhere, both engines agree bit-for-bit.
    *
    * Shape: ONE scan → (type, day) reduce → c33 inline gap explode →
    * median + lag windows over the day spine (value-bounded frames,
    * the c31 rule) → per-type 1-row aggregate. ≤|types| rows out. */
  def c52RunsTestOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def d38c(c: Column): Column = c.cast(DecimalType(38, 0))
    val days = zeroFilledDaysOf(events).select(col("event_type"), col("day"), col("n_events"))
    val wVal = Window.partitionBy(col("event_type")).orderBy(col("n_events"), col("day"))
    val wAll = Window.partitionBy(col("event_type"))
    val wDay = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val classified = days
      .withColumn("rn", row_number().over(wVal))
      .withColumn("n_days", count(lit(1)).over(wAll))
      // lower median: the value at ascending position (n+1) div 2
      .withColumn("median",
        max(when(col("rn") === expr("(n_days + 1) div 2"), col("n_events"))).over(wAll))
      .withColumn("above", col("n_events") > col("median"))
      .withColumn("run_start",
        when(lag(col("above"), 1).over(wDay).isNull ||
          lag(col("above"), 1).over(wDay) =!= col("above"), 1L).otherwise(0L))
    classified
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        countIf(col("above")).as("n_above"),
        sum(col("run_start")).as("runs"))
      .withColumn("n_below", col("n_days") - col("n_above"))
      .withColumn("expected_runs_milli",
        lit(1000L) + expr("(2000 * n_above * n_below) div n_days"))
      // A = R·n − (2·n1·n2 + n); test 625·A²·(n−1) > 4802·n1·n2·(2n1n2−n)
      .withColumn("a_num",
        d38c(col("runs")) * d38c(col("n_days")) -
          (lit(2) * d38c(col("n_above")) * d38c(col("n_below")) + d38c(col("n_days"))))
      .withColumn("lhs", lit(625) * col("a_num") * col("a_num") * (d38c(col("n_days")) - 1))
      .withColumn("rhs",
        lit(4802) * d38c(col("n_above")) * d38c(col("n_below")) *
          (lit(2) * d38c(col("n_above")) * d38c(col("n_below")) - d38c(col("n_days"))))
      .withColumn("verdict",
        when(col("n_above") === 0 || col("n_below") === 0, lit("degenerate"))
          .when(col("a_num") < 0 && col("lhs") > col("rhs"), lit("clustered"))
          .when(col("a_num") > 0 && col("lhs") > col("rhs"), lit("oscillating"))
          .otherwise(lit("random")))
      .select(col("event_type"), col("n_days"), col("n_above"), col("n_below"),
        col("runs"), col("expected_runs_milli"), col("verdict"))
      .orderBy(col("event_type"))
  }

  val c52Sql: String =
    """WITH e AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day FROM events),
      |byday AS (SELECT event_type, day, count(*) AS n FROM e GROUP BY 1, 2),
      |spans AS (SELECT event_type, min(day) AS lo, max(day) AS hi FROM byday GROUP BY 1),
      |spine AS (SELECT event_type, unnest(generate_series(lo, hi)) AS day FROM spans),
      |j AS (
      |  SELECT s.event_type, s.day, coalesce(b.n, 0) AS n_events
      |  FROM spine s LEFT JOIN byday b USING (event_type, day)),
      |cl AS (
      |  SELECT event_type, day, n_events,
      |    row_number() OVER (PARTITION BY event_type ORDER BY n_events, day) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n_days
      |  FROM j),
      |med AS (
      |  SELECT *, max(CASE WHEN rn = (n_days + 1) // 2 THEN n_events END)
      |      OVER (PARTITION BY event_type) AS median
      |  FROM cl),
      |runs AS (
      |  SELECT event_type, n_days, n_events > median AS above,
      |    CASE WHEN lag(n_events > median) OVER (PARTITION BY event_type ORDER BY day)
      |      IS DISTINCT FROM (n_events > median) THEN 1 ELSE 0 END AS run_start
      |  FROM med),
      |g AS (
      |  SELECT event_type, CAST(max(n_days) AS BIGINT) AS n_days,
      |    CAST(count(CASE WHEN above THEN 1 END) AS BIGINT) AS n_above,
      |    CAST(sum(run_start) AS BIGINT) AS runs
      |  FROM runs GROUP BY 1),
      |f AS (
      |  SELECT *, n_days - n_above AS n_below,
      |    CAST(runs AS HUGEINT) * n_days
      |      - (2 * CAST(n_above AS HUGEINT) * (n_days - n_above) + n_days) AS a_num
      |  FROM g)
      |SELECT event_type, n_days, n_above, n_below, runs,
      |  CAST(1000 + (2000 * n_above * n_below) // n_days AS BIGINT) AS expected_runs_milli,
      |  CASE WHEN n_above = 0 OR n_below = 0 THEN 'degenerate'
      |       WHEN a_num < 0 AND 625 * a_num * a_num * (n_days - 1)
      |         > 4802 * CAST(n_above AS HUGEINT) * n_below
      |           * (2 * CAST(n_above AS HUGEINT) * n_below - n_days) THEN 'clustered'
      |       WHEN a_num > 0 AND 625 * a_num * a_num * (n_days - 1)
      |         > 4802 * CAST(n_above AS HUGEINT) * n_below
      |           * (2 * CAST(n_above AS HUGEINT) * n_below - n_days) THEN 'oscillating'
      |       ELSE 'random' END AS verdict
      |FROM f ORDER BY event_type""".stripMargin

  def c53MannKendall(spark: SparkSession, dir: String): DataFrame =
    c53MannKendallOf(Tables.events(spark, dir))

  /** c53: Mann–Kendall trend test on the daily series — the DIRECTED
    * companion to c52 (the runs test rejects randomness without saying
    * which way; MK is the standard nonparametric monotone-trend test —
    * Mann 1945, Kendall 1975 — the one capacity planning actually
    * wants answered: "is this feed growing?"). Per type over the
    * zero-filled day spine: S = Σ_{i<j} sgn(x_j − x_i), tie-corrected
    * variance 18·Var = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5), and the 5%
    * verdict with the standard ±1 continuity correction, evaluated as
    * the EXACT integer comparison 11250·(|S|−1)² > 2401·var18
    * (1.96² = 2401/625; ×18 clears the variance denominator) in
    * DECIMAL(38) — no doubles, bit-identical across engines.
    *
    * Scale shape: the O(d²) pair sweep runs on the (type, day) REDUCED
    * frame, never the corpus — the day spine is CALENDAR-bounded
    * (≤ ~3.7k rows/type even for a 10-year feed; ~7M pairs worst
    * case), so the cost is fixed regardless of corpus size. The
    * reduced frame is `localCheckpoint`ed (the sharedClusters idiom,
    * CorpusOps.scala:155 — on a cluster a reliable checkpoint dir
    * takes over) so its three consumers (pairs × 2 sides, tie groups)
    * share ONE materialized corpus reduce instead of re-deriving the
    * lineage (the c49 branch-duplication trap); a plain persist would
    * not survive the self-join's attribute disambiguation in the
    * scan-budget lock's cache-dedup, and the checkpoint truncates the
    * O(corpus) lineage below a tiny calendar-bounded frame anyway.
    * The pair join is an equi-join on type with a day inequality
    * filter — never a cartesian. */
  def c53MannKendallOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def d38c(c: Column): Column = c.cast(DecimalType(38, 0))
    val days = zeroFilledDaysOf(events)
      .select(col("event_type"), col("day"), col("n_events"))
      .localCheckpoint(true)
    val a = days.select(col("event_type"), col("day").as("di"), col("n_events").as("xi"))
    val b = days.select(col("event_type"), col("day").as("dj"), col("n_events").as("xj"))
    val s = a.join(b, Seq("event_type"))
      .filter(col("di") < col("dj"))
      .groupBy(col("event_type"))
      .agg(sum(signum(col("xj") - col("xi")).cast("long")).as("s_stat"))
    val ties = days.groupBy(col("event_type"), col("n_events"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_values"), sum(col("t")).as("n_days"),
        sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5)).as("tie_term"))
    ties.join(s, Seq("event_type"))
      .withColumn("var18",
        col("n_days") * (col("n_days") - 1) * (lit(2) * col("n_days") + 5) - col("tie_term"))
      .withColumn("lhs",
        lit(11250) * d38c(abs(col("s_stat")) - 1) * d38c(abs(col("s_stat")) - 1))
      .withColumn("verdict",
        when(col("var18") === 0, lit("degenerate"))
          .when(col("s_stat") > 0 && col("lhs") > lit(2401) * d38c(col("var18")),
            lit("trend_up"))
          .when(col("s_stat") < 0 && col("lhs") > lit(2401) * d38c(col("var18")),
            lit("trend_down"))
          .otherwise(lit("no_trend")))
      .select(col("event_type"), col("n_days"), col("s_stat"), col("var18"), col("verdict"))
      .orderBy(col("event_type"))
  }

  val c53Sql: String =
    """WITH e AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day FROM events),
      |byday AS (SELECT event_type, day, count(*) AS n FROM e GROUP BY 1, 2),
      |spans AS (SELECT event_type, min(day) AS lo, max(day) AS hi FROM byday GROUP BY 1),
      |spine AS (SELECT event_type, unnest(generate_series(lo, hi)) AS day FROM spans),
      |j AS (
      |  SELECT s.event_type, s.day, coalesce(b.n, 0) AS n_events
      |  FROM spine s LEFT JOIN byday b USING (event_type, day)),
      |pairs AS (
      |  SELECT a.event_type,
      |    CAST(sum(CASE WHEN b.n_events > a.n_events THEN 1
      |                  WHEN b.n_events < a.n_events THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
      |  FROM j a JOIN j b ON a.event_type = b.event_type AND a.day < b.day
      |  GROUP BY 1),
      |ties AS (
      |  SELECT event_type, CAST(sum(t) AS BIGINT) AS n_days,
      |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      |  FROM (SELECT event_type, n_events, count(*) AS t FROM j GROUP BY 1, 2)
      |  GROUP BY 1),
      |f AS (
      |  SELECT t.event_type, t.n_days, p.s_stat,
      |    t.n_days * (t.n_days - 1) * (2 * t.n_days + 5) - t.tie_term AS var18
      |  FROM ties t JOIN pairs p ON t.event_type = p.event_type)
      |SELECT event_type, n_days, s_stat, CAST(var18 AS BIGINT) AS var18,
      |  CASE WHEN var18 = 0 THEN 'degenerate'
      |       WHEN s_stat > 0 AND 11250 * CAST(abs(s_stat) - 1 AS HUGEINT) * (abs(s_stat) - 1)
      |         > 2401 * CAST(var18 AS HUGEINT) THEN 'trend_up'
      |       WHEN s_stat < 0 AND 11250 * CAST(abs(s_stat) - 1 AS HUGEINT) * (abs(s_stat) - 1)
      |         > 2401 * CAST(var18 AS HUGEINT) THEN 'trend_down'
      |       ELSE 'no_trend' END AS verdict
      |FROM f ORDER BY event_type""".stripMargin

  def c54TheilSen(spark: SparkSession, dir: String): DataFrame =
    c54TheilSenOf(Tables.events(spark, dir))

  /** c54: Theil–Sen trend slope on the daily series — the MAGNITUDE
    * companion to c53 (Mann–Kendall says "growing"; Theil–Sen says
    * "by how much per day", robustly — the median of all pairwise
    * slopes tolerates up to ~29% outlier days, where OLS (q61) is
    * wrecked by one logging burst). Per type over the zero-filled day
    * spine: slope = lower median of (x_j − x_i)/(d_j − d_i) over all
    * day pairs i<j (the q21 discrete-median idiom — row_number =
    * ceil(cnt/2), engine-identical; each slope is ONE IEEE division
    * of two exactly-represented integers, so the sorted value set is
    * bit-identical across engines and ties collapse to the same
    * value). Direction calls `up`/`down`/`flat` on the exact-zero
    * boundary of that double.
    *
    * Scale shape: identical to c53 — the O(d²) pair frame lives on
    * the calendar-bounded (type, day) REDUCED frame (≤ ~3.7k
    * days/type → ≤ ~7M pairs even for a 10-year feed), cost fixed
    * regardless of corpus size. The reduced frame is
    * `localCheckpoint`ed so the pair join's two sides share the ONE
    * materialized corpus reduce (the c53 idiom); the median window
    * partitions by type over the value-bounded pair frame —
    * c31-compliant. */
  def c54TheilSenOf(events: DataFrame): DataFrame = {
    val days = zeroFilledDaysOf(events)
      .select(col("event_type"), col("day"), col("n_events"))
      .localCheckpoint(true)
    val a = days.select(col("event_type"), col("day").as("di"), col("n_events").as("xi"))
    val b = days.select(col("event_type"), col("day").as("dj"), col("n_events").as("xj"))
    val pairs = a.join(b, Seq("event_type"))
      .filter(col("di") < col("dj"))
      .select(col("event_type"),
        ((col("xj") - col("xi")).cast("double") /
          (col("dj") - col("di")).cast("double")).as("slope"))
    val w = Window.partitionBy(col("event_type"))
    pairs
      .withColumn("rn", row_number().over(w.orderBy(col("slope"))))
      .withColumn("n_pairs", count(lit(1)).over(w))
      .filter(col("rn") === ceil(col("n_pairs") / 2.0))
      .select(col("event_type"), col("n_pairs"), col("slope").as("slope_per_day"),
        when(col("slope") > 0, lit("up")).when(col("slope") < 0, lit("down"))
          .otherwise(lit("flat")).as("direction"))
      .orderBy(col("event_type"))
  }

  val c54Sql: String =
    """WITH e AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day FROM events),
      |byday AS (SELECT event_type, day, count(*) AS n FROM e GROUP BY 1, 2),
      |spans AS (SELECT event_type, min(day) AS lo, max(day) AS hi FROM byday GROUP BY 1),
      |spine AS (SELECT event_type, unnest(generate_series(lo, hi)) AS day FROM spans),
      |j AS (
      |  SELECT s.event_type, s.day, coalesce(b.n, 0) AS n_events
      |  FROM spine s LEFT JOIN byday b USING (event_type, day)),
      |pairs AS (
      |  SELECT a.event_type,
      |    CAST(b.n_events - a.n_events AS DOUBLE) / CAST(b.day - a.day AS DOUBLE) AS slope
      |  FROM j a JOIN j b ON a.event_type = b.event_type AND a.day < b.day),
      |r AS (
      |  SELECT event_type, slope,
      |    row_number() OVER (PARTITION BY event_type ORDER BY slope) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n_pairs
      |  FROM pairs)
      |SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs, slope AS slope_per_day,
      |  CASE WHEN slope > 0 THEN 'up' WHEN slope < 0 THEN 'down'
      |       ELSE 'flat' END AS direction
      |FROM r WHERE rn = CAST(ceil(n_pairs / 2.0) AS BIGINT)
      |ORDER BY event_type""".stripMargin

  def c55Drawdown(spark: SparkSession, dir: String): DataFrame =
    c55DrawdownOf(Tables.events(spark, dir))

  /** c55: maximum drawdown of the daily series — the INCIDENT-DEPTH
    * metric the trend family (c53/c54) doesn't report: how far below
    * its own running peak did this feed fall, and when? The finance
    * formulation (peak-to-trough) applied to volume: per type over the
    * zero-filled day spine, running peak, drawdown = peak − count, the
    * single worst day (earliest at ties — total order), and the depth
    * as exact bp of the peak at that moment. A 10000 bp drawdown is an
    * outage (c46's downtime report says WHEN; this ranks how bad),
    * persistent mid-size drawdowns are demand loss the mean-based c26
    * level-shift test averages away.
    *
    * Shape: ONE scan → calendar-bounded (type, day) reduce → two
    * cumulative windows (running peak, then argmax pick) over the
    * SAME reduced lineage — no joins, no checkpoint needed. Running
    * peak starts at the type's first spine day (≥1 event by
    * construction), so the bp division is always defined. */
  def c55DrawdownOf(events: DataFrame): DataFrame = {
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    zeroFilledDaysOf(events)
      .select(col("event_type"), col("day"), col("n_events"))
      .withColumn("peak", max(col("n_events")).over(wCum))
      .withColumn("dd", col("peak") - col("n_events"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("dd").desc, col("day"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("day").as("trough_day"),
        col("peak").as("peak_n"), col("n_events").as("trough_n"),
        col("dd").as("drawdown"),
        expr("(dd * 10000) div peak").as("drawdown_bp"))
      .orderBy(col("event_type"))
  }

  val c55Sql: String =
    """WITH e AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day FROM events),
      |byday AS (SELECT event_type, day, count(*) AS n FROM e GROUP BY 1, 2),
      |spans AS (SELECT event_type, min(day) AS lo, max(day) AS hi FROM byday GROUP BY 1),
      |spine AS (SELECT event_type, unnest(generate_series(lo, hi)) AS day FROM spans),
      |j AS (
      |  SELECT s.event_type, s.day, coalesce(b.n, 0) AS n_events
      |  FROM spine s LEFT JOIN byday b USING (event_type, day)),
      |scored AS (
      |  SELECT event_type, day, n_events,
      |    max(n_events) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      |  FROM j),
      |r AS (
      |  SELECT event_type, day, n_events, peak, peak - n_events AS dd,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY peak - n_events DESC, day) AS rn
      |  FROM scored)
      |SELECT event_type, day AS trough_day, peak AS peak_n,
      |  n_events AS trough_n, dd AS drawdown,
      |  (dd * 10000) // peak AS drawdown_bp
      |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin

  def c56WeeklyStickiness(spark: SparkSession, dir: String): DataFrame =
    c56WeeklyStickinessOf(Tables.events(spark, dir))

  /** c56: weekly stickiness (DAU/WAU) via the exact-bitmap rollup —
    * the two-level distinct problem `count(distinct)` plans BADLY: a
    * week's WAU is NOT the sum of its DAUs (returning users double-
    * count), and computing day AND week distincts relationally either
    * scans the corpus twice or pays the grouping-sets Expand (row
    * duplication per grouping). The `bitset_agg` family
    * (functions/BitmapAgg.scala — the ClickHouse/Doris exact tier of
    * the sketch ladder) does it in ONE pass: day-grain bitmaps fold
    * map-side, `bitset_count` reads each day's exact DAU off the
    * reduced frame, and `bitset_union_count` RE-AGGREGATES the day
    * bitmaps to the exact WAU — no rescan, no Expand, no estimate.
    * Stickiness = avg-DAU/WAU in truncated bp (the DAU/MAU engagement
    * metric at week grain).
    *
    * Memory honesty: a day bitmap is O(active ids)/64 words — the
    * exact tier is for day-bounded active sets; the unbounded-domain
    * tier is kmv_sketch (c50). Buffers merge map-side like every
    * aggregate in the family.
    *
    * Shape: ONE scan → (week, day) bitmap reduce → scalar counts on
    * the calendar-bounded frame → week re-aggregate. Single lineage,
    * two exchanges (day grain, week grain). */
  def c56WeeklyStickinessOf(events: DataFrame): DataFrame = {
    events
      .select(expr("unix_micros(ts) div 86400000000").as("day"), col("user_id"))
      .withColumn("week", expr("day div 7"))
      .groupBy(col("week"), col("day"))
      .agg(expr("bitset_agg(user_id)").as("bm"), count(lit(1)).as("n_events"))
      .withColumn("dau", expr("bitset_count(bm)"))
      .groupBy(col("week"))
      .agg(expr("bitset_union_count(bm)").as("wau"),
        count(lit(1)).as("n_days"),
        sum(col("dau")).as("dau_sum"),
        sum(col("n_events")).as("n_events"))
      .select(col("week"), col("n_days"), col("n_events"), col("wau"),
        col("dau_sum"),
        expr("(dau_sum * 10000) div (n_days * wau)").as("stickiness_bp"))
      .orderBy(col("week"))
  }

  val c56Sql: String =
    """WITH e AS (
      |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day, user_id FROM events),
      |d AS (
      |  SELECT day // 7 AS week, day, count(DISTINCT user_id) AS dau,
      |    CAST(count(*) AS BIGINT) AS n_events
      |  FROM e GROUP BY 1, 2),
      |w AS (
      |  SELECT day // 7 AS week, count(DISTINCT user_id) AS wau
      |  FROM e GROUP BY 1),
      |g AS (
      |  SELECT week, CAST(count(*) AS BIGINT) AS n_days,
      |    CAST(sum(n_events) AS BIGINT) AS n_events,
      |    CAST(sum(dau) AS BIGINT) AS dau_sum
      |  FROM d GROUP BY 1)
      |SELECT g.week, g.n_days, g.n_events, CAST(w.wau AS BIGINT) AS wau,
      |  g.dau_sum, (g.dau_sum * 10000) // (g.n_days * w.wau) AS stickiness_bp
      |FROM g JOIN w ON g.week = w.week
      |ORDER BY g.week""".stripMargin

  def c57CohortHalfLife(spark: SparkSession, dir: String): DataFrame =
    c57CohortHalfLifeOf(Tables.events(spark, dir))

  /** c57: cohort activity half-life — the DECAY-SPEED scalar the
    * cohort family doesn't report: c7's retention matrix says what
    * share of a cohort returns each week, c23 says how long single
    * users last; a growth review wants ONE number per cohort — how
    * many days until half of everything this cohort will EVER do is
    * behind it. Front-loaded cohorts (half-life ≈ 0) churned on
    * arrival; long half-lives mark durable acquisition channels.
    * half_life = min age with 2·cum ≥ total (median-of-mass in event
    * time), plus the exact bp of mass inside it.
    *
    * Shape: ONE scan → (user, day) map-side reduce → per-USER min-day
    * window (each partition a user's day set — bounded, skew-free) →
    * (cohort_week, age) reduce → cumulative/total windows on the
    * calendar-bounded cohort×age frame (c31-compliant) → first
    * qualifying row per cohort. All-integer: half_mass_bp is exact
    * floor division; cohort size reads off the age-0 row for free
    * ((user, day) is distinct, so exactly one row per user at its own
    * age 0 — no second distinct pass). */
  def c57CohortHalfLifeOf(events: DataFrame): DataFrame = {
    val ud = events
      .select(expr("unix_micros(ts) div 86400000000").as("day"), col("user_id"))
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("first_day",
        min(col("day")).over(Window.partitionBy(col("user_id"))))
    val byAge = ud
      .groupBy(expr("first_day div 7").as("cohort_week"),
        (col("day") - col("first_day")).as("age"))
      .agg(sum(col("n")).as("n_events"), count(lit(1)).as("n_user_days"))
    val wC = Window.partitionBy(col("cohort_week"))
    val scored = byAge
      .withColumn("cum", sum(col("n_events")).over(
        wC.orderBy(col("age")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum(col("n_events")).over(wC))
      .withColumn("max_age", max(col("age")).over(wC))
      .withColumn("n_users",
        max(when(col("age") === 0, col("n_user_days"))).over(wC))
    scored
      .filter(col("cum") * 2 >= col("tot"))
      .withColumn("rn", row_number().over(wC.orderBy(col("age"))))
      .filter(col("rn") === 1)
      .select(col("cohort_week"), col("n_users").cast("bigint").as("n_users"),
        col("tot").cast("bigint").as("n_events"),
        (col("max_age") + 1).cast("bigint").as("span_days"),
        col("age").cast("bigint").as("half_life_days"),
        expr("(cum * 10000) div tot").as("half_mass_bp"))
      .orderBy(col("cohort_week"))
  }

  val c57Sql: String =
    """WITH e AS (
      |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day, user_id FROM events),
      |ud AS (SELECT user_id, day, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1, 2),
      |f AS (
      |  SELECT user_id, day, n,
      |    min(day) OVER (PARTITION BY user_id) AS first_day
      |  FROM ud),
      |ba AS (
      |  SELECT first_day // 7 AS cohort_week, day - first_day AS age,
      |    sum(n) AS n_events, CAST(count(*) AS BIGINT) AS n_user_days
      |  FROM f GROUP BY 1, 2),
      |sc AS (
      |  SELECT cohort_week, age,
      |    sum(n_events) OVER (PARTITION BY cohort_week ORDER BY age
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(n_events) OVER (PARTITION BY cohort_week) AS tot,
      |    max(age) OVER (PARTITION BY cohort_week) AS max_age,
      |    max(CASE WHEN age = 0 THEN n_user_days END)
      |      OVER (PARTITION BY cohort_week) AS n_users
      |  FROM ba),
      |r AS (
      |  SELECT cohort_week, age, cum, tot, max_age, n_users,
      |    row_number() OVER (PARTITION BY cohort_week ORDER BY age) AS rn
      |  FROM sc WHERE 2 * cum >= tot)
      |SELECT cohort_week, CAST(n_users AS BIGINT) AS n_users,
      |  CAST(tot AS BIGINT) AS n_events,
      |  CAST(max_age + 1 AS BIGINT) AS span_days,
      |  CAST(age AS BIGINT) AS half_life_days,
      |  CAST((cum * 10000) // tot AS BIGINT) AS half_mass_bp
      |FROM r WHERE rn = 1 ORDER BY cohort_week""".stripMargin

  def c58Comovement(spark: SparkSession, dir: String): DataFrame =
    c58ComovementOf(Tables.events(spark, dir))

  /** c58: daily-volume comovement matrix — which feeds MOVE TOGETHER?
    * Pairwise Pearson r of daily counts over the shared day spine:
    * the incident-correlation question c49's burst-coincidence asks
    * only at the extremes ("did they spike together"), answered over
    * the whole series — a strong-negative pair is a substitution
    * signal (traffic migrating), strong-positive a shared upstream.
    *
    * Determinism: the five moments are exact DECIMAL(38,0) integers
    * over the zero-filled spine; r is a fixed-shape IEEE expression
    * (exact-int numerator / sqrt of a product of two exact-int-cast
    * variance terms) — division, multiply and sqrt are all correctly
    * rounded, so both engines produce the same bits and the 0.7/0.3
    * class gates cannot straddle. Zero-variance series report NULL r
    * and class 'flat'.
    *
    * Shape: ONE scan → calendar-bounded (type, day) dense reduce,
    * `localCheckpoint`ed so the pair join's two sides share the one
    * materialized corpus reduce (the c53/c54 idiom) → day equi-join
    * (≤ k² rows per day, k = |types|) → per-pair 1-row moments. */
  def c58ComovementOf(events: DataFrame): DataFrame = {
    def d38(c: Column): Column = c.cast(DecimalType(38, 0))
    val days = zeroFilledDaysOf(events)
      .select(col("event_type"), col("day"), col("n_events"))
      .localCheckpoint(true)
    val a = days.select(col("event_type").as("type_a"), col("day"),
      col("n_events").as("x"))
    val b = days.select(col("event_type").as("type_b"), col("day"),
      col("n_events").as("y"))
    val m = a.join(b, Seq("day"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n"),
        sum(d38(col("x"))).as("sx"), sum(d38(col("y"))).as("sy"),
        sum(d38(col("x")) * col("y")).as("sxy"),
        sum(d38(col("x")) * col("x")).as("sxx"),
        sum(d38(col("y")) * col("y")).as("syy"))
      .withColumn("vx", d38(col("n")) * col("sxx") - col("sx") * col("sx"))
      .withColumn("vy", d38(col("n")) * col("syy") - col("sy") * col("sy"))
      .withColumn("r",
        when(col("vx") > 0 && col("vy") > 0,
          (d38(col("n")) * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt(col("vx").cast("double") * col("vy").cast("double"))))
    m.select(col("type_a"), col("type_b"), col("n").cast("bigint").as("n_days"),
        col("r"),
        when(col("r").isNull, lit("flat"))
          .when(col("r") >= 0.7, lit("strong_pos"))
          .when(col("r") <= -0.7, lit("strong_neg"))
          .when(col("r") >= 0.3, lit("moderate_pos"))
          .when(col("r") <= -0.3, lit("moderate_neg"))
          .otherwise(lit("weak")).as("relation"))
      .orderBy(col("type_a"), col("type_b"))
  }

  val c58Sql: String =
    """WITH e AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day FROM events),
      |byday AS (SELECT event_type, day, count(*) AS n FROM e GROUP BY 1, 2),
      |spans AS (SELECT event_type, min(day) AS lo, max(day) AS hi FROM byday GROUP BY 1),
      |spine AS (SELECT event_type, unnest(generate_series(lo, hi)) AS day FROM spans),
      |j AS (
      |  SELECT s.event_type, s.day, coalesce(b.n, 0) AS n_events
      |  FROM spine s LEFT JOIN byday b USING (event_type, day)),
      |m AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(a.n_events AS HUGEINT)) AS sx,
      |    sum(CAST(b.n_events AS HUGEINT)) AS sy,
      |    sum(CAST(a.n_events AS HUGEINT) * b.n_events) AS sxy,
      |    sum(CAST(a.n_events AS HUGEINT) * a.n_events) AS sxx,
      |    sum(CAST(b.n_events AS HUGEINT) * b.n_events) AS syy
      |  FROM j a JOIN j b ON a.day = b.day AND a.event_type < b.event_type
      |  GROUP BY 1, 2),
      |v AS (
      |  SELECT type_a, type_b, n, sx, sy, sxy,
      |    CAST(n AS HUGEINT) * sxx - sx * sx AS vx,
      |    CAST(n AS HUGEINT) * syy - sy * sy AS vy
      |  FROM m),
      |r AS (
      |  SELECT type_a, type_b, n,
      |    CASE WHEN vx > 0 AND vy > 0 THEN
      |      CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE) /
      |        sqrt(CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE)) END AS r
      |  FROM v)
      |SELECT type_a, type_b, n AS n_days, r,
      |  CASE WHEN r IS NULL THEN 'flat'
      |       WHEN r >= 0.7 THEN 'strong_pos'
      |       WHEN r <= -0.7 THEN 'strong_neg'
      |       WHEN r >= 0.3 THEN 'moderate_pos'
      |       WHEN r <= -0.3 THEN 'moderate_neg'
      |       ELSE 'weak' END AS relation
      |FROM r ORDER BY type_a, type_b""".stripMargin

  def c59UserTurnover(spark: SparkSession, dir: String): DataFrame =
    c59UserTurnoverOf(Tables.events(spark, dir))

  /** c59: day-over-day active-set turnover — of yesterday's users,
    * how many came back TODAY? c31 counts actives, c32 splits
    * new/returning vs all history; this is the velocity form product
    * teams page on (retained/churned/new per day against the
    * IMMEDIATELY previous day). The set intersection rides the exact-
    * bitmap family end-to-end: day bitmaps fold map-side
    * (`bitset_agg`), and `bitset_overlap` — the pairwise scalar tier
    * added for exactly this shape — reads \|A∩B\| straight off two
    * adjacent serialized bitmaps, no second-level re-group, no
    * count(distinct) Expand, no corpus self-join.
    *
    * Calendar honesty: "previous" means day−1 — the first day and
    * days after a dark gap report NULL prev/retention rather than
    * comparing across the gap (a gap IS churn, but of a different
    * kind — c46's downtime report owns it).
    *
    * Shape: ONE scan → (day) bitmap reduce (state O(DAU)/64 words per
    * day) → one unpartitioned lag window over the calendar-bounded
    * day frame (c31 rule) → per-day set algebra, all exact. */
  def c59UserTurnoverOf(events: DataFrame): DataFrame = {
    val wD = Window.orderBy(col("day"))
    events
      .select(expr("unix_micros(ts) div 86400000000").as("day"), col("user_id"))
      .groupBy(col("day"))
      .agg(expr("bitset_agg(user_id)").as("bm"))
      .withColumn("dau", expr("bitset_count(bm)"))
      .withColumn("prev_day", lag(col("day"), 1).over(wD))
      .withColumn("prev_bm", lag(col("bm"), 1).over(wD))
      .withColumn("prev_dau", when(col("prev_day") === col("day") - 1,
        expr("bitset_count(prev_bm)")))
      .withColumn("common", when(col("prev_day") === col("day") - 1,
        expr("bitset_overlap(bm, prev_bm)")))
      .select(col("day"), col("dau"), col("prev_dau"), col("common"),
        expr("(common * 10000) div prev_dau").as("retained_bp"),
        (col("dau") - col("common")).as("new_users"),
        (col("prev_dau") - col("common")).as("churned_users"))
      .orderBy(col("day"))
  }

  val c59Sql: String =
    """WITH d AS (
      |  SELECT DISTINCT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day, user_id
      |  FROM events),
      |c AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM d GROUP BY 1),
      |o AS (
      |  SELECT a.day, CAST(count(*) AS BIGINT) AS common
      |  FROM d a JOIN d b ON a.user_id = b.user_id AND b.day = a.day - 1
      |  GROUP BY 1)
      |SELECT c.day, c.dau, p.dau AS prev_dau,
      |  CASE WHEN p.dau IS NOT NULL THEN coalesce(o.common, 0) END AS common,
      |  CASE WHEN p.dau IS NOT NULL
      |    THEN (coalesce(o.common, 0) * 10000) // p.dau END AS retained_bp,
      |  c.dau - CASE WHEN p.dau IS NOT NULL THEN coalesce(o.common, 0) END AS new_users,
      |  p.dau - CASE WHEN p.dau IS NOT NULL THEN coalesce(o.common, 0) END
      |    AS churned_users
      |FROM c
      |LEFT JOIN c p ON p.day = c.day - 1
      |LEFT JOIN o ON o.day = c.day
      |ORDER BY c.day""".stripMargin

  /** Fixed 8-full-week analysis window for c60: equal-size day-of-week
    * groups (8 observations each) keep the variance ratio EXACT
    * integer — see the derivation in the scaladoc. */
  val SeasonWeeks = 8

  def c60SeasonalityStrength(spark: SparkSession, dir: String): DataFrame =
    c60SeasonalityStrengthOf(Tables.events(spark, dir))

  /** c60: seasonality STRENGTH per event type — one number per type
    * for "how weekly is this signal" (c24 shows the dow profile's
    * SHAPE; c37/c45 assume weekliness — this measures it): the share
    * of daily-count variance explained by day-of-week, R² of the dow
    * means, in bp. Computed over the first 8 FULL weeks of the
    * dataset on a DENSE day grid (zero-filled — silent days are
    * signal, not missing data), which makes every dow group exactly
    * 8 days and collapses the variance ratio to exact integers:
    * BSS/TSS = (7·Σ S_g² − S²) / (56·Σ x² − S²) with S_g the dow
    * sums, S the window total, x the daily counts — both sides are
    * plain long arithmetic, no mean ever materialized. Degenerate
    * window (constant daily count, TSS = 0) reports NULL.
    *
    * Shape: day-grain reduce → 56-row-per-type dense grid (sequence
    * explode from the window's min day, value grain) → two group
    * reduces joined at type grain. The one unpartitioned window
    * (global min day) runs over the REDUCED type×day frame. */
  def c60SeasonalityStrengthOf(events: DataFrame): DataFrame = {
    // no dense grid needed: a silent day contributes 0 to every sum
    // (Σx, Σx², the dow sums and their squares), and the formula's
    // denominators are the CONSTANTS 56 and 8 the fixed window
    // guarantees — so the whole operator is one lineage, one scan
    val base = events
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("d0", min(col("day")).over(Window.partitionBy()))
      .filter(col("day") < col("d0") + SeasonWeeks * 7)
    base
      .groupBy(col("event_type"), pmod(col("day"), lit(7)).as("dow"))
      .agg(sum(col("cnt")).as("sg"), sum(col("cnt") * col("cnt")).as("ssq"))
      .groupBy(col("event_type"))
      .agg(sum(col("sg")).as("s"), sum(col("ssq")).as("ss"),
        sum(col("sg") * col("sg")).as("sg2"))
      .select(col("event_type"), col("s").as("window_events"),
        when(lit(56L) * col("ss") - col("s") * col("s") > 0,
          expr("(10000 * (7 * sg2 - s * s)) div (56 * ss - s * s)"))
          .as("strength_bp"))
      .orderBy(col("event_type"))
  }

  val c60Sql: String =
    """WITH base AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
      |    count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |windowed AS (
      |  SELECT *, min(day) OVER () AS d0 FROM base),
      |dows AS (
      |  SELECT event_type, day % 7 AS dow, sum(cnt) AS sg, sum(cnt * cnt) AS ssq
      |  FROM windowed WHERE day < d0 + 56 GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, sum(sg) AS s, sum(ssq) AS ss, sum(sg * sg) AS sg2
      |  FROM dows GROUP BY 1)
      |SELECT event_type, CAST(s AS BIGINT) AS window_events,
      |  CASE WHEN 56 * ss - s * s > 0
      |    THEN CAST((10000 * (7 * sg2 - s * s)) // (56 * ss - s * s) AS BIGINT)
      |  END AS strength_bp
      |FROM m ORDER BY event_type""".stripMargin

  def c61PeakDetect(spark: SparkSession, dir: String): DataFrame =
    c61PeakDetectOf(Tables.events(spark, dir))

  /** c61: daily PEAK detection per event type — the "which days
    * spiked" report an on-call dashboard renders as markers (c25 finds
    * hour-grain bursts against a trailing rate; c12 z-tests days
    * against the global mean; this finds LOCAL maxima against their
    * own trailing week, the classic prominence rule): a day is a peak
    * when it beats its previous day strictly, its next day at least
    * (plateau-left-edge convention: equal neighbors resolve to the
    * first day), has a FULL trailing 7-day window, and clears 1.2× the
    * trailing-week mean — all in integers (70·cnt ≥ 12·sum7 ⟺
    * cnt ≥ 1.2·mean7). Runs on the DENSE zero-filled day grid over
    * each type's own [first event, last event] span, so calendar gaps
    * can neither fake adjacency nor hide a spike's neighbors (and the
    * edges — no prev / no next / short window — are excluded, exactly
    * what the streaming twin can know online).
    *
    * Shape: day-grain reduce → single-lineage densification (each row
    * EXPLODES the gap back to its predecessor — the c33 gap-fill
    * idiom: no grid self-join, ONE scan) → ONE per-type ordered window
    * serving lag, lead and the trailing sum → filter. */
  def c61PeakDetectOf(events: DataFrame): DataFrame = {
    val wBase = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val dense = events
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("prev_day", lag(col("day"), 1).over(wBase))
      .select(col("event_type"), explode(transform(
        sequence(coalesce(col("prev_day") + 1, col("day")), col("day")),
        d => struct(d.as("day"),
          when(d === col("day"), col("cnt")).otherwise(lit(0L)).as("cnt"))))
        .as("r"))
      .select(col("event_type"), col("r.day").as("day"), col("r.cnt").as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    dense
      .withColumn("prev_cnt", lag(col("cnt"), 1).over(w))
      .withColumn("next_cnt", lead(col("cnt"), 1).over(w))
      .withColumn("sum7", sum(col("cnt")).over(w.rowsBetween(-6, 0)))
      .withColumn("nwin", count(lit(1)).over(w.rowsBetween(-6, 0)))
      .filter(col("prev_cnt").isNotNull && col("next_cnt").isNotNull &&
        col("nwin") === 7 &&
        col("cnt") > col("prev_cnt") && col("cnt") >= col("next_cnt") &&
        col("cnt") * 70 >= col("sum7") * 12)
      .select(col("event_type"), col("day"), col("cnt").as("n_events"),
        col("prev_cnt"), col("next_cnt"), col("sum7").as("trailing7"))
      .orderBy(col("event_type"), col("day"))
  }

  val c61Sql: String =
    """WITH base AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
      |    count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |spans AS (
      |  SELECT event_type, min(day) AS lo, max(day) AS hi FROM base GROUP BY 1),
      |spine AS (
      |  SELECT event_type, unnest(generate_series(lo, hi)) AS day FROM spans),
      |dense AS (
      |  SELECT s.event_type, s.day, coalesce(b.cnt, 0) AS cnt
      |  FROM spine s LEFT JOIN base b ON s.event_type = b.event_type AND s.day = b.day),
      |wdw AS (
      |  SELECT event_type, day, cnt,
      |    lag(cnt) OVER (PARTITION BY event_type ORDER BY day) AS prev_cnt,
      |    lead(cnt) OVER (PARTITION BY event_type ORDER BY day) AS next_cnt,
      |    sum(cnt) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS sum7,
      |    count(*) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS nwin
      |  FROM dense)
      |SELECT event_type, day, cnt AS n_events, prev_cnt, next_cnt,
      |  CAST(sum7 AS BIGINT) AS trailing7
      |FROM wdw
      |WHERE prev_cnt IS NOT NULL AND next_cnt IS NOT NULL AND nwin = 7
      |  AND cnt > prev_cnt AND cnt >= next_cnt AND cnt * 70 >= sum7 * 12
      |ORDER BY event_type, day""".stripMargin

  /** Correlogram depth: the full weekly rhythm (lag 7 closes the
    * cycle; deeper lags add nothing a second week would not). */
  val MaxLag = 7

  /** c62: daily-count CORRELOGRAM per event type — the full ACF at
    * lags 1..7 where c35 reports only lag 1 (persistence) and c60 one
    * R² number (weekliness): the shape a forecaster actually reads
    * before picking c45's dow baseline over naive-yesterday — a
    * 7-peaked ACF says "weekly", a monotone-decaying one says
    * "trending", a flat one says "noise". Same exact-integer moment
    * core as c35 (DECIMAL sums of the zero-filled daily series; one
    * double division at the end), same dense-span contract.
    *
    * Shape: the day-grain zero-filled frame is localCheckpoint'ed
    * (value grain — days × types) and self-joined at (type, day+lag)
    * for the 7-lag fan-out — an equi-join of a tiny frame with itself,
    * no window, no corpus re-scan; then a (type, lag) reduce. */
  def c62Correlogram(spark: SparkSession, dir: String): DataFrame =
    c62CorrelogramOf(Tables.events(spark, dir))

  def c62CorrelogramOf(events: DataFrame): DataFrame = {
    val filled = zeroFilledDaysOf(events)
      .select(col("event_type"), col("day"),
        col("n_events").cast(DecimalType(38, 0)).as("x"))
      .localCheckpoint(true)
    val b = filled.select(col("event_type").as("b_type"), col("day").as("b_day"),
      col("x").as("y"))
    filled
      .withColumn("lag", explode(sequence(lit(1), lit(MaxLag))))
      .join(b, col("event_type") === col("b_type") &&
        col("b_day") === col("day") + col("lag"))
      .groupBy(col("event_type"), col("lag").cast("long").as("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("event_type"), col("lag"), col("n_pairs"),
        ((col("n_pairs") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n_pairs") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n_pairs") * col("syy") - col("sy") * col("sy")).cast("double"))))
          .as("autocorr"))
      .orderBy(col("event_type"), col("lag"))
  }

  val c62Sql: String =
    s"""WITH e AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day FROM events),
      |byday AS (SELECT event_type, day, count(*) AS n FROM e GROUP BY 1, 2),
      |spans AS (SELECT event_type, min(day) AS lo, max(day) AS hi FROM byday GROUP BY 1),
      |spine AS (SELECT event_type, unnest(generate_series(lo, hi)) AS day FROM spans),
      |filled AS (
      |  SELECT s.event_type, s.day, CAST(coalesce(b.n, 0) AS HUGEINT) AS x
      |  FROM spine s LEFT JOIN byday b USING (event_type, day)),
      |lagged AS (
      |  SELECT f.event_type, l.lag, f.x, g.x AS y
      |  FROM filled f
      |  CROSS JOIN (SELECT unnest(range(1, ${MaxLag + 1})) AS lag) l
      |  JOIN filled g ON g.event_type = f.event_type AND g.day = f.day + l.lag),
      |m AS (
      |  SELECT event_type, lag, count(*) AS n_pairs,
      |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
      |    sum(x * x) AS sxx, sum(y * y) AS syy
      |  FROM lagged GROUP BY 1, 2)
      |SELECT event_type, CAST(lag AS BIGINT) AS lag, n_pairs,
      |  CAST(n_pairs * sxy - sx * sy AS DOUBLE)
      |    / (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
      |       * sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE))) AS autocorr
      |FROM m ORDER BY event_type, lag""".stripMargin

  def c63NextEventPredictability(spark: SparkSession, dir: String): DataFrame =
    c63NextEventPredictabilityOf(Tables.events(spark, dir))

  /** c63: next-event PREDICTABILITY per state — the scalar that says
    * whether c13's transition matrix is worth acting on: for each
    * event type (as the CURRENT state of a user's ordered stream), the
    * Gini impurity of its next-event distribution, 10⁴·(1 − Σc²/n²)
    * bp — 0 = perfectly predictable (always the same successor,
    * prefetch/precompute wins), → (1−1/k)·10⁴ = uniform coin (the
    * matrix is noise). Impurity instead of entropy keeps the whole
    * computation EXACT integer (cross-multiplied squares — no logs,
    * no doubles); the dominant successor and its share ride along as
    * the actionable rule. Successor pairs use the same per-user
    * (ts, event_id) total order as c13, so the two operators cannot
    * disagree about what "next" means.
    *
    * Shape: ONE scan → per-user lead window (user-partitioned — the
    * c13 exchange) → (state, next) reduce → state reduce + one
    * value-grain argmax window. */
  def c63NextEventPredictabilityOf(events: DataFrame): DataFrame = {
    val wUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = events
      .withColumn("next_type", lead(col("event_type"), 1).over(wUser))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("c"))
    val wState = Window.partitionBy(col("event_type"))
    pairs
      .withColumn("n", sum(col("c")).over(wState))
      .withColumn("sum_c2", sum(col("c") * col("c")).over(wState))
      .withColumn("rk", row_number().over(
        wState.orderBy(col("c").desc, col("next_type"))))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("n").as("n_transitions"),
        expr("(10000 * (n * n - sum_c2)) div (n * n)").as("impurity_bp"),
        col("next_type").as("top_next"),
        expr("(c * 10000) div n").as("top_next_bp"))
      .orderBy(col("event_type"))
  }

  val c63Sql: String =
    """WITH ordered AS (
      |  SELECT event_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_type
      |  FROM events),
      |pairs AS (
      |  SELECT event_type, next_type, count(*) AS c
      |  FROM ordered WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |st AS (
      |  SELECT *, sum(c) OVER (PARTITION BY event_type) AS n,
      |    sum(c * c) OVER (PARTITION BY event_type) AS sum_c2,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY c DESC, next_type) AS rk
      |  FROM pairs)
      |SELECT event_type, CAST(n AS BIGINT) AS n_transitions,
      |  CAST((10000 * (n * n - sum_c2)) // (n * n) AS BIGINT) AS impurity_bp,
      |  next_type AS top_next,
      |  CAST((c * 10000) // n AS BIGINT) AS top_next_bp
      |FROM st WHERE rk = 1 ORDER BY event_type""".stripMargin

  def c64HurstRs(spark: SparkSession, dir: String): DataFrame =
    c64HurstRsOf(Tables.events(spark, dir))

  /** c64: rescaled-range (R/S) statistic and Hurst estimate per event
    * type over the zero-filled daily series — LONG-RANGE dependence,
    * the axis none of the existing diagnostics see: c35/c62 measure
    * short-lag autocorrelation, c48 same-scale dispersion; R/S
    * (Hurst 1951, Mandelbrot & Wallis 1969) asks whether deviations
    * from the mean ACCUMULATE (H→1: persistent regimes — capacity
    * planning cannot assume daily independence; H≈0.5: random walk;
    * H→0: mean-reverting). The cumulative-deviation range stays EXACT
    * by n-multiplication: Zₜ = prefixₜ − t·S/n is rational, so
    * Wₜ = n·prefixₜ − t·S is integer in DECIMAL(38,0) and
    * max(W)−min(W) = n·R exactly; R/S = (maxW−minW)/√(n·Σc²−S²)
    * because the n's cancel against the population σ — ONE double
    * division + sqrt at the end, H = ln(rs)/ln(n) scalar per type.
    * Constant series (zero variance) have no row, the c51 contract.
    *
    * Shape: ONE scan → (type, day) reduce → c33 gap explode (gap days
    * are real zeros — skipping them shortens the span and inflates
    * persistence) → prefix/count/sum windows sharing ONE (type)
    * exchange at day grain → per-type 1-row reduce. */
  def c64HurstRsOf(events: DataFrame): DataFrame = {
    def d38c(c: Column): Column = c.cast(DecimalType(38, 0))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wPre = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("event_type"))
    val varN = col("nd") * col("ssq") - col("s") * col("s")
    zeroFilledDaysOf(events)
      .select(col("event_type"), col("day"), col("n_events"))
      .withColumn("t", row_number().over(wOrd))
      .withColumn("prefix", sum(d38c(col("n_events"))).over(wPre))
      .withColumn("nd", count(lit(1)).over(wAll).cast(DecimalType(38, 0)))
      .withColumn("s", sum(d38c(col("n_events"))).over(wAll))
      .withColumn("ssq", sum(d38c(col("n_events")) * d38c(col("n_events"))).over(wAll))
      .withColumn("w", col("nd") * col("prefix") - d38c(col("t")) * col("s"))
      .groupBy(col("event_type"))
      .agg(max(col("nd")).as("nd"), max(col("s")).as("s"),
        max(col("ssq")).as("ssq"), (max(col("w")) - min(col("w"))).as("rng"))
      .filter(varN > 0 && col("rng") > 0 && col("nd") > 1)
      .select(col("event_type"), col("nd").cast("bigint").as("n_days"),
        (col("rng").cast("double") / sqrt(varN.cast("double"))).as("rs"),
        (log(col("rng").cast("double") / sqrt(varN.cast("double"))) /
          log(col("nd").cast("double"))).as("h_est"))
      .orderBy(col("event_type"))
  }

  val c64Sql: String =
    """WITH e AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day FROM events),
      |byday AS (SELECT event_type, day, count(*) AS n FROM e GROUP BY 1, 2),
      |spans AS (SELECT event_type, min(day) AS lo, max(day) AS hi FROM byday GROUP BY 1),
      |spine AS (SELECT event_type, unnest(generate_series(lo, hi)) AS day FROM spans),
      |j AS (
      |  SELECT s.event_type, s.day, CAST(coalesce(b.n, 0) AS HUGEINT) AS c
      |  FROM spine s LEFT JOIN byday b USING (event_type, day)),
      |w AS (
      |  SELECT event_type, c,
      |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
      |    sum(c) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix,
      |    count(*) OVER (PARTITION BY event_type) AS nd,
      |    sum(c) OVER (PARTITION BY event_type) AS s,
      |    sum(c * c) OVER (PARTITION BY event_type) AS ssq
      |  FROM j),
      |g AS (
      |  SELECT event_type, max(nd) AS nd, max(s) AS s, max(ssq) AS ssq,
      |    max(nd * prefix - t * s) - min(nd * prefix - t * s) AS rng
      |  FROM w GROUP BY 1)
      |SELECT event_type, CAST(nd AS BIGINT) AS n_days,
      |  CAST(rng AS DOUBLE) / sqrt(CAST(nd * ssq - s * s AS DOUBLE)) AS rs,
      |  ln(CAST(rng AS DOUBLE) / sqrt(CAST(nd * ssq - s * s AS DOUBLE)))
      |    / ln(CAST(nd AS DOUBLE)) AS h_est
      |FROM g
      |WHERE nd * ssq - s * s > 0 AND rng > 0 AND nd > 1
      |ORDER BY event_type""".stripMargin

  def c65VolClustering(spark: SparkSession, dir: String): DataFrame =
    c65VolClusteringOf(Tables.events(spark, dir))

  /** c65: volatility clustering per event type — lag-1 autocorrelation
    * of |day-over-day change| in daily volume (the ARCH-effect
    * diagnostic, Engle 1982): c35/c62 autocorrelate the LEVEL series;
    * this asks whether the MAGNITUDE of change clusters — turbulent
    * days begetting turbulent days even when the level shows no
    * memory. Operationally it decides whether c12-style per-day
    * thresholds can treat each day's deviation as independent (they
    * can't when vol clusters — alerts arrive in storms, and paging
    * policy should expect that). Same exact-integer moment core as
    * c35 (DECIMAL(38,0) sums over the consecutive-pair frame, q26's
    * ONE double formula at the end); zero-variance series have no row.
    *
    * Shape: ONE scan → (type, day) reduce → c33 gap explode (a gap
    * day is a real zero — skipping it pairs non-adjacent days) → two
    * sequential lag/lead windows riding ONE (type, day) exchange →
    * per-type 1-row reduce. */
  def c65VolClusteringOf(events: DataFrame): DataFrame = {
    def d38c(c: Column): Column = c.cast(DecimalType(38, 0))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val denx = col("n") * col("sxx") - col("sx") * col("sx")
    val deny = col("n") * col("syy") - col("sy") * col("sy")
    zeroFilledDaysOf(events)
      .select(col("event_type"), col("day"), col("n_events"))
      .withColumn("prev", lag(col("n_events"), 1).over(wOrd))
      .filter(col("prev").isNotNull)
      .withColumn("v", d38c(abs(col("n_events") - col("prev"))))
      .withColumn("vnext", lead(col("v"), 1).over(wOrd))
      .filter(col("vnext").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast(DecimalType(38, 0)).as("n"),
        sum(col("v")).as("sx"), sum(col("vnext")).as("sy"),
        sum(col("v") * col("vnext")).as("sxy"),
        sum(col("v") * col("v")).as("sxx"),
        sum(col("vnext") * col("vnext")).as("syy"))
      .filter(denx > 0 && deny > 0)
      .select(col("event_type"), col("n").cast("bigint").as("n_pairs"),
        (num.cast("double") /
          (sqrt(denx.cast("double")) * sqrt(deny.cast("double"))))
          .as("vol_acf1"))
      .orderBy(col("event_type"))
  }

  val c65Sql: String =
    """WITH e AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day FROM events),
      |byday AS (SELECT event_type, day, count(*) AS n FROM e GROUP BY 1, 2),
      |spans AS (SELECT event_type, min(day) AS lo, max(day) AS hi FROM byday GROUP BY 1),
      |spine AS (SELECT event_type, unnest(generate_series(lo, hi)) AS day FROM spans),
      |j AS (
      |  SELECT s.event_type, s.day, coalesce(b.n, 0) AS c
      |  FROM spine s LEFT JOIN byday b USING (event_type, day)),
      |d AS (
      |  SELECT event_type, day,
      |    CAST(abs(c - lag(c) OVER (PARTITION BY event_type ORDER BY day)) AS HUGEINT) AS v
      |  FROM j QUALIFY v IS NOT NULL),
      |p AS (
      |  SELECT event_type, v,
      |    lead(v) OVER (PARTITION BY event_type ORDER BY day) AS vnext
      |  FROM d QUALIFY vnext IS NOT NULL),
      |m AS (
      |  SELECT event_type, count(*) AS n, sum(v) AS sx, sum(vnext) AS sy,
      |    sum(v * vnext) AS sxy, sum(v * v) AS sxx, sum(vnext * vnext) AS syy
      |  FROM p GROUP BY 1)
      |SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
      |  CAST(n * sxy - sx * sy AS DOUBLE) /
      |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
      |    AS vol_acf1
      |FROM m
      |WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
      |ORDER BY event_type""".stripMargin

  def c66BusyRuns(spark: SparkSession, dir: String): DataFrame =
    c66BusyRunsOf(Tables.events(spark, dir))

  /** c66: busy-RUN profile per event type — the duration dimension the
    * point detectors miss: c25 flags hourly floods, c41/c44 flag the
    * day a level shifts, but capacity planning needs to know how LONG
    * an elevated regime lasts once entered (provision for the p-max
    * run, not the single worst day). A day is `busy` when its count
    * strictly exceeds the type's own mean daily rate — exact integer
    * cross-multiplication (n·c > S, no division) over the zero-filled
    * spine (a gap day is a real quiet day: it BREAKS a run, and
    * skipping it would splice two separate episodes together). Runs
    * are maximal consecutive busy stretches via the classic
    * day − row_number island key; types never busy have no row.
    *
    * Shape: ONE scan → (type, day) reduce → c33 gap explode →
    * count/sum windows + the island window on ONE (type) exchange →
    * (type, island) reduce → per-type 1-row reduce. */
  def c66BusyRunsOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def d38c(c: Column): Column = c.cast(DecimalType(38, 0))
    val wAll = Window.partitionBy(col("event_type"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    zeroFilledDaysOf(events)
      .select(col("event_type"), col("day"), col("n_events"))
      .withColumn("nd", count(lit(1)).over(wAll))
      .withColumn("s", sum(col("n_events")).over(wAll))
      .filter(d38c(col("n_events")) * d38c(col("nd")) > d38c(col("s")))
      .withColumn("island", col("day") - row_number().over(wOrd))
      .groupBy(col("event_type"), col("island"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_runs"), max(col("len")).as("longest_run"),
        sum(col("len")).as("busy_days"))
      .select(col("event_type"), col("n_runs"), col("longest_run"),
        col("busy_days"),
        expr("(busy_days * 1000) div n_runs").as("mean_len_milli"))
      .orderBy(col("event_type"))
  }

  val c66Sql: String =
    """WITH e AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day FROM events),
      |byday AS (SELECT event_type, day, count(*) AS n FROM e GROUP BY 1, 2),
      |spans AS (SELECT event_type, min(day) AS lo, max(day) AS hi FROM byday GROUP BY 1),
      |spine AS (SELECT event_type, unnest(generate_series(lo, hi)) AS day FROM spans),
      |j AS (
      |  SELECT s.event_type, s.day, coalesce(b.n, 0) AS c
      |  FROM spine s LEFT JOIN byday b USING (event_type, day)),
      |t AS (
      |  SELECT event_type, day, c,
      |    count(*) OVER (PARTITION BY event_type) AS nd,
      |    sum(c) OVER (PARTITION BY event_type) AS s
      |  FROM j),
      |busy AS (
      |  SELECT event_type, day,
      |    day - row_number() OVER (PARTITION BY event_type ORDER BY day) AS island
      |  FROM t WHERE CAST(c AS HUGEINT) * nd > s),
      |runs AS (
      |  SELECT event_type, island, count(*) AS len FROM busy GROUP BY 1, 2)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_runs,
      |  CAST(max(len) AS BIGINT) AS longest_run,
      |  CAST(sum(len) AS BIGINT) AS busy_days,
      |  CAST((sum(len) * 1000) // count(*) AS BIGINT) AS mean_len_milli
      |FROM runs GROUP BY 1 ORDER BY 1""".stripMargin

  def c67CrossCorrelogram(spark: SparkSession, dir: String): DataFrame =
    c67Of(Tables.events(spark, dir))

  /** c67: cross-type LEAD–LAG correlogram — Pearson r between every
    * ordered type pair's zero-filled daily series at lags −3…+3
    * (lag L: does type_a's count today predict type_b's L days
    * later?). c58 gives the zero-lag comovement and c62 each type's
    * AUTO-correlogram; this is the missing cross half — the table an
    * on-call engineer reads to find which signal LEADS which (errors
    * today → support tickets tomorrow). All lags are REPORTED rather
    * than argmax'd: near-tied doubles must not decide a cross-engine
    * row (the c62 discipline). Moments are exact DECIMAL(38)
    * integers; only the final r is double, term order mirrored.
    *
    * Shape: one events reduce to (type, day) grain, zero-filled spine
    * localCheckpoint'ed, a 6-way lag fan-out of the TINY day-grain
    * frame (≤ types·days rows — never the event corpus), equi-join on
    * shifted day, one reduce per (pair, lag). */
  def c67Of(events: DataFrame): DataFrame = {
    def d38(c: Column): Column = c.cast(DecimalType(38, 0))
    val days = zeroFilledDaysOf(events)
      .select(col("event_type"), col("day"), col("n_events"))
      .localCheckpoint(true)
    val a = days.select(col("event_type").as("type_a"), col("day"),
        col("n_events").as("x"))
      .withColumn("lag", explode(lit(Array(-3, -2, -1, 1, 2, 3))))
    val b = days.select(col("event_type").as("type_b"),
      col("day").as("day_b"), col("n_events").as("y"))
    a.join(b, col("day_b") === col("day") + col("lag") &&
        col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"), col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(d38(col("x"))).as("sx"), sum(d38(col("y"))).as("sy"),
        sum(d38(col("x")) * col("y")).as("sxy"),
        sum(d38(col("x")) * col("x")).as("sxx"),
        sum(d38(col("y")) * col("y")).as("syy"))
      .withColumn("vx", d38(col("n")) * col("sxx") - col("sx") * col("sx"))
      .withColumn("vy", d38(col("n")) * col("syy") - col("sy") * col("sy"))
      .select(col("type_a"), col("type_b"), col("lag"),
        col("n").cast("bigint").as("n_days"),
        when(col("vx") > 0 && col("vy") > 0,
          (d38(col("n")) * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt(col("vx").cast("double") * col("vy").cast("double"))).as("r"))
      .orderBy(col("type_a"), col("type_b"), col("lag"))
  }

  val c67Sql: String =
    """WITH e AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day FROM events),
      |byday AS (SELECT event_type, day, count(*) AS n FROM e GROUP BY 1, 2),
      |spans AS (SELECT event_type, min(day) AS lo, max(day) AS hi FROM byday GROUP BY 1),
      |spine AS (SELECT event_type, unnest(generate_series(lo, hi)) AS day FROM spans),
      |j AS (
      |  SELECT s.event_type, s.day, coalesce(b.n, 0) AS n_events
      |  FROM spine s LEFT JOIN byday b USING (event_type, day)),
      |lags AS (SELECT unnest([-3, -2, -1, 1, 2, 3]) AS lag),
      |m AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b, l.lag,
      |    CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(a.n_events AS HUGEINT)) AS sx,
      |    sum(CAST(b.n_events AS HUGEINT)) AS sy,
      |    sum(CAST(a.n_events AS HUGEINT) * b.n_events) AS sxy,
      |    sum(CAST(a.n_events AS HUGEINT) * a.n_events) AS sxx,
      |    sum(CAST(b.n_events AS HUGEINT) * b.n_events) AS syy
      |  FROM j a CROSS JOIN lags l JOIN j b
      |    ON b.day = a.day + l.lag AND a.event_type < b.event_type
      |  GROUP BY 1, 2, 3),
      |v AS (
      |  SELECT type_a, type_b, lag, n, sx, sy, sxy,
      |    CAST(n AS HUGEINT) * sxx - sx * sx AS vx,
      |    CAST(n AS HUGEINT) * syy - sy * sy AS vy
      |  FROM m)
      |SELECT type_a, type_b, CAST(lag AS INTEGER) AS lag, n AS n_days,
      |  CASE WHEN vx > 0 AND vy > 0 THEN
      |    CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE) /
      |      sqrt(CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE)) END AS r
      |FROM v ORDER BY type_a, type_b, lag""".stripMargin

  def c68ActivityGini(spark: SparkSession, dir: String): DataFrame =
    c68Of(Tables.events(spark, dir))

  /** c68: daily-volume GINI per event type — how unevenly a type's
    * traffic is spread across its zero-filled day spine (0 = flat
    * load, →1 = a few spike days carry everything): the capacity
    * question c25 (which hours burst) and c66 (how long busy runs
    * last) don't answer — what share of provisioned days does the
    * traffic actually use. Sorted-cumsum Gini, EXACT integers:
    * G·10⁴ = (2·Σ i·x₍ᵢ₎ − (n+1)·Σx) · 10⁴ div (n·Σx), ranks from a
    * per-type window ordered by count (ties in x leave Σ i·x₍ᵢ₎
    * invariant — equal values make Σi over the tied run fixed — so
    * the rank order inside ties cannot flip a digit, engine or
    * parallelism notwithstanding). Gap days are REAL zero days (the
    * c66 spine contract): skipping them would understate skew.
    *
    * Shape: one events reduce to the (type, day) spine, one per-type
    * rank window over day-grain rows, one reduce. */
  def c68Of(events: DataFrame): DataFrame = {
    def d38(c: Column): Column = c.cast(DecimalType(38, 0))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("n_events"), col("day"))
    zeroFilledDaysOf(events)
      .select(col("event_type"), col("day"), col("n_events"))
      .withColumn("i", row_number().over(w))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(d38(col("n_events"))).as("tot"),
        sum(d38(col("i")) * col("n_events")).as("ix"))
      .select(col("event_type"), col("n").cast("bigint").as("n_days"),
        col("tot").cast("bigint").as("n_events"),
        expr("((2 * ix - (n + 1) * tot) * 10000) div (n * tot)")
          .cast("bigint").as("gini_bp"))
      .orderBy(col("event_type"))
  }

  val c68Sql: String =
    """WITH e AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day FROM events),
      |byday AS (SELECT event_type, day, count(*) AS n FROM e GROUP BY 1, 2),
      |spans AS (SELECT event_type, min(day) AS lo, max(day) AS hi FROM byday GROUP BY 1),
      |spine AS (SELECT event_type, unnest(generate_series(lo, hi)) AS day FROM spans),
      |j AS (
      |  SELECT s.event_type, s.day, coalesce(b.n, 0) AS n_events
      |  FROM spine s LEFT JOIN byday b USING (event_type, day)),
      |r AS (
      |  SELECT event_type, n_events,
      |    row_number() OVER (PARTITION BY event_type ORDER BY n_events, day) AS i
      |  FROM j),
      |m AS (
      |  SELECT event_type, count(*) AS n,
      |    sum(CAST(n_events AS HUGEINT)) AS tot,
      |    sum(CAST(i AS HUGEINT) * n_events) AS ix
      |  FROM r GROUP BY 1)
      |SELECT event_type, CAST(n AS BIGINT) AS n_days, CAST(tot AS BIGINT) AS n_events,
      |  CAST((2 * ix - (n + 1) * tot) * 10000 // (n * tot) AS BIGINT) AS gini_bp
      |FROM m ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c68_activity_gini" -> (c68ActivityGini _),
    "c67_cross_correlogram" -> (c67CrossCorrelogram _),
    "c66_busy_runs" -> (c66BusyRuns _),
    "c65_vol_clustering" -> (c65VolClustering _),
    "c64_hurst_rs" -> (c64HurstRs _),
    "c63_next_event_predictability" -> (c63NextEventPredictability _),
    "c62_correlogram" -> (c62Correlogram _),
    "c61_peak_detect" -> (c61PeakDetect _),
    "c60_seasonality_strength" -> (c60SeasonalityStrength _),
    "c59_user_turnover" -> (c59UserTurnover _),
    "c58_comovement" -> (c58Comovement _),
    "c57_cohort_half_life" -> (c57CohortHalfLife _),
    "c56_weekly_stickiness" -> (c56WeeklyStickiness _),
    "c55_drawdown" -> (c55Drawdown _),
    "c54_theil_sen" -> (c54TheilSen _),
    "c53_mann_kendall" -> (c53MannKendall _),
    "c52_runs_test" -> (c52RunsTest _),
    "c51_diurnality" -> (c51Diurnality _),
    "c50_overlap_sketch" -> (c50OverlapSketch _),
    "c49_co_burst" -> (c49CoBurst _),
    "c48_dispersion" -> (c48Dispersion _),
    "c47_anomaly_ensemble" -> (c47AnomalyEnsemble _),
    "c46_downtime_report" -> (c46DowntimeReport _),
    "c45_dow_backtest" -> (c45DowBacktest _),
    "c44_cusum_shift" -> (c44CusumShift _),
    "c43_slo_burn" -> (c43SloBurn _),
    "c42_survival_km" -> (c42SurvivalKm _),
    "c41_ewma_control" -> (c41EwmaControl _),
    "c40_markov_attribution" -> (c40MarkovAttribution _),
    "c39_ab_lift" -> (c39AbLift _),
    "c38_mad_anomaly" -> (c38MadAnomaly _),
    "c37_seasonal_anomaly" -> (c37SeasonalAnomaly _),
    "c36_decay_attribution" -> (c36DecayAttribution _),
    "c35_daily_autocorr" -> (c35DailyAutocorr _),
    "c34_interval_union" -> (c34IntervalUnion _),
    "c33_gap_fill" -> (c33GapFill _),
    "c30_variant_extract" -> (c30VariantExtract _),
    "c31_active_users" -> (c31ActiveUsers _),
    "c32_new_vs_returning" -> (c32NewVsReturning _),
    "c29_time_to_convert" -> (c29TimeToConvert _),
    "c28_type_pagerank" -> (c28TypePagerank _),
    "c27_audience_overlap" -> (c27AudienceOverlap _),
    "c26_level_shift" -> (c26LevelShift _),
    "c25_burst_detect" -> (c25BurstDetect _),
    "c24_dow_profile" -> (c24DowProfile _),
    "c23_user_lifetime" -> (c23UserLifetime _),
    "c22_asof_forward" -> (c22AsofForward _),
    "c21_sessionize_salted" -> (c21SessionizeSalted _),
    "c20_active_streaks" -> (c20ActiveStreaks _),
    "c19_peak_concurrency" -> (c19PeakConcurrency _),
    "c18_dwell_time" -> (c18DwellTime _),
    "c17_bounce_rate" -> (c17BounceRate _),
    "c16_top_paths" -> (c16TopPaths _),
    "c15_cohort_funnel" -> (c15CohortFunnel _),
    "c14_trending_topk" -> (c14TrendingTopk _),
    "c13_transitions" -> (c13Transitions _),
    "c12_daily_anomaly" -> (c12DailyAnomaly _),
    "c11_attribution" -> (c11Attribution _),
    "c10_session_stats" -> (c10SessionStats _),
    "c9_rfm_segments" -> (c9RfmSegments _),
    "c8_inter_event" -> (c8InterEvent _),
    "c1_hourly_window" -> (c1HourlyWindow _),
    "c2_sessionize" -> (c2Sessionize _),
    "c3_asof_join" -> (c3AsofJoin _),
    "c4_json_extract" -> (c4JsonExtract _),
    "c5_range_join" -> (c5RangeJoin _),
    "c6_funnel" -> (c6Funnel _),
    "c7_cohort_retention" -> (c7CohortRetention _))

  val oracles: Map[String, String] = Map(
    "c68_activity_gini" -> c68Sql,
    "c67_cross_correlogram" -> c67Sql,
    "c66_busy_runs" -> c66Sql,
    "c65_vol_clustering" -> c65Sql,
    "c64_hurst_rs" -> c64Sql,
    "c63_next_event_predictability" -> c63Sql,
    "c62_correlogram" -> c62Sql,
    "c61_peak_detect" -> c61Sql,
    "c60_seasonality_strength" -> c60Sql,
    "c59_user_turnover" -> c59Sql,
    "c58_comovement" -> c58Sql,
    "c57_cohort_half_life" -> c57Sql,
    "c56_weekly_stickiness" -> c56Sql,
    "c55_drawdown" -> c55Sql,
    "c54_theil_sen" -> c54Sql,
    "c53_mann_kendall" -> c53Sql,
    "c52_runs_test" -> c52Sql,
    "c51_diurnality" -> c51Sql,
    "c50_overlap_sketch" -> c50Sql,
    "c49_co_burst" -> c49Sql,
    "c48_dispersion" -> c48Sql,
    "c47_anomaly_ensemble" -> c47Sql,
    "c46_downtime_report" -> c46Sql,
    "c45_dow_backtest" -> c45Sql,
    "c44_cusum_shift" -> c44Sql,
    "c43_slo_burn" -> c43Sql,
    "c42_survival_km" -> c42Sql,
    "c41_ewma_control" -> c41Sql,
    "c40_markov_attribution" -> c40Sql,
    "c39_ab_lift" -> c39Sql,
    "c38_mad_anomaly" -> c38Sql,
    "c37_seasonal_anomaly" -> c37Sql,
    "c36_decay_attribution" -> c36Sql,
    "c35_daily_autocorr" -> c35Sql,
    "c34_interval_union" -> c34Sql,
    "c33_gap_fill" -> c33Sql,
    "c30_variant_extract" -> c30Sql,
    "c31_active_users" -> c31Sql,
    "c32_new_vs_returning" -> c32Sql,
    "c29_time_to_convert" -> c29Sql,
    "c28_type_pagerank" -> c28Sql,
    "c27_audience_overlap" -> c27Sql,
    "c26_level_shift" -> c26Sql,
    "c25_burst_detect" -> c25Sql,
    "c24_dow_profile" -> c24Sql,
    "c23_user_lifetime" -> c23Sql,
    "c22_asof_forward" -> c22Sql,
    // c21 is the salted PLAN for c2's semantics: same result frame by
    // construction, so it shares c2's oracle — the correctness gate
    // proving plan-equivalence cross-engine.
    "c21_sessionize_salted" -> c2Sql,
    "c20_active_streaks" -> c20Sql,
    "c19_peak_concurrency" -> c19Sql,
    "c18_dwell_time" -> c18Sql,
    "c17_bounce_rate" -> c17Sql,
    "c16_top_paths" -> c16Sql,
    "c15_cohort_funnel" -> c15Sql,
    "c14_trending_topk" -> c14Sql,
    "c13_transitions" -> c13Sql,
    "c12_daily_anomaly" -> c12Sql,
    "c11_attribution" -> c11Sql,
    "c10_session_stats" -> c10Sql,
    "c9_rfm_segments" -> c9Sql,
    "c8_inter_event" -> c8Sql,
    "c1_hourly_window" -> c1Sql,
    "c2_sessionize" -> c2Sql,
    "c3_asof_join" -> c3Sql,
    "c4_json_extract" -> c4Sql,
    "c5_range_join" -> c5Sql,
    "c6_funnel" -> c6Sql,
    "c7_cohort_retention" -> c7Sql)
}
