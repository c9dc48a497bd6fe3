package graft.operators

import graft.{Cols, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Analytics core: the query capabilities of the engine over the star
  * schema (SURVEY.md §2.B). Each query is a declarative DataFrame plan —
  * Catalyst handles pushdown/pruning/join-reordering; dimension tables
  * are explicitly broadcast so fact tables never shuffle for them.
  *
  * Scale notes: fact-fact joins (orders⨝lineitem) are equi-joins on the
  * natural key → sort-merge/shuffled-hash with AQE; top-k goes through
  * TakeOrderedAndProject (no global sort materialization).
  */
object Analytics {
  import Cols._

  /** TPC-H Q1-style pricing summary: grouped agg with derived measures. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val ep = dec2(col("l_extendedprice"))
    val disc = dec2(col("l_discount"), 4)
    val tax = dec2(col("l_tax"), 4)
    l.filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(ep).cast("double").as("sum_base_price"),
        sum(ep * (lit(1) - disc)).cast("double").as("sum_disc_price"),
        sum(ep * (lit(1) - disc) * (lit(1) + tax)).cast("double").as("sum_charge"),
        (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(ep).cast("double") / count(lit(1))).as("avg_price"),
        (sum(disc).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
      |  CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** 3-way join + agg + top-k (shipping priority). The customer side is
    * filtered only by segment (~20% of customers), which scales with SF —
    * fact-sized at 100 TB — so it carries NO broadcast hint: AQE picks
    * broadcast at test SF and sort-merge at scale (the q35/q44
    * adjudication). Top-k compiles to TakeOrderedAndProject. */
  def q3JoinTopk(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < lit("1998-03-15"))
    val l = Tables.lineitem(spark, dir).filter(col("l_shipdate") > lit("1998-03-15"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"), 4)))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** EXISTS semi-join: orders with at least one late-shipped lineitem. */
  def q4Semijoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-07-01") && col("o_orderdate") < lit("1996-10-01"))
    val l = Tables.lineitem(spark, dir)
    o.join(l, col("l_orderkey") === col("o_orderkey") && col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Snowflake 6-way join + agg (local supplier volume). Only the
    * SF-invariant dims (nation 25 rows, region 5) are hinted; supplier
    * scales with SF (~1 B rows at 100 TB) and stays un-hinted — AQE
    * broadcasts it at test SF, SMJ at scale. */
  def q5Multijoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
    val l = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"), 4)))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5Sql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** Selective filter + global aggregate (forecast revenue). The filter
    * reaches the parquet scan as PushedFilters. */
  def q6FilterSum(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1998-01-01")
        && col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
      .agg(sum(dec2(col("l_extendedprice")) * dec2(col("l_discount"), 4)).cast("double").as("revenue"))

  val q6Sql: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin

  /** Window functions: top-2 spenders per nation (rank within partition). */
  def q7WindowRank(spark: SparkSession, dir: String): DataFrame = {
    val custRev = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(dec2(col("o_totalprice"))).cast("double").as("total_spend"))
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val w = Window.partitionBy(col("c_nationkey")).orderBy(col("total_spend").desc, col("c_custkey"))
    custRev.join(c, col("o_custkey") === col("c_custkey"))
      .withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= 2)
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_name"), col("total_spend"), col("rnk"))
      .orderBy(col("n_name"), col("rnk"), col("c_name"))
  }

  val q7Sql: String =
    """WITH cust_rev AS (
      |  SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spend
      |  FROM orders GROUP BY o_custkey)
      |SELECT n_name, c_name, total_spend, rnk FROM (
      |  SELECT c_nationkey, c_name, c_custkey, total_spend,
      |    rank() OVER (PARTITION BY c_nationkey ORDER BY total_spend DESC, c_custkey) AS rnk
      |  FROM cust_rev JOIN customer ON o_custkey = c_custkey) t
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE rnk <= 2 ORDER BY n_name, rnk, c_name""".stripMargin

  /** Hierarchical ROLLUP (region → nation) with explicit null-first sort
    * so subtotal rows order identically everywhere. */
  def q8Rollup(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"), sum(dec2(col("c_acctbal"))).cast("double").as("total_bal"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  val q8Sql: String =
    """SELECT r_name, n_name, count(*) AS n_customers,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin

  /** NOT EXISTS anti-join: customers with no orders before 1996. */
  def q9Antijoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < lit("1996-01-01"))
    c.join(o, col("o_custkey") === col("c_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val q9Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderdate < TIMESTAMP '1996-01-01')
      |ORDER BY c_custkey""".stripMargin

  /** GroupBy + HAVING: high-frequency customers. */
  def q10Having(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("order_cnt"), sum(dec2(col("o_totalprice"))).cast("double").as("spend"))
      .filter(col("order_cnt") >= 12)
      .orderBy(col("o_custkey"))

  val q10Sql: String =
    """SELECT o_custkey, count(*) AS order_cnt,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
      |FROM orders GROUP BY o_custkey HAVING count(*) >= 12 ORDER BY o_custkey""".stripMargin

  /** Conditional aggregation: status breakdown per priority. */
  def q12CaseAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("total"),
        countIf(col("o_orderstatus") === "F").as("finished"),
        countIf(col("o_orderstatus") === "O").as("open_cnt"),
        sum(when(col("o_totalprice") > 100000, dec2(col("o_totalprice")))).cast("double").as("big_spend"))
      .orderBy(col("o_orderpriority"))

  val q12Sql: String =
    """SELECT o_orderpriority, count(*) AS total,
      |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS finished,
      |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS open_cnt,
      |  CAST(sum(CASE WHEN o_totalprice > 100000 THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS big_spend
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Left outer join + distribution (customer order-count histogram). */
  def q13OuterjoinDist(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13Sql: String =
    """WITH c_orders AS (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey)
      |SELECT c_count, count(*) AS custdist FROM c_orders
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Exact distinct counting per group. */
  def q14Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("distinct_parts"),
        countDistinct(col("l_suppkey")).as("distinct_supps"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"))

  val q14Sql: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS distinct_parts,
      |  count(DISTINCT l_suppkey) AS distinct_supps, count(*) AS cnt
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Scalar subquery / argmax: supplier(s) with max quarterly revenue. */
  def q15Maxsub(spark: SparkSession, dir: String): DataFrame =
    // global max via unpartitioned window over the per-supplier
    // aggregate (one row per supplier through the merge partition) —
    // ONE lineitem scan; the broadcast-scalar form re-derived the
    // aggregate for the max side. Survivors are near-singleton, so the
    // supplier join's other side stays trivially small.
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1997-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"), 4)))
        .cast("double").as("total_revenue"))
      .withColumn("mr", max(col("total_revenue")).over(Window.partitionBy()))
      .filter(col("total_revenue") === col("mr"))
      .join(Tables.supplier(spark, dir), col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))

  val q15Sql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey, CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue
      |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
      |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Pivot: event_type → columns, sum(value) per user (wide aggregation). */
  def q16Pivot(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val pivoted = e.groupBy(col("user_id"))
      .pivot("event_type", eventTypes)
      .agg(sum(dec2(col("value"))))
    pivoted.select(col("user_id") +: eventTypes.map(t => col(t).cast("double").as(t)): _*)
      .orderBy(col("user_id"))
  }

  val q16Sql: String =
    """SELECT user_id,
      |  CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS click,
      |  CAST(sum(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS error,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS purchase,
      |  CAST(sum(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS signup,
      |  CAST(sum(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** HLL sketch path (approx_count_distinct) — the 100 TB distinct
    * strategy. No DuckDB oracle (sketches differ); rows-only check. */
  def q17ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"))
      .orderBy(col("l_returnflag"))

  /** Quantile sketch path (approx_percentile) — the 100 TB percentile
    * strategy alongside the exact q21. Rows-only (sketches differ). */
  def q22ApproxPercentile(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50"),
        percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("p95"),
        percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000)).as("p99"))
      .orderBy(col("l_returnflag"))

  /** GROUPING SETS multi-granularity aggregation, via the DataFrame
    * groupingSets API — no temp views, no session-global state, safe
    * under concurrent jobs in one session (single expand + agg plan,
    * identical to the SQL form). */
  def q18GroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupingSets(
        Seq(Seq(col("r_name"), col("o_orderstatus")), Seq(col("r_name")), Seq.empty),
        col("r_name"), col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"),
        sum(dec2(col("o_totalprice"))).cast("double").as("total"))
      .orderBy(col("r_name").asc_nulls_first, col("o_orderstatus").asc_nulls_first)

  val q18Sql: String =
    """SELECT r_name, o_orderstatus, count(*) AS cnt,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |GROUP BY GROUPING SETS ((r_name, o_orderstatus), (r_name), ())
      |ORDER BY r_name NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin

  /** String processing: LIKE classes, regexp extraction, distinct
    * token counting per brand. */
  def q19StringOps(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("cnt"),
        countIf(col("p_name").like("%widget%")).as("widgets"),
        countDistinct(regexp_extract(col("p_name"), "^(\\w+)", 1)).as("n_first_words"),
        max(upper(col("p_type"))).as("max_type"))
      .orderBy(col("p_brand"))

  val q19Sql: String =
    """SELECT p_brand, count(*) AS cnt,
      |  count(CASE WHEN p_name LIKE '%widget%' THEN 1 END) AS widgets,
      |  count(DISTINCT regexp_extract(p_name, '^(\w+)', 1)) AS n_first_words,
      |  max(upper(p_type)) AS max_type
      |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** Set operations: INTERSECT / EXCEPT with distinct semantics. */
  def q20Setops(spark: SparkSession, dir: String): DataFrame = {
    val building = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val active96 = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
      .select(col("o_custkey").as("c_custkey"))
    val negative = Tables.customer(spark, dir)
      .filter(col("c_acctbal") < 0).select(col("c_custkey"))
    building.intersect(active96).except(negative).orderBy(col("c_custkey"))
  }

  val q20Sql: String =
    """(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      | INTERSECT
      | SELECT o_custkey AS c_custkey FROM orders
      | WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
      |EXCEPT
      |SELECT c_custkey FROM customer WHERE c_acctbal < 0
      |ORDER BY c_custkey""".stripMargin

  /** Exact discrete median per group via window rank selection —
    * deterministic (no interpolation), one shuffle on the group key. */
  def q21MedianDisc(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
    val wOrd = w.orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(col("rn") === ceil(col("cnt") / 2.0))
      .select(col("o_custkey"), col("o_totalprice").as("median_price"))
      .orderBy(col("o_custkey"))
  }

  val q21Sql: String =
    """WITH r AS (
      |  SELECT o_custkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS rn,
      |    count(*) OVER (PARTITION BY o_custkey) AS cnt
      |  FROM orders)
      |SELECT o_custkey, o_totalprice AS median_price FROM r
      |WHERE rn = CAST(ceil(cnt / 2.0) AS BIGINT) ORDER BY o_custkey""".stripMargin

  /** TPC-H Q11-style global-threshold selection: parts whose total
    * ordered quantity exceeds a fixed share of the corpus-wide total.
    * The global total comes from an unpartitioned window over the
    * ALREADY-AGGREGATED per-part frame — one row per part through that
    * single merge partition, never corpus rows — so lineitem is scanned
    * ONCE (the broadcast-scalar form re-derived the per-part aggregate:
    * a second full fact scan, 5.3 s of the query's r6 cold time). The
    * share comparison stays in DECIMAL (qty·2000 > total ⇔
    * qty > total/2000) so the boundary is exact and portable — no
    * double rounding at the threshold. */
  def q11GlobalThreshold(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(dec2(col("l_quantity"))).as("qty_dec"))
      .withColumn("total_dec", sum(col("qty_dec")).over(Window.partitionBy()))
      .filter(col("qty_dec") * 2000 > col("total_dec"))
      .select(col("l_partkey"), col("qty_dec").cast("double").as("sum_qty"))
      .orderBy(col("l_partkey"))

  val q11Sql: String =
    """WITH per_part AS (
      |  SELECT l_partkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty_dec
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT l_partkey, CAST(qty_dec AS DOUBLE) AS sum_qty
      |FROM per_part
      |WHERE qty_dec * 2000 > (SELECT sum(qty_dec) FROM per_part)
      |ORDER BY l_partkey""".stripMargin

  /** Running (cumulative) revenue per customer over order date — the
    * window-frame pattern (rows unbounded-preceding..current) q7's rank
    * doesn't cover. Sum accumulates in DECIMAL over a total order
    * (date, orderkey), so every prefix is exact and deterministic. */
  def q23RunningTotal(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(dec2(col("o_totalprice"))).over(w).cast("double").as("running_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q23Sql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS running_total
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** TPC-H Q17-style correlated aggregate: lineitems whose quantity is
    * below 20% of their part's average quantity ("small orders"), summed.
    * The correlated scalar subquery decorrelates into a per-part
    * aggregate joined back on the part key — one shuffle each side,
    * never a per-row re-scan. Threshold math stays in DECIMAL: qty·5 <
    * sum/count avoids the division (and its double rounding) entirely. */
  def q24CorrAvg(spark: SparkSession, dir: String): DataFrame = {
    // per-part stats as a partitioned window, not agg + self-join: the
    // join form scans lineitem twice and STILL shuffles it on the part
    // key for the probe side — the window needs that one exchange and
    // nothing else. Division-free DECIMAL threshold as before.
    val w = Window.partitionBy(col("l_partkey"))
    Tables.lineitem(spark, dir)
      .withColumn("qty_sum", sum(dec2(col("l_quantity"))).over(w))
      .withColumn("qty_cnt", count(lit(1)).over(w))
      .filter(dec2(col("l_quantity")) * 5 * col("qty_cnt") < col("qty_sum"))
      .agg(
        sumMoney(col("l_extendedprice")).as("small_order_revenue"),
        count(lit(1)).as("n_small"))
  }

  val q24Sql: String =
    """WITH per_part AS (
      |  SELECT l_partkey AS p_key,
      |    sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty_sum,
      |    count(*) AS qty_cnt
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS small_order_revenue,
      |  count(*) AS n_small
      |FROM lineitem JOIN per_part ON l_partkey = p_key
      |WHERE CAST(l_quantity AS DECIMAL(12,2)) * 5 * qty_cnt < qty_sum""".stripMargin

  /** Per-nation customer spend deciles — the ntile window pattern.
    * The window partitions by nation (never a global sort: a single
    * ORDER BY over billions of customers is the scale-hostile form),
    * with a (spend, custkey) total order inside each partition so tile
    * assignment is deterministic. Output is the per-(nation, decile)
    * aggregate. */
  def q25SpendDeciles(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(dec2(col("o_totalprice"))).as("s_dec"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    val w = Window.partitionBy(col("n_name"))
      .orderBy(col("s_dec").desc, col("o_custkey"))
    spend.join(cust, col("o_custkey") === col("c_custkey"))
      .withColumn("decile", ntile(10).over(w))
      .groupBy(col("n_name"), col("decile"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("s_dec")).cast("double").as("decile_spend"))
      .orderBy(col("n_name"), col("decile"))
  }

  val q25Sql: String =
    """WITH spend AS (
      |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(12,2))) AS s_dec
      |  FROM orders GROUP BY o_custkey),
      |tiled AS (
      |  SELECT n_name, s_dec,
      |    CAST(ntile(10) OVER (PARTITION BY n_name ORDER BY s_dec DESC, o_custkey) AS INTEGER) AS decile
      |  FROM spend
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey)
      |SELECT n_name, decile, count(*) AS n_customers,
      |  CAST(sum(s_dec) AS DOUBLE) AS decile_spend
      |FROM tiled GROUP BY n_name, decile
      |ORDER BY n_name, decile""".stripMargin

  /** q26: Pearson correlation (order value vs line count per order) from
    * EXACT integer/decimal moment sums. The built-in corr() accumulates
    * doubles in partition order — nondeterministic across parallelism
    * and never bit-equal cross-engine. Here every moment (n, Σx, Σy,
    * Σxy, Σx², Σy²) is an exact DECIMAL/BIGINT aggregate; the formula
    * is applied ONCE to the final sums in double — bit-identical at any
    * parallelism, in any engine. */
  def q26CorrMoments(spark: SparkSession, dir: String): DataFrame = {
    val lines = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("y"))
    val xy = Tables.orders(spark, dir)
      .join(lines, col("o_orderkey") === col("l_orderkey"))
      .select(dec2(col("o_totalprice")).as("x"), col("y"))
    val m = xy.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    m.select(
      col("n"),
      ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
          sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
        .as("corr_price_lines"))
  }

  val q26Sql: String =
    """WITH lines AS (
      |  SELECT l_orderkey, count(*) AS y FROM lineitem GROUP BY l_orderkey),
      |xy AS (
      |  SELECT CAST(o_totalprice AS DECIMAL(12,2)) AS x, y
      |  FROM orders JOIN lines ON o_orderkey = l_orderkey),
      |m AS (
      |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      |  FROM xy)
      |SELECT n,
      |  CAST(n * sxy - sx * sy AS DOUBLE)
      |    / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
      |    AS corr_price_lines
      |FROM m""".stripMargin

  /** q27: lapsed high-balance customers by segment (the TPC-H Q22
    * pattern): customers whose balance exceeds the positive-balance
    * average and who placed NO order since the cutoff. The scalar
    * average is a 1-row aggregate broadcast into a division-free
    * DECIMAL comparison (bal·n > Σbal ⟺ bal > avg, no double
    * rounding); the "no recent order" test is a left-anti join against
    * the date-filtered orders — the filter pushes to the orders scan,
    * so the anti-join's build side is only the recent slice. */
  def q27BalanceGap(spark: SparkSession, dir: String): DataFrame = {
    val segs = Seq("AUTOMOBILE", "BUILDING", "MACHINERY")
    val cutoff = "2000-01-01"
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment").isin(segs.map(lit(_)): _*))
    val avgRow = cust.filter(col("c_acctbal") > 0)
      .agg(sum(dec2(col("c_acctbal"))).as("bal_sum"), count(lit(1)).as("bal_cnt"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit(cutoff).cast("timestamp"))
      .select(col("o_custkey"))
    cust.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .crossJoin(broadcast(avgRow))
      .filter(dec2(col("c_acctbal")) * col("bal_cnt") > col("bal_sum"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"), sumMoney(col("c_acctbal")).as("total_bal"))
      .orderBy(col("c_mktsegment"))
  }

  val q27Sql: String =
    """WITH seg AS (
      |  SELECT * FROM customer
      |  WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')),
      |pos AS (
      |  SELECT sum(CAST(c_acctbal AS DECIMAL(12,2))) AS bal_sum, count(*) AS bal_cnt
      |  FROM seg WHERE c_acctbal > 0),
      |lapsed AS (
      |  SELECT * FROM seg WHERE NOT EXISTS (
      |    SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01'))
      |SELECT c_mktsegment, count(*) AS n_cust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
      |FROM lapsed, pos
      |WHERE CAST(c_acctbal AS DECIMAL(12,2)) * bal_cnt > bal_sum
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Exact revenue term: extendedprice·(1−discount) in DECIMAL. */
  private def revenue: Column =
    dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"), 4))

  /** q28: promo revenue share (TPC-H Q14) — conditional fraction of one
    * month's revenue from PROMO parts. The part side scales with SF
    * (200k rows/SF, ~20 B at 100 TB) so it is NOT hinted — AQE
    * broadcasts it at test SF where it fits the threshold, SMJ at
    * scale. Both sums are exact DECIMAL and only the final share
    * division runs in double, so the percentage is bit-stable at any
    * parallelism. The shipdate window pushes into the lineitem scan. */
  def q28PromoShare(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .agg(
        (sum(when(col("p_type") === "PROMO", revenue)).cast("double") * 100 /
          sum(revenue).cast("double")).as("promo_share_pct"),
        sum(revenue).cast("double").as("total_revenue"))

  val q28Sql: String =
    """SELECT
      |  CAST(sum(CASE WHEN p_type = 'PROMO'
      |    THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) END) AS DOUBLE) * 100
      |    / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
      |    AS promo_share_pct,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
      |    AS total_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin

  /** q29: bilateral shipping volume (TPC-H Q7) — revenue between every
    * (supplier nation, customer nation) pair per ship year. Snowflake
    * shape: only the 25-row nation dim is hinted; supplier and customer
    * both scale with SF and stay un-hinted (AQE broadcasts at test SF,
    * SMJ at scale); the two-year window pushes to the lineitem scan;
    * one exchange for the (pair, year) aggregate. */
  def q29NationVolume(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    l.join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir).select(
        col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      // customer scales with the fact tables (SF×150k in TPC-H) — an
      // equi-join shuffle, NOT a forced broadcast; Catalyst/AQE may
      // still broadcast it at small SF where it fits the threshold
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir).select(
        col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("cn_key"))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
      .agg(sum(revenue).cast("double").as("volume"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q29Sql: String =
    """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS volume
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation cn ON c_nationkey = cn.n_nationkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** q30: disjunctive-predicate revenue (TPC-H Q19) — an OR of three
    * (brand, size-range, quantity-range) conjunct branches over the
    * part join. The part-side conjuncts (brand ∈ {...}, size bounds)
    * prune the build side at the scan; the quantity ranges evaluate in
    * the join filter — the pattern that turns a "three scans, three
    * unions" naive form into ONE pass over lineitem. part scales with
    * SF, so the join carries no hint (AQE picks broadcast at test SF,
    * SMJ at scale). */
  def q30Disjunct(spark: SparkSession, dir: String): DataFrame = {
    val qty = col("l_quantity")
    val branch1 = col("p_brand") === "Brand#12" && col("p_size").between(1, 5) && qty.between(1, 11)
    val branch2 = col("p_brand") === "Brand#23" && col("p_size").between(1, 10) && qty.between(10, 20)
    val branch3 = col("p_brand") === "Brand#7" && col("p_size").between(1, 15) && qty.between(20, 30)
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .filter(branch1 || branch2 || branch3)
      .agg(sum(revenue).cast("double").as("revenue"), count(lit(1)).as("n_lines"))
  }

  val q30Sql: String =
    """SELECT
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#7' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** q31: returned-item revenue report (TPC-H Q10) — top 20 customers
    * by revenue lost to returns in one quarter. Fact-fact join shuffles
    * on the order key with both date/returnflag filters pushed to the
    * scans; nation broadcasts; the top-20 compiles to
    * TakeOrderedAndProject (per-partition top-k then a 20-row merge —
    * never a global sort of the aggregate). */
  def q31ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-10-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(revenue).cast("double").as("revenue"), count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q31Sql: String =
    """SELECT c_custkey, c_name, n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1997-10-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** q32: large-volume orders (TPC-H Q18) — orders whose total line
    * quantity exceeds a threshold, with their customer, top 10 by
    * quantity. The filter is an aggregated HAVING over the fact (exact
    * DECIMAL sum — the threshold comparison never leaves decimal);
    * survivors are a tiny set, so the customer/orders joins after the
    * aggregate touch only qualifying keys. Top-10 via
    * TakeOrderedAndProject. */
  def q32LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec2(col("l_quantity"))).as("qty_dec"))
      .filter(col("qty_dec") > 300)
    big.join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_orderdate"),
        col("qty_dec").cast("double").as("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(10)
  }

  val q32Sql: String =
    """WITH big AS (
      |  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty_dec
      |  FROM lineitem GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 300)
      |SELECT c_custkey, c_name, o_orderkey, o_orderdate,
      |  CAST(qty_dec AS DOUBLE) AS total_qty
      |FROM big
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY total_qty DESC, o_orderkey LIMIT 10""".stripMargin

  /** q33: top revenue supplier (TPC-H Q15 pattern) — per-supplier
    * revenue over one quarter, returning every supplier achieving the
    * GLOBAL maximum. Q15's correlated `total_revenue = (SELECT
    * max(...))` subquery decorrelates to a 1-row max over the
    * per-supplier aggregate, broadcast into an equality filter —
    * DECIMAL-exact on both sides, so "equals the max" never depends on
    * double rounding or parallelism. The quarter filter pushes to the
    * lineitem scan, and the max comes from an unpartitioned window over
    * the ALREADY-AGGREGATED per-supplier frame — one row per supplier,
    * never corpus rows, through that single merge partition — so
    * lineitem is scanned ONCE (the broadcast-scalar form re-derives the
    * aggregate: a second full fact scan at 100 TB). */
  def q33TopSupplier(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-07-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(revenue).as("rev_dec"))
      .withColumn("max_rev", max(col("rev_dec")).over(Window.partitionBy()))
      .filter(col("rev_dec") === col("max_rev"))
      // supplier scales with SF — no hint; AQE broadcasts it at test SF
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("rev_dec").cast("double").as("total_rev"))
      .orderBy(col("s_suppkey"))

  val q33Sql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS rev_dec
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-07-01' AND l_shipdate < TIMESTAMP '1997-10-01'
      |  GROUP BY l_suppkey),
      |mx AS (SELECT max(rev_dec) AS max_rev FROM rev)
      |SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_rev
      |FROM rev CROSS JOIN mx JOIN supplier ON l_suppkey = s_suppkey
      |WHERE rev_dec = max_rev
      |ORDER BY s_suppkey""".stripMargin

  /** q34: product-line profit by supplier nation and order year (TPC-H
    * Q9 pattern, minus partsupp which this schema lacks). The part
    * filter (name contains 'gear') prunes the build side to keys only
    * BEFORE the fact join — the scan-side projection is one column;
    * part and supplier both scale with SF so neither is hinted (the
    * filtered key set shrinks by a constant factor only — AQE
    * broadcasts at test SF, SMJ at scale); nation (25 rows) broadcasts;
    * the orders join shuffles on the order key; one exchange for the
    * (nation, year) aggregate. */
  def q34ProfitByNation(spark: SparkSession, dir: String): DataFrame = {
    val gearParts = Tables.part(spark, dir)
      .filter(col("p_name").contains("gear"))
      .select(col("p_partkey"))
    Tables.lineitem(spark, dir)
      .join(gearParts, col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(revenue).cast("double").as("profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q34Sql: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE p_name LIKE '%gear%'
      |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  /** q35: national market share (TPC-H Q8 pattern) — NATION_7's share
    * of ECONOMY-part revenue sold to ASIA customers, per order year.
    * Two-level conditional aggregation: both the conditional and total
    * sums stay DECIMAL and only the final share divides in double.
    * Only SF-invariant sides are hinted (nation selects, the 25-row
    * ASIA nation-key set); part keys, supplier and customer all scale
    * with SF and shuffle un-hinted (q29 discipline — AQE broadcasts
    * them at test SF); the two-year window pushes to the orders scan. */
  def q35MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val econParts = Tables.part(spark, dir)
      .filter(col("p_type") === "ECONOMY").select(col("p_partkey"))
    val asiaNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cn_key"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    Tables.lineitem(spark, dir)
      .join(econParts, col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir).select(
        col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(asiaNations), col("c_nationkey") === col("cn_key"), "left_semi")
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        (sum(when(col("supp_nation") === "NATION_7", revenue)).cast("double") /
          sum(revenue).cast("double")).as("mkt_share"),
        sum(revenue).cast("double").as("total_volume"))
      .orderBy(col("o_year"))
  }

  val q35Sql: String =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |  CAST(sum(CASE WHEN sn.n_name = 'NATION_7'
      |    THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) END) AS DOUBLE)
      |    / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
      |    AS mkt_share,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
      |    AS total_volume
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE p_type = 'ECONOMY'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND c_nationkey IN (
      |    SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
      |    WHERE r_name = 'ASIA')
      |GROUP BY 1 ORDER BY o_year""".stripMargin

  /** q36: supplier diversity per part line (TPC-H Q16 pattern, minus
    * partsupp — supply relationships derive from lineitem). Counts
    * DISTINCT suppliers per (brand, type, size) for selected sizes,
    * excluding flagged suppliers (negative balance — the schema's
    * stand-in for Q16's complaints filter) via an ANTI join on the
    * pre-filtered set. Both part and the flagged-supplier set scale
    * with SF (the filters shrink them by constant factors only), so
    * neither join is hinted — AQE broadcasts at test SF, SMJ at scale;
    * count_distinct runs with partial_merge two-phase aggregation —
    * no row data concentrates on one node. */
  def q36SupplierDiversity(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir)
      .filter(col("p_size").isin(1, 5, 9) && col("p_brand") =!= "Brand#9")
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val flagged = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    Tables.lineitem(spark, dir)
      .join(parts, col("l_partkey") === col("p_partkey"))
      .join(flagged, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val q36Sql: String =
    """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_size IN (1, 5, 9) AND p_brand <> 'Brand#9'
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** q37: suppliers who alone held up multi-supplier orders (TPC-H Q21
    * pattern, lateness re-expressed on this schema: a supplier is late
    * on an order when its last shipment left more than 90 days after
    * the order date — the schema has no commit/receipt dates). The
    * textbook form needs TWO correlated lineitem subqueries (EXISTS
    * another supplier / NOT EXISTS another LATE supplier); here both
    * decorrelate into counts over an order-keyed window on the ALREADY
    * REDUCED (order, supplier) frame — lineitem is scanned ONCE,
    * reduced map-side before anything shuffles, and the window reuses
    * the orders-join partitioning on the order key. The oracle keeps
    * the textbook EXISTS/NOT-EXISTS form, proving the one-scan plan
    * computes the classic semantics. */
  def q37BlameSupplier(spark: SparkSession, dir: String): DataFrame = {
    val perOrderSupp = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("l_shipdate")).as("last_ship"))
    val fOrders = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val wOrd = Window.partitionBy(col("l_orderkey"))
    perOrderSupp.join(fOrders, col("l_orderkey") === col("o_orderkey"))
      .withColumn("late", col("last_ship") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .withColumn("n_supp", count(lit(1)).over(wOrd))
      .withColumn("n_late", sum(when(col("late"), 1L).otherwise(0L)).over(wOrd))
      .filter(col("late") && col("n_supp") > 1 && col("n_late") === 1)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      // supplier scales with SF — un-hinted; AQE picks the strategy
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }

  val q37Sql: String =
    """WITH os AS (
      |  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS last_ship
      |  FROM lineitem GROUP BY 1, 2),
      |flag AS (
      |  SELECT os.*, (last_ship > o_orderdate + INTERVAL 90 DAY) AS late
      |  FROM os JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F')
      |SELECT s_name, count(*) AS numwait
      |FROM flag f JOIN supplier ON f.l_suppkey = s_suppkey
      |WHERE f.late
      |  AND EXISTS (SELECT 1 FROM flag f2
      |    WHERE f2.l_orderkey = f.l_orderkey AND f2.l_suppkey <> f.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM flag f3
      |    WHERE f3.l_orderkey = f.l_orderkey AND f3.l_suppkey <> f.l_suppkey AND f3.late)
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin

  /** q38: supplier concentration per part (TPC-H Q20 flavor, minus
    * partsupp): (part, supplier) pairs where one supplier shipped more
    * than 20% of the part's total quantity — the supply-risk signal a
    * sourcing pipeline flags. Lineitem reduces map-side to one row per
    * (part, supplier) before the shuffle; the part total is a window
    * over that reduced frame (only reduced rows re-exchange, never the
    * corpus); the threshold compares qty*5 > total in exact DECIMAL
    * (division-free — the one double division produces the reported
    * share only). The part/supplier enrichment joins are un-hinted —
    * both dims scale with SF (~20 B / ~1 B rows at 100 TB); AQE
    * broadcasts them at test SF, SMJ at scale. */
  def q38PartShare(spark: SparkSession, dir: String): DataFrame = {
    val ps = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(dec2(col("l_quantity"))).as("qty_dec"))
    ps.withColumn("tot_dec", sum(col("qty_dec")).over(Window.partitionBy(col("l_partkey"))))
      .filter(col("qty_dec") * 5 > col("tot_dec"))
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("s_name"),
        col("qty_dec").cast("double").as("supp_qty"),
        (col("qty_dec").cast("double") / col("tot_dec").cast("double")).as("share"))
      .orderBy(col("p_partkey"), col("s_name"))
  }

  val q38Sql: String =
    """WITH ps AS (
      |  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty_dec
      |  FROM lineitem GROUP BY 1, 2),
      |w AS (
      |  SELECT *, sum(qty_dec) OVER (PARTITION BY l_partkey) AS tot_dec FROM ps)
      |SELECT p_partkey, p_name, s_name,
      |  CAST(qty_dec AS DOUBLE) AS supp_qty,
      |  CAST(qty_dec AS DOUBLE) / CAST(tot_dec AS DOUBLE) AS share
      |FROM w
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |WHERE qty_dec * 5 > tot_dec
      |ORDER BY p_partkey, s_name""".stripMargin

  /** q39: year-over-year revenue growth per customer nation — the
    * trend report behind q29/q35's snapshots. The fact reduces to
    * (nation, year) revenue in one pass (dims broadcast, one group
    * exchange); growth is a lag window over the REDUCED frame
    * (|nations|·|years| rows), DECIMAL sums with a single final double
    * division per output row. NULL growth on each nation's first year
    * (no prior), by construction in both engines. */
  def q39YoyGrowth(spark: SparkSession, dir: String): DataFrame = {
    // spread loaders (guide §2.5): r16 A/B-measured win (1.37 -> 0.92)
    val per = Tables.spread(spark, dir, "lineitem", "l_orderkey")
      .join(Tables.spread(spark, dir, "orders", "o_orderkey"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(revenue).as("rev_dec"))
    per
      .withColumn("prev_dec",
        lag(col("rev_dec"), 1).over(
          Window.partitionBy(col("nation")).orderBy(col("o_year"))))
      .select(col("nation"), col("o_year"),
        col("rev_dec").cast("double").as("revenue"),
        ((col("rev_dec") - col("prev_dec")).cast("double") /
          col("prev_dec").cast("double")).as("yoy_growth"))
      .orderBy(col("nation"), col("o_year"))
  }

  val q39Sql: String =
    """WITH per AS (
      |  SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |    sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS rev_dec
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1, 2),
      |w AS (
      |  SELECT *, lag(rev_dec) OVER (PARTITION BY nation ORDER BY o_year) AS prev_dec
      |  FROM per)
      |SELECT nation, o_year, CAST(rev_dec AS DOUBLE) AS revenue,
      |  CAST(rev_dec - prev_dec AS DOUBLE) / CAST(prev_dec AS DOUBLE) AS yoy_growth
      |FROM w ORDER BY nation, o_year""".stripMargin

  /** q40: 90-day rolling revenue per customer nation (1997) — the
    * RANGE-frame window capability (q23's cumulative frame is
    * ROWS-based; this frame is VALUE-based: all days within 89 of the
    * current day, present or not). The order key is an integer day
    * number (epoch days), so the range frame is engine-portable —
    * RANGE over raw timestamps drags engine-specific interval
    * semantics into the frame boundary. One fact pass reduces to
    * (nation, day) DECIMAL revenue; the window slides over that
    * reduced frame. */
  def q40RollingRevenue(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), to_date(col("o_orderdate")).as("o_date"))
      .agg(sum(revenue).as("day_dec"))
      .withColumn("day_num", datediff(col("o_date"), lit("1970-01-01").cast("date")))
    per
      .withColumn("roll_dec", sum(col("day_dec")).over(
        Window.partitionBy(col("nation")).orderBy(col("day_num"))
          .rangeBetween(-89, Window.currentRow)))
      .select(col("nation"), col("o_date"),
        col("day_dec").cast("double").as("day_revenue"),
        col("roll_dec").cast("double").as("rolling_90d_revenue"))
      .orderBy(col("nation"), col("o_date"))
  }

  val q40Sql: String =
    """WITH per AS (
      |  SELECT n_name AS nation, CAST(o_orderdate AS DATE) AS o_date,
      |    sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS day_dec,
      |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_num
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |  GROUP BY 1, 2, 4)
      |SELECT nation, o_date,
      |  CAST(day_dec AS DOUBLE) AS day_revenue,
      |  CAST(sum(day_dec) OVER (PARTITION BY nation ORDER BY day_num
      |    RANGE BETWEEN 89 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_90d_revenue
      |FROM per ORDER BY nation, o_date""".stripMargin

  /** q41: exact INTERPOLATED quartiles per group (percentile_cont
    * semantics — q21's rank selection is the discrete variant; this is
    * the linear-interpolation one: h = (n−1)p, value = v⌊h⌋ + frac·Δ).
    * Spark's exact `percentile` aggregate is sort-based per group, not
    * a float accumulation, so results are parallelism-independent; on
    * l_quantity (small integers) with quarter positions the
    * interpolation arithmetic is exactly representable in binary
    * floats, which is what makes the cross-engine hash match exact
    * rather than approximate. One scan, one group exchange; the 100 TB
    * variant at hot group cardinalities is q22's quantile sketch. */
  def q41QuartilesCont(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))").as("qs"),
        count(lit(1)).as("n_rows"))
      .select(col("l_returnflag"),
        element_at(col("qs"), 1).as("q1"),
        element_at(col("qs"), 2).as("median"),
        element_at(col("qs"), 3).as("q3"),
        col("n_rows"))
      .orderBy(col("l_returnflag"))

  val q41Sql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS q1,
      |  quantile_cont(l_quantity, 0.5) AS median,
      |  quantile_cont(l_quantity, 0.75) AS q3,
      |  count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q42: min-cost supplier per part (the TPC-H Q2 correlated-subquery
    * pattern, re-expressed without partsupp): among suppliers in one
    * region, each part's cheapest observed line price and the
    * supplier(s) offering it — ties kept, like Q2. Decorrelated form:
    * aggregate (part, supplier) minima once, take the per-part min as a
    * window over that REDUCED frame (fan-out = suppliers-per-part, not
    * line count), keep equal rows. The correlated-subquery rewrite is
    * exactly what Q2 needs at scale — never a per-row subquery. All
    * comparisons in DECIMAL: min/equality on l_extendedprice are exact,
    * so the argmin can't flip with parallelism (an avg-based cost would
    * tie-break on float dust). The dim chain region→nation prunes the
    * supplier side before the fact join, but the pruned supplier frame
    * still scales with SF (a region keeps ~1/5 of ~1 B rows at 100 TB)
    * so the fact join carries no hint — AQE broadcasts at test SF. */
  def q42MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val euSupp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    Tables.lineitem(spark, dir)
      .join(euSupp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"), col("s_name"), col("n_name"))
      .agg(min(col("l_extendedprice")).as("best_price_dec"))
      .withColumn("part_min",
        min(col("best_price_dec")).over(Window.partitionBy(col("l_partkey"))))
      .filter(col("best_price_dec") === col("part_min"))
      .select(col("l_partkey").as("partkey"), col("l_suppkey").as("suppkey"),
        col("s_name"), col("n_name").as("nation"),
        col("best_price_dec").cast("double").as("best_price"))
      .orderBy(col("partkey"), col("suppkey"))
  }

  val q42Sql: String =
    """WITH eu AS (
      |  SELECT s_suppkey, s_name, n_name
      |  FROM supplier
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'),
      |agg AS (
      |  SELECT l_partkey AS partkey, l_suppkey AS suppkey, s_name, n_name AS nation,
      |    min(l_extendedprice) AS best_price_dec
      |  FROM lineitem JOIN eu ON l_suppkey = s_suppkey
      |  GROUP BY 1, 2, 3, 4),
      |w AS (
      |  SELECT *, min(best_price_dec) OVER (PARTITION BY partkey) AS part_min FROM agg)
      |SELECT partkey, suppkey, s_name, nation, CAST(best_price_dec AS DOUBLE) AS best_price
      |FROM w WHERE best_price_dec = part_min
      |ORDER BY partkey, suppkey""".stripMargin

  /** q43: dominant-supplier audit — the last TPC-H pattern (Q20's
    * correlated nested aggregate comparing a supplier's quantity against
    * a per-part aggregate threshold) not yet in the suite, decorrelated
    * the Q2/Q42 way. Dominance is RELATIVE to the part's fair share —
    * a supplier holding > 2x the uniform share (sq·n_suppliers > 2·total,
    * all DECIMAL/integer-exact cross-multiplication, no float division)
    * — because an absolute >50% cut degenerates as supplier counts grow
    * with scale. The inner per-(supplier, part) aggregate runs ONCE over
    * ONE fact scan; the per-part total and supplier count that Q20
    * re-derives in a correlated subquery are windows over that
    * already-reduced frame (never a second lineitem scan + join-back).
    * Only the 25-row nation dim is hinted in the enrichment chain;
    * supplier scales with SF and joins un-hinted. */
  def q43DominantSupplier(spark: SparkSession, dir: String): DataFrame = {
    val ps = Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(dec2(col("l_quantity"))).as("sq"))
    val wPart = Window.partitionBy(col("l_partkey"))
    val dom = ps
      .withColumn("part_total", sum(col("sq")).over(wPart))
      .withColumn("n_supp", count(lit(1)).over(wPart))
      .filter(col("sq") * col("n_supp") > col("part_total") * 2)
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n_dominated_parts"))
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    dom.join(supp, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"), col("n_dominated_parts"))
      .orderBy(col("s_suppkey"))
  }

  val q43Sql: String =
    """WITH ps AS (
      |  SELECT l_suppkey, l_partkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS sq
      |  FROM lineitem GROUP BY 1, 2),
      |w AS (
      |  SELECT l_suppkey, sq, sum(sq) OVER (PARTITION BY l_partkey) AS part_total,
      |    count(*) OVER (PARTITION BY l_partkey) AS n_supp
      |  FROM ps),
      |dom AS (
      |  SELECT l_suppkey, count(*) AS n_dominated_parts FROM w
      |  WHERE sq * n_supp > part_total * 2 GROUP BY 1)
      |SELECT s_suppkey, s_name, n_name, n_dominated_parts
      |FROM dom
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |ORDER BY s_suppkey""".stripMargin

  /** q44: exact per-group MODE — the one basic order statistic the
    * suite lacked beside median (q21/q41) and quantiles (q22/q25): the
    * most frequent order priority per customer nation, with the
    * deterministic tie rule (higher count wins, then lexicographically
    * smaller priority — engines disagree on arbitrary-tie mode, so the
    * rule is explicit and portable).
    *
    * Shape: orders ⋈ customer is a fact-fact shuffle on the customer
    * key (q29's adjudication: customer is NOT broadcastable), nation
    * broadcasts, then one (nation, priority) reduce to ≤ |nations|·
    * |priorities| rows; the argmax is a row_number window over that
    * reduced frame, never over fact rows. */
  def q44ModePriority(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("n_name"))
      .orderBy(col("n_orders").desc, col("o_orderpriority"))
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("n_name"), col("o_orderpriority").as("mode_priority"), col("n_orders"))
      .orderBy(col("n_name"))
  }

  val q44Sql: String =
    """WITH cnt AS (
      |  SELECT n_name, o_orderpriority, count(*) AS n_orders
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY n_name
      |    ORDER BY n_orders DESC, o_orderpriority) AS rn
      |  FROM cnt)
      |SELECT n_name, o_orderpriority AS mode_priority, n_orders
      |FROM r WHERE rn = 1 ORDER BY n_name""".stripMargin

  /** q45: equal-width HISTOGRAM per market segment — the fixed-bin
    * density card next to the quantile family (q25 deciles, q41
    * quartiles): order-value counts in $50k bins with each bin's share
    * of its segment in integer basis points.
    *
    * Bin assignment is DECIMAL-exact: o_totalprice is a 2-decimal
    * quantity, so `dec2(price)·100` is an exact integer cents value and
    * the bin is integer division — never `floor(double/width)`, whose
    * repr error (123.45·100 = 12344.999…) can misplace boundary values.
    *
    * Shape: orders⋈customer is a fact-fact shuffle on the customer key
    * (q29's adjudication: customer is NOT broadcastable), reduced
    * map-side to ≤ |segments|·|bins| rows; the per-segment total is a
    * window over that reduced frame, never a second scan.
    *
    * PRECONDITION (r6 advice): the `div`/`//` equivalence here relies on
    * Spark `div` truncating toward zero while DuckDB `//` floors —
    * identical ONLY because o_totalprice and the counts are nonnegative
    * and the cents value is an exact integer after the DECIMAL(12,2)
    * cast. Do NOT reuse this idiom on signed or non-2-decimal data;
    * use a pmod-based floor division in both engines instead. */
  def q45PriceHistogram(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        expr("cast(cast(o_totalprice AS decimal(12,2)) * 100 AS bigint) div 5000000").as("bin"),
        dec2(col("o_totalprice")).as("price_dec"))
    val wSeg = Window.partitionBy(col("c_mktsegment"))
    o.groupBy(col("c_mktsegment"), col("bin"))
      .agg(count(lit(1)).as("n_orders"), sum(col("price_dec")).as("rev_dec"))
      .withColumn("seg_total", sum(col("n_orders")).over(wSeg))
      .select(col("c_mktsegment"), (col("bin") * 50000L).as("bucket_lo"),
        col("n_orders"), col("rev_dec").cast("double").as("revenue"),
        expr("(n_orders * 10000) div seg_total").as("share_bp"))
      .orderBy(col("c_mktsegment"), col("bucket_lo"))
  }

  val q45Sql: String =
    """WITH b AS (
      |  SELECT c_mktsegment,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) // 5000000 AS bin,
      |    CAST(o_totalprice AS DECIMAL(12,2)) AS price_dec
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |g AS (
      |  SELECT c_mktsegment, bin, count(*) AS n_orders, sum(price_dec) AS rev_dec
      |  FROM b GROUP BY 1, 2),
      |w AS (
      |  SELECT *, CAST(sum(n_orders) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS seg_total
      |  FROM g)
      |SELECT c_mktsegment, bin * 50000 AS bucket_lo, n_orders,
      |  CAST(rev_dec AS DOUBLE) AS revenue,
      |  (n_orders * 10000) // seg_total AS share_bp
      |FROM w ORDER BY c_mktsegment, bucket_lo""".stripMargin

  /** q46: exact per-group WEIGHTED median — the weighted sibling of
    * q21 (discrete median) and q41 (interpolated quartiles): per return
    * flag, the smallest extended price at which cumulative shipped
    * quantity reaches half the group total. The crossing test is the
    * division-free DECIMAL form `2·cum ≥ total` (exact — never
    * `cum ≥ total/2` through a double).
    *
    * Shape: lineitem reduces FIRST to (flag, price) quantity sums — the
    * cumulative window then sorts the reduced frame, not fact rows
    * (q21's adjudication: an exact order statistic needs one ordered
    * pass per group; the 100 TB escape hatch is the q22 sketch). The
    * winner per flag is a min over the qualifying suffix, not a second
    * window. */
  def q46WeightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val byPrice = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), dec2(col("l_extendedprice")).as("price_dec"))
      .agg(sum(dec2(col("l_quantity"))).as("qty"))
    val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("price_dec"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("l_returnflag"))
    byPrice
      .withColumn("cum", sum(col("qty")).over(wCum))
      .withColumn("total", sum(col("qty")).over(wAll))
      .filter(col("cum") * 2 >= col("total"))
      .groupBy(col("l_returnflag"))
      .agg(min(col("price_dec")).cast("double").as("weighted_median_price"),
        min(col("total")).cast("double").as("total_qty"))
      .orderBy(col("l_returnflag"))
  }

  val q46Sql: String =
    """WITH g AS (
      |  SELECT l_returnflag, CAST(l_extendedprice AS DECIMAL(12,2)) AS price_dec,
      |    sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty
      |  FROM lineitem GROUP BY 1, 2),
      |w AS (
      |  SELECT l_returnflag, price_dec, qty,
      |    sum(qty) OVER (PARTITION BY l_returnflag ORDER BY price_dec
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(qty) OVER (PARTITION BY l_returnflag) AS total
      |  FROM g)
      |SELECT l_returnflag,
      |  CAST(min(price_dec) AS DOUBLE) AS weighted_median_price,
      |  CAST(min(total) AS DOUBLE) AS total_qty
      |FROM w WHERE cum * 2 >= total
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q47: gaps-and-islands over each customer's order sequence — the
    * classic inter-arrival analysis (reorder cadence): per customer
    * with ≥ 2 orders, the day gaps between consecutive orders via one
    * lag over the (o_orderdate, o_orderkey)-ordered per-customer
    * window, reduced to count / max / mean gap. The mean is the exact
    * double quotient of two integers (sum_gap_days / (n-1)) —
    * bit-identical IEEE division in both engines, never an
    * order-dependent double sum.
    *
    * Shape: ONE orders scan, one shuffle on o_custkey shared by the
    * lag window and the groupBy (same key — Catalyst reuses the
    * exchange), output is customer-sized. At 100 TB this is the only
    * shape: the gap computation never leaves the per-customer
    * partition. */
  def q47OrderGaps(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      .withColumn("gap_days",
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)).cast("long"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        max(col("gap_days")).as("max_gap_days"),
        sum(col("gap_days")).as("sum_gap"))
      .filter(col("n_orders") >= 2)
      .select(col("o_custkey"), col("n_orders"), col("max_gap_days"),
        (col("sum_gap").cast("double") / (col("n_orders") - 1)).as("avg_gap_days"))
      .orderBy(col("o_custkey"))
  }

  val q47Sql: String =
    """WITH g AS (
      |  SELECT o_custkey, CAST(datediff('day',
      |      lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |      o_orderdate) AS BIGINT) AS gap_days
      |  FROM orders),
      |a AS (
      |  SELECT o_custkey, count(*) AS n_orders, max(gap_days) AS max_gap_days,
      |    CAST(sum(gap_days) AS BIGINT) AS sum_gap
      |  FROM g GROUP BY 1)
      |SELECT o_custkey, n_orders, max_gap_days,
      |  CAST(sum_gap AS DOUBLE) / (n_orders - 1) AS avg_gap_days
      |FROM a WHERE n_orders >= 2 ORDER BY o_custkey""".stripMargin

  /** q48: year-over-year revenue-decile transition matrix — the
    * customer-migration report (who moved between spend tiers): per
    * (customer, year) revenue reduces from ONE orders scan, ntile(10)
    * assigns the decile inside each year (ties broken deterministically
    * on (rev desc, custkey) — engines disagree on arbitrary-tie ntile),
    * a per-customer lag pairs consecutive years, and the transition
    * counts reduce to ≤ years·10·10 rows.
    *
    * Shape: two window passes over the ALREADY-REDUCED (customer,
    * year) frame — never over order rows — then a tiny groupBy. The
    * ntile window partitions by year (few partitions, each
    * customer-sized): at extreme customer counts the in-year sort is
    * the cost, and the sketch escape hatch is approx percentile
    * bucketing (q22's machinery) — exactness is the point here. */
  def q48DecileShift(spark: SparkSession, dir: String): DataFrame = {
    val byYear = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"), year(col("o_orderdate")).as("y"))
      .agg(sum(dec2(col("o_totalprice"))).as("rev"))
    val wD = Window.partitionBy(col("y")).orderBy(col("rev").desc, col("o_custkey"))
    val wC = Window.partitionBy(col("o_custkey")).orderBy(col("y"))
    byYear
      .withColumn("decile", ntile(10).over(wD))
      .withColumn("prev_y", lag(col("y"), 1).over(wC))
      .withColumn("from_decile", lag(col("decile"), 1).over(wC))
      .filter(col("prev_y") === col("y") - 1)
      .groupBy(col("y"), col("from_decile"), col("decile").as("to_decile"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("y"), col("from_decile"), col("to_decile"))
  }

  val q48Sql: String =
    """WITH by_year AS (
      |  SELECT o_custkey, year(o_orderdate) AS y,
      |    sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
      |  FROM orders GROUP BY 1, 2),
      |d AS (
      |  SELECT o_custkey, y,
      |    ntile(10) OVER (PARTITION BY y ORDER BY rev DESC, o_custkey) AS decile
      |  FROM by_year),
      |t AS (
      |  SELECT y, decile,
      |    lag(y) OVER w AS prev_y, lag(decile) OVER w AS from_decile
      |  FROM d WINDOW w AS (PARTITION BY o_custkey ORDER BY y))
      |SELECT y, from_decile, decile AS to_decile, count(*) AS n_customers
      |FROM t WHERE prev_y = y - 1
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** q49: relative standing — percent_rank and cume_dist per market
    * segment (the two rank-family window functions the suite didn't
    * yet exercise; q7 covers rank, q25 ntile, q48 decile lag): each
    * order's standing by price inside its segment, sampled to every
    * 100th order key AFTER ranking (the rank needs the full frame;
    * the report doesn't). Both functions are exact IEEE quotients of
    * rank integers — portable — but ONLY under a total order: ties in
    * o_totalprice would make percent_rank engine-arbitrary, so the
    * order key breaks them deterministically.
    *
    * Shape: orders⋈customer shuffles on the customer key (q29's
    * adjudication), one segment-keyed window sort, filter after. */
  def q49PercentRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .filter(pmod(col("o_orderkey"), lit(100)) === 0)
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"),
        col("pct_rank"), col("cume"))
      .orderBy(col("c_mktsegment"), col("o_orderkey"))
  }

  val q49Sql: String =
    """WITH j AS (
      |  SELECT c_mktsegment, o_orderkey, o_totalprice
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |r AS (
      |  SELECT *,
      |    percent_rank() OVER w AS pct_rank,
      |    cume_dist() OVER w AS cume
      |  FROM j WINDOW w AS (PARTITION BY c_mktsegment ORDER BY o_totalprice, o_orderkey))
      |SELECT c_mktsegment, o_orderkey, o_totalprice, pct_rank, cume
      |FROM r WHERE o_orderkey % 100 = 0
      |ORDER BY c_mktsegment, o_orderkey""".stripMargin

  /** q50: shipping-delay profile per order priority — TPC-H Q12's
    * question (does low priority mean slow shipping?) re-expressed on
    * this schema's columns (no l_shipmode/commitdate here): delay =
    * ship date − order date in days, profiled per priority class with
    * volume, beyond-60-day share in exact bp, and the exact discrete
    * median delay via the crossing pattern (c18/q46): delays reduce
    * FIRST to (priority, delay) counts, the median walks that reduced
    * frame.
    *
    * Shape: lineitem⋈orders is the fact-fact shuffle on the order key
    * (neither side broadcastable), immediately reduced map-side to
    * (priority, delay-day) counts — bounded cardinality — before any
    * window. */
  def q50ShipDelay(spark: SparkSession, dir: String): DataFrame = {
    val byVal = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority")), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long").as("delay_days"))
      .groupBy(col("o_orderpriority"), col("delay_days"))
      .agg(count(lit(1)).as("n"))
    val wCum = Window.partitionBy(col("o_orderpriority")).orderBy(col("delay_days"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("o_orderpriority"))
    byVal
      .withColumn("cum", sum(col("n")).over(wCum))
      .withColumn("total", sum(col("n")).over(wAll))
      .groupBy(col("o_orderpriority"))
      .agg(max(col("total")).as("n_items"),
        sum(when(col("delay_days") > 60L, col("n")).otherwise(0L)).as("n_slow"),
        min(when(col("cum") * 2 >= col("total"), col("delay_days"))).as("p50_delay_days"),
        max(col("delay_days")).as("max_delay_days"))
      .select(col("o_orderpriority"), col("n_items"), col("n_slow"),
        expr("(n_slow * 10000) div n_items").as("slow_bp"),
        col("p50_delay_days"), col("max_delay_days"))
      .orderBy(col("o_orderpriority"))
  }

  val q50Sql: String =
    """WITH j AS (
      |  SELECT o_orderpriority,
      |    CAST(datediff('day', CAST(o_orderdate AS DATE),
      |      CAST(CAST(l_shipdate AS TIMESTAMP) AS DATE)) AS BIGINT) AS delay_days
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |v AS (SELECT o_orderpriority, delay_days, count(*) AS n FROM j GROUP BY 1, 2),
      |r AS (
      |  SELECT *,
      |    CAST(sum(n) OVER (PARTITION BY o_orderpriority ORDER BY delay_days
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |    CAST(sum(n) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS total
      |  FROM v),
      |a AS (
      |  SELECT o_orderpriority, max(total) AS n_items,
      |    CAST(sum(CASE WHEN delay_days > 60 THEN n ELSE 0 END) AS BIGINT) AS n_slow,
      |    min(CASE WHEN cum * 2 >= total THEN delay_days END) AS p50_delay_days,
      |    max(delay_days) AS max_delay_days
      |  FROM r GROUP BY 1)
      |SELECT o_orderpriority, n_items, n_slow,
      |  (n_slow * 10000) // n_items AS slow_bp,
      |  p50_delay_days, max_delay_days
      |FROM a ORDER BY o_orderpriority""".stripMargin

  /** Grid cell size for q51's spatial join (coordinate space 0..10⁶,
    * so 10×10 cells at sf-independent density; at real scale the cell
    * size is chosen from point density the same way). */
  val GridCell = 100000L
  private val GridSpan = 1000000L

  /** q51: grid-bucketed nearest-neighbor join — the SPATIAL join class
    * (nearest store/warehouse/city assignment; the reference's domain
    * is literally city data). Each customer finds its nearest supplier
    * in synthetic planar coordinates. No geometry columns ship in the
    * star schema, so points derive row-locally from the keys (Knuth
    * multiplicative hash onto a 10⁶×10⁶ grid — the d18/d40 injection
    * idiom; the pre-mask keeps products < 2^63 in every engine,
    * VectorOps:322). Distance is squared Euclidean in EXACT integer
    * arithmetic (no sqrt — monotone, and portable where libm sin/cos
    * tie-break differently across engines).
    *
    * Shape — the standard distributed spatial join: suppliers bucket
    * to their grid cell ONCE; each customer explodes to its 3×3
    * neighbor cells (bounded 9× fan-out of the probe side only, the
    * multiprobe-LSH discipline) and meets suppliers in a plain
    * equi-join on the cell key — NEVER a customer×supplier cross
    * join. Winner per customer = lexicographic min(struct(d², key))
    * — an aggregate with map-side partials (the d28 max_by idiom),
    * no per-customer window. Search radius is one cell: customers
    * with no supplier within the 3×3 neighborhood emit no row (the
    * documented bounded-radius contract; a real deployment sizes
    * cells from supplier density exactly like this testdata does).
    * At 100 TB the only exchange is the cell-key shuffle; a hot cell
    * bounds at cell population and salts like any hot join key. */
  def q51NearestSupplier(spark: SparkSession, dir: String): DataFrame = {
    def px(k: Column): Column = pmod(pmod(k, lit(2147483648L)) * lit(2654435761L), lit(GridSpan))
    def py(k: Column): Column = pmod(pmod(k, lit(2147483648L)) * lit(2246822519L), lit(GridSpan))
    val sup = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), px(col("s_suppkey")).as("sx"), py(col("s_suppkey")).as("sy"))
      .withColumn("cell_x", expr(s"sx div $GridCell"))
      .withColumn("cell_y", expr(s"sy div $GridCell"))
    val probes = Tables.customer(spark, dir)
      .select(col("c_custkey"), px(col("c_custkey")).as("cx"), py(col("c_custkey")).as("cy"))
      .withColumn("d", explode(expr("sequence(-1, 1)")))
      .withColumn("e", explode(expr("sequence(-1, 1)")))
      .select(col("c_custkey"), col("cx"), col("cy"),
        (expr(s"cx div $GridCell") + col("d")).as("cell_x"),
        (expr(s"cy div $GridCell") + col("e")).as("cell_y"))
    probes.join(sup, Seq("cell_x", "cell_y"))
      .select(col("c_custkey"),
        struct(
          ((col("cx") - col("sx")) * (col("cx") - col("sx")) +
            (col("cy") - col("sy")) * (col("cy") - col("sy"))).as("d2"),
          col("s_suppkey")).as("cand"))
      .groupBy(col("c_custkey"))
      .agg(min(col("cand")).as("best"))
      .select(col("c_custkey"), col("best.s_suppkey").as("s_suppkey"),
        col("best.d2").as("dist2"))
      .orderBy(col("c_custkey"))
  }

  val q51Sql: String =
    s"""WITH cust AS (
       |  SELECT c_custkey,
       |    ((c_custkey % 2147483648) * 2654435761) % $GridSpan AS cx,
       |    ((c_custkey % 2147483648) * 2246822519) % $GridSpan AS cy
       |  FROM customer),
       |sup AS (
       |  SELECT s_suppkey,
       |    ((s_suppkey % 2147483648) * 2654435761) % $GridSpan AS sx,
       |    ((s_suppkey % 2147483648) * 2246822519) % $GridSpan AS sy
       |  FROM supplier),
       |cand AS (
       |  SELECT c.c_custkey, s.s_suppkey,
       |    (c.cx - s.sx) * (c.cx - s.sx) + (c.cy - s.sy) * (c.cy - s.sy) AS d2
       |  FROM cust c JOIN sup s
       |    ON (s.sx // $GridCell) BETWEEN (c.cx // $GridCell) - 1 AND (c.cx // $GridCell) + 1
       |   AND (s.sy // $GridCell) BETWEEN (c.cy // $GridCell) - 1 AND (c.cy // $GridCell) + 1),
       |w AS (
       |  SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY d2, s_suppkey) AS rn
       |  FROM cand)
       |SELECT c_custkey, s_suppkey, d2 AS dist2 FROM w WHERE rn = 1
       |ORDER BY c_custkey""".stripMargin

  /** q52: full CUBE aggregation — the last member of the
    * multi-granularity family (q8 ROLLUP is the hierarchy prefix set,
    * q18 GROUPING SETS the hand-picked set; CUBE is all 2ᵏ margins):
    * revenue and volume for every (returnflag × linestatus) margin in
    * one pass — Spark expands grouping sets map-side, so the corpus is
    * scanned ONCE and only the expanded aggregate rows shuffle.
    * Aggregation levels are reported via 'ALL' labels (both columns
    * are non-null in the data, so coalesce is unambiguous) — portable
    * where grouping_id bit order is engine-specific. Money stays
    * DECIMAL until the final double cast (Cols.dec2 discipline). */
  def q52Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"), dec2(col("l_extendedprice")).as("p"))
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"), sum(col("p")).cast("double").as("revenue"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n_items"), col("revenue"))
      .orderBy(col("returnflag"), col("linestatus"))

  val q52Sql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |  coalesce(l_linestatus, 'ALL') AS linestatus,
      |  count(*) AS n_items,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** q53: Gini coefficient of customer spend per nation — the INEQUALITY
    * statistic behind mixture/curation decisions (d21/d30 cap domains by
    * share; this measures how unequal the shares are). Exact integer
    * arithmetic end-to-end: spend in cents, and the rank-weighted sum
    * Σᵢ i·xᵢ computed from the VALUE-GROUPED distribution — tied spends
    * collapse to one (nation, cents, cnt) row whose rank-sum is
    * cnt·C_prev + cnt(cnt+1)/2 in closed form — so the per-nation window
    * runs over the distinct-value frame, never the per-customer frame
    * (the q45/q50 reduce-first discipline; distinct spend values are
    * bounded by the price domain, not the corpus). G in basis points via
    * one integral division of DECIMAL(38,0) sums — Σ i·xᵢ reaches
    * n·S ≈ 10²³ at 100 TB, past BIGINT, inside DECIMAL(38,0).
    *
    * Shape: one fact agg (custkey), one key-partitioned customer join
    * (customer is fact-sized — never broadcast, the q44 adjudication),
    * one reduce to (nation, cents), window + final agg on the reduced
    * frame. Gini: G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ), ranks ascending. */
  def q53Gini(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg((sum(dec2(col("o_totalprice"))) * 100).cast("long").as("cents"))
    val nat = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    val byVal = spend.join(nat, col("o_custkey") === col("c_custkey"))
      .groupBy(col("n_name"), col("cents"))
      .agg(count(lit(1)).as("cnt"))
    val wPrev = Window.partitionBy(col("n_name")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byVal
      .withColumn("c_prev", coalesce(sum(col("cnt")).over(wPrev), lit(0L)))
      // rank-sum of a tied block in closed form; cnt·(cnt+1) is even so
      // the integral division is exact. Products stay < 2^63 (counts),
      // then promote to DECIMAL(38,0) for the value-weighted sums.
      .withColumn("rank_sum", col("cnt") * col("c_prev") + expr("(cnt * (cnt + 1)) div 2"))
      .groupBy(col("n_name"))
      .agg(
        sum(col("cnt")).as("n"),
        sum(col("cents").cast(DecimalType(38, 0)) * col("cnt")).as("s"),
        sum(col("cents").cast(DecimalType(38, 0)) * col("rank_sum")).as("s1"))
      .select(col("n_name"), col("n").as("n_cust"),
        expr("(10000 * (2 * s1 - (n + 1) * s)) div (n * s)").as("gini_bp"))
      .orderBy(col("n_name"))
  }

  val q53Sql: String =
    """WITH spend AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |nat AS (
      |  SELECT c_custkey, n_name FROM customer JOIN nation ON c_nationkey = n_nationkey),
      |byval AS (
      |  SELECT n_name, cents, count(*) AS cnt
      |  FROM spend JOIN nat ON o_custkey = c_custkey GROUP BY 1, 2),
      |wc AS (
      |  SELECT n_name, cents, cnt,
      |    coalesce(sum(cnt) OVER (PARTITION BY n_name ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c_prev
      |  FROM byval),
      |m AS (
      |  SELECT n_name, sum(cnt) AS n,
      |    sum(CAST(cents AS HUGEINT) * cnt) AS s,
      |    sum(CAST(cents AS HUGEINT) * (cnt * c_prev + (cnt * (cnt + 1)) // 2)) AS s1
      |  FROM wc GROUP BY 1)
      |SELECT n_name, CAST(n AS BIGINT) AS n_cust,
      |  CAST((10000 * (2 * s1 - (n + 1) * s)) // (n * s) AS BIGINT) AS gini_bp
      |FROM m ORDER BY n_name""".stripMargin

  /** q54: revenue-concentration crossing per nation — the Pareto
    * question ("how many top customers cover half the revenue") as the
    * a28/q46 crossing pattern: rank customers by spend desc, walk the
    * cumulative sum, report the first rank where 2·cum ≥ total plus
    * that prefix's exact share in bp. The complement of q53: Gini is
    * the whole curve, this is one actionable point on it.
    *
    * Shape: per-customer spend reduce, key-partitioned customer join,
    * ONE per-nation window exchange serving both the ranked cumsum and
    * the partition total; the crossing row is picked by a min(struct)
    * aggregate (the d28 idiom), never a second window. The per-customer
    * window frame is the honest cost of an exact crossing — the sketch
    * escape is q22's percentile machinery (documented, not shipped
    * here: exactness is the point). */
  def q54ParetoCross(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg((sum(dec2(col("o_totalprice"))) * 100).cast("long").as("cents"))
    val nat = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    val wRank = Window.partitionBy(col("n_name")).orderBy(col("cents").desc, col("o_custkey"))
    spend.join(nat, col("o_custkey") === col("c_custkey"))
      .withColumn("rn", row_number().over(wRank).cast("long"))
      .withColumn("cum", sum(col("cents"))
        .over(wRank.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("cents")).over(Window.partitionBy(col("n_name"))))
      .filter(col("cum") * 2 >= col("total"))
      .groupBy(col("n_name"))
      .agg(min(struct(col("rn"), col("cum"), col("total"))).as("b"))
      .select(col("n_name"), col("b.rn").as("n_top"),
        expr("(10000 * CAST(b.cum AS DECIMAL(38,0))) div b.total").as("top_share_bp"))
      .orderBy(col("n_name"))
  }

  val q54Sql: String =
    """WITH spend AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |j AS (
      |  SELECT n_name, o_custkey, cents
      |  FROM spend JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey),
      |r AS (
      |  SELECT n_name, cents,
      |    row_number() OVER w AS rn,
      |    sum(cents) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(cents) OVER (PARTITION BY n_name) AS total
      |  FROM j WINDOW w AS (PARTITION BY n_name ORDER BY cents DESC, o_custkey)),
      |x AS (
      |  SELECT n_name, rn, cum, total,
      |    row_number() OVER (PARTITION BY n_name ORDER BY rn) AS pick
      |  FROM r WHERE cum * 2 >= total)
      |SELECT n_name, rn AS n_top,
      |  CAST((10000 * CAST(cum AS HUGEINT)) // total AS BIGINT) AS top_share_bp
      |FROM x WHERE pick = 1 ORDER BY n_name""".stripMargin

  /** q55: chi-square association audit between market segment and order
    * priority — the categorical-independence test a curation pipeline
    * runs before trusting a stratification key (if segment and priority
    * were associated, sampling by one would bias the other; the same
    * audit d16/d21 presuppose). Emits the full contingency diagnostic:
    * observed count, expected count, and the per-cell χ² contribution
    * (o·N − r·c)²/(r·c·N), both milli-scaled through INTEGRAL division
    * — deterministic in both engines, no float summation anywhere.
    * Squares run in DECIMAL(38,0) (o·N reaches 2¹² past BIGINT at test
    * scale already); beyond N ≈ 3·10⁸ rows the squared term needs a
    * pre-scale of the deviation (dev div 10³ — relative error 10⁻⁶),
    * the documented rescale.
    *
    * Shape: one fact-fact join on the customer key, immediate reduce to
    * the ≤|segs|×|prios| contingency frame; margins via three windows
    * over that 25-row frame (the q11/a22 idiom — never a second corpus
    * scan per margin). */
  def q55Chi2Assoc(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"), col("o_orderpriority").as("prio"))
      .agg(count(lit(1)).as("obs"))
    cells
      .withColumn("r", sum(col("obs")).over(Window.partitionBy(col("seg"))))
      .withColumn("c", sum(col("obs")).over(Window.partitionBy(col("prio"))))
      .withColumn("n", sum(col("obs")).over(Window.partitionBy()))
      .withColumn("dev",
        col("obs").cast(DecimalType(38, 0)) * col("n") - col("r").cast(DecimalType(38, 0)) * col("c"))
      .select(col("seg"), col("prio"), col("obs").as("observed"),
        expr("(CAST(r AS DECIMAL(38,0)) * c * 1000) div n").as("expected_milli"),
        expr("(dev * dev * 1000) div (CAST(r AS DECIMAL(38,0)) * c * n)").as("contrib_milli"))
      .orderBy(col("seg"), col("prio"))
  }

  val q55Sql: String =
    """WITH cells AS (
      |  SELECT c_mktsegment AS seg, o_orderpriority AS prio, count(*) AS obs
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |t AS (
      |  SELECT seg, prio, obs,
      |    sum(obs) OVER (PARTITION BY seg) AS r,
      |    sum(obs) OVER (PARTITION BY prio) AS c,
      |    sum(obs) OVER () AS n
      |  FROM cells),
      |d AS (
      |  SELECT seg, prio, obs, r, c, n,
      |    CAST(obs AS HUGEINT) * n - CAST(r AS HUGEINT) * c AS dev
      |  FROM t)
      |SELECT seg, prio, CAST(obs AS BIGINT) AS observed,
      |  CAST((CAST(r AS HUGEINT) * c * 1000) // n AS BIGINT) AS expected_milli,
      |  CAST((dev * dev * 1000) // (CAST(r AS HUGEINT) * c * n) AS BIGINT) AS contrib_milli
      |FROM d ORDER BY seg, prio""".stripMargin

  /** q56 bucket count (a CBO-typical histogram width). */
  val HistBuckets = 16

  /** q56: equi-depth histogram build — the optimizer-statistics
    * primitive (ANALYZE ... COMPUTE STATISTICS histograms; the
    * selectivity model zone maps (a31) and join planning read): 16
    * buckets over order price in cents, each holding ~1/16 of the rows,
    * with exact integer boundaries. Value-grouped like q53 (one row per
    * DISTINCT price — bounded by the value domain, not the corpus), so
    * the cumulative window runs over the reduced frame; a value lands
    * in the bucket of its LAST row, ((cum−1)·B) div total + 1 — the
    * deterministic discrete rule; heavy values make buckets uneven,
    * which is equi-depth-with-ties reality and exactly what the
    * optimizer needs to see. Per bucket: [lo, hi] bounds, distinct
    * values, row count, exact depth share in bp. The q22
    * approx_percentile sketch is the documented escape when even the
    * value domain is too wide to reduce. */
  def q56EquidepthHist(spark: SparkSession, dir: String): DataFrame = {
    val byVal = Tables.orders(spark, dir)
      .groupBy((dec2(col("o_totalprice")) * 100).cast("long").as("cents"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    byVal
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("total", sum(col("cnt")).over(wAll))
      .withColumn("bucket", expr(s"((cum - 1) * $HistBuckets) div total") + 1)
      .groupBy(col("bucket"))
      .agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"),
        count(lit(1)).as("n_values"), sum(col("cnt")).as("n_rows"),
        max(col("total")).as("total"))
      .select(col("bucket"), col("lo"), col("hi"), col("n_values"), col("n_rows"),
        expr("(n_rows * 10000) div total").as("depth_bp"))
      .orderBy(col("bucket"))
  }

  val q56Sql: String =
    s"""WITH byval AS (
       |  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
       |    count(*) AS cnt
       |  FROM orders GROUP BY 1),
       |c AS (
       |  SELECT cents, cnt,
       |    sum(cnt) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |    sum(cnt) OVER () AS total
       |  FROM byval),
       |b AS (
       |  SELECT cents, cnt, total,
       |    ((cum - 1) * $HistBuckets) // total + 1 AS bucket
       |  FROM c),
       |g AS (
       |  SELECT bucket, min(cents) AS lo, max(cents) AS hi,
       |    count(*) AS n_values, sum(cnt) AS n_rows, max(total) AS total
       |  FROM b GROUP BY 1)
       |SELECT CAST(bucket AS BIGINT) AS bucket, lo, hi, n_values,
       |  CAST(n_rows AS BIGINT) AS n_rows,
       |  CAST((n_rows * 10000) // total AS BIGINT) AS depth_bp
       |FROM g ORDER BY bucket""".stripMargin

  /** q57: join-cardinality estimation audit — the CBO's core formula
    * (|A ⋈ B| ≈ |A|·|B| / max(ndv_A, ndv_B), System R / Spark
    * JoinEstimation) validated against ground truth per segment: what
    * the optimizer WOULD predict for orders ⋈ customer_seg on the
    * customer key vs the exact join size, error in bp. The stats
    * consumer q56's histograms feed; running the audit is how a stats
    * pipeline learns where uniform-frequency assumptions break.
    *
    * Shape: the stats passes (fact (|A|, ndv_A) 1-row broadcast,
    * per-segment (|B|, ndv_B)) are separate scans from the truth join
    * BY DESIGN — estimates must come from base-table statistics, never
    * from the join they predict (circular), and in production they are
    * catalog reads, not scans at all; the truth side is one real
    * key-partitioned join reduced to per-segment counts. Estimate
    * arithmetic is integral (div), so the audit is engine-exact. */
  def q57CardinalityAudit(spark: SparkSession, dir: String): DataFrame = {
    val factStats = Tables.orders(spark, dir)
      .agg(count(lit(1)).as("n_a"), countDistinct(col("o_custkey")).as("ndv_a"))
    val segStats = Tables.customer(spark, dir)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_b"), countDistinct(col("c_custkey")).as("ndv_b"))
    val actual = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"))
      .agg(count(lit(1)).as("actual_rows"))
    segStats.crossJoin(broadcast(factStats))
      // n_a·n_b passes 2^63 at the 100 TB design point (|orders|·
      // per-segment |customer| ≈ 1.5e11 × 2e8) — promote one side to
      // DECIMAL(38,0) before the multiply (the q53/q55 discipline);
      // the integral div brings the estimate back to BIGINT range
      .select(col("c_mktsegment").as("seg"), col("n_b"),
        expr("(n_a * cast(n_b as decimal(38,0))) div greatest(ndv_a, ndv_b)").as("est_rows"))
      .join(actual, Seq("seg"), "left")
      .select(col("seg"), col("n_b"), col("est_rows"),
        coalesce(col("actual_rows"), lit(0L)).as("actual_rows"),
        expr("(abs(est_rows - coalesce(actual_rows, 0)) * 10000) div greatest(1, coalesce(actual_rows, 0))")
          .as("err_bp"))
      .orderBy(col("seg"))
  }

  val q57Sql: String =
    """WITH fa AS (
      |  SELECT count(*) AS n_a, count(DISTINCT o_custkey) AS ndv_a FROM orders),
      |sb AS (
      |  SELECT c_mktsegment AS seg, count(*) AS n_b,
      |    count(DISTINCT c_custkey) AS ndv_b
      |  FROM customer GROUP BY 1),
      |act AS (
      |  SELECT c_mktsegment AS seg, count(*) AS actual_rows
      |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1),
      |est AS (
      |  SELECT seg, n_b, (n_a * CAST(n_b AS HUGEINT)) // greatest(ndv_a, ndv_b) AS est_rows
      |  FROM sb, fa)
      |SELECT est.seg, est.n_b, CAST(est.est_rows AS BIGINT) AS est_rows,
      |  coalesce(act.actual_rows, 0) AS actual_rows,
      |  CAST((abs(est.est_rows - coalesce(act.actual_rows, 0)) * 10000)
      |    // greatest(1, coalesce(act.actual_rows, 0)) AS BIGINT) AS err_bp
      |FROM est LEFT JOIN act ON est.seg = act.seg
      |ORDER BY est.seg""".stripMargin

  /** q58: supplier SKYLINE (Pareto frontier) — the multi-objective
    * selection operator (Börzsönyi et al., "The Skyline Operator",
    * ICDE 2001) the suite lacked: suppliers where no other supplier is
    * at-least-as-good on BOTH objectives (revenue ↑, worst ship delay
    * ↓) and strictly better on one — the "efficient frontier" a
    * sourcing decision reads directly.
    *
    * Decorrelated to a champion sweep (never the quadratic all-pairs
    * dominance join, and never an unpartitioned window over the
    * SF-scaled per-supplier frame — the c31 prohibition): the
    * per-supplier reduce keys one exchange; tier maxima come from a
    * delay-PARTITIONED window (delay is a bounded business quantity
    * like q50's, so partitions are balanced); only tier CHAMPIONS
    * (rev = tier max — equal-delay dominance needs strictly larger
    * revenue, so champions are exactly the within-tier survivors,
    * exact ties both kept, the standard skyline rule) reach the
    * global prefix-max window — ≤ |delay domain| + ties rows through
    * the single partition. A champion is on the frontier iff it
    * strictly beats every faster tier's best (a faster dominator
    * needs only ≥ revenue). Revenue compares in exact DECIMAL, delay
    * in integer days — dominance can't flip with parallelism. ONE
    * fact-fact scan pair (lineitem ⋈ orders on the order key);
    * supplier enrichment joins un-hinted (SF-scaled — AQE broadcasts
    * at test SF). */
  def q58Skyline(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_suppkey"))
      .agg(sum(revenue).as("rev_dec"),
        max(datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long")).as("max_delay_days"))
    // ONE lineage (a tier-aggregate + join-back would re-derive `per`
    // and re-scan the facts — the c33/a36 branch-duplication trap):
    // tier maxima via a delay-partitioned window over `per`, then the
    // global prefix-max ONLY over the tier champions — ≤ |delay
    // domain| + ties rows through the single-partition window, never
    // the SF-scaled supplier frame
    val champs = per
      .withColumn("tier_best",
        max(col("rev_dec")).over(Window.partitionBy(col("max_delay_days"))))
      .filter(col("rev_dec") === col("tier_best"))
      .withColumn("best_faster",
        max(col("rev_dec")).over(Window.orderBy(col("max_delay_days"))
          .rangeBetween(Window.unboundedPreceding, -1)))
      .filter(col("best_faster").isNull || col("rev_dec") > col("best_faster"))
    champs
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("max_delay_days"),
        col("rev_dec").cast("double").as("revenue"))
      .orderBy(col("max_delay_days"), col("s_suppkey"))
  }

  val q58Sql: String =
    """WITH per AS (
      |  SELECT l_suppkey,
      |    sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS rev_dec,
      |    max(CAST(datediff('day', CAST(o_orderdate AS DATE),
      |      CAST(CAST(l_shipdate AS TIMESTAMP) AS DATE)) AS BIGINT)) AS max_delay_days
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1),
      |t AS (
      |  SELECT *, max(rev_dec) OVER (PARTITION BY max_delay_days) AS tier_best
      |  FROM per),
      |c AS (SELECT * FROM t WHERE rev_dec = tier_best),
      |f AS (
      |  SELECT *, max(rev_dec) OVER (ORDER BY max_delay_days
      |    RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_faster
      |  FROM c)
      |SELECT s_suppkey, s_name, max_delay_days, CAST(rev_dec AS DOUBLE) AS revenue
      |FROM f JOIN supplier ON l_suppkey = s_suppkey
      |WHERE best_faster IS NULL OR rev_dec > best_faster
      |ORDER BY max_delay_days, s_suppkey""".stripMargin

  /** Pair support floor for q59 (pairs co-purchased by fewer baskets
    * are noise at any scale). */
  val BasketMinSupport = 2L

  /** q59: market-basket co-purchase pairs with LIFT (Agrawal/Srikant
    * association-rule mining, the 2-itemset core): parts bought by the
    * same customer, scored by lift = P(a,b)/(P(a)·P(b)) — the classic
    * "frequently bought together" signal, top-20 by support.
    *
    * Shape — the bounded pair fan-out discipline (q51/d82's): baskets
    * = distinct (customer, part) from ONE fact-fact join; the pair
    * generator self-joins that frame on the customer key with p1<p2 —
    * fan-out per customer is (parts-per-customer choose 2), and
    * parts-per-customer is SF-INVARIANT in a TPC-H-shaped schema
    * (order count per customer and lines per order are constants), so
    * pair volume stays linear in customers. The pair rows carry ONLY
    * (p1, p2) through the big exchange — per-part basket counts join
    * AFTER the support filter, against the reduced counts frame
    * (measured ~3 s cheaper at sf0.1 than windowing counts onto every
    * pair row; an interpreted HOF pair-explode loses by more — the d6
    * nested-HOF lesson re-confirmed). Both pair sides and the counts
    * branch are the SAME distinct lineage, deduped by exchange reuse
    * (spec executes and asserts ReusedExchange — one basket
    * computation). Basket total is a 1-row aggregate off a slim
    * column-pruned orders scan (the a36/d85 scalar-side
    * adjudication). Counts exact; lift is the single final double
    * expression; top-20 ordered by (support desc, p1, p2) — a
    * deterministic total order compiling to TakeOrderedAndProject.
    *
    * Plan-audit note: the STATIC formatted plan prints the basket
    * lineage once per reference (pair sides + counts branch) because
    * AQE defers exchange reuse to runtime — the FINAL adaptive plan
    * (what actually executes, asserted in the spec) reuses the one
    * basket exchange for all three. */
  def q59BasketPairs(spark: SparkSession, dir: String): DataFrame = {
    val baskets = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      .distinct()
      // materialized ONCE: the prefilter consumes baskets from three
      // structurally different subtrees (support counts, both pair
      // sides through the semi-join) — exchange reuse no longer covers
      // them all, and re-running the lineitem⋈orders join per subtree
      // would quadruple the corpus scans
      .localCheckpoint()
    val counts = baskets.groupBy(col("part")).agg(count(lit(1)).as("c_i"))
    // Apriori monotonicity (r12 verdict's hardening): c_ab <= min(c_a,
    // c_b), so a part below the support floor can never appear in a
    // qualifying pair — semi-join the baskets down BEFORE the
    // per-customer quadratic fan-out. EXACT (no qualifying pair is
    // lost), and the bound that keeps the pair explosion flat as
    // basket sizes grow with scale: only items already frequent pay
    // the O(k²) expansion.
    val frequent = counts.filter(col("c_i") >= BasketMinSupport).select(col("part"))
    // pin the pair-expansion width: AQE sizes the self-join's
    // post-shuffle stage by its INPUT bytes, which undercounts the
    // O(k²) per-customer fan-out inside it by the basket-size factor
    // (measured r16: the expansion stage coalesced to 5 tasks, 2.5 s
    // of the query's 4 s; widened to session parallelism the same
    // work runs in ~0.4 s). The explicit cust-hash repartition is the
    // exchange the join needs anyway — same key — so this only fixes
    // the width, it adds no shuffle.
    val pruned = baskets.join(frequent, Seq("part"), "left_semi")
      .repartition(spark.sparkContext.defaultParallelism, col("cust"))
    val a = pruned.select(col("cust"), col("part").as("p1"))
    val b = pruned.select(col("cust"), col("part").as("p2"))
    val nRow = Tables.orders(spark, dir)
      .agg(count_distinct(col("o_custkey")).as("n_baskets"))
    a.join(b, "cust")
      .filter(col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= BasketMinSupport)
      .join(counts.select(col("part").as("p1"), col("c_i").as("c_a")), "p1")
      .join(counts.select(col("part").as("p2"), col("c_i").as("c_b")), "p2")
      .crossJoin(broadcast(nRow))
      .select(col("p1"), col("p2"), col("c_ab"), col("c_a"), col("c_b"),
        ((col("c_ab").cast("double") * col("n_baskets").cast("double")) /
          (col("c_a").cast("double") * col("c_b").cast("double"))).as("lift"))
      .orderBy(col("c_ab").desc, col("p1"), col("p2"))
      .limit(20)
  }

  val q59Sql: String =
    s"""WITH baskets AS (
       |  SELECT DISTINCT o_custkey AS cust, l_partkey AS part
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |counts AS (SELECT part, count(*) AS c_i FROM baskets GROUP BY 1),
       |p AS (
       |  SELECT x.part AS p1, y.part AS p2, count(*) AS c_ab
       |  FROM baskets x JOIN baskets y ON x.cust = y.cust AND x.part < y.part
       |  GROUP BY 1, 2
       |  HAVING count(*) >= $BasketMinSupport),
       |n AS (SELECT count(DISTINCT o_custkey) AS n_baskets FROM orders)
       |SELECT p1, p2, CAST(c_ab AS BIGINT) AS c_ab,
       |  CAST(ca.c_i AS BIGINT) AS c_a, CAST(cb.c_i AS BIGINT) AS c_b,
       |  (CAST(c_ab AS DOUBLE) * CAST(n_baskets AS DOUBLE))
       |    / (CAST(ca.c_i AS DOUBLE) * CAST(cb.c_i AS DOUBLE)) AS lift
       |FROM p
       |JOIN counts ca ON p.p1 = ca.part
       |JOIN counts cb ON p.p2 = cb.part
       |CROSS JOIN n
       |ORDER BY c_ab DESC, p1, p2 LIMIT 20""".stripMargin

  /** First-significant-digit expectations under Benford's law,
    * log10(1+1/d) as literal PPM (they sum to exactly 1,000,000) —
    * literals so neither engine evaluates a logarithm (the no-ln/pow
    * determinism rule). */
  val BenfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  /** Nigrini MAD conformity thresholds for first-digit tests, in PPM of
    * proportion deviation (Nigrini 2012: <0.006 close, <0.012
    * acceptable, <0.015 marginally acceptable, else nonconformity). */
  val BenfordMadClosePpm = 6000L
  val BenfordMadAcceptablePpm = 12000L
  val BenfordMadMarginalPpm = 15000L

  /** q60: Benford first-digit audit over order totals — the classic
    * forensic data-quality test (Benford 1938; Nigrini's audit
    * formulation): naturally-occurring multi-scale amounts follow
    * P(d) = log10(1+1/d), and fabricated or truncated feeds don't.
    * Per digit 1–9: observed count, observed share (ppm), Benford
    * expectation (ppm), absolute deviation; plus the suite-level MAD
    * (mean absolute deviation of proportions) and its Nigrini
    * conformity verdict. A synthetic uniform-ish price column is
    * expected to NONCONFORM — the audit's point is measuring how far.
    *
    * Determinism: the first digit is extracted from the BIGINT cents
    * rendering (integer→string agrees across engines; double→string
    * does not), shares via the truncating integer div both engines
    * apply to nonnegatives, expectations as literal ppm so no engine
    * computes a log.
    *
    * Shape: ONE column-pruned orders scan → map-side digit → one
    * 10-column conditional-aggregate row (count + 9 countIfs) → the
    * 9-element literal-domain explode (a40's pinned-enum idiom: a
    * digit absent from the data still gets its row) → the MAD window
    * runs over the 9-row frame (value-bounded, the c31 rule). Nothing
    * past the map-side reduce is corpus-sized. */
  def q60BenfordAudit(spark: SparkSession, dir: String): DataFrame =
    q60BenfordAuditOf(Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 0)
      .select(col("o_totalprice").as("v")))

  /** q60 over ANY positive value column `v` — the audit seam: the
    * query entry feeds o_totalprice (uniform by construction, so the
    * suite pins the `nonconformity` verdict); the spec feeds planted
    * log-uniform and blended fixtures that land in the `close` and
    * `acceptable` bands, exercising every branch of the Nigrini
    * scale. */
  def q60BenfordAuditOf(values: DataFrame): DataFrame = {
    val digit = expr(
      "cast(substring(cast(cast(cast(v as decimal(18,2)) * 100 as bigint) as string), 1, 1) as int)")
    val row = values
      .select(digit.as("d"))
      .agg(count(lit(1)).as("n"),
        BenfordPpm.map { case (d, _) => countIf(col("d") === d).as(s"c$d") }: _*)
    val stacked = row.select(
      col("n"),
      explode(array(BenfordPpm.map { case (d, ppm) =>
        struct(lit(d).as("digit"), col(s"c$d").as("observed"), lit(ppm).as("exp_ppm"))
      }: _*)).as("x"))
      .select(col("x.digit").as("digit"), col("x.observed").as("observed"),
        expr("(x.observed * 1000000) div n").as("obs_ppm"),
        col("x.exp_ppm").as("exp_ppm"))
      .withColumn("dev_ppm", abs(col("obs_ppm") - col("exp_ppm")))
    stacked
      .withColumn("mad_ppm",
        expr("sum(dev_ppm) over () div 9"))
      .withColumn("conformity",
        when(col("mad_ppm") < BenfordMadClosePpm, "close")
          .when(col("mad_ppm") < BenfordMadAcceptablePpm, "acceptable")
          .when(col("mad_ppm") < BenfordMadMarginalPpm, "marginal")
          .otherwise("nonconformity"))
      .orderBy(col("digit"))
  }

  val q60Sql: String = {
    val digits = BenfordPpm.map(_._1).mkString(", ")
    val ppms = BenfordPpm.map(_._2).mkString(", ")
    val countCases = BenfordPpm.map { case (d, _) =>
      s"count(CASE WHEN d = $d THEN 1 END) AS c$d"
    }.mkString(", ")
    val obsCases = BenfordPpm.map { case (d, _) =>
      s"WHEN digit = $d THEN c$d"
    }.mkString(" ")
    s"""WITH src AS (
       |  SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS d
       |  FROM orders WHERE o_totalprice > 0),
       |agg AS (SELECT count(*) AS n, $countCases FROM src),
       |spine AS (SELECT unnest([$digits]) AS digit, unnest([$ppms]) AS exp_ppm),
       |j AS (
       |  SELECT digit, CAST(CASE $obsCases END AS BIGINT) AS observed, exp_ppm, n
       |  FROM spine CROSS JOIN agg),
       |k AS (
       |  SELECT digit, observed, CAST((observed * 1000000) // n AS BIGINT) AS obs_ppm, exp_ppm,
       |    CAST(abs((observed * 1000000) // n - exp_ppm) AS BIGINT) AS dev_ppm
       |  FROM j)
       |SELECT digit, observed, obs_ppm, CAST(exp_ppm AS BIGINT) AS exp_ppm, dev_ppm,
       |  CAST(sum(dev_ppm) OVER () // 9 AS BIGINT) AS mad_ppm,
       |  CASE WHEN sum(dev_ppm) OVER () // 9 < $BenfordMadClosePpm THEN 'close'
       |       WHEN sum(dev_ppm) OVER () // 9 < $BenfordMadAcceptablePpm THEN 'acceptable'
       |       WHEN sum(dev_ppm) OVER () // 9 < $BenfordMadMarginalPpm THEN 'marginal'
       |       ELSE 'nonconformity' END AS conformity
       |FROM k ORDER BY digit""".stripMargin
  }

  /** q61: per-nation daily-revenue OLS trend — the least-squares slope
    * (and fit quality) behind every "revenue is growing X/day" claim;
    * the q26/q53 exact-moment discipline applied to regression: all
    * five moments (Σx, Σy, Σxx, Σxy, Σyy) accumulate as DECIMAL(38,0)
    * integers over (day-offset, daily cents), so they are bit-stable
    * at any parallelism; slope and r² are FINAL double expressions
    * composed only of decimal→double casts, ÷ and × (the c39
    * correctly-rounded-ops rule — r² is (num/den)·(num/syy-term), not
    * num²/... , so no decimal product ever squares the numerator: at
    * the 100 TB design point num ≈ 1.5e23 and num² would overflow
    * DECIMAL(38,0) while every retained product stays inside).
    *
    * x is the day offset from each nation's first observed day (window
    * over the reduced frame), keeping Σxx span-bounded instead of
    * epoch-sized.
    *
    * Shape: orders⨝customer un-hinted on the customer key (SMJ at
    * scale, AQE-broadcast at test SF), nation dim broadcast
    * (SF-invariant); one (nation, day) reduce → per-nation moment agg;
    * windows only over the ≤|nations×days| frame. */
  def q61OlsTrend(spark: SparkSession, dir: String): DataFrame = {
    def d38(c: Column): Column = c.cast(DecimalType(38, 0))
    val byDay = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("day"))
      .agg(sum(expr("cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)")).as("y"))
    val wN = Window.partitionBy(col("n_name"))
    val moments = byDay
      .withColumn("x", col("day") - min(col("day")).over(wN))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_days"),
        sum(d38(col("x"))).as("sx"),
        sum(d38(col("y"))).as("sy"),
        sum(d38(col("x")) * d38(col("x"))).as("sxx"),
        sum(d38(col("x")) * d38(col("y"))).as("sxy"),
        sum(d38(col("y")) * d38(col("y"))).as("syy"))
      .filter(col("n_days") >= 2)
    moments
      .withColumn("num", d38(col("n_days")) * col("sxy") - col("sx") * col("sy"))
      .withColumn("den", d38(col("n_days")) * col("sxx") - col("sx") * col("sx"))
      .withColumn("syyc", d38(col("n_days")) * col("syy") - col("sy") * col("sy"))
      .select(col("n_name"), col("n_days"),
        (col("num").cast("double") / col("den").cast("double"))
          .as("slope_cents_per_day"),
        ((col("num").cast("double") / col("den").cast("double")) *
          (col("num").cast("double") / col("syyc").cast("double"))).as("r2"))
      .orderBy(col("n_name"))
  }

  val q61Sql: String =
    """WITH byday AS (
      |  SELECT n_name,
      |    epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS day,
      |    sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS y
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1, 2),
      |xs AS (
      |  SELECT n_name, day - min(day) OVER (PARTITION BY n_name) AS x, y FROM byday),
      |m AS (
      |  SELECT n_name, count(*) AS n_days,
      |    sum(CAST(x AS DECIMAL(38,0))) AS sx,
      |    sum(CAST(y AS DECIMAL(38,0))) AS sy,
      |    sum(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))) AS sxx,
      |    sum(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS sxy,
      |    sum(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS syy
      |  FROM xs GROUP BY 1 HAVING count(*) >= 2),
      |k AS (
      |  SELECT n_name, n_days,
      |    CAST(n_days AS DECIMAL(38,0)) * sxy - sx * sy AS num,
      |    CAST(n_days AS DECIMAL(38,0)) * sxx - sx * sx AS den,
      |    CAST(n_days AS DECIMAL(38,0)) * syy - sy * sy AS syyc
      |  FROM m)
      |SELECT n_name, n_days,
      |  CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS slope_cents_per_day,
      |  (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
      |    * (CAST(num AS DOUBLE) / CAST(syyc AS DOUBLE)) AS r2
      |FROM k ORDER BY n_name""".stripMargin

  /** DOJ/FTC 2010 merger-guideline HHI thresholds, on the bp² scale
    * (percent² × 10⁴): < 1500 pct² unconcentrated, < 2500 moderate. */
  val HhiUnconcentratedBp2 = 15000000L
  val HhiModerateBp2 = 25000000L

  /** q62: Herfindahl–Hirschman supplier-concentration index per part
    * brand — the antitrust/supply-chain-risk readout behind "how
    * captive is this part line to its top suppliers": per brand, each
    * supplier's share of shipped QUANTITY in truncated basis points,
    * HHI = Σ share_bp² (bp² scale: ×10⁴ the familiar percent² HHI),
    * the top supplier's share, and the DOJ concentration class. The
    * bp-truncation convention makes the statistic integer-exact and
    * engine-identical (the q53/q60 discipline) — quantity, not
    * revenue, so every sum is a bigint, never a decimal rounding
    * question.
    *
    * Shape: lineitem⨝part un-hinted on the part key (SMJ at scale,
    * AQE-broadcast at test SF — both sides SF-scaled, never a forced
    * hint), ONE (brand, supplier) reduce with map-side partials, then
    * a brand window + brand reduce over the ≤|brands|·|suppliers|
    * reduced frame. Nothing corpus-sized past the first reduce. */
  def q62HhiConcentration(spark: SparkSession, dir: String): DataFrame = {
    val vol = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
    val wB = Window.partitionBy(col("p_brand"))
    vol
      .withColumn("total", sum(col("q")).over(wB))
      .withColumn("share_bp", expr("(q * 10000) div total"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_suppliers"),
        max(col("total")).as("total_qty"),
        sum(col("share_bp") * col("share_bp")).as("hhi_bp2"),
        max(col("share_bp")).as("top_share_bp"))
      .select(col("p_brand"), col("n_suppliers"), col("total_qty"),
        col("hhi_bp2"), col("top_share_bp"),
        when(col("hhi_bp2") < HhiUnconcentratedBp2, "unconcentrated")
          .when(col("hhi_bp2") < HhiModerateBp2, "moderate")
          .otherwise("high").as("concentration"))
      .orderBy(col("p_brand"))
  }

  val q62Sql: String =
    s"""WITH v AS (
       |  SELECT p_brand, l_suppkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  GROUP BY 1, 2),
       |w AS (SELECT *, CAST(sum(q) OVER (PARTITION BY p_brand) AS BIGINT) AS total FROM v),
       |s AS (SELECT p_brand, q, total, CAST((q * 10000) // total AS BIGINT) AS share_bp FROM w),
       |a AS (
       |  SELECT p_brand, CAST(count(*) AS BIGINT) AS n_suppliers,
       |    CAST(max(total) AS BIGINT) AS total_qty,
       |    CAST(sum(share_bp * share_bp) AS BIGINT) AS hhi_bp2,
       |    CAST(max(share_bp) AS BIGINT) AS top_share_bp
       |  FROM s GROUP BY 1)
       |SELECT p_brand, n_suppliers, total_qty, hhi_bp2, top_share_bp,
       |  CASE WHEN hhi_bp2 < $HhiUnconcentratedBp2 THEN 'unconcentrated'
       |       WHEN hhi_bp2 < $HhiModerateBp2 THEN 'moderate'
       |       ELSE 'high' END AS concentration
       |FROM a ORDER BY p_brand""".stripMargin

  /** q63 KS rejection coefficient at α = 0.05 (the asymptotic
    * two-sample critical value c(α) = 1.358), on the ppm scale. */
  val KsAlphaCoefPpm = 1358000.0

  def q63KsDelay(spark: SparkSession, dir: String): DataFrame =
    q63KsDelayOf(Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_returnflag").as("grp"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long").as("delay_days")))

  /** q63: exact two-sample Kolmogorov–Smirnov test, each group's
    * ship-delay distribution against the rest of the corpus pooled —
    * the distribution-shift audit behind "does this segment ship
    * differently", where mean-based contrasts (c26) miss shape
    * changes. D = max over jump points of |F̂₁ − F̂₂|, computed in
    * exact integers: per-side ECDFs as truncating-div ppm
    * (cum·10⁶ div n — int64-safe at any corpus size, unlike the
    * cross-product form c₁·n₂ which overflows at ~10¹² rows), the
    * argmax reported at the SMALLEST achieving delay (total order,
    * engine-identical). The reject flag compares D against the
    * asymptotic α=0.05 critical value 1.358·√((n₁+n₂)/(n₁n₂)) — the
    * one double in the query, built from identically-rounded casts,
    * √ and × only (the IEEE determinism rules; no ln/pow).
    *
    * Shape: lineitem⨝orders un-hinted (the q50 delay join: SMJ at
    * scale, AQE-broadcast at test SF) → ONE (grp, delay) reduce with
    * map-side partials; everything after runs on reduced frames — the
    * global per-delay cum is an unpartitioned window over the
    * ≤|calendar-span| rows (value-bounded, the c31 rule), each
    * group's spine gap-fills via the c33 inline explode so its
    * cumulative count is defined at every global jump point, and the
    * per-group argmax is a window, not a sort. */
  def q63KsDelayOf(pairs: DataFrame): DataFrame = {
    val byVal = pairs.groupBy(col("grp"), col("delay_days"))
      .agg(count(lit(1)).as("cnt"))
    val wAllRows = Window.partitionBy()
    val wGlobCum = Window.orderBy(col("delay_days"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val globals = byVal.groupBy(col("delay_days"))
      .agg(sum(col("cnt")).as("g_cnt"))
      .withColumn("cum_all", sum(col("g_cnt")).over(wGlobCum))
      .withColumn("n_all", sum(col("g_cnt")).over(wAllRows))
      .select(col("delay_days"), col("cum_all"), col("n_all"))
    val wGrp = Window.partitionBy(col("grp")).orderBy(col("delay_days"))
    val dense = byVal
      .withColumn("gmin", min(col("delay_days")).over(wAllRows))
      .withColumn("prev", lag(col("delay_days"), 1).over(wGrp))
      .select(col("grp"), explode(transform(
        sequence(coalesce(col("prev") + 1, col("gmin")), col("delay_days")),
        d => struct(d.as("delay_days"),
          when(d === col("delay_days"), col("cnt")).otherwise(lit(0L)).as("cnt"))))
        .as("r"))
      .select(col("grp"), col("r.delay_days").as("delay_days"), col("r.cnt").as("cnt"))
    val wGrpCum = wGrp.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = dense
      .withColumn("cum_g", sum(col("cnt")).over(wGrpCum))
      .withColumn("n_grp", sum(col("cnt")).over(Window.partitionBy(col("grp"))))
      .join(globals, Seq("delay_days"))
      .filter(col("n_all") > col("n_grp"))
      .withColumn("d_ppm", abs(
        expr("(cum_g * 1000000) div n_grp") -
          expr("((cum_all - cum_g) * 1000000) div (n_all - n_grp)")))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("d_ppm").desc, col("delay_days"))))
      .filter(col("rnk") === 1)
      .select(col("grp"), col("n_grp"), (col("n_all") - col("n_grp")).as("n_rest"),
        col("delay_days").as("d_delay_days"), col("d_ppm"),
        (lit(KsAlphaCoefPpm) * sqrt(
          (col("n_all").cast("double")) /
            (col("n_grp").cast("double") * (col("n_all") - col("n_grp")).cast("double"))))
          .as("crit_ppm"),
        (col("d_ppm").cast("double") > lit(KsAlphaCoefPpm) * sqrt(
          (col("n_all").cast("double")) /
            (col("n_grp").cast("double") * (col("n_all") - col("n_grp")).cast("double"))))
          .as("reject"))
      .orderBy(col("grp"))
  }

  val q63Sql: String =
    s"""WITH j AS (
       |  SELECT l_returnflag AS grp,
       |    CAST(datediff('day', CAST(o_orderdate AS DATE),
       |      CAST(CAST(l_shipdate AS TIMESTAMP) AS DATE)) AS BIGINT) AS delay_days
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |v AS (SELECT grp, delay_days, count(*) AS cnt FROM j GROUP BY 1, 2),
       |g AS (
       |  SELECT delay_days,
       |    CAST(sum(sum(cnt)) OVER (ORDER BY delay_days
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_all,
       |    CAST(sum(sum(cnt)) OVER () AS BIGINT) AS n_all
       |  FROM v GROUP BY delay_days),
       |l AS (
       |  SELECT *, lag(delay_days) OVER (PARTITION BY grp ORDER BY delay_days) AS prev,
       |    min(delay_days) OVER () AS gmin
       |  FROM v),
       |dense AS (
       |  SELECT grp, unnest(generate_series(coalesce(prev + 1, gmin), delay_days)) AS day,
       |    delay_days, cnt FROM l),
       |z AS (
       |  SELECT grp, day AS delay_days,
       |    CASE WHEN day = delay_days THEN cnt ELSE 0 END AS cnt
       |  FROM dense),
       |c AS (
       |  SELECT grp, delay_days,
       |    CAST(sum(cnt) OVER (PARTITION BY grp ORDER BY delay_days
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_g,
       |    CAST(sum(cnt) OVER (PARTITION BY grp) AS BIGINT) AS n_grp
       |  FROM z),
       |s AS (
       |  SELECT c.grp, c.delay_days, c.cum_g, c.n_grp, g.cum_all, g.n_all,
       |    abs((c.cum_g * 1000000) // c.n_grp
       |      - ((g.cum_all - c.cum_g) * 1000000) // (g.n_all - c.n_grp)) AS d_ppm
       |  FROM c JOIN g ON c.delay_days = g.delay_days
       |  WHERE g.n_all > c.n_grp),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY grp
       |    ORDER BY d_ppm DESC, delay_days) AS rnk
       |  FROM s)
       |SELECT grp, n_grp, CAST(n_all - n_grp AS BIGINT) AS n_rest,
       |  delay_days AS d_delay_days, CAST(d_ppm AS BIGINT) AS d_ppm,
       |  $KsAlphaCoefPpm * sqrt(CAST(n_all AS DOUBLE)
       |    / (CAST(n_grp AS DOUBLE) * CAST(n_all - n_grp AS DOUBLE))) AS crit_ppm,
       |  CAST(d_ppm AS DOUBLE) > $KsAlphaCoefPpm * sqrt(CAST(n_all AS DOUBLE)
       |    / (CAST(n_grp AS DOUBLE) * CAST(n_all - n_grp AS DOUBLE))) AS reject
       |FROM r WHERE rnk = 1 ORDER BY grp""".stripMargin

  /** q64: open-order backlog profile — the operational WIP curve
    * ("how many orders are in flight, worth how much, on each day")
    * behind capacity planning and cash-conversion readouts: an order
    * is OPEN from its order date until the day its last line ships;
    * per calendar day: orders opened, orders fully shipped, and the
    * running open count + open value (exact cents). The c19 sweep-line
    * idea at ORDER grain with join-derived interval ends — each order
    * contributes a +1/−1 delta pair, so the curve is two running sums
    * over the day spine, never a day×order containment join (which is
    * quadratic in span and the naive form everyone writes first).
    *
    * Determinism: integer day indices (epoch days), exact cents via
    * the DECIMAL(12,2)·100 idiom (q53), running sums of longs. The
    * curve ends at exactly 0 open orders / 0 cents — every joined
    * order closes — a spec-pinned conservation invariant.
    *
    * Shape: TWO genuine inputs (a21 precedent): lineitem reduces
    * map-side to per-order last ship day, joins orders un-hinted on
    * the order key (SMJ at scale, AQE-broadcast at test SF), the
    * ±delta pair explodes ROW-LOCALLY, and everything after the
    * ≤|span-days| (day) reduce — gap explode (c33), running sums —
    * is value-bounded windows over the ~2.4k-row calendar frame (the
    * c31 rule: unpartitioned windows only over reduced frames). */
  def q64BacklogProfile(spark: SparkSession, dir: String): DataFrame = {
    val ends = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(max(expr("unix_date(to_date(l_shipdate))").cast("long")).as("end_day"))
    val byDay = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        expr("unix_date(to_date(o_orderdate))").cast("long").as("start_day"),
        (dec2(col("o_totalprice")) * 100).cast("long").as("cents"))
      .join(ends, col("o_orderkey") === col("l_orderkey"))
      .select(explode(array(
        struct(col("start_day").as("day"), lit(1L).as("dn"), col("cents").as("dc")),
        struct(col("end_day").as("day"), lit(-1L).as("dn"), (-col("cents")).as("dc"))))
        .as("e"))
      .select(col("e.day").as("day"), col("e.dn").as("dn"), col("e.dc").as("dc"))
      .groupBy(col("day"))
      .agg(sum(when(col("dn") > 0, 1L).otherwise(0L)).as("n_opened"),
        sum(when(col("dn") < 0, 1L).otherwise(0L)).as("n_closed"),
        sum(col("dn")).as("dn"), sum(col("dc")).as("dc"))
    val wDay = Window.orderBy(col("day"))
    val dense = byDay
      .withColumn("prev_day", lag(col("day"), 1).over(wDay))
      .select(explode(transform(
        sequence(coalesce(col("prev_day") + 1, col("day")), col("day")),
        d => struct(d.as("day"),
          when(d === col("day"), col("n_opened")).otherwise(lit(0L)).as("n_opened"),
          when(d === col("day"), col("n_closed")).otherwise(lit(0L)).as("n_closed"),
          when(d === col("day"), col("dn")).otherwise(lit(0L)).as("dn"),
          when(d === col("day"), col("dc")).otherwise(lit(0L)).as("dc")))).as("r"))
      .select(col("r.day").as("day"), col("r.n_opened").as("n_opened"),
        col("r.n_closed").as("n_closed"), col("r.dn").as("dn"), col("r.dc").as("dc"))
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dense
      .withColumn("open_orders", sum(col("dn")).over(wCum))
      .withColumn("open_cents", sum(col("dc")).over(wCum))
      .select(col("day"), col("n_opened"), col("n_closed"),
        col("open_orders"), col("open_cents"))
      .orderBy(col("day"))
  }

  val q64Sql: String =
    """WITH ends AS (
      |  SELECT l_orderkey,
      |    CAST(max(datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))) AS BIGINT) AS end_day
      |  FROM lineitem GROUP BY 1),
      |d0 AS (
      |  SELECT CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS start_day,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents, end_day
      |  FROM orders JOIN ends ON o_orderkey = l_orderkey),
      |deltas AS (
      |  SELECT start_day AS day, 1 AS dn, cents AS dc FROM d0
      |  UNION ALL
      |  SELECT end_day AS day, -1 AS dn, -cents AS dc FROM d0),
      |byday AS (
      |  SELECT day,
      |    CAST(sum(CASE WHEN dn > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_opened,
      |    CAST(sum(CASE WHEN dn < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_closed,
      |    CAST(sum(dn) AS BIGINT) AS dn, CAST(sum(dc) AS BIGINT) AS dc
      |  FROM deltas GROUP BY 1),
      |span AS (SELECT min(day) AS lo, max(day) AS hi FROM byday),
      |spine AS (SELECT unnest(generate_series(lo, hi)) AS day FROM span),
      |j AS (
      |  SELECT s.day, coalesce(b.n_opened, 0) AS n_opened,
      |    coalesce(b.n_closed, 0) AS n_closed,
      |    coalesce(b.dn, 0) AS dn, coalesce(b.dc, 0) AS dc
      |  FROM spine s LEFT JOIN byday b USING (day))
      |SELECT day, CAST(n_opened AS BIGINT) AS n_opened,
      |  CAST(n_closed AS BIGINT) AS n_closed,
      |  CAST(sum(dn) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND CURRENT ROW) AS BIGINT) AS open_orders,
      |  CAST(sum(dc) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND CURRENT ROW) AS BIGINT) AS open_cents
      |FROM j ORDER BY day""".stripMargin

  /** q65: ABC revenue classification per brand — the inventory-control
    * cut (Pareto's 80/95 bands; Dickie 1951's "ABC analysis") every
    * merchandising/supply team runs: within each brand, parts sorted by
    * revenue split into A (first 80% of cumulative revenue), B (to
    * 95%), C (tail), reported as a per-(brand, class) rollup — part
    * count, exact revenue, and share. Class is decided on the
    * cumulative EXCLUSIVE of the part itself (cross-multiplied
    * integers: A iff cumExcl·5 < total·4, B iff cumExcl·20 < total·19)
    * so the part that CROSSES a boundary still belongs to the upper
    * class and the first part is always A — the textbook convention,
    * spec-pinned.
    *
    * Determinism: revenue in exact e4 integer units (DECIMAL sum ×
    * 10000), ties in the revenue sort broken by partkey, share via
    * DECIMAL(38) integral div — no doubles anywhere.
    *
    * Shape: ONE lineitem scan joins part un-hinted (part scales with
    * SF — AQE broadcasts at test SF, SMJ at scale) → (brand, part)
    * reduce (map-side partial) → q54's per-brand window ladder over
    * the REDUCED per-part frame (|brands| = 25 partitions of |parts|/25
    * rows — never the corpus) → ≤ 25×3-row rollup. */
  def q65AbcClass(spark: SparkSession, dir: String): DataFrame =
    q65AbcClassOf(Tables.lineitem(spark, dir), Tables.part(spark, dir))

  /** q65 over ANY lineitem/part-shaped frames (the spec plants exact
    * boundary fixtures). */
  def q65AbcClassOf(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val wB = Window.partitionBy(col("p_brand"))
    val wCum = wB.orderBy(col("rev_e4").desc, col("l_partkey"))
    lineitem
      .join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("l_partkey"))
      .agg((sum(revenue) * 10000).cast("long").as("rev_e4"))
      .withColumn("cum_excl", coalesce(sum(col("rev_e4"))
        .over(wCum.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("total", sum(col("rev_e4")).over(wB))
      // cross-multiplied class test in DECIMAL(38): total·20 can pass
      // Long at 100 TB brand revenue (e4 units), mirrored HUGEINT-side
      .withColumn("abc_class",
        when(col("cum_excl").cast(DecimalType(38, 0)) * 5 <
            col("total").cast(DecimalType(38, 0)) * 4, lit("A"))
          .when(col("cum_excl").cast(DecimalType(38, 0)) * 20 <
            col("total").cast(DecimalType(38, 0)) * 19, lit("B"))
          .otherwise(lit("C")))
      .groupBy(col("p_brand"), col("abc_class"))
      .agg(count(lit(1)).as("n_parts"), sum(col("rev_e4")).as("class_rev_e4"),
        max(col("total")).as("t"))
      .select(col("p_brand"), col("abc_class"), col("n_parts"), col("class_rev_e4"),
        expr("(10000 * CAST(class_rev_e4 AS DECIMAL(38,0))) div t").as("share_bp"))
      .orderBy(col("p_brand"), col("abc_class"))
  }

  val q65Sql: String =
    """WITH rev AS (
      |  SELECT p_brand, l_partkey,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |      * (1 - CAST(l_discount AS DECIMAL(4,2)))) * 10000 AS BIGINT) AS rev_e4
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1, 2),
      |w AS (
      |  SELECT p_brand, rev_e4,
      |    COALESCE(sum(rev_e4) OVER (PARTITION BY p_brand
      |      ORDER BY rev_e4 DESC, l_partkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl,
      |    sum(rev_e4) OVER (PARTITION BY p_brand) AS total
      |  FROM rev),
      |c AS (
      |  SELECT p_brand, rev_e4, total,
      |    CASE WHEN CAST(cum_excl AS HUGEINT) * 5 < CAST(total AS HUGEINT) * 4 THEN 'A'
      |         WHEN CAST(cum_excl AS HUGEINT) * 20 < CAST(total AS HUGEINT) * 19 THEN 'B'
      |         ELSE 'C' END AS abc_class
      |  FROM w)
      |SELECT p_brand, abc_class, CAST(count(*) AS BIGINT) AS n_parts,
      |  CAST(sum(rev_e4) AS BIGINT) AS class_rev_e4,
      |  CAST((10000 * CAST(sum(rev_e4) AS HUGEINT)) // max(total) AS BIGINT) AS share_bp
      |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q66: monthly top-K revenue leaderboard with CHURN — the
    * "trending items" card (c14's sliding top-k, here at calendar
    * grain over the sales facts): per month, the top 5 parts by exact
    * revenue with rank, revenue, and `is_new` — whether the part was
    * absent from the PREVIOUS month's board. Leaderboard churn is the
    * merchandising pulse read: a stable board means entrenched
    * winners; high churn means demand is rotating and yesterday's
    * stocking plan is stale.
    *
    * `is_new` comes from ONE more window over the ≤K·|months| board
    * frame (lag of month partitioned BY PART: new iff the part's
    * previous board appearance is not month−1) — never a self-join of
    * the board against itself, which would re-derive the corpus
    * lineage twice (the branch-duplication trap, plan-audited to one
    * scan). First month is all-new by convention.
    *
    * Shape: ONE lineitem scan joins part un-hinted → (month, part)
    * reduce (map-side partial) → per-month rank window over the
    * REDUCED frame → filter to K → the churn lag over the ≤K·|months|
    * board. Total order (revenue desc, partkey) makes ranks exact. */
  def q66TopkChurn(spark: SparkSession, dir: String): DataFrame = {
    val K = 5
    val wM = Window.partitionBy(col("m")).orderBy(col("rev_e4").desc, col("l_partkey"))
    val wP = Window.partitionBy(col("l_partkey")).orderBy(col("m"))
    // spread loader (guide §2.5): r16 A/B-measured win (1.59 -> 1.12)
    Tables.spread(spark, dir, "lineitem", "l_orderkey")
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .groupBy((year(col("l_shipdate")) * 12 + month(col("l_shipdate")) - 1).as("m"),
        col("l_partkey"))
      .agg((sum(revenue) * 10000).cast("long").as("rev_e4"))
      .withColumn("rnk", row_number().over(wM))
      .filter(col("rnk") <= K)
      .withColumn("prev_m", lag(col("m"), 1).over(wP))
      .select(col("m").cast("long").as("month_idx"), col("rnk"), col("l_partkey"), col("rev_e4"),
        (col("prev_m").isNull || col("prev_m") =!= col("m") - 1).as("is_new"))
      .orderBy(col("month_idx"), col("rnk"))
  }

  val q66Sql: String =
    """WITH rev AS (
      |  SELECT year(l_shipdate) * 12 + month(l_shipdate) - 1 AS m, l_partkey,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |      * (1 - CAST(l_discount AS DECIMAL(4,2)))) * 10000 AS BIGINT) AS rev_e4
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT m, l_partkey, rev_e4,
      |    row_number() OVER (PARTITION BY m ORDER BY rev_e4 DESC, l_partkey) AS rnk
      |  FROM rev),
      |board AS (SELECT * FROM r WHERE rnk <= 5),
      |c AS (
      |  SELECT m, rnk, l_partkey, rev_e4,
      |    lag(m) OVER (PARTITION BY l_partkey ORDER BY m) AS prev_m
      |  FROM board)
      |SELECT CAST(m AS BIGINT) AS month_idx, CAST(rnk AS INTEGER) AS rnk, l_partkey, rev_e4,
      |  (prev_m IS NULL OR prev_m <> m - 1) AS is_new
      |FROM c ORDER BY month_idx, rnk""".stripMargin

  /** q67: growth accounting — the revenue-retention decomposition
    * (the SaaS "GRR/NRR" table, equally the wholesale account-health
    * read): per year, ending revenue explained as starting revenue
    * + NEW (customers with no revenue last year) + EXPANSION (grew)
    * − CONTRACTION (shrank) − CHURNED (no revenue this year), all in
    * exact cents. The conservation identity
    * `ending = starting + new + expansion − contraction − churned`
    * holds EXACTLY by construction (spec-pinned) — the property the
    * float version of this table never quite has.
    *
    * Churn needs a row in the year the revenue is MISSING: rather
    * than a (customer × year) spine join (|custs|·|years| at scale),
    * each (customer, year) row also emits its SUCCESSOR-year stub via
    * lead() — a churn event exists only where a prior-year row exists
    * to emit it, so the frame stays ≤2× the reduced (cust, year)
    * frame and zero-revenue years never materialize globally.
    *
    * Shape: ONE orders scan → (cust, year) reduce (map-side partial)
    * → lead window partitioned by customer over the reduced frame →
    * row-local explode of (current row + churn stub) → per-year
    * conditional agg to ≤|years| rows. */
  def q67GrowthAccounting(spark: SparkSession, dir: String): DataFrame = {
    val wC = Window.partitionBy(col("o_custkey")).orderBy(col("y"))
    val rows = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"), year(col("o_orderdate")).as("y"))
      .agg((sum(dec2(col("o_totalprice"))) * 100).cast("long").as("cents"))
      .withColumn("prev_y", lag(col("y"), 1).over(wC))
      .withColumn("prev_cents", lag(col("cents"), 1).over(wC))
      .withColumn("next_y", lead(col("y"), 1).over(wC))
      .select(col("o_custkey"), col("y"), col("cents"),
        when(col("prev_y") === col("y") - 1, col("prev_cents")).otherwise(lit(0L))
          .as("base"),
        // churn stub: revenue existed in y but not in y+1
        (col("next_y").isNull || col("next_y") =!= col("y") + 1).as("emits_churn"))
    rows
      .select(col("y"), col("cents"), col("base"), col("emits_churn"),
        explode(when(col("emits_churn"),
          array(lit("cur"), lit("churn"))).otherwise(array(lit("cur")))).as("kind"))
      .select(
        when(col("kind") === "churn", col("y") + 1).otherwise(col("y")).as("yy"),
        when(col("kind") === "churn", lit(0L)).otherwise(col("cents")).as("cur_cents"),
        when(col("kind") === "churn", col("cents")).otherwise(col("base")).as("base_cents"),
        col("kind"))
      .groupBy(col("yy").as("y"))
      .agg(
        sum(col("base_cents")).as("starting_cents"),
        sum(when(col("kind") === "cur" && col("base_cents") === 0, col("cur_cents"))
          .otherwise(0L)).as("new_cents"),
        sum(when(col("kind") === "cur" && col("base_cents") > 0,
          greatest(col("cur_cents") - col("base_cents"), lit(0L))).otherwise(0L))
          .as("expansion_cents"),
        sum(when(col("kind") === "cur" && col("base_cents") > 0,
          greatest(col("base_cents") - col("cur_cents"), lit(0L))).otherwise(0L))
          .as("contraction_cents"),
        sum(when(col("kind") === "churn", col("base_cents")).otherwise(0L))
          .as("churned_cents"),
        sum(col("cur_cents")).as("ending_cents"))
      // the spine's last churn stub lands one year past the data — a
      // real churn fact (that year starts with the churned base and
      // ends at whatever the remaining customers spent)
      .orderBy(col("y"))
  }

  val q67Sql: String =
    """WITH cy AS (
      |  SELECT o_custkey, year(o_orderdate) AS y,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
      |  FROM orders GROUP BY 1, 2),
      |w AS (
      |  SELECT o_custkey, y, cents,
      |    CASE WHEN lag(y) OVER wc = y - 1 THEN lag(cents) OVER wc ELSE 0 END AS base,
      |    (lead(y) OVER wc IS NULL OR lead(y) OVER wc <> y + 1) AS emits_churn
      |  FROM cy WINDOW wc AS (PARTITION BY o_custkey ORDER BY y)),
      |x AS (
      |  SELECT y AS yy, cents AS cur_cents, base AS base_cents, 'cur' AS kind FROM w
      |  UNION ALL
      |  SELECT y + 1, 0, cents, 'churn' FROM w WHERE emits_churn)
      |SELECT CAST(yy AS INTEGER) AS y,
      |  CAST(sum(base_cents) AS BIGINT) AS starting_cents,
      |  CAST(sum(CASE WHEN kind = 'cur' AND base_cents = 0 THEN cur_cents ELSE 0 END) AS BIGINT) AS new_cents,
      |  CAST(sum(CASE WHEN kind = 'cur' AND base_cents > 0
      |    THEN greatest(cur_cents - base_cents, 0) ELSE 0 END) AS BIGINT) AS expansion_cents,
      |  CAST(sum(CASE WHEN kind = 'cur' AND base_cents > 0
      |    THEN greatest(base_cents - cur_cents, 0) ELSE 0 END) AS BIGINT) AS contraction_cents,
      |  CAST(sum(CASE WHEN kind = 'churn' THEN base_cents ELSE 0 END) AS BIGINT) AS churned_cents,
      |  CAST(sum(cur_cents) AS BIGINT) AS ending_cents
      |FROM x GROUP BY 1 ORDER BY y""".stripMargin

  /** q68: discount elasticity per brand — "does discounting actually
    * move volume for this brand?": the OLS slope of line quantity on
    * discount (q61's exact-decimal-moments discipline, here with
    * x = discount in integer bp so every moment is integral), plus R²
    * — the evidence a pricing review wants before renewing a promo
    * budget. A near-zero slope with tiny R² (the honest answer on
    * uncorrelated data) is itself the finding: the discount ladder is
    * not buying volume.
    *
    * Determinism: all six moments are DECIMAL(38)-exact sums of
    * integers; only the final slope/R² divisions run in double on
    * identical operand trees (the q61/c39 rule — no pow, no ln).
    *
    * Shape: ONE lineitem scan joins part un-hinted (AQE at test SF,
    * SMJ at scale) → per-brand moment reduce (map-side partial) →
    * row-local algebra on ≤|brands| rows. */
  def q68DiscountElasticity(spark: SparkSession, dir: String): DataFrame = {
    def d38(c: Column): Column = c.cast(DecimalType(38, 0))
    // spread loader (guide §2.5): r16 A/B-measured win (1.19 -> 0.77)
    Tables.spread(spark, dir, "lineitem", "l_orderkey")
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        expr("cast(cast(l_discount as decimal(4,2)) * 10000 as bigint)").as("x"),
        expr("cast(cast(l_quantity as decimal(12,2)) as bigint)").as("y"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lines"),
        sum(d38(col("x"))).as("sx"), sum(d38(col("y"))).as("sy"),
        sum(d38(col("x")) * d38(col("x"))).as("sxx"),
        sum(d38(col("x")) * d38(col("y"))).as("sxy"),
        sum(d38(col("y")) * d38(col("y"))).as("syy"))
      .filter(col("n_lines") >= 2)
      .withColumn("num", d38(col("n_lines")) * col("sxy") - col("sx") * col("sy"))
      .withColumn("den", d38(col("n_lines")) * col("sxx") - col("sx") * col("sx"))
      .withColumn("syyc", d38(col("n_lines")) * col("syy") - col("sy") * col("sy"))
      .select(col("p_brand"), col("n_lines"),
        // slope in qty per FULL discount unit: per-bp slope x 10000
        (col("num").cast("double") / col("den").cast("double") * 10000)
          .as("slope_qty_per_disc"),
        ((col("num").cast("double") / col("den").cast("double")) *
          (col("num").cast("double") / col("syyc").cast("double"))).as("r2"))
      .orderBy(col("p_brand"))
  }

  val q68Sql: String =
    """WITH pts AS (
      |  SELECT p_brand,
      |    CAST(CAST(l_discount AS DECIMAL(4,2)) * 10000 AS BIGINT) AS x,
      |    CAST(CAST(l_quantity AS DECIMAL(12,2)) AS BIGINT) AS y
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |m AS (
      |  SELECT p_brand, count(*) AS n_lines,
      |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx,
      |    sum(CAST(x AS HUGEINT) * y) AS sxy,
      |    sum(CAST(y AS HUGEINT) * y) AS syy
      |  FROM pts GROUP BY 1),
      |k AS (
      |  SELECT p_brand, n_lines,
      |    n_lines * sxy - sx * sy AS num,
      |    n_lines * sxx - sx * sx AS den,
      |    n_lines * syy - sy * sy AS syyc
      |  FROM m WHERE n_lines >= 2)
      |SELECT p_brand, CAST(n_lines AS BIGINT) AS n_lines,
      |  CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 10000 AS slope_qty_per_disc,
      |  (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
      |    * (CAST(num AS DOUBLE) / CAST(syyc AS DOUBLE)) AS r2
      |FROM k ORDER BY p_brand""".stripMargin

  /** q69: returns p-chart — the Shewhart attribute control chart
    * (Shewhart 1931; the p-chart for fraction nonconforming) over
    * monthly return rates: per month, lines shipped, lines returned,
    * the return fraction, and the 3σ binomial control limits
    * UCL/LCL = p̄ ± 3·√(p̄(1−p̄)/n) around the process-wide center
    * line, with the out-of-control flag — the quality-ops read
    * ("did returns BREAK this month or is it just binomial noise")
    * that a bare monthly-rate report cannot give, because a small
    * month wobbles more than a big one and the limits must widen
    * accordingly (the whole point of the p-chart).
    *
    * Determinism: center line from EXACT window totals (longs); the
    * fraction, σ and limits are doubles built from identical operand
    * trees in both engines — +,−,×,÷,√ only (the c39 Wilson rule; no
    * pow, no ln). LCL clamps at 0 (a fraction cannot go negative).
    *
    * Shape: ONE lineitem scan → month reduce (map-side partial) →
    * two window sums over the ≤|months| frame for the center line →
    * row-local limits. */
  def q69ReturnPchart(spark: SparkSession, dir: String): DataFrame = {
    val wAll = Window.partitionBy(lit(1))
    Tables.lineitem(spark, dir)
      .groupBy((year(col("l_shipdate")) * 12 + month(col("l_shipdate")) - 1)
        .cast("long").as("month_idx"))
      .agg(count(lit(1)).as("n_lines"),
        countIf(col("l_returnflag") === "R").as("n_returned"))
      .withColumn("pbar",
        (sum(col("n_returned")).over(wAll).cast("double") /
          sum(col("n_lines")).over(wAll).cast("double")))
      .withColumn("sigma",
        sqrt(col("pbar") * (lit(1.0) - col("pbar")) / col("n_lines").cast("double")))
      .select(col("month_idx"), col("n_lines"), col("n_returned"),
        (col("n_returned").cast("double") / col("n_lines").cast("double")).as("p_ret"),
        col("pbar"),
        (col("pbar") + lit(3.0) * col("sigma")).as("ucl"),
        greatest(col("pbar") - lit(3.0) * col("sigma"), lit(0.0)).as("lcl"))
      .withColumn("ooc", col("p_ret") > col("ucl") || col("p_ret") < col("lcl"))
      .orderBy(col("month_idx"))
  }

  val q69Sql: String =
    """WITH m AS (
      |  SELECT CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT) AS month_idx,
      |    CAST(count(*) AS BIGINT) AS n_lines,
      |    CAST(count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS BIGINT) AS n_returned
      |  FROM lineitem GROUP BY 1),
      |c AS (
      |  SELECT *,
      |    CAST(sum(n_returned) OVER () AS DOUBLE) / CAST(sum(n_lines) OVER () AS DOUBLE) AS pbar
      |  FROM m),
      |s AS (
      |  SELECT *, sqrt(pbar * (1.0 - pbar) / CAST(n_lines AS DOUBLE)) AS sigma FROM c)
      |SELECT month_idx, n_lines, n_returned,
      |  CAST(n_returned AS DOUBLE) / CAST(n_lines AS DOUBLE) AS p_ret, pbar,
      |  pbar + 3.0 * sigma AS ucl,
      |  greatest(pbar - 3.0 * sigma, 0.0) AS lcl,
      |  (CAST(n_returned AS DOUBLE) / CAST(n_lines AS DOUBLE) > pbar + 3.0 * sigma
      |   OR CAST(n_returned AS DOUBLE) / CAST(n_lines AS DOUBLE)
      |      < greatest(pbar - 3.0 * sigma, 0.0)) AS ooc
      |FROM s ORDER BY month_idx""".stripMargin

  def q70Spearman(spark: SparkSession, dir: String): DataFrame =
    q70SpearmanOf(Tables.lineitem(spark, dir))

  /** q70: Spearman rank correlation between discount and quantity per
    * return flag — the ROBUST companion to q26's Pearson (rank
    * correlation sees any monotone relation and shrugs at outliers;
    * pricing tails wreck a raw-moment corr). The scale trick: never
    * rank 6 B rows. Discount and quantity live in TINY value spaces
    * (≤11 and ≤50 distinct values), so the row-grain ranking
    * compresses to the VALUE-GRAIN frequency table: the tie-averaged
    * rank of value v is cum_before(v) + (t_v + 1)/2 — computable with
    * a window over the ≤50-row marginal frame (c31-compliant; a
    * per-flag rank window over the corpus would pin |flags| hot
    * partitions). Ranks are kept INTEGRAL by doubling (r2 = 2·cum +
    * t + 1); Pearson is scale-invariant, so ρ(r2x, r2y) = ρ(rank_x,
    * rank_y) exactly. Moments are frequency-weighted sums over the
    * ≤flag·11·50 joint cells in DECIMAL(38,0) — exact until the final
    * double sqrt/divide (the q26 IEEE discipline). Σ cnt·r2x·r2y ≤
    * 4n³: inside DECIMAL(38) up to n ≈ 2.9e12 rows — the 100 TB
    * corpus fits.
    *
    * Shape: ONE scan → (flag, disc, qty) map-side reduce (≤1650
    * cells) → marginal tie/cum windows over the SAME cell lineage
    * (re-aggregating per axis would re-scan the corpus per marginal —
    * the c49 trap; exact-offset RANGE frames, the c36 idiom) →
    * per-flag 1-row aggregate. No joins at all. */
  def q70SpearmanOf(lineitem: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def d38c(c: Column): Column = c.cast(DecimalType(38, 0))
    val cells = lineitem
      .select(col("l_returnflag").as("flag"),
        (dec2(col("l_discount")) * 100).cast("bigint").as("dx"),
        col("l_quantity").cast("bigint").as("qy"))
      .groupBy(col("flag"), col("dx"), col("qy"))
      .agg(count(lit(1)).as("cnt"))
    // marginal tie counts and cum-before as WINDOWS over the same cell
    // lineage (re-aggregating `cells` per axis would re-scan lineitem
    // per marginal — the c49 branch-duplication trap; exact-offset
    // RANGE frames on the integer value are the c36 idiom)
    def r2(valCol: String): Column = {
      val t = sum(col("cnt")).over(Window.partitionBy(col("flag"), col(valCol)))
      val cumBefore = coalesce(
        sum(col("cnt")).over(Window.partitionBy(col("flag")).orderBy(col(valCol))
          .rangeBetween(Window.unboundedPreceding, -1)), lit(0L))
      lit(2) * cumBefore + t + 1
    }
    cells
      .withColumn("rx", d38c(r2("dx")))
      .withColumn("ry", d38c(r2("qy")))
      .select(col("flag"), d38c(col("cnt")).as("c"), col("rx"), col("ry"))
      .groupBy(col("flag"))
      .agg(sum(col("c")).as("n"),
        sum(col("c") * col("rx")).as("sx"),
        sum(col("c") * col("ry")).as("sy"),
        sum(col("c") * col("rx") * col("ry")).as("sxy"),
        sum(col("c") * col("rx") * col("rx")).as("sxx"),
        sum(col("c") * col("ry") * col("ry")).as("syy"))
      .select(col("flag").as("l_returnflag"), col("n").cast("bigint").as("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
          .as("spearman"))
      .orderBy(col("l_returnflag"))
  }

  val q70Sql: String =
    """WITH cells AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS dx,
      |    CAST(l_quantity AS BIGINT) AS qy, count(*) AS cnt
      |  FROM lineitem GROUP BY 1, 2, 3),
      |j AS (
      |  SELECT flag, CAST(cnt AS HUGEINT) AS c,
      |    CAST(2 * coalesce(sum(cnt) OVER (PARTITION BY flag ORDER BY dx
      |        RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      + sum(cnt) OVER (PARTITION BY flag, dx) + 1 AS HUGEINT) AS rx,
      |    CAST(2 * coalesce(sum(cnt) OVER (PARTITION BY flag ORDER BY qy
      |        RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      + sum(cnt) OVER (PARTITION BY flag, qy) + 1 AS HUGEINT) AS ry
      |  FROM cells),
      |m AS (
      |  SELECT flag, sum(c) AS n, sum(c * rx) AS sx, sum(c * ry) AS sy,
      |    sum(c * rx * ry) AS sxy, sum(c * rx * rx) AS sxx, sum(c * ry * ry) AS syy
      |  FROM j GROUP BY 1)
      |SELECT flag AS l_returnflag, CAST(n AS BIGINT) AS n,
      |  CAST(n * sxy - sx * sy AS DOUBLE)
      |    / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
      |    AS spearman
      |FROM m ORDER BY l_returnflag""".stripMargin

  def q71KendallTau(spark: SparkSession, dir: String): DataFrame =
    q71KendallTauOf(Tables.lineitem(spark, dir))

  /** q71: Kendall tau-b between discount and quantity per return flag —
    * the PAIRWISE companion to q70's Spearman (tau counts concordant
    * vs discordant pairs directly, so its value is interpretable as a
    * probability difference and its small-sample behavior is the
    * textbook reason analysts ask for both). The naive statistic is an
    * O(n²) sweep over row pairs — 1.8e19 pairs at 6 B rows. The scale
    * trick is q70's value-space compression taken one step further:
    * both axes live in tiny value spaces (≤11 discounts × ≤50
    * quantities), so ALL pair information collapses onto the joint
    * frequency table. C − D = Σ_{cells a,b: dx_a<dx_b} c_a·c_b·
    * sgn(qy_b − qy_a) over cell PAIRS (≤550² per flag — fixed cost
    * regardless of corpus size), and the tau-b tie corrections need
    * only the marginal tie counts: n1 = Σ_x t_x(t_x−1)/2, n2 likewise
    * on y, n0 = n(n−1)/2, tau_b = (C−D)/√((n0−n1)(n0−n2)). Products
    * reach n² — DECIMAL(38,0) throughout (exact to n ≈ 1.3e19), one
    * IEEE divide/sqrt at the end (the q26 discipline).
    *
    * Shape: ONE corpus scan → (flag, dx, qy) map-side reduce, then
    * `localCheckpoint` of the ≤1650-row cell frame (the c53 idiom) so
    * its four consumers — pair-join both sides, two marginals — share
    * the materialized reduce instead of re-deriving the corpus lineage
    * (the c49 trap). The pair join is an equi-join on flag between two
    * value-bounded frames; never a cartesian. */
  def q71KendallTauOf(lineitem: DataFrame): DataFrame = {
    def d38(c: Column): Column = c.cast(DecimalType(38, 0))
    val cells = lineitem
      .select(col("l_returnflag").as("flag"),
        (dec2(col("l_discount")) * 100).cast("bigint").as("dx"),
        col("l_quantity").cast("bigint").as("qy"))
      .groupBy(col("flag"), col("dx"), col("qy"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val a = cells.select(col("flag"), col("dx").as("dxa"), col("qy").as("qya"),
      col("cnt").as("ca"))
    val b = cells.select(col("flag"), col("dx").as("dxb"), col("qy").as("qyb"),
      col("cnt").as("cb"))
    val cd = a.join(b, Seq("flag")).filter(col("dxa") < col("dxb"))
      .groupBy(col("flag"))
      .agg(sum(d38(col("ca")) * d38(col("cb")) *
        signum(col("qyb") - col("qya")).cast("int")).as("cmd"))
    def tiePairs(axis: String, out: String): DataFrame = cells
      .groupBy(col("flag"), col(axis)).agg(sum(col("cnt")).as("t"))
      .groupBy(col("flag"))
      .agg(sum((d38(col("t")) * (d38(col("t")) - 1)) / 2).cast(DecimalType(38, 0))
        .as(out))
    val n0 = cells.groupBy(col("flag"))
      .agg(sum(col("cnt")).as("n"))
      .select(col("flag"), col("n"),
        ((d38(col("n")) * (d38(col("n")) - 1)) / 2).cast(DecimalType(38, 0)).as("n0"))
    n0.join(tiePairs("dx", "n1"), Seq("flag"))
      .join(tiePairs("qy", "n2"), Seq("flag"))
      .join(cd, Seq("flag"))
      .select(col("flag").as("l_returnflag"), col("n").cast("bigint").as("n"),
        (col("cmd").cast("double") /
          (sqrt((col("n0") - col("n1")).cast("double")) *
            sqrt((col("n0") - col("n2")).cast("double")))).as("tau_b"))
      .orderBy(col("l_returnflag"))
  }

  val q71Sql: String =
    """WITH cells AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS dx,
      |    CAST(l_quantity AS BIGINT) AS qy, count(*) AS cnt
      |  FROM lineitem GROUP BY 1, 2, 3),
      |cd AS (
      |  SELECT a.flag,
      |    sum(CAST(a.cnt AS HUGEINT) * b.cnt *
      |      CASE WHEN b.qy > a.qy THEN 1 WHEN b.qy < a.qy THEN -1 ELSE 0 END) AS cmd
      |  FROM cells a JOIN cells b ON a.flag = b.flag AND a.dx < b.dx
      |  GROUP BY 1),
      |tx AS (
      |  SELECT flag, sum(CAST(t AS HUGEINT) * (t - 1) // 2) AS n1
      |  FROM (SELECT flag, dx, sum(cnt) AS t FROM cells GROUP BY 1, 2) GROUP BY 1),
      |ty AS (
      |  SELECT flag, sum(CAST(t AS HUGEINT) * (t - 1) // 2) AS n2
      |  FROM (SELECT flag, qy, sum(cnt) AS t FROM cells GROUP BY 1, 2) GROUP BY 1),
      |nn AS (
      |  SELECT flag, sum(cnt) AS n,
      |    CAST(sum(cnt) AS HUGEINT) * (sum(cnt) - 1) // 2 AS n0
      |  FROM cells GROUP BY 1)
      |SELECT nn.flag AS l_returnflag, CAST(nn.n AS BIGINT) AS n,
      |  CAST(cd.cmd AS DOUBLE) /
      |    (sqrt(CAST(nn.n0 - tx.n1 AS DOUBLE)) * sqrt(CAST(nn.n0 - ty.n2 AS DOUBLE)))
      |    AS tau_b
      |FROM nn JOIN tx ON nn.flag = tx.flag JOIN ty ON nn.flag = ty.flag
      |  JOIN cd ON nn.flag = cd.flag
      |ORDER BY l_returnflag""".stripMargin

  def q72MannWhitney(spark: SparkSession, dir: String): DataFrame =
    q72MannWhitneyOf(Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("grp"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long").as("delay"),
        (col("l_returnflag") === "R").as("is_ret")))

  /** q72: Mann–Whitney U test per order priority — do RETURNED items
    * sit on a different ship-delay distribution than kept ones? The
    * rank-sum test is the standard nonparametric two-sample location
    * test (Mann & Whitney 1947); q63's KS answers "any shape change",
    * this answers the sharper "stochastically larger" question QA
    * actually asks about returns. Never ranks the corpus: delays live
    * in a small integer value space (ship − order ≤ ~4 months), so
    * the row-grain rank sum collapses onto the per-priority delay
    * histogram with a conditional aggregate per side (the a20/a36
    * one-scan idiom — no returned/kept branch split). 2U = Σ_v
    * ret(v)·(2·cum_kept_before(v) + kept(v)) keeps half-tie credits
    * integral; the tie-corrected z uses T = (n+1)n(n−1) − Σ(t³−t) in
    * DECIMAL(38,0) (exact to n ≈ 6.9e9 per group), then ONE IEEE
    * divide/sqrt — numerator and denominator are each a correctly-
    * rounded cast of an exact integer, so z is engine-identical
    * bit-for-bit. u2 is int64-exact while ret·kept < 4.6e18 (~2e9
    * rows per side per group); past that emit DECIMAL instead.
    *
    * Shape: two scans = two genuine inputs (lineitem ⨝ orders on the
    * natural key, the q63 precedent) → (priority, delay) map-side
    * reduce with per-side conditional counts (≤ priorities ×
    * delay-span cells) → exact-offset RANGE window (c36 idiom) →
    * per-group 1-row aggregate. */
  def q72MannWhitneyOf(pairs: DataFrame): DataFrame = {
    def d38(c: Column): Column = c.cast(DecimalType(38, 0))
    val cells = pairs
      .groupBy(col("grp"), col("delay"))
      .agg(sum(when(col("is_ret"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("is_ret"), 0L).otherwise(1L)).as("cb"))
    val wBefore = Window.partitionBy(col("grp")).orderBy(col("delay"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val scored = cells
      .withColumn("cumb", coalesce(sum(col("cb")).over(wBefore), lit(0L)))
      .withColumn("t", col("ca") + col("cb"))
    val m = scored.groupBy(col("grp"))
      .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
        sum(d38(col("ca")) * (lit(2) * col("cumb") + col("cb"))).as("u2"),
        sum(d38(col("t")) * col("t") * col("t") - col("t")).as("tie3"))
      .withColumn("n", col("na") + col("nb"))
      .withColumn("tt",
        (d38(col("n")) + 1) * col("n") * (col("n") - 1) - col("tie3"))
    m.select(col("grp").as("o_orderpriority"),
      col("na").cast("bigint").as("n_ret"), col("nb").cast("bigint").as("n_kept"),
      col("u2").cast("bigint").as("u2"),
      when(col("na") === 0 || col("nb") === 0 || col("tt") === 0, lit(null))
        .otherwise((col("u2") - d38(col("na")) * d38(col("nb"))).cast("double") /
          sqrt(((d38(col("na")) * d38(col("nb"))).cast("double") *
            col("tt").cast("double")) /
            (lit(3.0) * (d38(col("n")) * (d38(col("n")) - 1)).cast("double"))))
        .as("z"))
      .orderBy(col("o_orderpriority"))
  }

  val q72Sql: String =
    """WITH cells AS (
      |  SELECT o.o_orderpriority AS grp,
      |    date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) AS delay,
      |    CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 0 ELSE 1 END) AS BIGINT) AS cb
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT grp, ca, cb, ca + cb AS t,
      |    coalesce(sum(cb) OVER (PARTITION BY grp ORDER BY delay
      |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
      |  FROM cells),
      |m AS (
      |  SELECT grp, sum(ca) AS na, sum(cb) AS nb,
      |    sum(CAST(ca AS HUGEINT) * (2 * cumb + cb)) AS u2,
      |    sum(CAST(t AS HUGEINT) * t * t - t) AS tie3
      |  FROM scored GROUP BY 1),
      |f AS (
      |  SELECT grp, na, nb, na + nb AS n, u2,
      |    (CAST(na + nb AS HUGEINT) + 1) * (na + nb) * (na + nb - 1) - tie3 AS tt
      |  FROM m)
      |SELECT grp AS o_orderpriority, CAST(na AS BIGINT) AS n_ret,
      |  CAST(nb AS BIGINT) AS n_kept, CAST(u2 AS BIGINT) AS u2,
      |  CASE WHEN na = 0 OR nb = 0 OR tt = 0 THEN NULL
      |    ELSE CAST(u2 - CAST(na AS HUGEINT) * nb AS DOUBLE) /
      |      sqrt((CAST(CAST(na AS HUGEINT) * nb AS DOUBLE) * CAST(tt AS DOUBLE))
      |        / (3.0 * CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE)))
      |  END AS z
      |FROM f ORDER BY o_orderpriority""".stripMargin

  def q73AnovaTwoWay(spark: SparkSession, dir: String): DataFrame =
    q73AnovaTwoWayOf(Tables.lineitem(spark, dir))

  /** q73: two-way ANOVA of line price by return flag × line status —
    * the FACTORIAL extension of c51's one-way η²: does the flag move
    * price, does status, and do they INTERACT (the question one-way
    * contrasts structurally cannot ask)? Classic weighted-means
    * (Type I) decomposition on the unbalanced design, documented as
    * such: SS_A = Σ_a S_a²/n_a − C, SS_B likewise, SS_cells from the
    * (a,b) cells, SS_AB and SS_err by subtraction; F = mean-square
    * ratios.
    *
    * Determinism: Σ(S²/n) terms are RATIONALS, and IEEE double
    * summation is order-sensitive — a cross-engine hash would flake on
    * aggregation order. So every SS term is truncated to integral
    * MILLI-cents² FIRST (S²·1000 div n — the q63 d_ppm idiom):
    * integer terms sum order-free and engine-identically; the bounded
    * truncation error (≤ 1 milli per group) is documentation, not
    * noise. Each F is then ONE IEEE division of two exact integer
    * products ((SS_A·df_err) / (df_A·SS_err)) — bit-identical. All
    * moments are DECIMAL(38,0) over cents (Σy² ≈ 2.4e24 at 6 B rows;
    * ·1000 stays inside DECIMAL(38)).
    *
    * Shape: ONE scan → (flag, status) cell reduce (≤6 rows),
    * `localCheckpoint`ed (the c53/q71 idiom) so the four marginal
    * consumers (A, B, cells, totals) share the materialized reduce;
    * the 1-row moment frames combine by literal-capacity crossJoin
    * (BNLJ-allowlisted) and explode to the 5 effect rows. */
  def q73AnovaTwoWayOf(lineitem: DataFrame): DataFrame = {
    def d38(c: Column): Column = c.cast(DecimalType(38, 0))
    // floor division that STAYS DECIMAL(38,0): Spark's `div` returns
    // LONG, and S²·1000/n ≈ 1.8e20 already overflows int64 at sf0.01.
    // (a − a mod b)/b is exactly integral, so the decimal divide is
    // exact and the (38,0) cast is lossless — DuckDB's HUGEINT `//`
    // mirrors it for positive operands.
    def fdiv(a: Column, b: Column): Column =
      ((a - (a % b)) / b).cast(DecimalType(38, 0))
    val cells = lineitem
      .select(col("l_returnflag").as("fa"), col("l_linestatus").as("fb"),
        (dec2(col("l_extendedprice")) * 100).cast("bigint").as("y"))
      .groupBy(col("fa"), col("fb"))
      .agg(count(lit(1)).as("n"), sum(d38(col("y"))).as("s"),
        sum(d38(col("y")) * col("y")).as("ssq"))
      .localCheckpoint(true)
    def termSum(grouped: DataFrame, levels: String): DataFrame = grouped
      .agg(sum(fdiv(col("s") * col("s") * 1000, d38(col("n"))))
          .cast(DecimalType(38, 0)).as(s"t_$levels"),
        count(lit(1)).cast("long").as(s"k_$levels"))
    val ma = termSum(cells.groupBy(col("fa"))
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s")), "a")
    val mb = termSum(cells.groupBy(col("fb"))
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s")), "b")
    val mc = termSum(cells, "c")
    val tot = cells.agg(sum(col("n")).as("nn"), sum(col("s")).as("ss"),
      sum(col("ssq")).as("sq"))
      .select(col("nn"),
        fdiv(col("ss") * col("ss") * 1000, d38(col("nn"))).as("corr"),
        (d38(col("sq")) * 1000).cast(DecimalType(38, 0)).as("sqm"))
    val m = tot.crossJoin(ma).crossJoin(mb).crossJoin(mc)
      .withColumn("ss_a", col("t_a") - col("corr"))
      .withColumn("ss_b", col("t_b") - col("corr"))
      .withColumn("ss_ab", col("t_c") - col("t_a") - col("t_b") + col("corr"))
      .withColumn("ss_err", col("sqm") - col("t_c"))
      .withColumn("ss_tot", col("sqm") - col("corr"))
      .withColumn("df_a", col("k_a") - 1)
      .withColumn("df_b", col("k_b") - 1)
      .withColumn("df_ab", (col("k_a") - 1) * (col("k_b") - 1))
      .withColumn("df_err", col("nn") - col("k_c"))
      .withColumn("df_tot", col("nn") - 1)
    def fOf(ss: String, df: String): Column =
      when(col(df) > 0 && col("ss_err") > 0 && col("df_err") > 0,
        (col(ss) * col("df_err")).cast("double") /
          (col(df) * col("ss_err")).cast("double"))
    m.select(explode(array(
        struct(lit("returnflag").as("effect"), col("ss_a").cast("double").as("ss_milli"),
          col("df_a").cast("long").as("df"), fOf("ss_a", "df_a").as("f")),
        struct(lit("linestatus").as("effect"), col("ss_b").cast("double").as("ss_milli"),
          col("df_b").cast("long").as("df"), fOf("ss_b", "df_b").as("f")),
        struct(lit("interaction").as("effect"), col("ss_ab").cast("double").as("ss_milli"),
          col("df_ab").cast("long").as("df"), fOf("ss_ab", "df_ab").as("f")),
        struct(lit("error").as("effect"), col("ss_err").cast("double").as("ss_milli"),
          col("df_err").cast("long").as("df"), lit(null).cast("double").as("f")),
        struct(lit("total").as("effect"), col("ss_tot").cast("double").as("ss_milli"),
          col("df_tot").cast("long").as("df"), lit(null).cast("double").as("f"))))
        .as("r"))
      .select(col("r.effect").as("effect"), col("r.ss_milli"), col("r.df"), col("r.f"))
      .orderBy(col("effect"))
  }

  val q73Sql: String =
    """WITH cells AS (
      |  SELECT l_returnflag AS fa, l_linestatus AS fb,
      |    CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS HUGEINT)) AS s,
      |    sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS HUGEINT)
      |      * CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS HUGEINT)) AS ssq
      |  FROM lineitem GROUP BY 1, 2),
      |ma AS (
      |  SELECT sum((s * s * 1000) // n) AS t_a, count(*) AS k_a
      |  FROM (SELECT fa, sum(n) AS n, sum(s) AS s FROM cells GROUP BY 1)),
      |mb AS (
      |  SELECT sum((s * s * 1000) // n) AS t_b, count(*) AS k_b
      |  FROM (SELECT fb, sum(n) AS n, sum(s) AS s FROM cells GROUP BY 1)),
      |mc AS (SELECT sum((s * s * 1000) // n) AS t_c, count(*) AS k_c FROM cells),
      |tot AS (
      |  SELECT sum(n) AS nn, (sum(s) * sum(s) * 1000) // sum(n) AS corr,
      |    sum(ssq) * 1000 AS sqm
      |  FROM cells),
      |m AS (
      |  SELECT nn, corr, sqm, t_a, k_a, t_b, k_b, t_c, k_c,
      |    t_a - corr AS ss_a, t_b - corr AS ss_b,
      |    t_c - t_a - t_b + corr AS ss_ab,
      |    sqm - t_c AS ss_err, sqm - corr AS ss_tot,
      |    k_a - 1 AS df_a, k_b - 1 AS df_b, (k_a - 1) * (k_b - 1) AS df_ab,
      |    nn - k_c AS df_err, nn - 1 AS df_tot
      |  FROM tot, ma, mb, mc)
      |SELECT effect, ss_milli, df, f FROM (
      |  SELECT 'returnflag' AS effect, CAST(ss_a AS DOUBLE) AS ss_milli,
      |    CAST(df_a AS BIGINT) AS df,
      |    CASE WHEN df_a > 0 AND ss_err > 0 AND df_err > 0
      |      THEN CAST(ss_a * df_err AS DOUBLE) / CAST(df_a * ss_err AS DOUBLE) END AS f
      |  FROM m
      |  UNION ALL
      |  SELECT 'linestatus', CAST(ss_b AS DOUBLE), CAST(df_b AS BIGINT),
      |    CASE WHEN df_b > 0 AND ss_err > 0 AND df_err > 0
      |      THEN CAST(ss_b * df_err AS DOUBLE) / CAST(df_b * ss_err AS DOUBLE) END
      |  FROM m
      |  UNION ALL
      |  SELECT 'interaction', CAST(ss_ab AS DOUBLE), CAST(df_ab AS BIGINT),
      |    CASE WHEN df_ab > 0 AND ss_err > 0 AND df_err > 0
      |      THEN CAST(ss_ab * df_err AS DOUBLE) / CAST(df_ab * ss_err AS DOUBLE) END
      |  FROM m
      |  UNION ALL
      |  SELECT 'error', CAST(ss_err AS DOUBLE), CAST(df_err AS BIGINT), NULL FROM m
      |  UNION ALL
      |  SELECT 'total', CAST(ss_tot AS DOUBLE), CAST(df_tot AS BIGINT), NULL FROM m)
      |ORDER BY effect""".stripMargin

  def q74KruskalWallis(spark: SparkSession, dir: String): DataFrame =
    q74KruskalWallisOf(Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .select(year(to_date(col("o_orderdate"))).cast("long").as("yr"),
        col("o_orderpriority").as("grp"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long").as("delay")))

  /** q74: Kruskal–Wallis H per order year — do the FIVE priorities sit
    * on one ship-delay distribution, or does at least one differ? The
    * k-sample extension of q72's two-sample rank test (Kruskal &
    * Wallis 1952): q73 answers the parametric mean question, this is
    * the distribution-free one an SLA audit wants when delays are
    * skewed. Never ranks the corpus: delays live in a small integer
    * value space, so row-grain midranks collapse onto the (year,
    * priority, delay) histogram — 2·midrank(v) = 2·cum_before(v) +
    * t_v + 1 keeps half-tie credits integral, and the per-value tie
    * term folds into the SAME pass as c·(t²−1) (Σ_groups c over a
    * value is t, so the sum telescopes to Σ(t³−t) with no second
    * value-grain consumer — single lineage, no checkpoint).
    * H = 3·ΣR2_i²/n_i / (N(N+1)) − 3(N+1) on doubled rank sums;
    * tie-adjusted by (N³−N)/(N³−N−Σ(t³−t)).
    *
    * Determinism: ΣR2_i²/n_i is rational → milli-truncated per group
    * first (R2²·1000 div n, the q73 idiom) so the year aggregate sums
    * exact DECIMAL(38,0) terms order-free; h/h_adj are then fixed-
    * shape scalar IEEE expressions over exact integers — engine-
    * identical. Exact while R2²·1000 < 1e38, i.e. ≤ ~5.6e8 rows per
    * (year, priority); past that move the milli factor into the
    * final doubles. The Σ2R_i = N(N+1) conservation identity ships as
    * `rank_check` — a free full-ranking audit.
    *
    * Shape: two scans = two genuine inputs (lineitem ⨝ orders on the
    * natural key, the q63/q72 precedent) → (year, priority, delay)
    * map-side reduce → two windows on the value-bounded frame (t at
    * (year, delay) grain; exact-offset RANGE cum at year grain) →
    * (year, priority) reduce → per-year 1-row aggregate. */
  def q74KruskalWallisOf(rows: DataFrame): DataFrame = {
    def d38(c: Column): Column = c.cast(DecimalType(38, 0))
    def fdiv(a: Column, b: Column): Column =
      ((a - (a % b)) / b).cast(DecimalType(38, 0))
    val cells = rows.groupBy(col("yr"), col("grp"), col("delay"))
      .agg(count(lit(1)).as("c"))
    val scored = cells
      .withColumn("t", sum(col("c")).over(
        Window.partitionBy(col("yr"), col("delay"))))
      .withColumn("cumb", coalesce(sum(col("c")).over(
        Window.partitionBy(col("yr")).orderBy(col("delay"))
          .rangeBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val byGrp = scored.groupBy(col("yr"), col("grp"))
      .agg(sum(col("c")).as("ni"),
        sum(d38(col("c")) * (lit(2) * col("cumb") + col("t") + 1)).as("r2"),
        sum(d38(col("c")) * (d38(col("t")) * col("t") - 1)).as("tiep"))
    val byYr = byGrp.groupBy(col("yr"))
      .agg(sum(col("ni")).as("n"), count(lit(1)).as("k"),
        sum(fdiv(col("r2") * col("r2") * 1000, d38(col("ni")))).as("s"),
        sum(col("tiep")).as("tie3"), sum(col("r2")).as("r2sum"))
      .withColumn("cub", d38(col("n")) * col("n") * col("n") - col("n"))
    byYr
      .withColumn("h",
        when(col("k") > 1 && col("cub") > col("tie3"),
          (col("s") * 3).cast("double") /
            (d38(col("n")) * (col("n") + 1) * 1000).cast("double") -
            (col("n") + 1).cast("double") * 3.0))
      .withColumn("h_adj",
        col("h") * (col("cub").cast("double") /
          (col("cub") - col("tie3")).cast("double")))
      .select(col("yr").as("order_year"),
        col("n").cast("bigint").as("n_rows"),
        col("k").cast("bigint").as("k_groups"),
        (col("r2sum") === d38(col("n")) * (col("n") + 1)).as("rank_check"),
        col("h"), col("h_adj"),
        (col("h_adj") > when(col("k") === 2, 3.841)
          .when(col("k") === 3, 5.991).when(col("k") === 4, 7.815)
          .when(col("k") === 5, 9.488).when(col("k") === 6, 11.070))
          .as("significant"))
      .orderBy(col("order_year"))
  }

  val q74Sql: String =
    """WITH rows_in AS (
      |  SELECT year(CAST(o.o_orderdate AS DATE)) AS yr,
      |    o.o_orderpriority AS grp,
      |    date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) AS delay
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |cells AS (
      |  SELECT yr, grp, delay, CAST(count(*) AS BIGINT) AS c
      |  FROM rows_in GROUP BY 1, 2, 3),
      |scored AS (
      |  SELECT yr, grp, c,
      |    sum(c) OVER (PARTITION BY yr, delay) AS t,
      |    coalesce(sum(c) OVER (PARTITION BY yr ORDER BY delay
      |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
      |  FROM cells),
      |by_grp AS (
      |  SELECT yr, grp, sum(c) AS ni,
      |    sum(CAST(c AS HUGEINT) * (2 * cumb + t + 1)) AS r2,
      |    sum(CAST(c AS HUGEINT) * (CAST(t AS HUGEINT) * t - 1)) AS tiep
      |  FROM scored GROUP BY 1, 2),
      |by_yr AS (
      |  SELECT yr, sum(ni) AS n, count(*) AS k,
      |    sum((r2 * r2 * 1000) // CAST(ni AS HUGEINT)) AS s,
      |    sum(tiep) AS tie3, sum(r2) AS r2sum
      |  FROM by_grp GROUP BY 1),
      |f AS (
      |  SELECT yr, n, k, s, tie3, r2sum,
      |    CAST(n AS HUGEINT) * n * n - n AS cub
      |  FROM by_yr),
      |g AS (
      |  SELECT yr, n, k, r2sum = CAST(n AS HUGEINT) * (n + 1) AS rank_check,
      |    CASE WHEN k > 1 AND cub > tie3 THEN
      |      CAST(s * 3 AS DOUBLE) / CAST(CAST(n AS HUGEINT) * (n + 1) * 1000 AS DOUBLE)
      |        - CAST(n + 1 AS DOUBLE) * 3.0 END AS h,
      |    cub, tie3
      |  FROM f)
      |SELECT yr AS order_year, CAST(n AS BIGINT) AS n_rows,
      |  CAST(k AS BIGINT) AS k_groups, rank_check, h,
      |  h * (CAST(cub AS DOUBLE) / CAST(cub - tie3 AS DOUBLE)) AS h_adj,
      |  h * (CAST(cub AS DOUBLE) / CAST(cub - tie3 AS DOUBLE)) >
      |    CASE k WHEN 2 THEN 3.841 WHEN 3 THEN 5.991 WHEN 4 THEN 7.815
      |           WHEN 5 THEN 9.488 WHEN 6 THEN 11.070 END AS significant
      |FROM g ORDER BY order_year""".stripMargin

  def q75Levene(spark: SparkSession, dir: String): DataFrame =
    q75LeveneOf(Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .select(year(to_date(col("o_orderdate"))).cast("long").as("yr"),
        col("o_orderpriority").as("grp"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long").as("delay")))

  /** q75: Brown–Forsythe (median-centered Levene) test per order year
    * — do the priorities differ in delay SPREAD? The scale complement
    * to q74's location test, and the homogeneity-of-variance check
    * q73's F silently assumes: one-way ANOVA on |y − median_i|, with
    * the median (not the mean) center for robustness under the skew
    * delays actually have (Brown & Forsythe 1974).
    *
    * All-integer trick: F is scale-invariant in the transformed
    * values, so it's computed on w = |2y − 2m_i| — the DOUBLED median
    * (lower+upper middle) is always integral, no .5 anywhere. Group
    * medians come off the (year, priority, delay) histogram with two
    * stacked windows (cum, then min-where — never a corpus rank);
    * sum-of-squares terms milli-truncate like q73 so year aggregates
    * sum order-free; F is ONE IEEE division of exact integer
    * products. Critical values are the df₂=∞ row (n−k is huge at any
    * real SF), documented as such.
    *
    * Shape: two scans (lineitem ⨝ orders, the q63/q72/q74 precedent)
    * → (year, priority, delay) map-side reduce → three windows on the
    * value-bounded frame (all same partition key — one exchange) →
    * (year, priority) reduce → per-year 1-row. */
  def q75LeveneOf(rows: DataFrame): DataFrame = {
    def d38(c: Column): Column = c.cast(DecimalType(38, 0))
    def fdiv(a: Column, b: Column): Column =
      ((a - (a % b)) / b).cast(DecimalType(38, 0))
    val wg = Window.partitionBy(col("yr"), col("grp"))
    val cells = rows.groupBy(col("yr"), col("grp"), col("delay"))
      .agg(count(lit(1)).as("c"))
      .withColumn("ni", sum(col("c")).over(wg))
      .withColumn("cum", sum(col("c")).over(wg.orderBy(col("delay"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val centered = cells
      .withColumn("lo", min(when(col("cum") >= expr("(ni + 1) div 2"),
        col("delay"))).over(wg))
      .withColumn("hi", min(when(col("cum") >= expr("(ni + 2) div 2"),
        col("delay"))).over(wg))
      .withColumn("wv", abs(lit(2) * col("delay") - col("lo") - col("hi")))
    val byGrp = centered.groupBy(col("yr"), col("grp"))
      .agg(max(col("ni")).as("ni"),
        sum(d38(col("c")) * col("wv")).as("s"),
        sum(d38(col("c")) * col("wv") * col("wv")).as("q"))
    val byYr = byGrp.groupBy(col("yr"))
      .agg(sum(col("ni")).as("n"), count(lit(1)).as("k"),
        sum(col("q")).as("qq"), sum(col("s")).as("ssum"),
        sum(fdiv(col("s") * col("s") * 1000, d38(col("ni")))).as("t"))
      .withColumn("ss_b", col("t") - fdiv(col("ssum") * col("ssum") * 1000, d38(col("n"))))
      .withColumn("ss_w", d38(col("qq")) * 1000 - col("t"))
    byYr
      .withColumn("f",
        when(col("k") > 1 && col("ss_w") > 0,
          (col("ss_b") * (col("n") - col("k"))).cast("double") /
            ((col("k") - 1) * col("ss_w")).cast("double")))
      .select(col("yr").as("order_year"),
        col("n").cast("bigint").as("n_rows"),
        col("k").cast("bigint").as("k_groups"),
        col("ss_b").cast("double").as("ss_between_milli"),
        col("ss_w").cast("double").as("ss_within_milli"),
        col("f"),
        (col("f") > when(col("k") === 2, 3.841).when(col("k") === 3, 2.996)
          .when(col("k") === 4, 2.605).when(col("k") === 5, 2.372)
          .when(col("k") === 6, 2.214)).as("significant"))
      .orderBy(col("order_year"))
  }

  val q75Sql: String =
    """WITH rows_in AS (
      |  SELECT year(CAST(o.o_orderdate AS DATE)) AS yr,
      |    o.o_orderpriority AS grp,
      |    date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) AS delay
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |cells AS (
      |  SELECT yr, grp, delay, CAST(count(*) AS BIGINT) AS c
      |  FROM rows_in GROUP BY 1, 2, 3),
      |w1 AS (
      |  SELECT yr, grp, delay, c,
      |    sum(c) OVER (PARTITION BY yr, grp) AS ni,
      |    sum(c) OVER (PARTITION BY yr, grp ORDER BY delay
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM cells),
      |w2 AS (
      |  SELECT yr, grp, delay, c, ni,
      |    min(CASE WHEN cum >= (ni + 1) // 2 THEN delay END)
      |      OVER (PARTITION BY yr, grp) AS lo,
      |    min(CASE WHEN cum >= (ni + 2) // 2 THEN delay END)
      |      OVER (PARTITION BY yr, grp) AS hi
      |  FROM w1),
      |g AS (
      |  SELECT yr, grp, max(ni) AS ni,
      |    sum(CAST(c AS HUGEINT) * abs(2 * delay - lo - hi)) AS s,
      |    sum(CAST(c AS HUGEINT) * abs(2 * delay - lo - hi)
      |      * abs(2 * delay - lo - hi)) AS q
      |  FROM w2 GROUP BY 1, 2),
      |y AS (
      |  SELECT yr, sum(ni) AS n, count(*) AS k, sum(q) AS qq, sum(s) AS ssum,
      |    sum((s * s * 1000) // CAST(ni AS HUGEINT)) AS t
      |  FROM g GROUP BY 1),
      |fin AS (
      |  SELECT yr, n, k,
      |    t - (ssum * ssum * 1000) // CAST(n AS HUGEINT) AS ss_b,
      |    1000 * qq - t AS ss_w
      |  FROM y),
      |ff AS (
      |  SELECT yr, n, k, ss_b, ss_w,
      |    CASE WHEN k > 1 AND ss_w > 0 THEN
      |      CAST(ss_b * (n - k) AS DOUBLE) / CAST((k - 1) * ss_w AS DOUBLE) END AS f
      |  FROM fin)
      |SELECT yr AS order_year, CAST(n AS BIGINT) AS n_rows,
      |  CAST(k AS BIGINT) AS k_groups,
      |  CAST(ss_b AS DOUBLE) AS ss_between_milli,
      |  CAST(ss_w AS DOUBLE) AS ss_within_milli, f,
      |  f > CASE k WHEN 2 THEN 3.841 WHEN 3 THEN 2.996 WHEN 4 THEN 2.605
      |             WHEN 5 THEN 2.372 WHEN 6 THEN 2.214 END AS significant
      |FROM ff ORDER BY order_year""".stripMargin

  def q76CohortLtv(spark: SparkSession, dir: String): DataFrame =
    q76CohortLtvOf(Tables.orders(spark, dir))

  /** q76: customer-cohort lifetime-value curves — the REVENUE twin of
    * the event-side cohort family (c7 retention counts users, c57
    * halves event mass; finance wants dollars): customers cohorted by
    * first-order year, revenue accumulated by cohort age, cumulative
    * LTV per cohort member in exact cents. The curve shape is the
    * acquisition-quality readout — a cohort whose age-1 increment
    * collapses is churn the age-0 revenue hides.
    *
    * All-integer: money in cents via DECIMAL(12,2)·100 (the q73
    * idiom), cumulative window sums exact, ltv_cents = cum div
    * cohort size. Cohort size reads off the age-0 row for free (every
    * customer's first order is at its own age 0 — the c57 trick at
    * customer grain; a customer orders at most once per... no, MANY
    * orders per year, so size = distinct customers at age 0 needs the
    * first-order rows only: count rows where o_orderdate year equals
    * the customer's first-order year AND it's the customer's FIRST
    * order — row_number over customer keeps exactly one).
    *
    * Shape: ONE scan → per-customer min-date window (skew-free
    * customer partitions) + first-row marker → (cohort, age) reduce →
    * cum/size windows on the calendar-bounded cohort×age frame →
    * direct emit. */
  def q76CohortLtvOf(orders: DataFrame): DataFrame = {
    val wCust = Window.partitionBy(col("o_custkey"))
    val keyed = orders
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"),
        (dec2(col("o_totalprice")) * 100).cast("long").as("cents"))
      .withColumn("first_d", min(col("d")).over(wCust))
      .withColumn("rn", row_number().over(wCust.orderBy(col("d"))))
      .select(year(col("first_d")).cast("long").as("cohort_year"),
        (year(col("d")) - year(col("first_d"))).cast("long").as("age"),
        col("cents"), when(col("rn") === 1, 1L).otherwise(0L).as("is_first"))
    val byAge = keyed.groupBy(col("cohort_year"), col("age"))
      .agg(sum(col("cents")).as("revenue_cents"), count(lit(1)).as("n_orders"),
        sum(col("is_first")).as("n_new"))
    val wC = Window.partitionBy(col("cohort_year"))
    byAge
      .withColumn("cum", sum(col("revenue_cents")).over(
        wC.orderBy(col("age")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n_customers", max(when(col("age") === 0, col("n_new"))).over(wC))
      .select(col("cohort_year"), col("age"), col("n_customers"),
        col("n_orders"), col("revenue_cents"),
        col("cum").as("cum_revenue_cents"),
        expr("cum div n_customers").as("ltv_cents"))
      .orderBy(col("cohort_year"), col("age"))
  }

  val q76Sql: String =
    """WITH o AS (
      |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |  FROM orders),
      |k AS (
      |  SELECT o_custkey, d, cents,
      |    min(d) OVER (PARTITION BY o_custkey) AS first_d,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY d) AS rn
      |  FROM o),
      |ba AS (
      |  SELECT year(first_d) AS cohort_year, year(d) - year(first_d) AS age,
      |    sum(cents) AS revenue_cents, CAST(count(*) AS BIGINT) AS n_orders,
      |    CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_new
      |  FROM k GROUP BY 1, 2),
      |sc AS (
      |  SELECT cohort_year, age, revenue_cents, n_orders,
      |    sum(revenue_cents) OVER (PARTITION BY cohort_year ORDER BY age
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    max(CASE WHEN age = 0 THEN n_new END)
      |      OVER (PARTITION BY cohort_year) AS n_customers
      |  FROM ba)
      |SELECT CAST(cohort_year AS BIGINT) AS cohort_year, CAST(age AS BIGINT) AS age,
      |  n_customers, n_orders, CAST(revenue_cents AS BIGINT) AS revenue_cents,
      |  CAST(cum AS BIGINT) AS cum_revenue_cents,
      |  CAST(cum // n_customers AS BIGINT) AS ltv_cents
      |FROM sc ORDER BY cohort_year, age""".stripMargin

  def q77ReorderCadence(spark: SparkSession, dir: String): DataFrame =
    q77ReorderCadenceOf(Tables.orders(spark, dir)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"), col("o_custkey").as("cust"), col("d")))

  /** q77: purchase cadence per market segment — the inter-ORDER gap
    * distribution (c8's inter-event analysis lifted to the star
    * schema): how many days between a customer's consecutive orders,
    * exactly? Replenishment businesses read the median as the natural
    * reorder cycle and p90 as the churn horizon — "no order for >p90
    * days" is the winback trigger that doesn't misfire on normal
    * cadence. Consecutive per-customer gaps (the chain, not all
    * pairs), value-grain exact median/p90 (q21/d106 discipline —
    * never a corpus rank), mean in exact milli-days; single-order
    * customers ride the same reduce as null-gap rows (the d109
    * trick), so customer counts come for free.
    *
    * Shape: two scans (orders ⨝ customer on the natural key) →
    * per-customer lag window (skew-free) → (segment, gap) value-grain
    * reduce → per-segment cum windows on the bounded histogram →
    * 1-row per segment. */
  def q77ReorderCadenceOf(rows: DataFrame): DataFrame = {
    val wCust = Window.partitionBy(col("cust")).orderBy(col("d"))
    val gaps = rows
      .withColumn("prev", lag(col("d"), 1).over(wCust))
      .select(col("seg"), datediff(col("d"), col("prev")).cast("long").as("gap"))
    val wS = Window.partitionBy(col("seg"))
    val cells = gaps.groupBy(col("seg"), col("gap"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(
        wS.orderBy(col("gap").asc_nulls_first)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum(col("cnt")).over(wS))
      .withColumn("nf", sum(when(col("gap").isNull, col("cnt")).otherwise(0L)).over(wS))
    cells.groupBy(col("seg").as("c_mktsegment"))
      .agg(max(col("nf")).as("n_customers"),
        (max(col("tot")) - max(col("nf"))).as("n_repeat_pairs"),
        min(when(col("gap").isNotNull &&
          (col("cum") - col("nf")) * 2 >= col("tot") - col("nf"), col("gap")))
          .as("med_gap_days"),
        min(when(col("gap").isNotNull &&
          (col("cum") - col("nf")) * 10 >= (col("tot") - col("nf")) * 9, col("gap")))
          .as("p90_gap_days"),
        sum(when(col("gap").isNotNull, col("gap") * col("cnt")).otherwise(0L))
          .as("gap_sum"))
      .select(col("c_mktsegment"), col("n_customers"), col("n_repeat_pairs"),
        col("med_gap_days"), col("p90_gap_days"),
        when(col("n_repeat_pairs") > 0,
          expr("(gap_sum * 1000) div n_repeat_pairs")).as("mean_gap_milli"))
      .orderBy(col("c_mktsegment"))
  }

  val q77Sql: String =
    """WITH r AS (
      |  SELECT c.c_mktsegment AS seg, o.o_custkey AS cust,
      |    CAST(o.o_orderdate AS DATE) AS d
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |g AS (
      |  SELECT seg,
      |    date_diff('day', lag(d) OVER (PARTITION BY cust ORDER BY d), d) AS gap
      |  FROM r),
      |cells AS (
      |  SELECT seg, gap, CAST(count(*) AS BIGINT) AS cnt FROM g GROUP BY 1, 2),
      |sc AS (
      |  SELECT seg, gap, cnt,
      |    sum(cnt) OVER (PARTITION BY seg ORDER BY gap ASC NULLS FIRST
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(cnt) OVER (PARTITION BY seg) AS tot,
      |    sum(CASE WHEN gap IS NULL THEN cnt ELSE 0 END)
      |      OVER (PARTITION BY seg) AS nf
      |  FROM cells)
      |SELECT seg AS c_mktsegment, CAST(max(nf) AS BIGINT) AS n_customers,
      |  CAST(max(tot) - max(nf) AS BIGINT) AS n_repeat_pairs,
      |  min(CASE WHEN gap IS NOT NULL AND (cum - nf) * 2 >= tot - nf
      |    THEN CAST(gap AS BIGINT) END) AS med_gap_days,
      |  min(CASE WHEN gap IS NOT NULL AND (cum - nf) * 10 >= (tot - nf) * 9
      |    THEN CAST(gap AS BIGINT) END) AS p90_gap_days,
      |  CAST(CASE WHEN max(tot) - max(nf) > 0 THEN
      |    (sum(CASE WHEN gap IS NOT NULL THEN CAST(gap AS BIGINT) * cnt ELSE 0 END)
      |      * 1000) // (max(tot) - max(nf)) END AS BIGINT) AS mean_gap_milli
      |FROM sc GROUP BY seg ORDER BY c_mktsegment""".stripMargin

  def q78PriceIndex(spark: SparkSession, dir: String): DataFrame =
    q78PriceIndexOf(Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("part"),
        year(to_date(col("l_shipdate"))).cast("long").as("yr"),
        (dec2(col("l_quantity")) * 100).cast("long").as("qty_c"),
        (dec2(col("l_extendedprice")) * 100).cast("long").as("rev_c")))

  /** q78: matched-basket price index per ship year — the economics
    * question none of the revenue family asks: did PRICES move, or
    * just volume? Laspeyres (base-year basket at current prices),
    * Paasche (current basket at base prices) and their Fisher
    * geometric mean, all against the first year of data, restricted
    * to parts traded in BOTH years (the matched basket — entering/
    * exiting parts are mix shift, not inflation).
    *
    * All-integer core: unit price is the rational R/Q, so Laspeyres'
    * numerator Σ_p P_t·Q_b milli-truncates per part as
    * (R_t·Q_b·1000) div Q_t (exact DECIMAL(38,0), the q73 idiom) while
    * its denominator Σ_p P_b·Q_b = Σ R_b·1000 EXACTLY (the identity
    * that makes base-weighted indexes integral); Paasche mirrors with
    * the roles swapped. Index bp are exact floor divisions; only
    * Fisher's sqrt is IEEE (fixed shape, correctly rounded).
    *
    * Shape: two scans... no — ONE scan → (part, year) reduce,
    * `localCheckpoint`ed (c53 idiom) so the base-year slice and the
    * current-year rows share the materialized reduce → 1-row min-year
    * frame by literal crossJoin (BNLJ-allowlisted, q73 idiom — never
    * an unpartitioned window over the part-grain frame) → part
    * equi-join base↔year → per-year 1-row. */
  def q78PriceIndexOf(rows: DataFrame): DataFrame = {
    def d38(c: Column): Column = c.cast(DecimalType(38, 0))
    def fdiv(a: Column, b: Column): Column =
      ((a - (a % b)) / b).cast(DecimalType(38, 0))
    val py = rows.groupBy(col("part"), col("yr"))
      .agg(sum(col("qty_c")).as("q"), sum(col("rev_c")).as("r"))
      .localCheckpoint(true)
    val base = py.crossJoin(broadcast(py.agg(min(col("yr")).as("base_yr"))))
      .filter(col("yr") === col("base_yr"))
      .select(col("part"), col("base_yr"), col("q").as("qb"), col("r").as("rb"))
    py.join(base, Seq("part"))
      .filter(col("yr") > col("base_yr"))
      .groupBy(col("yr"))
      .agg(count(lit(1)).as("n_parts"), max(col("base_yr")).as("base_yr"),
        sum(fdiv(d38(col("r")) * col("qb") * 1000, d38(col("q")))).as("l_num"),
        sum(d38(col("rb")) * 1000).as("l_den"),
        sum(d38(col("r")) * 1000).as("p_num"),
        sum(fdiv(d38(col("rb")) * col("q") * 1000, d38(col("qb")))).as("p_den"))
      .select(col("yr").as("ship_year"), col("base_yr"), col("n_parts"),
        fdiv(col("l_num") * 10000, col("l_den")).cast("bigint").as("laspeyres_bp"),
        fdiv(col("p_num") * 10000, col("p_den")).cast("bigint").as("paasche_bp"),
        sqrt((col("l_num") * 10000).cast("double") / col("l_den").cast("double") *
          ((col("p_num") * 10000).cast("double") / col("p_den").cast("double")))
          .as("fisher_bp"))
      .orderBy(col("ship_year"))
  }

  val q78Sql: String =
    """WITH rows_in AS (
      |  SELECT l_partkey AS part, year(CAST(l_shipdate AS DATE)) AS yr,
      |    CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS qty_c,
      |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS rev_c
      |  FROM lineitem),
      |py AS (
      |  SELECT part, yr, sum(qty_c) AS q, sum(rev_c) AS r
      |  FROM rows_in GROUP BY 1, 2),
      |b AS (SELECT min(yr) AS base_yr FROM py),
      |base AS (
      |  SELECT part, base_yr, q AS qb, r AS rb FROM py, b WHERE yr = base_yr),
      |j AS (
      |  SELECT py.yr, base.base_yr,
      |    CAST(py.q AS HUGEINT) AS q, CAST(py.r AS HUGEINT) AS r,
      |    CAST(base.qb AS HUGEINT) AS qb, CAST(base.rb AS HUGEINT) AS rb
      |  FROM py JOIN base USING (part) WHERE py.yr > base.base_yr),
      |g AS (
      |  SELECT yr, max(base_yr) AS base_yr, CAST(count(*) AS BIGINT) AS n_parts,
      |    sum((r * qb * 1000) // q) AS l_num, sum(rb * 1000) AS l_den,
      |    sum(r * 1000) AS p_num, sum((rb * q * 1000) // qb) AS p_den
      |  FROM j GROUP BY 1)
      |SELECT yr AS ship_year, CAST(base_yr AS BIGINT) AS base_yr, n_parts,
      |  CAST((l_num * 10000) // l_den AS BIGINT) AS laspeyres_bp,
      |  CAST((p_num * 10000) // p_den AS BIGINT) AS paasche_bp,
      |  sqrt(CAST(l_num * 10000 AS DOUBLE) / CAST(l_den AS DOUBLE) *
      |    (CAST(p_num * 10000 AS DOUBLE) / CAST(p_den AS DOUBLE))) AS fisher_bp
      |FROM g ORDER BY ship_year""".stripMargin

  def q79AbcMigration(spark: SparkSession, dir: String): DataFrame =
    // spread loader (guide §2.5): r16 A/B-measured win (1.98 -> 1.61)
    q79AbcMigrationOf(Tables.spread(spark, dir, "lineitem", "l_orderkey")
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(year(to_date(col("l_shipdate"))).cast("long").as("yr"),
        col("p_brand"), col("l_partkey"))
      .agg((sum(revenue) * 10000).cast("long").as("rev_e4")))

  /** q79: year-over-year ABC-class migration — q65 gives the
    * Pareto classing of one period; inventory management acts on the
    * TRANSITIONS: a part sliding A→C is dying demand (stop stocking),
    * C→A is a breakout (q65 next year is too late). Classes are
    * computed per (year, brand) with q65's EXACT cross-multiplied
    * boundaries (same 80/95 thresholds, same tie rule — the two
    * operators cannot disagree on a class), then consecutive years
    * join on (brand, part) and the matrix aggregates globally to
    * (year_to, from, to) with the move direction.
    *
    * Shape: the (year, brand, part) revenue reduce arrives as input
    * (lineitem ⨝ part, two genuine scans), classing windows ride
    * (year, brand) partitions — q65's adjudicated partition size, a
    * year never sorts globally — and the frame is `localCheckpoint`ed
    * (c53 idiom) so the year↔year+1 self-join shares one
    * materialization. */
  def q79AbcMigrationOf(rev: DataFrame): DataFrame = {
    def d38(c: Column): Column = c.cast(DecimalType(38, 0))
    val wB = Window.partitionBy(col("yr"), col("p_brand"))
    val wCum = wB.orderBy(col("rev_e4").desc, col("l_partkey"))
    val classed = rev
      .withColumn("cum_excl", coalesce(sum(col("rev_e4"))
        .over(wCum.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("total", sum(col("rev_e4")).over(wB))
      .withColumn("abc_class",
        when(d38(col("cum_excl")) * 5 < d38(col("total")) * 4, lit("A"))
          .when(d38(col("cum_excl")) * 20 < d38(col("total")) * 19, lit("B"))
          .otherwise(lit("C")))
      .select(col("yr"), col("p_brand"), col("l_partkey"),
        col("abc_class"), col("rev_e4"))
      .localCheckpoint(true)
    val from = classed.select(col("yr"), col("p_brand"), col("l_partkey"),
      col("abc_class").as("class_from"))
    val to = classed.select((col("yr") - 1).as("yr"), col("p_brand"),
      col("l_partkey"), col("abc_class").as("class_to"),
      col("rev_e4").as("rev_to_e4"))
    def rank(c: Column): Column =
      when(c === "A", 0).when(c === "B", 1).otherwise(2)
    from.join(to, Seq("yr", "p_brand", "l_partkey"))
      .groupBy((col("yr") + 1).as("year_to"), col("class_from"), col("class_to"))
      .agg(count(lit(1)).as("n_parts"), sum(col("rev_to_e4")).as("rev_to_e4"))
      .withColumn("move",
        when(rank(col("class_to")) < rank(col("class_from")), lit("up"))
          .when(rank(col("class_to")) > rank(col("class_from")), lit("down"))
          .otherwise(lit("stay")))
      .orderBy(col("year_to"), col("class_from"), col("class_to"))
  }

  val q79Sql: String =
    """WITH rev AS (
      |  SELECT year(CAST(l_shipdate AS DATE)) AS yr, p_brand, l_partkey,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |      * (1 - CAST(l_discount AS DECIMAL(4,2)))) * 10000 AS BIGINT) AS rev_e4
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1, 2, 3),
      |w AS (
      |  SELECT yr, p_brand, l_partkey, rev_e4,
      |    COALESCE(sum(rev_e4) OVER (PARTITION BY yr, p_brand
      |      ORDER BY rev_e4 DESC, l_partkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl,
      |    sum(rev_e4) OVER (PARTITION BY yr, p_brand) AS total
      |  FROM rev),
      |c AS (
      |  SELECT yr, p_brand, l_partkey, rev_e4,
      |    CASE WHEN CAST(cum_excl AS HUGEINT) * 5 < CAST(total AS HUGEINT) * 4 THEN 'A'
      |         WHEN CAST(cum_excl AS HUGEINT) * 20 < CAST(total AS HUGEINT) * 19 THEN 'B'
      |         ELSE 'C' END AS abc_class
      |  FROM w),
      |j AS (
      |  SELECT f.yr + 1 AS year_to, f.abc_class AS class_from,
      |    t.abc_class AS class_to, t.rev_e4 AS rev_to_e4
      |  FROM c f JOIN c t ON f.p_brand = t.p_brand
      |    AND f.l_partkey = t.l_partkey AND t.yr = f.yr + 1),
      |g AS (
      |  SELECT year_to, class_from, class_to,
      |    CAST(count(*) AS BIGINT) AS n_parts, sum(rev_to_e4) AS rev_to_e4
      |  FROM j GROUP BY 1, 2, 3)
      |SELECT CAST(year_to AS BIGINT) AS year_to, class_from, class_to, n_parts,
      |  CAST(rev_to_e4 AS BIGINT) AS rev_to_e4,
      |  CASE WHEN (CASE class_to WHEN 'A' THEN 0 WHEN 'B' THEN 1 ELSE 2 END) <
      |            (CASE class_from WHEN 'A' THEN 0 WHEN 'B' THEN 1 ELSE 2 END) THEN 'up'
      |       WHEN (CASE class_to WHEN 'A' THEN 0 WHEN 'B' THEN 1 ELSE 2 END) >
      |            (CASE class_from WHEN 'A' THEN 0 WHEN 'B' THEN 1 ELSE 2 END) THEN 'down'
      |       ELSE 'stay' END AS move
      |FROM g ORDER BY year_to, class_from, class_to""".stripMargin

  /** q80: Cramér's V effect size per region — q55 reports the chi²
    * CELLS (where association lives); this reports the per-region
    * association STRENGTH a dashboard actually compares across
    * regions: V² = χ²/(n·(min(r,c)−1)) between market segment and
    * order priority, within each customer region. χ² rides q55's
    * exact integer core (dev = obs·n − r·c; per-cell contribution
    * floored at micro scale and summed — the documented deterministic
    * integer convention), and the min(r,c) table dims come from a tiny
    * per-region distinct-count frame (25 rows, broadcast). V² is
    * reported in bp of its [0,1] range. All-integer, value-grain
    * (region × seg × prio cells — bounded by the category product,
    * never corpus rows).
    *
    * Shape: orders⋈customer⋈nation (nation broadcast) → cell reduce →
    * three window sums over the CELL frame → region reduce; the dims
    * frame aggregates the same cell frame (reused exchange). */
  def q80CramersV(spark: SparkSession, dir: String): DataFrame =
    // the cell frame is ≤ |regions|·|segs|·|prios| rows (125 here) and
    // feeds FOUR consumers (dims, both grid sides, the dense join):
    // localCheckpoint it (the c53/q71 idiom) so the 3-table corpus
    // join runs once, not four times
    q80CramersVOf(Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey").as("region"), col("c_mktsegment").as("seg"),
        col("o_orderpriority").as("prio"))
      .agg(count(lit(1)).as("obs"))
      .localCheckpoint(true))

  /** Core of [[q80CramersV]] over a prepared (region, seg, prio, obs)
    * cell frame — separable so the spec can plant exact contingency
    * tables (perfect association → 10000 bp, independence → 0).
    * The observed cells are DENSIFIED to each region's full seg×prio
    * grid first (zero cells carry χ² mass too — dev = −r·c; dropping
    * them silently deflates V² exactly when association is strongest);
    * the grid is the category product, value grain. */
  def q80CramersVOf(cells: DataFrame): DataFrame = {
    val dims = cells.groupBy(col("region").as("d_region"))
      .agg(countDistinct(col("seg")).as("n_seg"),
        countDistinct(col("prio")).as("n_prio"))
    val grid = cells.select(col("region"), col("seg")).distinct()
      .join(cells.select(col("region"), col("prio")).distinct(), Seq("region"))
    val dense = grid.join(cells, Seq("region", "seg", "prio"), "left")
      .select(col("region"), col("seg"), col("prio"),
        coalesce(col("obs"), lit(0L)).as("obs"))
    val chi = dense
      .withColumn("r", sum(col("obs")).over(
        Window.partitionBy(col("region"), col("seg"))))
      .withColumn("c", sum(col("obs")).over(
        Window.partitionBy(col("region"), col("prio"))))
      .withColumn("n", sum(col("obs")).over(Window.partitionBy(col("region"))))
      .withColumn("dev",
        col("obs").cast(DecimalType(38, 0)) * col("n") -
          col("r").cast(DecimalType(38, 0)) * col("c"))
      .withColumn("contrib_micro",
        expr("(dev * dev * 1000000) div (CAST(r AS DECIMAL(38,0)) * c * n)"))
      .groupBy(col("region"))
      .agg(sum(col("obs")).as("n_orders"),
        sum(col("contrib_micro")).cast(DecimalType(38, 0)).as("chi2_micro"))
    chi.join(broadcast(dims), col("region") === col("d_region"))
      .select(col("region"), col("n_orders"),
        col("chi2_micro").cast("long").as("chi2_micro"),
        expr("(chi2_micro * 10000) div (1000000 * n_orders * " +
          "(least(n_seg, n_prio) - 1))").cast("long").as("v2_bp"))
      .orderBy(col("region"))
  }

  val q80Sql: String =
    """WITH cells AS (
      |  SELECT n_regionkey AS region, c_mktsegment AS seg, o_orderpriority AS prio,
      |    count(*) AS obs
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |    JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1, 2, 3),
      |dims AS (
      |  SELECT region, count(DISTINCT seg) AS n_seg, count(DISTINCT prio) AS n_prio
      |  FROM cells GROUP BY 1),
      |grid AS (
      |  SELECT s.region, s.seg, p.prio
      |  FROM (SELECT DISTINCT region, seg FROM cells) s
      |  JOIN (SELECT DISTINCT region, prio FROM cells) p USING (region)),
      |dense AS (
      |  SELECT g.region, g.seg, g.prio, coalesce(c.obs, 0) AS obs
      |  FROM grid g LEFT JOIN cells c
      |    ON g.region = c.region AND g.seg = c.seg AND g.prio = c.prio),
      |t AS (
      |  SELECT region, obs,
      |    sum(obs) OVER (PARTITION BY region, seg) AS r,
      |    sum(obs) OVER (PARTITION BY region, prio) AS c,
      |    sum(obs) OVER (PARTITION BY region) AS n
      |  FROM dense),
      |chi AS (
      |  SELECT region, sum(obs) AS n_orders,
      |    sum(((CAST(obs AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
      |       * (CAST(obs AS HUGEINT) * n - CAST(r AS HUGEINT) * c) * 1000000)
      |      // (CAST(r AS HUGEINT) * c * n)) AS chi2_micro
      |  FROM t GROUP BY 1)
      |SELECT CAST(region AS BIGINT) AS region, CAST(n_orders AS BIGINT) AS n_orders,
      |  CAST(chi2_micro AS BIGINT) AS chi2_micro,
      |  CAST((chi2_micro * 10000) // (1000000 * n_orders *
      |    (least(n_seg, n_prio) - 1)) AS BIGINT) AS v2_bp
      |FROM chi JOIN dims USING (region) ORDER BY region""".stripMargin

  /** q81: robust location per priority class — the outlier-immune
    * means a pricing dashboard trusts when q44/q21's plain mean is
    * skew-poisoned: the 10% TRIMMED mean (drop the bottom/top decile
    * rows, average the rest) and the WINSORIZED mean (clamp into the
    * decile boundary values instead of dropping) of order price in
    * cents, exact to micro-cents. Rank-based, so the whole computation
    * is integer: one per-class row_number window over cents (ties are
    * interchangeable — any tie order yields the same kept multiset),
    * t = n div 10 rows trimmed per side, boundary values read at ranks
    * t+1 and n−t, and both means reported as (sum·1000000) div count.
    *
    * Shape: ONE scan → per-class window rank (5 partitions, cents +
    * rowid only) → conditional aggregates; all downstream frames are
    * class-grain (5 rows). */
  def q81TrimmedStats(spark: SparkSession, dir: String): DataFrame =
    q81TrimmedStatsOf(Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("prio"),
        (dec2(col("o_totalprice")) * 100).cast("long").as("cents")))

  /** Core of [[q81TrimmedStats]] over a prepared (prio, cents) frame —
    * separable for planted-value specs (known outliers, known trim
    * boundaries). */
  def q81TrimmedStatsOf(priced: DataFrame): DataFrame = {
    val wRank = Window.partitionBy(col("prio")).orderBy(col("cents"))
    val wAll = Window.partitionBy(col("prio"))
    priced
      .withColumn("rn", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("t", expr("n div 10"))
      // boundary VALUES at the trim ranks, broadcast down the same
      // partition — a second frame-less window over the same key, so
      // still ONE exchange on prio
      .withColumn("lo_cents",
        max(when(col("rn") === col("t") + 1, col("cents"))).over(wAll))
      .withColumn("hi_cents",
        max(when(col("rn") === col("n") - col("t"), col("cents"))).over(wAll))
      .groupBy(col("prio"))
      .agg(
        max(col("n")).as("n_orders"),
        max(col("t")).as("n_trimmed_per_side"),
        max(col("lo_cents")).as("lo_cents"),
        max(col("hi_cents")).as("hi_cents"),
        sum(when(col("rn") > col("t") && col("rn") <= col("n") - col("t"),
          col("cents")).otherwise(lit(0L)).cast(DecimalType(38, 0))).as("trim_sum"),
        sum(greatest(least(col("cents"), col("hi_cents")), col("lo_cents"))
          .cast(DecimalType(38, 0))).as("wins_sum"))
      .select(col("prio"), col("n_orders"), col("n_trimmed_per_side"),
        col("lo_cents"), col("hi_cents"),
        expr("(trim_sum * 1000000) div (n_orders - 2 * n_trimmed_per_side)")
          .cast("long").as("trimmed_mean_microcents"),
        expr("(wins_sum * 1000000) div n_orders")
          .cast("long").as("winsorized_mean_microcents"))
      .orderBy(col("prio"))
  }

  val q81Sql: String =
    """WITH priced AS (
      |  SELECT o_orderpriority AS prio,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |  FROM orders),
      |ranked AS (
      |  SELECT prio, cents,
      |    row_number() OVER (PARTITION BY prio ORDER BY cents) AS rn,
      |    count(*) OVER (PARTITION BY prio) AS n
      |  FROM priced),
      |trimmed AS (
      |  SELECT prio, cents, rn, n, n // 10 AS t FROM ranked),
      |bounded AS (
      |  SELECT *,
      |    max(CASE WHEN rn = t + 1 THEN cents END) OVER (PARTITION BY prio) AS lo_cents,
      |    max(CASE WHEN rn = n - t THEN cents END) OVER (PARTITION BY prio) AS hi_cents
      |  FROM trimmed)
      |SELECT prio, CAST(max(n) AS BIGINT) AS n_orders,
      |  CAST(max(t) AS BIGINT) AS n_trimmed_per_side,
      |  max(lo_cents) AS lo_cents, max(hi_cents) AS hi_cents,
      |  CAST((sum(CASE WHEN rn > t AND rn <= n - t THEN CAST(cents AS HUGEINT)
      |    ELSE 0 END) * 1000000) // (max(n) - 2 * max(t)) AS BIGINT)
      |    AS trimmed_mean_microcents,
      |  CAST((sum(CAST(greatest(least(cents, hi_cents), lo_cents) AS HUGEINT))
      |    * 1000000) // max(n) AS BIGINT) AS winsorized_mean_microcents
      |FROM bounded GROUP BY prio ORDER BY prio""".stripMargin

  /** q82: cross-supplier price-dispersion audit per part — the
    * procurement arbitrage signal q42 (min-cost supplier) acts on,
    * quantified: for each part bought from ≥2 suppliers, each
    * supplier's mean unit price (exact integer micro-cents — summed
    * extended cents scaled BEFORE the division, one floor), then the
    * spread between the cheapest and dearest supplier in bp of the
    * dearest. High-spread parts are renegotiation targets; zero
    * spread means the catalog price is honest. Deterministic
    * throughout; no medians needed — min/max of per-supplier means IS
    * the arbitrage bound.
    *
    * Shape: ONE lineitem scan → (part, supplier) reduce (map-side
    * combinable sums) → part-grain reduce; no joins at all — the
    * part/supplier dimensions would add nothing but names. */
  def q82PriceDispersion(spark: SparkSession, dir: String): DataFrame = {
    // spread loader (guide §2.5): r16 A/B-measured win (1.08 -> 0.94)
    Tables.spread(spark, dir, "lineitem", "l_orderkey")
      .select(col("l_partkey"), col("l_suppkey"),
        (dec2(col("l_extendedprice")) * 100).cast("long").as("cents"),
        col("l_quantity").cast("long").as("qty"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("cents")).as("c"), sum(col("qty")).as("q"))
      .select(col("l_partkey"), col("l_suppkey"),
        expr("(c * 1000000) div q").as("unit_micro"))
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        min(col("unit_micro")).as("min_unit_micro"),
        max(col("unit_micro")).as("max_unit_micro"))
      .filter(col("n_suppliers") >= 2)
      .select(col("l_partkey"), col("n_suppliers"),
        col("min_unit_micro"), col("max_unit_micro"),
        expr("((max_unit_micro - min_unit_micro) * 10000) div max_unit_micro")
          .as("spread_bp"))
      .orderBy(col("l_partkey"))
  }

  val q82Sql: String =
    """WITH per AS (
      |  SELECT l_partkey, l_suppkey,
      |    sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS c,
      |    sum(CAST(l_quantity AS BIGINT)) AS q
      |  FROM lineitem GROUP BY 1, 2),
      |unitp AS (
      |  SELECT l_partkey, l_suppkey, (c * 1000000) // q AS unit_micro FROM per),
      |parts AS (
      |  SELECT l_partkey, count(*) AS n_suppliers,
      |    min(unit_micro) AS min_unit_micro, max(unit_micro) AS max_unit_micro
      |  FROM unitp GROUP BY 1)
      |SELECT l_partkey, n_suppliers,
      |  CAST(min_unit_micro AS BIGINT) AS min_unit_micro,
      |  CAST(max_unit_micro AS BIGINT) AS max_unit_micro,
      |  CAST(((max_unit_micro - min_unit_micro) * 10000) // max_unit_micro AS BIGINT)
      |    AS spread_bp
      |FROM parts WHERE n_suppliers >= 2 ORDER BY l_partkey""".stripMargin

  /** q83: same-day multi-order audit per customer — the accounts-
    * payable duplicate-submission screen (a real AP control, not a
    * TPC-H toy: double-submitted invoices share payer+date, the
    * strongest-signal pair that survives key regeneration): every
    * (customer, day) with more than one order, with the order count,
    * the day's total in cents, the key span, and the exact-duplicate
    * flag — identical totals on the same day are the rows an auditor
    * opens first (n_distinct_totals < n_orders). Deterministic,
    * all-integer, naturally rare (the point of a screen is a short
    * worklist).
    *
    * Shape: ONE scan → (customer, day) reduce with distinct-total
    * count — no self-join: the group is the duplicate candidate. */
  def q83SameDayOrders(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .select(col("o_custkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("day"),
        col("o_orderkey"),
        (dec2(col("o_totalprice")) * 100).cast("long").as("cents"))
      .groupBy(col("o_custkey"), col("day"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("cents")).as("day_cents"),
        min(col("o_orderkey")).as("first_key"),
        max(col("o_orderkey")).as("last_key"),
        countDistinct(col("cents")).as("n_distinct_totals"))
      .filter(col("n_orders") > 1)
      .select(col("o_custkey"), col("day"), col("n_orders"), col("day_cents"),
        col("first_key"), col("last_key"),
        (col("n_distinct_totals") < col("n_orders")).as("exact_dup_suspect"))
      .orderBy(col("o_custkey"), col("day"))
  }

  val q83Sql: String =
    """WITH o AS (
      |  SELECT o_custkey,
      |    epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS day,
      |    o_orderkey,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |  FROM orders),
      |g AS (
      |  SELECT o_custkey, day, CAST(count(*) AS BIGINT) AS n_orders,
      |    CAST(sum(cents) AS BIGINT) AS day_cents,
      |    min(o_orderkey) AS first_key, max(o_orderkey) AS last_key,
      |    CAST(count(DISTINCT cents) AS BIGINT) AS n_distinct_totals
      |  FROM o GROUP BY 1, 2)
      |SELECT o_custkey, day, n_orders, day_cents, first_key, last_key,
      |  n_distinct_totals < n_orders AS exact_dup_suspect
      |FROM g WHERE n_orders > 1 ORDER BY o_custkey, day""".stripMargin

  def q84GkGamma(spark: SparkSession, dir: String): DataFrame =
    q84GkGammaOf(Tables.orders(spark, dir), Tables.lineitem(spark, dir))

  /** q84: Goodman–Kruskal gamma between order priority and ship-delay
    * tier — ORDINAL×ORDINAL association, the slot q55 (nominal chi²)
    * and q71 (numeric Kendall) both miss: does higher urgency actually
    * buy earlier shipping? Gamma counts concordant vs discordant cell
    * pairs of the 5×3 cross-tab (priority rank from the `N-WORD`
    * prefix digit; delay tier = shipped-before-order / within-year /
    * beyond-year) and ignores ties — the right choice when both axes
    * are coarse grades, where tau-b's tie correction drowns the
    * signal. Exactly integer: pair products in DECIMAL(38,0) (cnt² at
    * 100 TB overflows a long), gamma itself ONE double division of two
    * exact sums.
    *
    * Shape: fact⋈dim join → ≤15-cell reduce, localCheckpoint'ed (the
    * q80 idiom: the pair join must not re-run the corpus join per
    * side), then a ≤15×15 non-equi self-join — a broadcast
    * nested-loop over LITERAL-capacity frames (BNLJ-allowlisted, the
    * a31 precedent). */
  def q84GkGammaOf(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    def d38c(c: Column): Column = c.cast(DecimalType(38, 0))
    val delay = datediff(col("l_shipdate"), col("o_orderdate"))
    val cells = lineitem.select(col("l_orderkey"), col("l_shipdate"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority")), col("l_orderkey") === col("o_orderkey"))
      .select(substring(col("o_orderpriority"), 1, 1).cast("int").as("pr"),
        when(delay < 0, 1).when(delay <= 365, 2).otherwise(3).as("tier"))
      .groupBy(col("pr"), col("tier"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val a = cells.select(col("pr").as("pa"), col("tier").as("ta"),
      d38c(col("cnt")).as("ca"))
    val b = cells.select(col("pr").as("pb"), col("tier").as("tb"),
      d38c(col("cnt")).as("cb"))
    a.join(broadcast(b), col("pa") < col("pb") && col("ta") =!= col("tb"))
      .agg(
        sum(when(col("tb") > col("ta"), col("ca") * col("cb")).otherwise(lit(0)))
          .as("conc"),
        sum(when(col("tb") < col("ta"), col("ca") * col("cb")).otherwise(lit(0)))
          .as("disc"))
      .select(col("conc").cast("bigint").as("concordant"),
        col("disc").cast("bigint").as("discordant"),
        ((col("conc") - col("disc")).cast("double") /
          (col("conc") + col("disc")).cast("double")).as("gamma"))
  }

  val q84Sql: String =
    """WITH cells AS (
      |  SELECT CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS pr,
      |    CASE WHEN datediff('day', o_orderdate, l_shipdate) < 0 THEN 1
      |         WHEN datediff('day', o_orderdate, l_shipdate) <= 365 THEN 2
      |         ELSE 3 END AS tier,
      |    count(*) AS cnt
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2),
      |p AS (
      |  SELECT
      |    sum(CASE WHEN b.tier > a.tier
      |      THEN CAST(a.cnt AS HUGEINT) * b.cnt ELSE 0 END) AS conc,
      |    sum(CASE WHEN b.tier < a.tier
      |      THEN CAST(a.cnt AS HUGEINT) * b.cnt ELSE 0 END) AS disc
      |  FROM cells a JOIN cells b ON a.pr < b.pr AND a.tier <> b.tier)
      |SELECT CAST(conc AS BIGINT) AS concordant, CAST(disc AS BIGINT) AS discordant,
      |  CAST(conc - disc AS DOUBLE) / CAST(conc + disc AS DOUBLE) AS gamma
      |FROM p""".stripMargin

  def q85JarqueBera(spark: SparkSession, dir: String): DataFrame =
    q85JarqueBeraOf(Tables.orders(spark, dir))

  /** q85: Jarque–Bera normality diagnostics of order totals per
    * priority — skewness, excess kurtosis, and the JB statistic
    * (Jarque & Bera 1980), the gate before ANY of the z-score
    * detectors (q69/c12/c38 presuppose rough normality; a heavy tail
    * quietly converts their σ thresholds into noise). Higher moments
    * are cancellation bombs in floating point, so the sums stay EXACT:
    * prices center on a FIXED dollar pivot (skew/kurtosis are
    * translation-invariant, and a constant pivot keeps it ONE pass —
    * a data-derived mean would need a pass of its own), and Σc..Σc⁴
    * accumulate in DECIMAL(38,0) (o_totalprice reaches ~5.5e5, so
    * |c| ≤ ~3.1e5 dollars around the 2.5e5 pivot ⇒ Σc⁴ ≤ n·9.3e21,
    * which fits DECIMAL(38) to n ≈ 1e16 rows). Only the FINAL scalar expression — identical
    * term order in both engines, sqrt/mul/div only (no pow, whose
    * last-ulp varies by libm) — runs in doubles, so the result is
    * bit-stable at any parallelism.
    *
    * Shape: ONE column-pruned orders scan → per-priority 5-row
    * reduce. */
  def q85JarqueBeraOf(orders: DataFrame): DataFrame = {
    def d38c(c: Column): Column = c.cast(DecimalType(38, 0))
    val c = d38c(floor(Cols.dec2(col("o_totalprice"))).cast("long") - lit(250000L))
    val nd = col("n").cast("double")
    val mu = col("s1").cast("double") / nd
    val r2 = col("s2").cast("double") / nd
    val r3 = col("s3").cast("double") / nd
    val r4 = col("s4").cast("double") / nd
    val m2 = r2 - mu * mu
    val m3 = r3 - lit(3.0) * mu * r2 + lit(2.0) * mu * mu * mu
    val m4 = r4 - lit(4.0) * mu * r3 + lit(6.0) * mu * mu * r2 -
      lit(3.0) * mu * mu * mu * mu
    val skew = m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2))
    val exkurt = m4 / (m2 * m2) - lit(3.0)
    orders
      .select(col("o_orderpriority"), c.as("c"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).cast(DecimalType(38, 0)).as("n"),
        sum(col("c")).as("s1"),
        sum(col("c") * col("c")).as("s2"),
        sum(col("c") * col("c") * col("c")).as("s3"),
        sum(col("c") * col("c") * col("c") * col("c")).as("s4"))
      .select(col("o_orderpriority"), col("n").cast("bigint").as("n"),
        skew.as("skewness"), exkurt.as("ex_kurtosis"),
        (nd / lit(6.0) * (skew * skew + exkurt * exkurt / lit(4.0))).as("jb"))
      .orderBy(col("o_orderpriority"))
  }

  val q85Sql: String =
    """WITH s AS (
      |  SELECT o_orderpriority,
      |    CAST(floor(CAST(o_totalprice AS DECIMAL(12,2))) AS HUGEINT) - 250000 AS c
      |  FROM orders),
      |m AS (
      |  SELECT o_orderpriority, count(*) AS n, sum(c) AS s1, sum(c*c) AS s2,
      |    sum(c*c*c) AS s3, sum(c*c*c*c) AS s4
      |  FROM s GROUP BY 1),
      |d AS (
      |  SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
      |    CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
      |    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
      |    CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
      |    CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
      |  FROM m),
      |cm AS (
      |  SELECT o_orderpriority, n, nd,
      |    r2 - mu * mu AS m2,
      |    r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
      |    r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2 - 3.0 * mu * mu * mu * mu AS m4
      |  FROM d),
      |k AS (
      |  SELECT o_orderpriority, n, nd,
      |    m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2)) AS skewness,
      |    m4 / (m2 * m2) - 3.0 AS ex_kurtosis
      |  FROM cm)
      |SELECT o_orderpriority, n, skewness, ex_kurtosis,
      |  nd / 6.0 * (skewness * skewness + ex_kurtosis * ex_kurtosis / 4.0) AS jb
      |FROM k ORDER BY o_orderpriority""".stripMargin

  def q86Hoover(spark: SparkSession, dir: String): DataFrame =
    q86HooverOf(Tables.orders(spark, dir), Tables.customer(spark, dir))

  /** q86: Hoover (Robin Hood) index of customer spend per nation —
    * the share of total spend that would have to MOVE between
    * customers to equalize them: ½·Σ|xᵢ/X − 1/n|, the inequality
    * measure with a direct operational reading (q53's Gini ranks
    * pairs; Hoover prices the transfer), and — unlike Theil/Atkinson —
    * log-free, so it stays EXACT integer end-to-end:
    * Σ|n·xᵢ − X| · 10⁴ div (2·n·X) in DECIMAL(38,0) cents
    * (n·x ≈ 10¹⁸, the deviation sum ≈ 10²⁸ at 100 TB — inside 38
    * digits). Purchasing customers only (a zero-spend row has no
    * cents to move; the inner join states that contract).
    *
    * Shape: orders⋈customer → customer-grain spend reduce,
    * localCheckpoint'ed (the q80 idiom — totals and deviations must
    * not re-run the join per side) → ≤25-row nation totals broadcast
    * back → one deviation reduce. No corpus window: a
    * Window.partitionBy(nation) over the customer-grain frame would
    * pin 25 hot partitions (the c21 trap). */
  def q86HooverOf(orders: DataFrame, customer: DataFrame): DataFrame = {
    def d38c(c: Column): Column = c.cast(DecimalType(38, 0))
    val spend = orders
      .select(col("o_custkey"), Cols.dec2(col("o_totalprice")).as("p"))
      .groupBy(col("o_custkey"))
      .agg(d38c(sum(col("p")) * 100).as("x"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey"), col("x"))
      .localCheckpoint()
    val totals = spend.groupBy(col("c_nationkey"))
      .agg(sum(col("x")).as("tx"), count(lit(1)).cast(DecimalType(38, 0)).as("nc"))
    spend.join(broadcast(totals), Seq("c_nationkey"))
      .groupBy(col("c_nationkey"))
      .agg(max(col("nc")).as("nc"), max(col("tx")).as("tx"),
        sum(abs(col("x") * col("nc") - col("tx"))).as("dev"))
      .select(col("c_nationkey"), col("nc").cast("bigint").as("n_customers"),
        // integral div (nonnegative operands) — decimal `/` rounds
        // HALF_UP at scale 6, which can bump across the floor boundary
        expr("(dev * 10000) div (nc * tx * 2)").cast("bigint").as("hoover_bp"))
      .orderBy(col("c_nationkey"))
  }

  val q86Sql: String =
    """WITH spend AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS HUGEINT) AS x
      |  FROM orders GROUP BY 1),
      |sx AS (
      |  SELECT c_nationkey, x FROM spend JOIN customer ON o_custkey = c_custkey),
      |t AS (
      |  SELECT c_nationkey, sum(x) AS tx, count(*) AS nc FROM sx GROUP BY 1)
      |SELECT s.c_nationkey, CAST(t.nc AS BIGINT) AS n_customers,
      |  CAST(sum(abs(s.x * t.nc - t.tx)) * 10000 // (t.nc * t.tx * 2) AS BIGINT)
      |    AS hoover_bp
      |FROM sx s JOIN t ON s.c_nationkey = t.c_nationkey
      |GROUP BY s.c_nationkey, t.nc, t.tx
      |ORDER BY s.c_nationkey""".stripMargin

  def q87CovMatrix(spark: SparkSession, dir: String): DataFrame =
    // spread loader (guide §2.5): the DECIMAL(38) moment partials
    // otherwise run inside the single-split scan task (r16 measured)
    q87CovMatrixOf(Tables.spread(spark, dir, "lineitem", "l_orderkey"))

  /** q87: covariance/correlation MATRIX per return flag over the three
    * pricing measures (quantity, discount, extended price) — q24/q26
    * report single pairs; a pricing analyst reads the matrix (which
    * measures co-move, which are independent) before trusting any
    * elasticity model built on them. All three pairs come from ONE
    * scan and ONE aggregate: the nine raw power/cross sums accumulate
    * exactly in DECIMAL(38,0) integer units (qty units, discount bp,
    * price cents), and the pair rows unfold from that single
    * aggregated row via an inline array-explode — never a union of
    * projections, which would re-run the scan per pair (the c49
    * trap). cov = (n·Σxy − Σx·Σy)/n² and the q26 corr formula are the
    * only double steps, identical term order in the oracle. */
  def q87CovMatrixOf(lineitem: DataFrame): DataFrame = {
    def d38c(c: Column): Column = c.cast(DecimalType(38, 0))
    val base = lineitem.select(col("l_returnflag").as("flag"),
      d38c(col("l_quantity").cast("long")).as("q"),
      d38c((Cols.dec2(col("l_discount")) * 100).cast("long")).as("d"),
      d38c((Cols.dec2(col("l_extendedprice")) * 100).cast("long")).as("p"))
    val agg = base.groupBy(col("flag")).agg(
      count(lit(1)).cast(DecimalType(38, 0)).as("n"),
      sum(col("q")).as("sq"), sum(col("d")).as("sd"), sum(col("p")).as("sp"),
      sum(col("q") * col("q")).as("sqq"), sum(col("d") * col("d")).as("sdd"),
      sum(col("p") * col("p")).as("spp"), sum(col("q") * col("d")).as("sqd"),
      sum(col("q") * col("p")).as("sqp"), sum(col("d") * col("p")).as("sdp"))
    def pair(name: String, sx: String, sy: String, sxy: String,
             sxx: String, syy: String): Column = {
      val num = col("n") * col(sxy) - col(sx) * col(sy)
      val dx = col("n") * col(sxx) - col(sx) * col(sx)
      val dy = col("n") * col(syy) - col(sy) * col(sy)
      struct(lit(name).as("pair"),
        (num.cast("double") / (col("n") * col("n")).cast("double")).as("cov"),
        (num.cast("double") / (sqrt(dx.cast("double")) * sqrt(dy.cast("double"))))
          .as("corr"))
    }
    agg.select(col("flag").as("l_returnflag"), col("n").cast("bigint").as("n"),
        explode(array(
          pair("qty_disc", "sq", "sd", "sqd", "sqq", "sdd"),
          pair("qty_price", "sq", "sp", "sqp", "sqq", "spp"),
          pair("disc_price", "sd", "sp", "sdp", "sdd", "spp"))).as("m"))
      .select(col("l_returnflag"), col("n"), col("m.pair").as("pair"),
        col("m.cov").as("cov"), col("m.corr").as("corr"))
      .orderBy(col("l_returnflag"), col("pair"))
  }

  val q87Sql: String =
    """WITH b AS (
      |  SELECT l_returnflag AS flag, CAST(l_quantity AS HUGEINT) AS q,
      |    CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS HUGEINT) AS d,
      |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS HUGEINT) AS p
      |  FROM lineitem),
      |m AS (
      |  SELECT flag, count(*) AS n, sum(q) AS sq, sum(d) AS sd, sum(p) AS sp,
      |    sum(q*q) AS sqq, sum(d*d) AS sdd, sum(p*p) AS spp,
      |    sum(q*d) AS sqd, sum(q*p) AS sqp, sum(d*p) AS sdp
      |  FROM b GROUP BY 1),
      |u AS (
      |  SELECT flag, n, 'qty_disc' AS pair,
      |    CAST(n*sqd - sq*sd AS DOUBLE) / CAST(n*n AS DOUBLE) AS cov,
      |    CAST(n*sqd - sq*sd AS DOUBLE) /
      |      (sqrt(CAST(n*sqq - sq*sq AS DOUBLE)) * sqrt(CAST(n*sdd - sd*sd AS DOUBLE))) AS corr
      |  FROM m
      |  UNION ALL
      |  SELECT flag, n, 'qty_price',
      |    CAST(n*sqp - sq*sp AS DOUBLE) / CAST(n*n AS DOUBLE),
      |    CAST(n*sqp - sq*sp AS DOUBLE) /
      |      (sqrt(CAST(n*sqq - sq*sq AS DOUBLE)) * sqrt(CAST(n*spp - sp*sp AS DOUBLE)))
      |  FROM m
      |  UNION ALL
      |  SELECT flag, n, 'disc_price',
      |    CAST(n*sdp - sd*sp AS DOUBLE) / CAST(n*n AS DOUBLE),
      |    CAST(n*sdp - sd*sp AS DOUBLE) /
      |      (sqrt(CAST(n*sdd - sd*sd AS DOUBLE)) * sqrt(CAST(n*spp - sp*sp AS DOUBLE)))
      |  FROM m)
      |SELECT flag AS l_returnflag, CAST(n AS BIGINT) AS n, pair, cov, corr
      |FROM u ORDER BY l_returnflag, pair""".stripMargin

  def q88PartialCorr(spark: SparkSession, dir: String): DataFrame =
    // spread loader (guide §2.5): r16 A/B-measured win (1.69 -> 0.69)
    q88PartialCorrOf(Tables.spread(spark, dir, "lineitem", "l_orderkey"))

  /** q88: PARTIAL correlations over the q87 triple — each pair's
    * association with the third measure held fixed
    * (r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²))): the
    * confounder check q87's raw matrix invites — is the
    * quantity↔price co-movement real, or routed through discount? A
    * raw corr that collapses once controlled is exactly the spurious
    * association an elasticity model must not fit. Same ONE scan, ONE
    * aggregate, same exact DECIMAL(38,0) sums; the three raw r's and
    * the partials are scalar double expressions with oracle-identical
    * term order (sqrt/mul/div only — the q85 discipline). */
  def q88PartialCorrOf(lineitem: DataFrame): DataFrame = {
    def d38c(c: Column): Column = c.cast(DecimalType(38, 0))
    val base = lineitem.select(col("l_returnflag").as("flag"),
      d38c(col("l_quantity").cast("long")).as("q"),
      d38c((Cols.dec2(col("l_discount")) * 100).cast("long")).as("d"),
      d38c((Cols.dec2(col("l_extendedprice")) * 100).cast("long")).as("p"))
    val agg = base.groupBy(col("flag")).agg(
      count(lit(1)).cast(DecimalType(38, 0)).as("n"),
      sum(col("q")).as("sq"), sum(col("d")).as("sd"), sum(col("p")).as("sp"),
      sum(col("q") * col("q")).as("sqq"), sum(col("d") * col("d")).as("sdd"),
      sum(col("p") * col("p")).as("spp"), sum(col("q") * col("d")).as("sqd"),
      sum(col("q") * col("p")).as("sqp"), sum(col("d") * col("p")).as("sdp"))
    def r(sx: String, sy: String, sxy: String, sxx: String, syy: String): Column = {
      val num = col("n") * col(sxy) - col(sx) * col(sy)
      val dx = col("n") * col(sxx) - col(sx) * col(sx)
      val dy = col("n") * col(syy) - col(sy) * col(sy)
      num.cast("double") / (sqrt(dx.cast("double")) * sqrt(dy.cast("double")))
    }
    val rqd = r("sq", "sd", "sqd", "sqq", "sdd")
    val rqp = r("sq", "sp", "sqp", "sqq", "spp")
    val rdp = r("sd", "sp", "sdp", "sdd", "spp")
    def partial(rxy: Column, rxz: Column, ryz: Column): Column =
      (rxy - rxz * ryz) /
        (sqrt(lit(1.0) - rxz * rxz) * sqrt(lit(1.0) - ryz * ryz))
    agg.select(col("flag").as("l_returnflag"), col("n").cast("bigint").as("n"),
        explode(array(
          struct(lit("qty_disc_given_price").as("pair"),
            partial(rqd, rqp, rdp).as("pcorr"), rqd.as("raw_corr")),
          struct(lit("qty_price_given_disc").as("pair"),
            partial(rqp, rqd, rdp).as("pcorr"), rqp.as("raw_corr")),
          struct(lit("disc_price_given_qty").as("pair"),
            partial(rdp, rqd, rqp).as("pcorr"), rdp.as("raw_corr")))).as("m"))
      .select(col("l_returnflag"), col("n"), col("m.pair").as("pair"),
        col("m.pcorr").as("pcorr"), col("m.raw_corr").as("raw_corr"))
      .orderBy(col("l_returnflag"), col("pair"))
  }

  val q88Sql: String =
    """WITH b AS (
      |  SELECT l_returnflag AS flag, CAST(l_quantity AS HUGEINT) AS q,
      |    CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS HUGEINT) AS d,
      |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS HUGEINT) AS p
      |  FROM lineitem),
      |m AS (
      |  SELECT flag, count(*) AS n, sum(q) AS sq, sum(d) AS sd, sum(p) AS sp,
      |    sum(q*q) AS sqq, sum(d*d) AS sdd, sum(p*p) AS spp,
      |    sum(q*d) AS sqd, sum(q*p) AS sqp, sum(d*p) AS sdp
      |  FROM b GROUP BY 1),
      |r AS (
      |  SELECT flag, n,
      |    CAST(n*sqd - sq*sd AS DOUBLE) /
      |      (sqrt(CAST(n*sqq - sq*sq AS DOUBLE)) * sqrt(CAST(n*sdd - sd*sd AS DOUBLE))) AS rqd,
      |    CAST(n*sqp - sq*sp AS DOUBLE) /
      |      (sqrt(CAST(n*sqq - sq*sq AS DOUBLE)) * sqrt(CAST(n*spp - sp*sp AS DOUBLE))) AS rqp,
      |    CAST(n*sdp - sd*sp AS DOUBLE) /
      |      (sqrt(CAST(n*sdd - sd*sd AS DOUBLE)) * sqrt(CAST(n*spp - sp*sp AS DOUBLE))) AS rdp
      |  FROM m),
      |u AS (
      |  SELECT flag, n, 'qty_disc_given_price' AS pair,
      |    (rqd - rqp * rdp) / (sqrt(1.0 - rqp * rqp) * sqrt(1.0 - rdp * rdp)) AS pcorr,
      |    rqd AS raw_corr
      |  FROM r
      |  UNION ALL
      |  SELECT flag, n, 'qty_price_given_disc',
      |    (rqp - rqd * rdp) / (sqrt(1.0 - rqd * rqd) * sqrt(1.0 - rdp * rdp)), rqp
      |  FROM r
      |  UNION ALL
      |  SELECT flag, n, 'disc_price_given_qty',
      |    (rdp - rqd * rqp) / (sqrt(1.0 - rqd * rqd) * sqrt(1.0 - rqp * rqp)), rdp
      |  FROM r)
      |SELECT flag AS l_returnflag, CAST(n AS BIGINT) AS n, pair, pcorr, raw_corr
      |FROM u ORDER BY l_returnflag, pair""".stripMargin

  def q89Mahalanobis(spark: SparkSession, dir: String): DataFrame =
    // spread loader (guide §2.5): the DECIMAL(38) moment partials
    // otherwise run inside the single-split scan task (r16 measured)
    q89MahalanobisOf(Tables.spread(spark, dir, "lineitem", "l_orderkey"))

  /** q89: MULTIVARIATE outlier audit per return flag — Mahalanobis
    * distance on the (quantity, extended price) plane: the univariate
    * z-tests (q69/c12) miss exactly the rows a fraud/data-quality
    * reviewer wants — a quantity and a price each unremarkable alone
    * but jointly off the correlation ridge (tiny qty at a huge price).
    * d² = (x−μ)ᵀ Σ⁻¹ (x−μ) with the 2×2 Σ inverted in closed form;
    * rows with d² > 5 (the ~2.2σ ellipse — uniform-bounded joints cap d² near 6, so a 3σ cut would measure a vacuous zero) are flagged. Two-pass by
    * necessity (d² needs μ, Σ first): pass 1 is the q87 exact-DECIMAL
    * moment reduce (≤|flags| rows, broadcast back — the q27 scalar
    * idiom), pass 2 streams the corpus once against the broadcast
    * moments. The cross-multiplied comparison (numerator vs 5·det)
    * runs in DOUBLES — the quartic integer products overflow
    * DECIMAL(38) and HUGEINT alike at price-cents scale — but every
    * input is an exact integer converted and combined in IDENTICAL
    * term order on both engines, so the flagged set is still
    * bit-stable at any parallelism and the oracle replays it. */
  def q89MahalanobisOf(lineitem: DataFrame): DataFrame = {
    def d38c(c: Column): Column = c.cast(DecimalType(38, 0))
    val base = lineitem.select(col("l_returnflag").as("flag"),
      d38c(col("l_quantity").cast("long")).as("q"),
      d38c((Cols.dec2(col("l_extendedprice")) * 100).cast("long")).as("p"))
    val moments = base.groupBy(col("flag")).agg(
      count(lit(1)).cast(DecimalType(38, 0)).as("n"),
      sum(col("q")).as("sq"), sum(col("p")).as("sp"),
      sum(col("q") * col("q")).as("sqq"),
      sum(col("p") * col("p")).as("spp"),
      sum(col("q") * col("p")).as("sqp"))
    // with u = n·q − sq, v = n·p − sp (exact integers; the n-multiplied
    // centering), A = n·sqq − sq² (= n²·var_q), B = n·spp − sp²,
    // C = n·sqp − sq·sp: d² = (A·v² − 2C·u·v + B·u²)/(A·B − C²)
    // EXACTLY (the n⁴ factors cancel — derivation above the oracle).
    // The quartic products overflow DECIMAL(38) (and DuckDB's HUGEINT)
    // at price-cents scale, so the comparison runs in doubles — from
    // EXACT integer inputs converted and combined in identical term
    // order on both engines (round-to-nearest is deterministic), the
    // flag is still bit-stable at any parallelism.
    val u = (col("n") * col("q") - col("sq")).cast("double")
    val v = (col("n") * col("p") - col("sp")).cast("double")
    val a = (col("n") * col("sqq") - col("sq") * col("sq")).cast("double")
    val b = (col("n") * col("spp") - col("sp") * col("sp")).cast("double")
    val cc = (col("n") * col("sqp") - col("sq") * col("sp")).cast("double")
    val num = a * v * v - lit(2.0) * cc * u * v + b * u * u
    val det = a * b - cc * cc
    base.join(broadcast(moments), Seq("flag"))
      .withColumn("is_outlier", num > lit(5.0) * det)
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("is_outlier"), 1L).otherwise(0L)).as("n_outliers"))
      .select(col("flag").as("l_returnflag"), col("n_rows"), col("n_outliers"),
        expr("(n_outliers * 1000000) div n_rows").as("outlier_ppm"))
      .orderBy(col("l_returnflag"))
  }

  val q89Sql: String =
    """WITH b AS (
      |  SELECT l_returnflag AS flag, CAST(l_quantity AS HUGEINT) AS q,
      |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS HUGEINT) AS p
      |  FROM lineitem),
      |m AS (
      |  SELECT flag, count(*) AS n, sum(q) AS sq, sum(p) AS sp,
      |    sum(q*q) AS sqq, sum(p*p) AS spp, sum(q*p) AS sqp
      |  FROM b GROUP BY 1),
      |j AS (
      |  SELECT b.flag,
      |    CAST(m.n*m.sqq - m.sq*m.sq AS DOUBLE) AS a,
      |    CAST(m.n*m.spp - m.sp*m.sp AS DOUBLE) AS bb,
      |    CAST(m.n*m.sqp - m.sq*m.sp AS DOUBLE) AS c,
      |    CAST(m.n*b.q - m.sq AS DOUBLE) AS u,
      |    CAST(m.n*b.p - m.sp AS DOUBLE) AS v
      |  FROM b JOIN m ON b.flag = m.flag)
      |SELECT flag AS l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(CASE WHEN a*v*v - 2.0*c*u*v + bb*u*u > 5.0 * (a*bb - c*c)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  CAST((sum(CASE WHEN a*v*v - 2.0*c*u*v + bb*u*u > 5.0 * (a*bb - c*c)
      |    THEN 1 ELSE 0 END) * 1000000) // count(*) AS BIGINT) AS outlier_ppm
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin

  def q90TheilIndex(spark: SparkSession, dir: String): DataFrame =
    q90TheilOf(Tables.orders(spark, dir), Tables.customer(spark, dir))

  /** q90: Theil-T inequality of customer spend, DECOMPOSED by nation —
    * the additive split q86's Hoover cannot give: total inequality =
    * Σ_g within-nation T_g weighted by spend share + a between-nation
    * term Σ_g (X_g/X)·ln((X_g/X)/(N_g/N)), so a data owner reads
    * exactly how much disparity lives INSIDE markets vs BETWEEN them
    * (the GE(1) decomposition — Theil 1967; Shorrocks 1980 for the
    * decomposability result). Log-bearing, so the statistic itself is
    * double; every INPUT to the doubles is an exact integer (cents
    * spend, counts) aggregated first, and the oracle mirrors the term
    * order, so the 1e-9 float gate holds. Purchasing customers only
    * (x > 0 — ln demands it; the q86 contract).
    *
    * Shape: customer-grain spend reduce (localCheckpoint — the per-
    * term pass and the totals pass must not re-run the join), ≤25-row
    * nation totals broadcast back for the per-customer terms, grand
    * totals broadcast for the between term. No corpus window. */
  def q90TheilOf(orders: DataFrame, customer: DataFrame): DataFrame = {
    def d38c(c: Column): Column = c.cast(DecimalType(38, 0))
    val spend = orders
      .select(col("o_custkey"), Cols.dec2(col("o_totalprice")).as("p"))
      .groupBy(col("o_custkey"))
      .agg(d38c(sum(col("p")) * 100).as("x"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey"), col("x"))
      .localCheckpoint()
    val totals = spend.groupBy(col("c_nationkey"))
      .agg(sum(col("x")).as("tx"), count(lit(1)).as("nc"))
      .localCheckpoint()
    val grand = totals.agg(sum(col("tx")).as("gx"), sum(col("nc")).as("gn"))
    // per-customer ratio r = x·N_g/X_g (>0); within T_g = Σ r·ln(r) / N_g
    val within = spend.join(broadcast(totals), Seq("c_nationkey"))
      .withColumn("r", col("x").cast("double") * col("nc").cast("double") /
        col("tx").cast("double"))
      .groupBy(col("c_nationkey"))
      .agg((sum(col("r") * log(col("r"))) / first(col("nc"))).as("t_within"))
    totals.crossJoin(broadcast(grand))
      .withColumn("share_x", col("tx").cast("double") / col("gx").cast("double"))
      .withColumn("share_n", col("nc").cast("double") / col("gn").cast("double"))
      .join(within, Seq("c_nationkey"))
      .select(col("c_nationkey"), col("nc").cast("bigint").as("n_customers"),
        col("tx").cast("bigint").as("spend_cents"), col("t_within"),
        (col("share_x") * log(col("share_x") / col("share_n"))).as("between_term"))
      .orderBy(col("c_nationkey"))
  }

  val q90Sql: String =
    """WITH s AS (
      |  SELECT c_nationkey, CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS HUGEINT) AS x
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY c_nationkey, o_custkey),
      |t AS (SELECT c_nationkey, sum(x) AS tx, count(*) AS nc FROM s GROUP BY 1),
      |g AS (SELECT sum(tx) AS gx, sum(nc) AS gn FROM t),
      |w AS (
      |  SELECT s.c_nationkey,
      |    sum((CAST(s.x AS DOUBLE) * CAST(t.nc AS DOUBLE) / CAST(t.tx AS DOUBLE))
      |      * ln(CAST(s.x AS DOUBLE) * CAST(t.nc AS DOUBLE) / CAST(t.tx AS DOUBLE)))
      |      / any_value(CAST(t.nc AS DOUBLE)) AS t_within
      |  FROM s JOIN t USING (c_nationkey) GROUP BY 1)
      |SELECT t.c_nationkey, CAST(t.nc AS BIGINT) AS n_customers,
      |  CAST(t.tx AS BIGINT) AS spend_cents, w.t_within,
      |  (CAST(t.tx AS DOUBLE) / CAST(g.gx AS DOUBLE))
      |    * ln((CAST(t.tx AS DOUBLE) / CAST(g.gx AS DOUBLE))
      |        / (CAST(t.nc AS DOUBLE) / CAST(g.gn AS DOUBLE))) AS between_term
      |FROM t JOIN w USING (c_nationkey) CROSS JOIN g
      |ORDER BY t.c_nationkey""".stripMargin

  def q91SeasonalStrength(spark: SparkSession, dir: String): DataFrame =
    q91SeasonalOf(Tables.orders(spark, dir))

  /** q91: month-of-year SEASONAL INDEX of order revenue — for every
    * (year, month) the classical ratio-to-yearly-average index
    * idx = n_months_in_year · rev_m / rev_year (n_months, not 12:
    * TPC-H-ish order dates end mid-year, and a partial year's absent
    * months must not deflate the present ones), then per MONTH across
    * years the index's mean/min/max — the table a demand planner reads
    * to separate real seasonality from one-off years (q39's YoY growth
    * tracks the trend; this isolates the periodic component). Revenue
    * sums are exact cents; only the final ratios are doubles, term
    * order mirrored.
    *
    * Shape: one orders reduce to (year, month) grain (≤ ~84 rows at
    * any SF — months don't grow with data), a per-year reduce
    * broadcast back, a per-month reduce. Nothing leaves month grain. */
  def q91SeasonalOf(orders: DataFrame): DataFrame = {
    def d38c(c: Column): Column = c.cast(DecimalType(38, 0))
    val rev = orders
      .select(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"),
        Cols.dec2(col("o_totalprice")).as("p"))
      .groupBy(col("y"), col("m"))
      .agg(d38c(sum(col("p")) * 100).as("rev"))
      .localCheckpoint()
    val yearly = rev.groupBy(col("y"))
      .agg(sum(col("rev")).as("yrev"), count(lit(1)).as("n_months"))
    rev.join(broadcast(yearly), Seq("y"))
      .withColumn("idx", col("rev").cast("double") * col("n_months").cast("double") /
        col("yrev").cast("double"))
      .groupBy(col("m"))
      .agg(count(lit(1)).cast("bigint").as("n_years"),
        sum(col("rev")).cast("bigint").as("rev_cents"),
        avg(col("idx")).as("avg_idx"),
        min(col("idx")).as("min_idx"), max(col("idx")).as("max_idx"))
      .select(col("m").as("month"), col("n_years"), col("rev_cents"),
        col("avg_idx"), col("min_idx"), col("max_idx"))
      .orderBy(col("month"))
  }

  val q91Sql: String =
    """WITH r AS (
      |  SELECT EXTRACT(year FROM o_orderdate) AS y, EXTRACT(month FROM o_orderdate) AS m,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS HUGEINT) AS rev
      |  FROM orders GROUP BY 1, 2),
      |yr AS (SELECT y, sum(rev) AS yrev, count(*) AS n_months FROM r GROUP BY 1),
      |i AS (
      |  SELECT r.m, r.rev,
      |    CAST(r.rev AS DOUBLE) * CAST(yr.n_months AS DOUBLE) / CAST(yr.yrev AS DOUBLE) AS idx
      |  FROM r JOIN yr USING (y))
      |SELECT CAST(m AS INTEGER) AS month, CAST(count(*) AS BIGINT) AS n_years,
      |  CAST(sum(rev) AS BIGINT) AS rev_cents,
      |  avg(idx) AS avg_idx, min(idx) AS min_idx, max(idx) AS max_idx
      |FROM i GROUP BY 1 ORDER BY 1""".stripMargin

  def q92HillTail(spark: SparkSession, dir: String): DataFrame =
    q92HillOf(Tables.orders(spark, dir))

  /** q92: Hill estimator of the customer-spend TAIL INDEX — for the
    * top-k order statistics, α̂_k = k / Σᵢ₌₁..k ln(x₍ᵢ₎/x₍ₖ₊₁₎)
    * (Hill 1975), at k ∈ {20, 50, 100}: the heavy-tail exponent a
    * capacity planner reads to know whether whale customers follow a
    * power law (α ≤ 2 ⇒ infinite variance — mean-based provisioning
    * is wrong) and how fast the estimate stabilizes across k. Rank
    * order is integer-deterministic (spend cents desc, custkey asc —
    * no float in the ORDER), thresholds are exact cents; only the
    * final log-sum is double with oracle-mirrored term order.
    *
    * Shape: customer-grain spend reduce → TakeOrdered 101 rows (k is
    * bounded — the 100 TB point: the tail fit never materializes a
    * corpus-wide window) → a 3-way k fan-out of that 101-row frame →
    * one reduce per k. */
  def q92HillOf(orders: DataFrame): DataFrame = {
    def d38c(c: Column): Column = c.cast(DecimalType(38, 0))
    val ks = Seq(20, 50, 100)
    val kMax = ks.max
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("x").desc, col("o_custkey"))
    val top = orders
      .select(col("o_custkey"), Cols.dec2(col("o_totalprice")).as("p"))
      .groupBy(col("o_custkey"))
      .agg(d38c(sum(col("p")) * 100).as("x"))
      .orderBy(col("x").desc, col("o_custkey"))
      .limit(kMax + 1) // TakeOrdered — the window below sorts 101 rows
      .withColumn("rk", row_number().over(w))
      .localCheckpoint()
    top.withColumn("k", explode(lit(ks.toArray)))
      .filter(col("rk") <= col("k") + 1)
      .groupBy(col("k"))
      .agg(
        max(when(col("rk") === col("k") + 1, col("x"))).as("thr"),
        sum(when(col("rk") <= col("k"), log(col("x").cast("double")))).as("sumln"))
      // a k the corpus cannot fill (fewer than k+1 customers) emits no
      // row — a truncated-tail α would be silently wrong
      .filter(col("thr").isNotNull)
      .select(col("k"), col("thr").cast("bigint").as("threshold_cents"),
        (col("k").cast("double") /
          (col("sumln") - col("k").cast("double") *
            log(col("thr").cast("double")))).as("alpha"))
      .orderBy(col("k"))
  }

  val q92Sql: String =
    """WITH s AS (
      |  SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS HUGEINT) AS x
      |  FROM orders GROUP BY 1),
      |r AS (
      |  SELECT x, row_number() OVER (ORDER BY x DESC, o_custkey) AS rk FROM s
      |  ORDER BY x DESC, o_custkey LIMIT 101),
      |f AS (SELECT k, rk, x FROM r CROSS JOIN (SELECT unnest([20, 50, 100]) AS k)
      |  WHERE rk <= k + 1),
      |m AS (
      |  SELECT k,
      |    max(CASE WHEN rk = k + 1 THEN x END) AS thr,
      |    sum(CASE WHEN rk <= k THEN ln(CAST(x AS DOUBLE)) END) AS sumln
      |  FROM f GROUP BY 1)
      |SELECT CAST(k AS INTEGER) AS k, CAST(thr AS BIGINT) AS threshold_cents,
      |  CAST(k AS DOUBLE) / (sumln - CAST(k AS DOUBLE) * ln(CAST(thr AS DOUBLE))) AS alpha
      |FROM m WHERE thr IS NOT NULL ORDER BY k""".stripMargin

  def q93BreuschPagan(spark: SparkSession, dir: String): DataFrame =
    // spread loader (guide §2.5): the DECIMAL(38) moment partials
    // otherwise run inside the single-split scan task (r16 measured)
    q93BreuschPaganOf(Tables.spread(spark, dir, "lineitem", "l_orderkey"))

  /** q93: Breusch–Pagan heteroscedasticity test per return flag — does
    * the price-on-quantity OLS (q61's family) have residual variance
    * that GROWS with quantity? BP = n·R² of the auxiliary regression
    * of e² on x (Breusch & Pagan 1979, Koenker form): large BP ⇒ the
    * OLS confidence intervals a downstream report quotes are wrong,
    * the diagnostic every regression over money data needs. Pass 1
    * reduces EXACT integer moments (cents/quantity sums in
    * DECIMAL(38)); a, b and every per-row residual are doubles built
    * from those exact moments in oracle-identical term order, so the
    * auxiliary moments match cross-engine to float-sum tolerance.
    *
    * Shape: two corpus passes (moments, then residual moments against
    * the ≤|flags|-row broadcast) — the q89 two-pass discipline; no
    * window, no join fan-out. */
  def q93BreuschPaganOf(lineitem: DataFrame): DataFrame = {
    def d38(c: Column): Column = c.cast(DecimalType(38, 0))
    val base = lineitem.select(col("l_returnflag").as("flag"),
      d38(col("l_quantity")).as("x"),
      d38(Cols.dec2(col("l_extendedprice")) * 100).as("y"))
    val m = base.groupBy(col("flag"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
      // slope/intercept in doubles from exact integer moments — the
      // SAME division both engines perform on identical inputs
      .withColumn("b",
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
      .withColumn("a",
        (col("sy").cast("double") - col("b") * col("sx").cast("double")) /
          col("n").cast("double"))
      .localCheckpoint() // ≤|flags| rows, consumed by BOTH later joins
    val resid = col("y").cast("double") - col("a") - col("b") * col("x").cast("double")
    val e2 = base.join(broadcast(m.select(col("flag"), col("a"), col("b"))), Seq("flag"))
      .withColumn("e2", resid * resid) // explicit product — pow(x,2) ulp-differs
      .groupBy(col("flag"))
      .agg(count(lit(1)).cast("double").as("nn"),
        sum(col("x").cast("double")).as("fx"),
        sum(col("x").cast("double") * col("x").cast("double")).as("fxx"),
        sum(col("e2")).as("se"),
        sum(col("e2") * col("e2")).as("see"),
        sum(col("e2") * col("x").cast("double")).as("sex"))
    e2.join(m.select(col("flag"), col("n"), col("b")), Seq("flag"))
      .withColumn("r2",
        (col("nn") * col("sex") - col("fx") * col("se")) *
          (col("nn") * col("sex") - col("fx") * col("se")) /
          ((col("nn") * col("fxx") - col("fx") * col("fx")) *
            (col("nn") * col("see") - col("se") * col("se"))))
      .select(col("flag").as("l_returnflag"), col("n").cast("bigint").as("n"),
        col("b").as("slope"), (col("nn") * col("r2")).as("bp_stat"))
      .orderBy(col("l_returnflag"))
  }

  val q93Sql: String =
    """WITH b AS (
      |  SELECT l_returnflag AS flag, CAST(l_quantity AS HUGEINT) AS x,
      |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS HUGEINT) AS y
      |  FROM lineitem),
      |m AS (
      |  SELECT flag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |    sum(x*x) AS sxx, sum(x*y) AS sxy
      |  FROM b GROUP BY 1),
      |ab AS (
      |  SELECT flag, n,
      |    CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) AS bb,
      |    (CAST(sy AS DOUBLE) -
      |      CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
      |        * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS aa
      |  FROM m),
      |r AS (
      |  SELECT b.flag,
      |    (CAST(b.y AS DOUBLE) - ab.aa - ab.bb * CAST(b.x AS DOUBLE))
      |      * (CAST(b.y AS DOUBLE) - ab.aa - ab.bb * CAST(b.x AS DOUBLE)) AS e2,
      |    CAST(b.x AS DOUBLE) AS xd
      |  FROM b JOIN ab USING (flag)),
      |f AS (
      |  SELECT flag, CAST(count(*) AS DOUBLE) AS nn,
      |    sum(xd) AS fx, sum(xd*xd) AS fxx,
      |    sum(e2) AS se, sum(e2*e2) AS see, sum(e2*xd) AS sex
      |  FROM r GROUP BY 1)
      |SELECT f.flag AS l_returnflag, CAST(ab.n AS BIGINT) AS n, ab.bb AS slope,
      |  nn * ((nn*sex - fx*se) * (nn*sex - fx*se)
      |    / ((nn*fxx - fx*fx) * (nn*see - se*se))) AS bp_stat
      |FROM f JOIN ab USING (flag) ORDER BY l_returnflag""".stripMargin

  def q94CramersV(spark: SparkSession, dir: String): DataFrame =
    q94CramersVOf(Tables.lineitem(spark, dir))

  /** q94: Cramér's V association between return flag and line status —
    * the categorical-correlation audit (Cramér 1946): χ² of the
    * contingency table via the identity χ² = n·(Σ o²/(r·c) − 1) (no
    * expected-count subtraction — one less cancellation site), then
    * V = √(χ²/(n·min(R−1,C−1))) ∈ [0,1]. The q84 GK-gamma measures
    * ORDINAL association; V is its nominal twin — the check before
    * anyone one-hot-encodes two columns that are secretly the same
    * signal. Cell/margin counts are EXACT integers; each cell's
    * o²/(r·c) term is one double division of exact inputs, summed
    * over ≤|R×C| cells (float-sum tolerance over a handful of
    * well-conditioned positive terms).
    *
    * Shape: ONE column-pruned scan → |R×C|-row reduce → unpartitioned
    * windows over that tiny frame → 1 row. */
  def q94CramersVOf(lineitem: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = lineitem
      .groupBy(col("l_returnflag").as("f"), col("l_linestatus").as("s"))
      .agg(count(lit(1)).as("o"))
    val t = cells
      .withColumn("r", sum(col("o")).over(Window.partitionBy(col("f"))))
      .withColumn("c", sum(col("o")).over(Window.partitionBy(col("s"))))
      .withColumn("n", sum(col("o")).over(Window.partitionBy()))
    val term = (col("o").cast("double") * col("o").cast("double")) /
      (col("r").cast("double") * col("c").cast("double"))
    t.agg(max(col("n")).as("nmax"),
        countDistinct(col("f")).as("rr"),
        countDistinct(col("s")).as("cc"),
        sum(term).as("tsum"))
      .select(col("nmax").cast("bigint").as("n_rows"),
        ((col("rr") - 1) * (col("cc") - 1)).cast("bigint").as("dof"),
        (col("nmax").cast("double") * (col("tsum") - lit(1.0))).as("chi2"),
        // Σ o²/(r·c) ≥ 1 algebraically; float summation can land an
        // ulp BELOW 1 at exact independence — clamp before the sqrt
        sqrt(greatest(col("tsum") - lit(1.0), lit(0.0)) /
          least(col("rr") - 1, col("cc") - 1).cast("double")).as("cramers_v"))
  }

  val q94Sql: String =
    """WITH cells AS (
      |  SELECT l_returnflag AS f, l_linestatus AS s, count(*) AS o
      |  FROM lineitem GROUP BY 1, 2),
      |t AS (
      |  SELECT f, s, o,
      |    sum(o) OVER (PARTITION BY f) AS r,
      |    sum(o) OVER (PARTITION BY s) AS c,
      |    sum(o) OVER () AS n
      |  FROM cells)
      |SELECT CAST(max(n) AS BIGINT) AS n_rows,
      |  CAST((count(DISTINCT f) - 1) * (count(DISTINCT s) - 1) AS BIGINT) AS dof,
      |  CAST(max(n) AS DOUBLE) *
      |    (sum((CAST(o AS DOUBLE) * CAST(o AS DOUBLE))
      |      / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE))) - 1.0) AS chi2,
      |  sqrt(greatest(sum((CAST(o AS DOUBLE) * CAST(o AS DOUBLE))
      |      / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE))) - 1.0, 0.0)
      |    / CAST(least(count(DISTINCT f) - 1, count(DISTINCT s) - 1) AS DOUBLE))
      |    AS cramers_v
      |FROM t""".stripMargin

  def q95Spearman(spark: SparkSession, dir: String): DataFrame =
    // spread loader (guide §2.5): the 600k-cell map-side reduce
    // otherwise runs its partial aggregation in the single scan task
    q95SpearmanOf(Tables.spread(spark, dir, "lineitem", "l_orderkey"))

  /** q95: Spearman rank correlation between quantity and price per
    * return flag — the monotone-association twin of the Pearson
    * family (q61/q87/q88 all assume linearity; Spearman survives any
    * monotone transform and heavy tails, the robust default for
    * skewed money data). Tie handling is the textbook AVERAGE rank,
    * kept EXACT by doubling: 2·avgrank = 2·cum_before + ties + 1 is
    * an integer, so every rank moment accumulates in DECIMAL(38) and
    * only the final ρ division runs in doubles with oracle-identical
    * term order (denominator as √A·√B, never √(A·B) — pow/sqrt
    * composition ulp-differs across libm).
    *
    * The scale trick is q70's VALUE-GRAIN rank: never sort the corpus
    * inside |flags| partitions (the r14 plan did exactly that — 4
    * corpus-grain Sort+Window pairs pinned to 3 hot partitions).
    * Quantity has ≤50 integral values; extendedprice at cents grain
    * is bounded by distinct prices (≈ |parts|·50 ≪ rows at TPC-H
    * scale — price = qty·partprice, so the joint (flag,qty,price)
    * cell frame is ~|distinct prices|, corpus/600 at sf≥1). The
    * tie-averaged rank of value v is cum_before(v) + (t_v + 1)/2,
    * computed with marginal windows OVER the reduced cell frame
    * (exact-offset RANGE frames, the c36 idiom; re-aggregating per
    * axis would re-scan the corpus per marginal — the c49 trap).
    * Frequency-weighted moments Σ cnt·r2x·r2y ≤ 4n³ stay inside
    * DECIMAL(38) to n ≈ 2.9e12 rows — the 100 TB corpus fits.
    *
    * Shape: ONE scan → (flag, qty, price) map-side reduce → the
    * quantity axis ranks via a value-bounded BROADCAST table (≤
    * |flags|·50 rows), the price axis via marginal tie/cum windows
    * over the SAME cell lineage (one (flag, py) sort) → |flags|-row
    * aggregate. No corpus-grain window anywhere, and only ONE cell-
    * frame sort instead of two. */
  def q95SpearmanOf(lineitem: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def d38(c: Column): Column = c.cast(DecimalType(38, 0))
    // integral axes: quantity is whole units (exact bigint); price is
    // exact at cents (dec2 rounds to the same 2-dp grain the r14
    // row-grain version tie-grouped on, so ranks are bit-identical)
    // materialized ONCE (the q59 discipline): the cell frame feeds two
    // structurally different subtrees — the x-rank marginal and the
    // main y-window path — and the static plan must keep scan budget 1
    // without betting on runtime exchange dedup
    val cells = lineitem
      .select(col("l_returnflag").as("flag"),
        col("l_quantity").cast("bigint").as("qx"),
        (Cols.dec2(col("l_extendedprice")) * 100).cast("bigint").as("py"))
      .groupBy(col("flag"), col("qx"), col("py"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    // x axis: quantity has ≤ 50 integral values per flag, so its
    // doubled rank table is a ≤ |flags|·50-row frame — aggregate it
    // off the cell lineage and BROADCAST-join it back instead of
    // running two windows over the full cell frame (r16: the qx
    // windows forced a second |flags|-partition sort of every cell;
    // the broadcast join removes that sort at any scale, since the
    // x-rank table is VALUE-bounded — |flags|·|quantity values| —
    // never corpus-bounded)
    val xm = cells.groupBy(col("flag"), col("qx")).agg(sum(col("cnt")).as("t"))
    val xr = xm.withColumn("cumb", coalesce(
        sum(col("t")).over(Window.partitionBy(col("flag")).orderBy(col("qx"))
          .rangeBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("flag"), col("qx"), (lit(2) * col("cumb") + col("t") + 1).as("x"))
    // y axis: distinct prices ≪ rows at scale but unbounded, so its
    // tie/cum windows stay marginal windows over the cell frame (one
    // (flag, py) sort — the q70 idiom)
    val ty = sum(col("cnt")).over(Window.partitionBy(col("flag"), col("py")))
    val cumy = coalesce(
      sum(col("cnt")).over(Window.partitionBy(col("flag")).orderBy(col("py"))
        .rangeBetween(Window.unboundedPreceding, -1)), lit(0L))
    cells
      .withColumn("y", d38(lit(2) * cumy + ty + 1))
      .join(broadcast(xr), Seq("flag", "qx"))
      .withColumn("x", d38(col("x")))
      .select(col("flag"), d38(col("cnt")).as("c"), col("x"), col("y"))
      .groupBy(col("flag"))
      .agg(sum(col("c")).as("n"),
        sum(col("c") * col("x")).as("sx"),
        sum(col("c") * col("y")).as("sy"),
        sum(col("c") * col("x") * col("x")).as("sxx"),
        sum(col("c") * col("y") * col("y")).as("syy"),
        sum(col("c") * col("x") * col("y")).as("sxy"))
      .select(col("flag").as("l_returnflag"),
        col("n").cast("bigint").as("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
          .as("spearman_rho"))
      .orderBy(col("l_returnflag"))
  }

  val q95Sql: String =
    """WITH b AS (
      |  SELECT l_returnflag AS flag, CAST(l_quantity AS DOUBLE) AS xv,
      |    CAST(l_extendedprice AS DECIMAL(12,2)) AS yv
      |  FROM lineitem),
      |r AS (
      |  SELECT flag,
      |    CAST(2 * rank() OVER (PARTITION BY flag ORDER BY xv)
      |      + count(*) OVER (PARTITION BY flag, xv) - 1 AS HUGEINT) AS x,
      |    CAST(2 * rank() OVER (PARTITION BY flag ORDER BY yv)
      |      + count(*) OVER (PARTITION BY flag, yv) - 1 AS HUGEINT) AS y
      |  FROM b),
      |m AS (
      |  SELECT flag, CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx, sum(y) AS sy,
      |    sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
      |  FROM r GROUP BY 1)
      |SELECT flag AS l_returnflag, CAST(n AS BIGINT) AS n,
      |  CAST(n*sxy - sx*sy AS DOUBLE) /
      |    (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE)))
      |    AS spearman_rho
      |FROM m ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q95_spearman_rho" -> (q95Spearman _),
    "q94_cramers_v" -> (q94CramersV _),
    "q93_breusch_pagan" -> (q93BreuschPagan _),
    "q92_hill_tail" -> (q92HillTail _),
    "q91_seasonal_strength" -> (q91SeasonalStrength _),
    "q90_theil_index" -> (q90TheilIndex _),
    "q89_mahalanobis" -> (q89Mahalanobis _),
    "q88_partial_corr" -> (q88PartialCorr _),
    "q87_cov_matrix" -> (q87CovMatrix _),
    "q86_hoover_index" -> (q86Hoover _),
    "q85_jarque_bera" -> (q85JarqueBera _),
    "q84_gk_gamma" -> (q84GkGamma _),
    "q83_same_day_orders" -> (q83SameDayOrders _),
    "q82_price_dispersion" -> (q82PriceDispersion _),
    "q81_trimmed_stats" -> (q81TrimmedStats _),
    "q80_cramers_v" -> (q80CramersV _),
    "q79_abc_migration" -> (q79AbcMigration _),
    "q78_price_index" -> (q78PriceIndex _),
    "q77_reorder_cadence" -> (q77ReorderCadence _),
    "q76_cohort_ltv" -> (q76CohortLtv _),
    "q75_levene" -> (q75Levene _),
    "q74_kruskal_wallis" -> (q74KruskalWallis _),
    "q73_anova_two_way" -> (q73AnovaTwoWay _),
    "q72_mann_whitney" -> (q72MannWhitney _),
    "q71_kendall_tau" -> (q71KendallTau _),
    "q70_spearman" -> (q70Spearman _),
    "q69_return_pchart" -> (q69ReturnPchart _),
    "q68_discount_elasticity" -> (q68DiscountElasticity _),
    "q67_growth_accounting" -> (q67GrowthAccounting _),
    "q66_topk_churn" -> (q66TopkChurn _),
    "q65_abc_class" -> (q65AbcClass _),
    "q64_backlog_profile" -> (q64BacklogProfile _),
    "q63_ks_delay" -> (q63KsDelay _),
    "q62_hhi_concentration" -> (q62HhiConcentration _),
    "q61_ols_trend" -> (q61OlsTrend _),
    "q60_benford_audit" -> (q60BenfordAudit _),
    "q59_basket_pairs" -> (q59BasketPairs _),
    "q58_skyline" -> (q58Skyline _),
    "q57_cardinality_audit" -> (q57CardinalityAudit _),
    "q56_equidepth_hist" -> (q56EquidepthHist _),
    "q55_chi2_assoc" -> (q55Chi2Assoc _),
    "q54_pareto_cross" -> (q54ParetoCross _),
    "q53_gini" -> (q53Gini _),
    "q52_cube" -> (q52Cube _),
    "q51_nearest_supplier" -> (q51NearestSupplier _),
    "q50_ship_delay" -> (q50ShipDelay _),
    "q49_percent_rank" -> (q49PercentRank _),
    "q48_decile_shift" -> (q48DecileShift _),
    "q47_order_gaps" -> (q47OrderGaps _),
    "q46_weighted_median" -> (q46WeightedMedian _),
    "q45_price_histogram" -> (q45PriceHistogram _),
    "q44_mode_priority" -> (q44ModePriority _),
    "q43_dominant_supplier" -> (q43DominantSupplier _),
    "q42_min_cost_supplier" -> (q42MinCostSupplier _),
    "q41_quartiles_cont" -> (q41QuartilesCont _),
    "q40_rolling_revenue" -> (q40RollingRevenue _),
    "q39_yoy_growth" -> (q39YoyGrowth _),
    "q37_blame_supplier" -> (q37BlameSupplier _),
    "q38_part_share" -> (q38PartShare _),
    "q33_top_supplier" -> (q33TopSupplier _),
    "q34_profit_by_nation" -> (q34ProfitByNation _),
    "q35_market_share" -> (q35MarketShare _),
    "q36_supplier_diversity" -> (q36SupplierDiversity _),
    "q31_returned_items" -> (q31ReturnedItems _),
    "q32_large_orders" -> (q32LargeOrders _),
    "q28_promo_share" -> (q28PromoShare _),
    "q29_nation_volume" -> (q29NationVolume _),
    "q30_disjunct" -> (q30Disjunct _),
    "q27_balance_gap" -> (q27BalanceGap _),
    "q26_corr_moments" -> (q26CorrMoments _),
    "q11_global_threshold" -> (q11GlobalThreshold _),
    "q23_running_total" -> (q23RunningTotal _),
    "q24_corr_avg" -> (q24CorrAvg _),
    "q25_spend_deciles" -> (q25SpendDeciles _),
    "q19_string_ops" -> (q19StringOps _),
    "q20_setops" -> (q20Setops _),
    "q21_median_disc" -> (q21MedianDisc _),
    "q1_agg" -> (q1Agg _),
    "q3_join_topk" -> (q3JoinTopk _),
    "q4_semijoin" -> (q4Semijoin _),
    "q5_multijoin" -> (q5Multijoin _),
    "q6_filter_sum" -> (q6FilterSum _),
    "q7_window_rank" -> (q7WindowRank _),
    "q8_rollup" -> (q8Rollup _),
    "q9_antijoin" -> (q9Antijoin _),
    "q10_having" -> (q10Having _),
    "q12_case_agg" -> (q12CaseAgg _),
    "q13_outerjoin_dist" -> (q13OuterjoinDist _),
    "q14_distinct" -> (q14Distinct _),
    "q15_maxsub" -> (q15Maxsub _),
    "q16_pivot" -> (q16Pivot _),
    "q17_approx_distinct" -> (q17ApproxDistinct _),
    "q18_grouping_sets" -> (q18GroupingSets _),
    "q22_approx_percentile" -> (q22ApproxPercentile _))

  val oracles: Map[String, String] = Map(
    "q95_spearman_rho" -> q95Sql,
    "q94_cramers_v" -> q94Sql,
    "q93_breusch_pagan" -> q93Sql,
    "q92_hill_tail" -> q92Sql,
    "q91_seasonal_strength" -> q91Sql,
    "q90_theil_index" -> q90Sql,
    "q89_mahalanobis" -> q89Sql,
    "q88_partial_corr" -> q88Sql,
    "q87_cov_matrix" -> q87Sql,
    "q86_hoover_index" -> q86Sql,
    "q85_jarque_bera" -> q85Sql,
    "q84_gk_gamma" -> q84Sql,
    "q83_same_day_orders" -> q83Sql,
    "q82_price_dispersion" -> q82Sql,
    "q81_trimmed_stats" -> q81Sql,
    "q80_cramers_v" -> q80Sql,
    "q79_abc_migration" -> q79Sql,
    "q78_price_index" -> q78Sql,
    "q77_reorder_cadence" -> q77Sql,
    "q76_cohort_ltv" -> q76Sql,
    "q75_levene" -> q75Sql,
    "q74_kruskal_wallis" -> q74Sql,
    "q73_anova_two_way" -> q73Sql,
    "q72_mann_whitney" -> q72Sql,
    "q71_kendall_tau" -> q71Sql,
    "q70_spearman" -> q70Sql,
    "q69_return_pchart" -> q69Sql,
    "q68_discount_elasticity" -> q68Sql,
    "q67_growth_accounting" -> q67Sql,
    "q66_topk_churn" -> q66Sql,
    "q65_abc_class" -> q65Sql,
    "q64_backlog_profile" -> q64Sql,
    "q63_ks_delay" -> q63Sql,
    "q62_hhi_concentration" -> q62Sql,
    "q61_ols_trend" -> q61Sql,
    "q60_benford_audit" -> q60Sql,
    "q59_basket_pairs" -> q59Sql,
    "q58_skyline" -> q58Sql,
    "q57_cardinality_audit" -> q57Sql,
    "q56_equidepth_hist" -> q56Sql,
    "q55_chi2_assoc" -> q55Sql,
    "q54_pareto_cross" -> q54Sql,
    "q53_gini" -> q53Sql,
    "q52_cube" -> q52Sql,
    "q51_nearest_supplier" -> q51Sql,
    "q50_ship_delay" -> q50Sql,
    "q49_percent_rank" -> q49Sql,
    "q48_decile_shift" -> q48Sql,
    "q47_order_gaps" -> q47Sql,
    "q46_weighted_median" -> q46Sql,
    "q45_price_histogram" -> q45Sql,
    "q44_mode_priority" -> q44Sql,
    "q43_dominant_supplier" -> q43Sql,
    "q42_min_cost_supplier" -> q42Sql,
    "q41_quartiles_cont" -> q41Sql,
    "q40_rolling_revenue" -> q40Sql,
    "q39_yoy_growth" -> q39Sql,
    "q37_blame_supplier" -> q37Sql,
    "q38_part_share" -> q38Sql,
    "q33_top_supplier" -> q33Sql,
    "q34_profit_by_nation" -> q34Sql,
    "q35_market_share" -> q35Sql,
    "q36_supplier_diversity" -> q36Sql,
    "q31_returned_items" -> q31Sql,
    "q32_large_orders" -> q32Sql,
    "q28_promo_share" -> q28Sql,
    "q29_nation_volume" -> q29Sql,
    "q30_disjunct" -> q30Sql,
    "q27_balance_gap" -> q27Sql,
    "q26_corr_moments" -> q26Sql,
    "q11_global_threshold" -> q11Sql,
    "q23_running_total" -> q23Sql,
    "q24_corr_avg" -> q24Sql,
    "q25_spend_deciles" -> q25Sql,
    "q19_string_ops" -> q19Sql,
    "q20_setops" -> q20Sql,
    "q21_median_disc" -> q21Sql,
    "q1_agg" -> q1Sql,
    "q3_join_topk" -> q3Sql,
    "q4_semijoin" -> q4Sql,
    "q5_multijoin" -> q5Sql,
    "q6_filter_sum" -> q6Sql,
    "q7_window_rank" -> q7Sql,
    "q8_rollup" -> q8Sql,
    "q9_antijoin" -> q9Sql,
    "q10_having" -> q10Sql,
    "q12_case_agg" -> q12Sql,
    "q13_outerjoin_dist" -> q13Sql,
    "q14_distinct" -> q14Sql,
    "q15_maxsub" -> q15Sql,
    "q16_pivot" -> q16Sql,
    "q18_grouping_sets" -> q18Sql)
}
