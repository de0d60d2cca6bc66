package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Relational analytics operators over the TPC-H-ish tables.
 *
 * These are the scan/join/aggregate headliners of the bench. Shapes are
 * classic TPC-H (adapted to the columns present in the test data):
 * declarative DataFrame plans so Catalyst pushes filters/prunes columns
 * to the parquet scan, small dimensions are broadcast, and aggregates
 * partial-agg on the map side.
 */
object Analytics {

  // Money/measure aggregates run in exact DECIMAL and only convert to
  // DOUBLE after the final ROUND: double SUMs are association-order
  // dependent (partial aggregation in Spark, segment trees in DuckDB),
  // so ulp drift can survive 2-dp rounding at scale; decimal addition
  // is associative and both engines agree exactly (SURVEY §5).
  private val price = col("l_extendedprice").cast("decimal(18,4)")
  private val qty = col("l_quantity").cast("decimal(18,2)")
  private val disc = col("l_discount").cast("decimal(5,4)")
  private val oneMinusDisc = lit(1.0).cast("decimal(5,4)") - disc
  private val onePlusTax = lit(1.0).cast("decimal(5,4)") + col("l_tax").cast("decimal(5,4)")

  /** Q1-shape pricing summary: scan-heavy group aggregate over lineitem. */
  def q1Pricing(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(qty), 2).cast("double").as("sum_qty"),
        round(sum(price), 2).cast("double").as("sum_base_price"),
        round(sum(price * oneMinusDisc), 2).cast("double").as("sum_disc_price"),
        round(sum(price * oneMinusDisc * onePlusTax), 2).cast("double").as("sum_charge"),
        round(sum(qty).cast("double") / count(lit(1)), 4).as("avg_qty"),
        round(sum(price).cast("double") / count(lit(1)), 4).as("avg_price"),
        round(sum(disc).cast("double") / count(lit(1)), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  val q1PricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1.0 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))), 2) AS DOUBLE) AS sum_disc_price,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1.0 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))) * (CAST(1.0 AS DECIMAL(5,4)) + CAST(l_tax AS DECIMAL(5,4)))), 2) AS DOUBLE) AS sum_charge,
      |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
      |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4) AS avg_price,
      |  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(5,4))) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Q6-shape revenue: selective filters that must reach the parquet scan. */
  def q6Revenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(round(sum(price * disc), 2).cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))

  val q6RevenueSql: String =
    """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(5,4))), 2) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** Q3-shape shipping priority: 3-way join, broadcast customer, top-10. */
  def q3Shipping(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(price * oneMinusDisc), 2).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3ShippingSql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1.0 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15'
      |  AND l_shipdate > TIMESTAMP '1998-03-15'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** Q5-shape snowflake join through region→nation→customer+supplier. */
  def q5LocalVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val region = Tables.region(spark, sfDir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
    val supp = Tables.supplier(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, sfDir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(price * oneMinusDisc), 2).cast("double").as("revenue"))
  }

  val q5LocalVolumeSql: String =
    """SELECT n_name,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1.0 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name""".stripMargin

  /** Top-3 orders per customer by total price (window function shape). */
  def qTopOrdersWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        (floor(col("o_totalprice") * 100) / 100).as("total_price"), col("rnk"))
  }

  val qTopOrdersWindowSql: String =
    """SELECT o_custkey, o_orderkey, FLOOR(o_totalprice * 100) / 100 AS total_price, rnk
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice, CAST(ROW_NUMBER() OVER (
      |    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rnk
      |  FROM orders)
      |WHERE rnk <= 3""".stripMargin

  /** 30-minute-gap sessionization of the events stream (lag + cumsum). */
  def qSessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        round(sum(col("value").cast("decimal(18,6)")), 2).cast("double").as("session_value"))
  }

  val qSessionizeSql: String =
    """SELECT user_id, session_seq, COUNT(*) AS n_events,
      |  MIN(CAST(ts AS TIMESTAMP)) AS session_start,
      |  MAX(CAST(ts AS TIMESTAMP)) AS session_end,
      |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS session_value
      |FROM (
      |  SELECT user_id, ts, value,
      |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM (
      |    SELECT user_id, event_id, ts, value,
      |      CASE WHEN prev_ts IS NULL
      |             OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS new_session
      |    FROM (
      |      SELECT user_id, event_id, ts, value,
      |        LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |      FROM events)))
      |GROUP BY user_id, session_seq""".stripMargin

  /** Q14-shape promotion effect: conditional aggregate over a
    * broadcast part-dimension join (promo revenue share per brand). */
  def q14Promo(spark: SparkSession, sfDir: String): DataFrame = {
    val promo = when(col("p_type").startsWith("PROMO"), price * oneMinusDisc)
      .otherwise(lit(0).cast("decimal(24,8)"))
    Tables.lineitem(spark, sfDir)
      .join(broadcast(Tables.part(spark, sfDir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        round(sum(promo), 2).cast("double").as("promo_revenue"),
        round(sum(price * oneMinusDisc), 2).cast("double").as("total_revenue"),
        count(lit(1)).as("n_lines"))
  }

  val q14PromoSql: String =
    """SELECT p_brand,
      |  CAST(ROUND(SUM(CASE WHEN p_type LIKE 'PROMO%'
      |    THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1.0 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))
      |    ELSE CAST(0 AS DECIMAL(24,8)) END), 2) AS DOUBLE) AS promo_revenue,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1.0 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))), 2) AS DOUBLE) AS total_revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand""".stripMargin

  /** Semi-structured extraction: parse the events' JSON props payload
    * (codegen'd `get_json_object`, no UDF) and aggregate the extracted
    * field per event type. */
  def qEventsJson(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"),
        count(when(col("k") >= 50, 1)).as("n_high"))

  val qEventsJsonSql: String =
    """SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
      |  CAST(COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50 THEN 1 END) AS BIGINT) AS n_high
      |FROM events GROUP BY event_type""".stripMargin

  /** Hourly tumbling-window event aggregates (batch twin of the streaming op). */
  def qEventsWindow(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour").getField("start").as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,6)")), 2).cast("double").as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))

  val qEventsWindowSql: String =
    """SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS hour_start, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  /**
   * Approximate distinct users per event type (HLL++ sketch). The
   * scale path for `q_events_window`'s exact countDistinct: the
   * sketch is mergeable (one partial-agg pass, no distinct shuffle),
   * which is what survives at 100 TB. Register merges are
   * commutative, so the estimate is deterministic. Accuracy vs the
   * exact count is asserted in AnalyticsSpec (rows oracle).
   */
  /** Relative-error bound the HLL verdict is checked against: 3x the
    * Spark sketch's 0.02 rsd (a 3-sigma gate), comfortably above
    * DuckDB's HLL error too — yet a REAL check: a broken sketch, a
    * wrong column, or a precision regression in either engine fails
    * it. */
  val ApproxUsersEps = 0.06

  /**
   * `q_events_approx_users`: HLL approximate distinct users per event
   * type. The two engines build DIFFERENT sketch families, so hash
   * equality on the estimate itself is impossible by construction —
   * instead the entry outputs the BOUNDED-ERROR VERDICT the r9
   * verdict asked for, expressed so the driver's existing hash gate
   * checks it: each engine derives the exact distinct count IN THE
   * SAME QUERY and validates its OWN sketch against it
   * (|approx − exact| <= [[ApproxUsersEps]]·exact). The hashed
   * columns — exact counts + per-type verdict — agree exactly iff
   * both sketches honor the bound; the raw estimate's behavior stays
   * spec-checked in AnalyticsSpec.
   */
  def qEventsApproxUsers(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx"),
        count_distinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"), col("n_events"), col("exact_users"),
        (abs(col("approx").cast("double") - col("exact_users")) <=
          lit(ApproxUsersEps) * col("exact_users")).cast("int").as("within_bound"))

  val qEventsApproxUsersSql: String =
    s"""SELECT event_type, COUNT(*) AS n_events,
       |  COUNT(DISTINCT user_id) AS exact_users,
       |  CAST(ABS(CAST(approx_count_distinct(user_id) AS DOUBLE)
       |             - COUNT(DISTINCT user_id))
       |       <= $ApproxUsersEps * COUNT(DISTINCT user_id) AS INTEGER) AS within_bound
       |FROM events GROUP BY event_type""".stripMargin

  /**
   * Running revenue per supplier over ship dates (cumulative window).
   * Revenue terms are exact DECIMALs: engines disagree on the
   * floating-point association of window sums (DuckDB aggregates
   * frames via a segment tree), so double running sums drift by ulps
   * that occasionally survive 2-dp rounding. Decimal addition is
   * associative — both engines produce the identical exact sum.
   */
  def qRunningBalance(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey")).orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rev = col("l_extendedprice").cast("decimal(18,4)") *
      (lit(1.0).cast("decimal(5,4)") - col("l_discount").cast("decimal(5,4)"))
    Tables.lineitem(spark, sfDir)
      .withColumn("running_revenue", sum(rev).over(w))
      .groupBy(col("l_suppkey"))
      .agg(round(max(col("running_revenue")), 2).cast("double").as("final_running"),
        count(lit(1)).as("n_lines"))
  }

  val qRunningBalanceSql: String =
    """SELECT l_suppkey, CAST(ROUND(MAX(running_revenue), 2) AS DOUBLE) AS final_running,
      |  COUNT(*) AS n_lines
      |FROM (
      |  SELECT l_suppkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |        (CAST(1.0 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))) OVER (
      |      PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_revenue
      |  FROM lineitem)
      |GROUP BY l_suppkey""".stripMargin
}
