package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Tables._

/** The standard relational surface (SURVEY.md §2.3–§2.8 parity): scans,
  * filters, projections, joins (inner/semi/anti/broadcast), aggregations
  * (incl. rollup), windows, sorts/top-k, and set operations — each exposed
  * as a named query over the driver's TPC-H-ish tables and hash-checked
  * against a DuckDB oracle.
  *
  * Determinism rules shared with the oracle SQL (SparkEntry.oracleSql):
  *   - every query ends in a TOTAL order (unique tie-break column) so row
  *     order matches the oracle byte-for-byte;
  *   - NO floating `round()` in outputs. Summing doubles is
  *     order-dependent, and round() breaks ties differently in the two
  *     engines (Spark: decimal-string HALF_UP; DuckDB: binary
  *     ties-away-from-zero). Instead every accumulated money value is
  *     computed in EXACT decimal — per-value cast to DECIMAL(12,2) (both
  *     engines round the identical IEEE bits to the identical 2-decimal
  *     value), exact decimal sum (order-independent), final CAST back to
  *     DOUBLE (nearest-double of the same rational on both sides) —
  *     bit-identical results with no rounding step at all. Averages are
  *     exact-decimal-sum ÷ count in double (same bits ⇒ same quotient);
  *     per-row arithmetic is bit-identical IEEE and needs nothing;
  *   - ascending sorts put NULLS FIRST explicitly in the SQL (Spark's
  *     default) since DuckDB defaults to NULLS LAST.
  *
  * Scale notes (100 TB design point):
  *   - dimension joins (region/nation/supplier/part at TPC-H scale ratios)
  *     are explicitly `broadcast()` — no shuffle of the fact table;
  *   - fact-fact joins (orders⋈lineitem) shuffle on the join key once and
  *     Catalyst/AQE pick sort-merge with skew splitting;
  *   - aggregations are declarative groupBy/agg → partial (map-side)
  *     aggregation for free; decimal sums keep partial aggregation (exact
  *     long-backed Decimal accumulation, overflow headroom to 1e33);
  *   - the trailing global sorts exist for oracle determinism; at
  *     production scale the same plans run unsorted or top-k'd
  *     (TakeOrderedAndProject) — noted per query.
  */
object Relational {

  /** 2-decimal money column as exact decimal. */
  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Order-independent exact sum of a money column, surfaced as DOUBLE. */
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Exact sum of a product of two money-scale factors (scale-4 decimal),
    * surfaced as DOUBLE.
    */
  private def dsumProd(a: Column, b: Column): Column =
    sum(dec(a) * dec(b)).cast("double")

  /** Exact average: exact decimal sum ÷ count, in double. */
  private def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** TPC-H Q1 flavor: scan-heavy grouped aggregation with arithmetic.
    * Plan: parquet scan (shipdate filter pushed) → partial agg → 6-group
    * final agg. No joins, one shuffle of 6 groups — scales linearly.
    */
  def q01PricingSummary(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsumProd(col("l_extendedprice"), lit(1) - col("l_discount")).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q6 flavor: tight-filter scalar aggregate. Filter fully pushed
    * to parquet; single partial+final agg, no shuffle of data rows.
    */
  def q02RevenueForecast(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
      .agg(dsumProd(col("l_extendedprice"), col("l_discount")).as("revenue"))

  /** TPC-H Q3 flavor: segment-filtered customer ⋈ orders ⋈ lineitem,
    * grouped revenue, top-10. customer is the small side → broadcast;
    * orders⋈lineitem co-shuffle on orderkey. Top-k via orderBy+limit →
    * TakeOrderedAndProject (no global sort materialization).
    */
  def q03TopRevenueOrders(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = orders(s, d).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = lineitem(s, d)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsumProd(col("l_extendedprice"), lit(1) - col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Star join through two broadcast dims: customers per region with
    * account stats. nation (25 rows) and region (5 rows) broadcast — the
    * customer scan never shuffles for the join, only for the 5-group agg.
    */
  def q04RegionCustomerStats(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        davg(col("c_acctbal")).as("avg_acctbal"),
        dsum(col("c_acctbal")).as("sum_acctbal"))
      .orderBy(col("r_name"))

  /** Window: top-3 orders per customer by value. Single shuffle on
    * custkey; rank computed per partition. Tie-broken on orderkey for
    * determinism.
    */
  def q05TopOrdersPerCustomer(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Global top-k: TakeOrderedAndProject, not a full sort — each partition
    * keeps 100 rows, driver merges. Raw (unaggregated) doubles need no
    * decimal treatment: identical parquet bits on both sides.
    */
  def q06TopOrders(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  /** Left-semi join (EXISTS): customers that have ≥1 order, counted per
    * nation. Semi-join shuffles only keys; nation broadcast.
    */
  def q07ActiveCustomersByNation(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy(col("n_name"))

  /** Left-anti join (NOT EXISTS): customers with no orders. */
  def q08InactiveCustomers(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))

  /** Set op: INTERSECT of rich customers and big-order customers. */
  def q09RichAndBigSpenders(s: SparkSession, d: String): DataFrame =
    customer(s, d).filter(col("c_acctbal") > 5000).select(col("c_custkey").as("custkey"))
      .intersect(
        orders(s, d).filter(col("o_totalprice") > 200000).select(col("o_custkey").as("custkey")))
      .orderBy(col("custkey"))

  /** Set op: EXCEPT — rich customers who never placed a big order. */
  def q10RichNotBigSpenders(s: SparkSession, d: String): DataFrame =
    customer(s, d).filter(col("c_acctbal") > 5000).select(col("c_custkey").as("custkey"))
      .except(
        orders(s, d).filter(col("o_totalprice") > 200000).select(col("o_custkey").as("custkey")))
      .orderBy(col("custkey"))

  /** ROLLUP: hierarchical counts region → nation with grand total.
    * Spark's rollup = DuckDB GROUP BY ROLLUP; NULLS FIRST ordering matches
    * Spark's asc default.
    */
  def q11RegionNationRollup(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("bal"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))

  /** Time-bucketed aggregation: monthly order revenue. date_trunc keeps
    * the column a timestamp in both engines.
    */
  def q12MonthlyRevenue(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("revenue"))
      .orderBy(col("month"))

  /** CASE bucketing + conditional aggregation over order values. */
  def q13OrderValueBuckets(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(
        when(col("o_totalprice") < 50000, "small")
          .when(col("o_totalprice") < 150000, "medium")
          .otherwise("large").as("bucket"),
        col("o_totalprice"),
        col("o_orderstatus"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n"),
        dsum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(0.0))
          .as("finished_value"))
      .orderBy(col("bucket"))

  /** String functions + filter + agg on part. */
  def q14PartBrandStats(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .filter(col("p_size") >= 10 && upper(col("p_type")).isin("STANDARD", "PROMO"))
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n"),
        davg(col("p_retailprice")).as("avg_price"),
        max(length(col("p_name"))).as("max_name_len"))
      .orderBy(col("p_brand"))

  /** UNION ALL with literal tags, then ordered. */
  def q15PriorityUnion(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(lit("urgent").as("class"), col("o_orderkey"), col("o_totalprice"))
    val low = o.filter(col("o_orderpriority") === "5-LOW")
      .select(lit("low").as("class"), col("o_orderkey"), col("o_totalprice"))
    urgent.unionAll(low).orderBy(col("class"), col("o_orderkey"))
  }

  /** Fact-fact join orders⋈lineitem with HAVING: multi-line orders and
    * their revenue. Co-shuffles both sides on orderkey (sort-merge / AQE).
    */
  /** Aggregate-BEFORE-join: lineitem pre-aggregates per orderkey (600k →
    * 150k rows with partial map-side combine), and only then joins orders
    * to attach o_custkey — identical result (the join is 1:N on the group
    * key and o_custkey is functionally dependent on it), but the join
    * moves one aggregated row per order instead of every line item. At
    * 100 TB this is the difference between shuffling the fact table once
    * (for its own agg) and shuffling it twice.
    */
  def q16BigOrders(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_lines"),
        dsum(col("l_extendedprice")).as("gross"))
      .filter(col("n_lines") >= 5)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("n_lines"), col("gross"))
      .orderBy(col("o_orderkey"))

  /** Grouped running/window aggregates: each nation's customer balances
    * ranked and cumulated — rank + sum window over one shuffle. The
    * running sum accumulates in exact decimal (frame order is
    * deterministic, but decimal keeps it airtight), surfaced as double.
    */
  def q17NationBalanceWindow(s: SparkSession, d: String): DataFrame = {
    val w: WindowSpec = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    customer(s, d)
      .select(
        col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        rank().over(w).as("bal_rank"),
        sum(dec(col("c_acctbal")))
          .over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double").as("running_bal"))
      .filter(col("bal_rank") <= 5)
      .orderBy(col("c_nationkey"), col("bal_rank"))
  }

  /** Hourly tumbling aggregation over the events table (batch analogue of
    * the streaming window — the streaming path itself is in
    * graft.streaming, non-SQL-checkable).
    */
  def q18EventsHourly(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("value")).as("total_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("hour"), col("event_type"))

  /** JSON extraction from the events props column. */
  def q19EventsJson(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(
        (get_json_object(col("props"), "$.k").cast("int") % 10).as("k_mod"),
        col("value"))
      .groupBy(col("k_mod"))
      .agg(count(lit(1)).as("n"), davg(col("value")).as("avg_value"))
      .orderBy(asc_nulls_first("k_mod"))

  /** Correlated-style aggregate filter: customers whose total order value
    * exceeds 10× their account balance (join + group + join back =
    * decorrelated plan, the Spark-native shape).
    */
  def q20OverSpenders(s: SparkSession, d: String): DataFrame = {
    val spend = orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(dsum(col("o_totalprice")).as("total_spend"))
    customer(s, d)
      .join(spend, col("c_custkey") === col("o_custkey"))
      .filter(col("total_spend") > col("c_acctbal") * 10)
      .select(col("c_custkey"), col("c_acctbal"), col("total_spend"))
      .orderBy(col("c_custkey"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> q01PricingSummary _,
    "q02_revenue_forecast" -> q02RevenueForecast _,
    "q03_top_revenue_orders" -> q03TopRevenueOrders _,
    "q04_region_customer_stats" -> q04RegionCustomerStats _,
    "q05_top_orders_per_customer" -> q05TopOrdersPerCustomer _,
    "q06_top_orders" -> q06TopOrders _,
    "q07_active_customers_by_nation" -> q07ActiveCustomersByNation _,
    "q08_inactive_customers" -> q08InactiveCustomers _,
    "q09_rich_and_big_spenders" -> q09RichAndBigSpenders _,
    "q10_rich_not_big_spenders" -> q10RichNotBigSpenders _,
    "q11_region_nation_rollup" -> q11RegionNationRollup _,
    "q12_monthly_revenue" -> q12MonthlyRevenue _,
    "q13_order_value_buckets" -> q13OrderValueBuckets _,
    "q14_part_brand_stats" -> q14PartBrandStats _,
    "q15_priority_union" -> q15PriorityUnion _,
    "q16_big_orders" -> q16BigOrders _,
    "q17_nation_balance_window" -> q17NationBalanceWindow _,
    "q18_events_hourly" -> q18EventsHourly _,
    "q19_events_json" -> q19EventsJson _,
    "q20_over_spenders" -> q20OverSpenders _)

  /** Shared SQL fragments for the oracle (DuckDB) side of the decimal
    * strategy — kept textually simple so the SQL stays readable.
    */
  private def sqlDsum(e: String): String =
    s"CAST(sum(CAST($e AS DECIMAL(12,2))) AS DOUBLE)"
  private def sqlDsumProd(a: String, b: String): String =
    s"CAST(sum(CAST($a AS DECIMAL(12,2)) * CAST($b AS DECIMAL(12,2))) AS DOUBLE)"
  private def sqlDavg(e: String): String =
    s"${sqlDsum(e)} / count(*)"

  /** DuckDB oracle SQL, column-name and row-order aligned with the Spark
    * plans above (see determinism rules in the object doc).
    */
  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         ${sqlDsum("l_quantity")} AS sum_qty,
         ${sqlDsum("l_extendedprice")} AS sum_base_price,
         ${sqlDsumProd("l_extendedprice", "1 - l_discount")} AS sum_disc_price,
         ${sqlDavg("l_quantity")} AS avg_qty,
         ${sqlDavg("l_extendedprice")} AS avg_price,
         count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_revenue_forecast" ->
      s"""SELECT ${sqlDsumProd("l_extendedprice", "l_discount")} AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
           AND l_discount >= 0.05 AND l_discount <= 0.07
           AND l_quantity < 24""",
    "q03_top_revenue_orders" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         ${sqlDsumProd("l_extendedprice", "1 - l_discount")} AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, l_orderkey
         LIMIT 10""",
    "q04_region_customer_stats" ->
      s"""SELECT r_name, count(*) AS n_customers,
         ${sqlDavg("c_acctbal")} AS avg_acctbal,
         ${sqlDsum("c_acctbal")} AS sum_acctbal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name
         ORDER BY r_name""",
    "q05_top_orders_per_customer" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 3
         ORDER BY o_custkey, rn""",
    "q06_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
         FROM orders
         ORDER BY o_totalprice DESC, o_orderkey
         LIMIT 100""",
    "q07_active_customers_by_nation" ->
      """SELECT n_name, count(*) AS n_active
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         GROUP BY n_name
         ORDER BY n_name""",
    "q08_inactive_customers" ->
      """SELECT c_custkey, c_name, c_acctbal
         FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q09_rich_and_big_spenders" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
         INTERSECT
         SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000
         ORDER BY custkey""",
    "q10_rich_not_big_spenders" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
         EXCEPT
         SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000
         ORDER BY custkey""",
    "q11_region_nation_rollup" ->
      s"""SELECT r_name, n_name, count(*) AS n, ${sqlDsum("c_acctbal")} AS bal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP(r_name, n_name)
         ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""",
    "q12_monthly_revenue" ->
      s"""SELECT date_trunc('month', o_orderdate) AS month,
         count(*) AS n_orders, ${sqlDsum("o_totalprice")} AS revenue
         FROM orders
         GROUP BY 1
         ORDER BY month""",
    "q13_order_value_buckets" ->
      s"""SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                     WHEN o_totalprice < 150000 THEN 'medium'
                     ELSE 'large' END AS bucket,
         count(*) AS n,
         ${sqlDsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END")}
           AS finished_value
         FROM orders
         GROUP BY 1
         ORDER BY bucket""",
    "q14_part_brand_stats" ->
      s"""SELECT p_brand, count(*) AS n,
         ${sqlDavg("p_retailprice")} AS avg_price,
         max(length(p_name)) AS max_name_len
         FROM part
         WHERE p_size >= 10 AND upper(p_type) IN ('STANDARD', 'PROMO')
         GROUP BY p_brand
         ORDER BY p_brand""",
    "q15_priority_union" ->
      """SELECT 'urgent' AS class, o_orderkey, o_totalprice FROM orders
           WHERE o_orderpriority = '1-URGENT'
         UNION ALL
         SELECT 'low' AS class, o_orderkey, o_totalprice FROM orders
           WHERE o_orderpriority = '5-LOW'
         ORDER BY class, o_orderkey""",
    "q16_big_orders" ->
      s"""SELECT o_orderkey, o_custkey, count(*) AS n_lines,
         ${sqlDsum("l_extendedprice")} AS gross
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderkey, o_custkey
         HAVING count(*) >= 5
         ORDER BY o_orderkey""",
    "q17_nation_balance_window" ->
      """SELECT c_nationkey, c_custkey, c_acctbal, bal_rank, running_bal FROM (
           SELECT c_nationkey, c_custkey, c_acctbal,
             rank() OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal DESC, c_custkey) AS bal_rank,
             CAST(sum(CAST(c_acctbal AS DECIMAL(12,2)))
                    OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal DESC, c_custkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE) AS running_bal
           FROM customer) WHERE bal_rank <= 5
         ORDER BY c_nationkey, bal_rank""",
    "q18_events_hourly" ->
      s"""SELECT date_trunc('hour', ts) AS hour, event_type,
         count(*) AS n, ${sqlDsum("value")} AS total_value,
         count(DISTINCT user_id) AS n_users
         FROM events
         GROUP BY 1, 2
         ORDER BY hour, event_type""",
    "q19_events_json" ->
      s"""SELECT CAST(props ->> '$$.k' AS INTEGER) % 10 AS k_mod,
         count(*) AS n, ${sqlDavg("value")} AS avg_value
         FROM events
         GROUP BY 1
         ORDER BY k_mod NULLS FIRST""",
    "q20_over_spenders" ->
      s"""SELECT c_custkey, c_acctbal, total_spend FROM customer
         JOIN (SELECT o_custkey, ${sqlDsum("o_totalprice")} AS total_spend
               FROM orders GROUP BY o_custkey) ON c_custkey = o_custkey
         WHERE total_spend > c_acctbal * 10
         ORDER BY c_custkey""")
}
