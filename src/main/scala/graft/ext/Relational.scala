package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Relational query surface over the TPC-H-ish testdata.
  *
  * The reference pipeline itself contains no joins/windows/sorts
  * (SURVEY.md §2.4/§2.6); these are the engine extensions that make the
  * library usable for real analytics, expressed Spark-first so Catalyst
  * plans them (broadcast hash joins for dims, partial+final hash
  * aggregation, AQE skew handling).
  *
  * Determinism contract with the DuckDB oracle:
  *   - double sums go through DECIMAL(18,2|4) so results are exact and
  *     independent of aggregation order (a straight double sum differs
  *     between engines in the last ulps);
  *   - every output is totally ordered with explicit tie-breakers;
  *   - NULL ordering is pinned (nulls first) on rollup outputs.
  */
object Relational {

  /** Order-insensitive exact sum of a double column: cast to decimal,
    * sum exactly, return double.
    */
  private def dsum2(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")
  private def dsum4(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")
  // 6 decimals: the exact scale of a product of three 2-decimal
  // factors, so the decimal cast never faces a rounding tie (a tie at
  // scale 4 is hit by ~1% of such products and engines break it
  // differently)
  private def dsum6(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast("double")

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  /** TPC-H Q1-shaped pricing summary: scan-heavy groupBy-agg; Catalyst
    * plans partial+final HashAggregate, shipdate predicate pushed to
    * parquet row groups.
    */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-01").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum2($"l_quantity").as("sum_qty"),
        dsum2($"l_extendedprice").as("sum_base_price"),
        dsum4(($"l_extendedprice" * (lit(1.0d) - $"l_discount"))).as("sum_disc_price"),
        dsum6(($"l_extendedprice" * (lit(1.0d) - $"l_discount") * (lit(1.0d) + $"l_tax")))
          .as("sum_charge"),
        // averages as exact-decimal-sum / count: identical double both engines
        (dsum2($"l_quantity") / count(lit(1))).as("avg_qty"),
        (dsum2($"l_extendedprice") / count(lit(1))).as("avg_price"),
        (dsum4($"l_discount") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** TPC-H Q6-shaped forecast-revenue filter-sum: pure scan+filter,
    * every predicate pushed to parquet.
    */
  def q6Forecast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .where($"l_shipdate" >= lit("1995-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
        $"l_discount" >= 0.04d && $"l_discount" <= 0.08d && $"l_quantity" < 24.0d)
      .agg(dsum4($"l_extendedprice" * $"l_discount").as("revenue"),
        count(lit(1)).as("n"))
  }

  /** TPC-H Q3-shaped shipping-priority query: join, group, top-10 by
    * revenue (TakeOrdered after partial agg).
    */
  def q3Shipping(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(t(s, dir, "customer")), $"o_custkey" === $"c_custkey")
      .where($"c_mktsegment" === "BUILDING" &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      .groupBy($"l_orderkey", to_date($"o_orderdate").as("orderdate"), $"o_orderpriority")
      .agg(dsum4($"l_extendedprice" * (lit(1.0d) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  /** Fact-to-dim equi join; dim side broadcast (customer is tiny
    * relative to orders at every SF — at 100 TB the customer dim still
    * broadcasts at tens of MB).
    */
  def qJoinOrdersCustomer(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), dsum2($"o_totalprice").as("revenue"))
      .orderBy($"c_mktsegment")
  }

  /** TPC-H Q5-shaped snowflake join: lineitem ⋈ orders shuffle join on
    * the fact keys, all dims broadcast.
    */
  def qJoinMulti(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(t(s, dir, "customer")), $"o_custkey" === $"c_custkey")
      .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(dsum4($"l_extendedprice" * (lit(1.0d) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy($"r_name", $"n_name")
  }

  /** TPC-H Q4 shape: order-priority counts for one quarter's orders
    * having at least one late lineitem. The testdata carries no
    * commit/receipt dates, so "late" = shipped more than 90 days
    * after the order date; the SHAPE is the point — a correlated
    * EXISTS with cross-table date arithmetic, planned as a left-semi
    * join with a non-equi conjunct.
    */
  def q4OrderPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .where($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1996-04-01").cast("timestamp"))
      .join(t(s, dir, "lineitem"),
        $"o_orderkey" === $"l_orderkey" &&
          $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  /** TPC-H Q5 proper (local supplier volume): the same-nation
    * customer⋈supplier constraint is the interesting part — supplier
    * joins on BOTH the fact key (l_suppkey) and the customer's
    * nationkey, so only same-nation flows count. Facts shuffle once on
    * orderkey; every dimension broadcasts.
    */
  def q5LocalSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(t(s, dir, "customer")), $"o_custkey" === $"c_custkey")
      .join(broadcast(t(s, dir, "supplier")),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(t(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
      .where($"r_name" === "ASIA" &&
        $"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      .groupBy($"n_name")
      .agg(dsum4($"l_extendedprice" * (lit(1.0d) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  /** TPC-H Q14 shape (promotion effect): lineitem ⋈ part with a
    * conditional aggregate — promo revenue and total revenue in ONE
    * pass (CASE inside SUM, no second scan). Ratio left as two exact
    * decimal-summed doubles; dividing is the caller's (oracle-hostile
    * rounding) business. Part broadcasts at every scale.
    */
  def q14Promo(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .where($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-02-01").cast("timestamp"))
      .join(broadcast(t(s, dir, "part")), $"l_partkey" === $"p_partkey")
      .agg(
        dsum4(when($"p_type" === "PROMO",
            $"l_extendedprice" * (lit(1.0d) - $"l_discount"))
          .otherwise(lit(0.0d))).as("promo_revenue"),
        dsum4($"l_extendedprice" * (lit(1.0d) - $"l_discount")).as("total_revenue"),
        count(lit(1)).as("n_lineitems"))
  }

  /** Left-semi join: customers having orders (EXISTS). */
  def qSemiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"c_mktsegment")
  }

  /** Left-anti join: customers with no orders (NOT EXISTS). */
  def qAntiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  /** Top-3 orders per customer by spend: rank window, no global sort of
    * the fact — only a shuffle on o_custkey.
    */
  def qWindowTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    t(s, dir, "orders")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= 3)
      .select($"o_custkey", $"o_orderkey", $"rnk", $"o_totalprice")
      .orderBy($"o_custkey", $"rnk")
  }

  /** Global top-10 by totalprice: TakeOrderedAndProject, not a full sort. */
  def qOrderByLimit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(10)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
  }

  /** Set difference: customers that never ordered (EXCEPT = distinct). */
  def qExcept(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer").select($"c_custkey")
      .except(t(s, dir, "orders").select($"o_custkey".as("c_custkey")))
      .orderBy($"c_custkey")
  }

  /** Set intersection: high-balance customers who placed big orders. */
  def qIntersect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer").where($"c_acctbal" > 5000.0).select($"c_custkey")
      .intersect(t(s, dir, "orders").where($"o_totalprice" > 100000.0)
        .select($"o_custkey".as("c_custkey")))
      .orderBy($"c_custkey")
  }

  /** Running per-customer spend: cumulative window sum (decimal-exact). */
  def qWindowRunning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val w = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey",
        row_number().over(ord).cast("long").as("order_seq"),
        sum($"o_totalprice".cast(DecimalType(18, 2))).over(w).cast("double").as("running_spend"))
      .orderBy($"o_custkey", $"order_seq")
  }

  /** lag(): days between consecutive orders per customer. */
  def qWindowLag(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    t(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey",
        datediff(to_date($"o_orderdate"), to_date(lag($"o_orderdate", 1).over(w)))
          .cast("long").as("days_since_prev"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** Wider window-function surface: ntile, percent_rank, first/last
    * value over an explicit frame (percent_rank's (rank-1)/(n-1) is a
    * pure-integer-derived double division — engine-identical).
    */
  def qWindowFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey",
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        first($"o_totalprice").over(wFull).as("first_price"),
        last($"o_totalprice").over(wFull).as("last_price"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** RATIO-TO-REPORT — contribution analysis: each (month, priority)
    * cell's revenue as a share of its month's total, the classic
    * reporting rollup. Decimal revenue sums are order-independent;
    * the share is ONE IEEE divide of two decimal-exact scalars
    * quantized to DECIMAL(18,8) (the engine-exactness convention).
    * One aggregate shuffle; the month-total window rides the
    * aggregate's own partitioning (no second exchange).
    */
  def qShareOfTotal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.DecimalType
    val cell = t(s, dir, "orders")
      .groupBy(date_format($"o_orderdate", "yyyy-MM").as("month"),
        $"o_orderpriority")
      .agg(sum($"o_totalprice".cast(DecimalType(18, 2))).as("rev"))
    val w = Window.partitionBy($"month")
    cell
      .withColumn("month_rev", sum($"rev").over(w))
      .select($"month", $"o_orderpriority",
        $"rev".cast("double").as("revenue"),
        ($"rev".cast("double") / $"month_rev".cast("double"))
          .cast(DecimalType(18, 8)).cast("double").as("share"))
      .orderBy($"month", $"o_orderpriority")
  }

  /** ROLLUP over status×priority with pinned NULLS FIRST ordering. */
  def qRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum2($"o_totalprice").as("revenue"))
      .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  /** CUBE — all 2ᵏ grouping combinations (completes the rollup /
    * grouping-sets / cube trio; one Expand + hash aggregate, null
    * ordering pinned on both sides).
    */
  def qCube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum2($"o_totalprice").as("revenue"))
      .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  /** Deterministic string aggregation: the sorted distinct set joined
    * to one string per group (collect_set is order-free; array_sort
    * pins it — the only listagg form that can be oracle-checked).
    */
  def qStringAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .groupBy($"o_orderstatus")
      .agg(concat_ws(",", array_sort(collect_set($"o_orderpriority"))).as("priorities"),
        count(lit(1)).as("n"))
      .orderBy($"o_orderstatus")
  }

  /** Exact count-distinct (expand + two-phase agg under the hood). */
  def qCountDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .groupBy($"o_orderstatus")
      .agg(countDistinct($"o_custkey").as("n_customers"), count(lit(1)).as("n_orders"))
      .orderBy($"o_orderstatus")
  }

  /** Full outer join, aggregated per key from either side. */
  def qFullOuter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "full_outer")
      .groupBy(coalesce($"c_custkey", $"o_custkey").as("custkey"))
      .agg(count($"o_orderkey").as("n_orders"),
        max(when($"c_custkey".isNotNull, 1).otherwise(0)).cast("long").as("has_customer"))
      .orderBy($"custkey")
  }

  /** GROUPING SETS via the spark.sql entry point (SRC5 analog: SQL
    * strings over registered views are first-class in the engine).
    */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders_v
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
  }

  /** Correlated EXISTS subquery (planned as a semi join). */
  def qExistsSubquery(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("customer_v")
    t(s, dir, "orders").createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT c_mktsegment, COUNT(*) AS n FROM customer_v
        |WHERE EXISTS (SELECT 1 FROM orders_v
        |              WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }

  /** Scalar subquery: orders above the (decimal-exact) average price. */
  def qScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT o_orderstatus, COUNT(*) AS n FROM orders_v
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM orders_v)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  /** HAVING-style post-aggregation filter. */
  def qHaving(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_customers"), dsum2($"c_acctbal").as("total_bal"))
      .where($"n_customers" >= 3)
      .orderBy($"c_nationkey")
  }

  /** Pivot: order counts by priority × status (statuses become
    * columns; list pinned so Spark needs no extra distinct pass and
    * the oracle can mirror with conditional aggregation).
    */
  def qPivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy($"o_orderpriority")
  }

  /** Cross join (small × small) + string expression surface. */
  def qStringFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .where($"c_name".like("%1%"))
      .select($"c_custkey",
        upper($"c_name").as("name_upper"),
        concat($"c_mktsegment", lit("#"), $"c_name").as("tagged"),
        regexp_replace($"c_name", "[0-9]", "x").as("name_masked"),
        length($"c_name").cast("long").as("name_len"))
      .orderBy($"c_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_full_outer" -> (qFullOuter _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_exists_subquery" -> (qExistsSubquery _),
    "q_scalar_subquery" -> (qScalarSubquery _),
    "q_having" -> (qHaving _),
    "q_pivot" -> (qPivot _),
    "q_string_funcs" -> (qStringFuncs _),
    "q1_agg" -> (q1Agg _),
    "q6_forecast" -> (q6Forecast _),
    "q3_shipping" -> (q3Shipping _),
    "q4_order_priority" -> (q4OrderPriority _),
    "q5_local_supplier" -> (q5LocalSupplier _),
    "q14_promo" -> (q14Promo _),
    "q_join_orders_customer" -> (qJoinOrdersCustomer _),
    "q_join_multi" -> (qJoinMulti _),
    "q_semi_join" -> (qSemiJoin _),
    "q_anti_join" -> (qAntiJoin _),
    "q_window_topk" -> (qWindowTopK _),
    "q_orderby_limit" -> (qOrderByLimit _),
    "q_except" -> (qExcept _),
    "q_intersect" -> (qIntersect _),
    "q_window_running" -> (qWindowRunning _),
    "q_window_lag" -> (qWindowLag _),
    "q_window_funcs" -> (qWindowFuncs _),
    "q_rollup" -> (qRollup _),
    "q_share_of_total" -> (qShareOfTotal _),
    "q_cube" -> (qCube _),
    "q_string_agg" -> (qStringAgg _),
    "q_count_distinct" -> (qCountDistinct _),
  )

  val oracle: Map[String, String] = Map(
    "q_full_outer" ->
      """SELECT COALESCE(c_custkey, o_custkey) AS custkey,
        |  COUNT(o_orderkey) AS n_orders,
        |  CAST(MAX(CASE WHEN c_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS has_customer
        |FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY custkey""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_exists_subquery" ->
      """SELECT c_mktsegment, COUNT(*) AS n FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT o_orderstatus, COUNT(*) AS n FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM orders)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_having" ->
      """SELECT c_nationkey, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer GROUP BY c_nationkey HAVING COUNT(*) >= 3
        |ORDER BY c_nationkey""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_string_funcs" ->
      """SELECT c_custkey, upper(c_name) AS name_upper,
        |  concat(c_mktsegment, '#', c_name) AS tagged,
        |  regexp_replace(c_name, '[0-9]', 'x', 'g') AS name_masked,
        |  length(c_name) AS name_len
        |FROM customer WHERE c_name LIKE '%1%' ORDER BY c_custkey""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q6_forecast" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.04 AND l_discount <= 0.08 AND l_quantity < 24.0""".stripMargin,
    "q3_shipping" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_orderkey, orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q14_promo" ->
      """SELECT
        |  CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
        |         THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
        |       AS DECIMAL(18,4))) AS DOUBLE) AS promo_revenue,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |    AS total_revenue,
        |  COUNT(*) AS n_lineitems
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-02-01'""".stripMargin,
    "q_join_orders_customer" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_join_multi" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lineitems
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q_semi_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_window_topk" ->
      """SELECT o_custkey, o_orderkey, rnk, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,
    "q_orderby_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_except" ->
      """SELECT c_custkey FROM customer
        |EXCEPT SELECT o_custkey FROM orders ORDER BY c_custkey""".stripMargin,
    "q_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
        |INTERSECT SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0
        |ORDER BY c_custkey""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  ROW_NUMBER() OVER w AS order_seq,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, order_seq""".stripMargin,
    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey,
        |  DATE_DIFF('day',
        |    CAST(LAG(o_orderdate, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE),
        |    CAST(o_orderdate AS DATE)) AS days_since_prev
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
        |  PERCENT_RANK() OVER w AS pct_rank,
        |  FIRST_VALUE(o_totalprice) OVER wf AS first_price,
        |  LAST_VALUE(o_totalprice) OVER wf AS last_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    // decimal cell/total sums, ONE IEEE divide quantized then widened
    "q_share_of_total" ->
      """WITH cell AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderpriority,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY month, o_orderpriority)
        |SELECT month, o_orderpriority,
        |  CAST(rev AS DOUBLE) AS revenue,
        |  CAST(CAST(CAST(rev AS DOUBLE) /
        |            CAST(SUM(rev) OVER (PARTITION BY month) AS DOUBLE)
        |       AS DECIMAL(18,8)) AS DOUBLE) AS share
        |FROM cell ORDER BY month, o_orderpriority""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_string_agg" ->
      """SELECT o_orderstatus,
        |  string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_count_distinct" ->
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers, COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
  )
}
