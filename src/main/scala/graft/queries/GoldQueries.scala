package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.functions.Stable
import graft.sources.Tables

/** Gold-layer aggregates (SURVEY.md §2d A1–A11, §2e W3–W5, §2f O1–O3)
  * re-expressed over the driver fixture tables. Each query mirrors one
  * aggregation shape of the reference's `05_gold_aggregation.py` /
  * `calculations.py` / `06_display_reporting.py` and carries a DuckDB oracle.
  */
object GoldQueries {

  /** orders ⋈ customer ⋈ nation ⋈ region. nation/region are broadcast
    * explicitly (12-row-dim analog, reference `04:96`); orders⋈customer is
    * left to Catalyst/AQE — at 100 TB it is a shuffle hash join on the key,
    * and AQE will broadcast if the build side turns out small.
    */
  private def ordersWithRegion(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer")
    val n = Tables.load(spark, dir, "nation")
    val r = Tables.load(spark, dir, "region")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
  }

  /** A1-flavor grouped multi-agg (reference `05_gold_aggregation.py:35-54`):
    * per-(returnflag, linestatus) measures incl. conditional counts via
    * sum(when) and a stddev with the reference's coalesce(…, 0.0) guard for
    * 1-row groups (`05:43`).
    */
  val pricingSummary: QuerySpec = QuerySpec.sql(
    "q01_pricing_summary",
    s"""SELECT l_returnflag, l_linestatus,
      |  ${Stable.sum2Sql("l_quantity")} AS sum_qty,
      |  ${Stable.sum2Sql("l_extendedprice")} AS sum_base_price,
      |  ${Stable.sum2Sql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
      |  ${Stable.avg4Sql("l_quantity")} AS avg_qty,
      |  round(coalesce(stddev_samp(l_quantity), 0.0), 4) AS stddev_qty,
      |  CAST(sum(CASE WHEN l_quantity >= 45 THEN 1 ELSE 0 END) AS BIGINT) AS big_qty_count,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
  ) { (spark, dir) =>
    Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Stable.sum2(col("l_quantity")).as("sum_qty"),
        Stable.sum2(col("l_extendedprice")).as("sum_base_price"),
        Stable.sum2(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("sum_disc_price"),
        Stable.avg4(col("l_quantity")).as("avg_qty"),
        round(coalesce(stddev_samp(col("l_quantity")), lit(0.0)), 4)
          .as("stddev_qty"),
        sum(when(col("l_quantity") >= 45, 1).otherwise(0))
          .as("big_qty_count"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** A1+A2 full gold_regional_risk shape (`05_gold_aggregation.py:35-77`):
    * (region, year, month) grain, 9 measures incl. banded conditional
    * counts, then the derived risk_score (weights 50/20/5 + scaled max) and
    * the CASE re-bucket ladder.
    */
  val regionalRisk: QuerySpec = QuerySpec.sql(
    "q07_regional_risk",
    s"""WITH agg AS (
      |  SELECT r_name,
      |    CAST(year(o_orderdate) AS BIGINT) AS year,
      |    CAST(month(o_orderdate) AS BIGINT) AS month,
      |    count(*) AS total_orders,
      |    ${Stable.avg4Sql("o_totalprice")} AS avg_price,
      |    round(max(o_totalprice), 2) AS max_price,
      |    round(min(o_totalprice), 2) AS min_price,
      |    round(coalesce(stddev_samp(o_totalprice), 0.0), 2) AS stddev_price,
      |    CAST(sum(CASE WHEN o_totalprice >= 450000 THEN 1 ELSE 0 END) AS BIGINT) AS critical_orders,
      |    CAST(sum(CASE WHEN o_totalprice >= 350000 AND o_totalprice < 450000 THEN 1 ELSE 0 END) AS BIGINT) AS high_orders,
      |    CAST(sum(CASE WHEN o_totalprice >= 250000 AND o_totalprice < 350000 THEN 1 ELSE 0 END) AS BIGINT) AS moderate_orders,
      |    ${Stable.sum2Sql("o_totalprice")} AS sum_price
      |  FROM orders
      |    JOIN customer ON o_custkey = c_custkey
      |    JOIN nation ON c_nationkey = n_nationkey
      |    JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY 1, 2, 3)
      |SELECT *,
      |  CASE WHEN risk_score >= 100 THEN 'CRITICAL'
      |       WHEN risk_score >= 50 THEN 'HIGH'
      |       WHEN risk_score >= 20 THEN 'MODERATE'
      |       WHEN risk_score >= 5 THEN 'LOW'
      |       ELSE 'MINIMAL' END AS risk_level
      |FROM (SELECT *,
      |        round(critical_orders * 50 + high_orders * 20 +
      |              moderate_orders * 5 + max_price / 10000.0 + 1e-9, 2) AS risk_score
      |      FROM agg)
      |ORDER BY r_name, year, month""".stripMargin
  ) { (spark, dir) =>
    ordersWithRegion(spark, dir)
      .groupBy(col("r_name"),
        year(col("o_orderdate")).cast("long").as("year"),
        month(col("o_orderdate")).cast("long").as("month"))
      .agg(
        count(lit(1)).as("total_orders"),
        Stable.avg4(col("o_totalprice")).as("avg_price"),
        round(max(col("o_totalprice")), 2).as("max_price"),
        round(min(col("o_totalprice")), 2).as("min_price"),
        round(coalesce(stddev_samp(col("o_totalprice")), lit(0.0)), 2)
          .as("stddev_price"),
        sum(when(col("o_totalprice") >= 450000, 1).otherwise(0))
          .as("critical_orders"),
        sum(when(col("o_totalprice") >= 350000 && col("o_totalprice") < 450000, 1)
          .otherwise(0)).as("high_orders"),
        sum(when(col("o_totalprice") >= 250000 && col("o_totalprice") < 350000, 1)
          .otherwise(0)).as("moderate_orders"),
        Stable.sum2(col("o_totalprice")).as("sum_price"))
      .withColumn("risk_score",
        round(col("critical_orders") * 50 + col("high_orders") * 20 +
          col("moderate_orders") * 5 + col("max_price") / 10000.0 + lit(1e-9), 2))
      .withColumn("risk_level",
        when(col("risk_score") >= 100, "CRITICAL")
          .when(col("risk_score") >= 50, "HIGH")
          .when(col("risk_score") >= 20, "MODERATE")
          .when(col("risk_score") >= 5, "LOW")
          .otherwise("MINIMAL"))
      .orderBy(col("r_name"), col("year"), col("month"))
  }

  /** A3 daily agg + W3 rolling ROWS frames + W4 anomaly flag
    * (`05_gold_aggregation.py:89-121`). The rolling window is unpartitioned
    * by design — it runs AFTER aggregation to daily grain, so the single
    * partition holds only ~one row per day (2.4 k rows here), not the raw
    * fact table; at 100 TB the pattern still holds because the window input
    * is already reduced.
    */
  val dailyRolling: QuerySpec = QuerySpec.sql(
    "q08_daily_rolling",
    s"""WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS order_date,
      |    count(*) AS n_orders,
      |    ${Stable.avg4Sql("o_totalprice")} AS avg_price,
      |    round(max(o_totalprice), 2) AS max_price,
      |    count(DISTINCT o_custkey) AS n_customers,
      |    CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent_orders
      |  FROM orders GROUP BY 1)
      |SELECT *,
      |  CAST(year(order_date) AS BIGINT) AS year,
      |  CAST(month(order_date) AS BIGINT) AS month,
      |  CASE WHEN rolling_7d_count > 0
      |         AND CAST(n_orders AS DOUBLE) > rolling_7d_count / 7.0 * 2
      |       THEN TRUE ELSE FALSE END AS is_anomaly
      |FROM (SELECT *,
      |        CAST(sum(n_orders) OVER (ORDER BY order_date
      |          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling_7d_count,
      |        CAST(sum(n_orders) OVER (ORDER BY order_date
      |          ROWS BETWEEN 29 PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling_30d_count
      |      FROM daily)
      |ORDER BY order_date""".stripMargin
  ) { (spark, dir) =>
    val daily = Tables.load(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("order_date"))
      .agg(
        count(lit(1)).as("n_orders"),
        Stable.avg4(col("o_totalprice")).as("avg_price"),
        round(max(col("o_totalprice")), 2).as("max_price"),
        countDistinct(col("o_custkey")).as("n_customers"),
        sum(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0))
          .as("urgent_orders"))
    val w = Window.orderBy(col("order_date"))
    daily
      .withColumn("rolling_7d_count",
        sum(col("n_orders")).over(w.rowsBetween(-6, 0)))
      .withColumn("rolling_30d_count",
        sum(col("n_orders")).over(w.rowsBetween(-29, 0)))
      .withColumn("year", year(col("order_date")).cast("long"))
      .withColumn("month", month(col("order_date")).cast("long"))
      .withColumn("is_anomaly",
        col("rolling_7d_count") > 0 &&
          col("n_orders").cast("double") > col("rolling_7d_count") / 7.0 * 2)
      .orderBy(col("order_date"))
  }

  /** A4 global grand-total KPI row (`05_gold_aggregation.py:134-151`). */
  val kpiSummary: QuerySpec = QuerySpec.sql(
    "q09_kpi_summary",
    s"""SELECT count(*) AS total_orders,
      |  count(DISTINCT o_custkey) AS distinct_customers,
      |  count(DISTINCT o_orderstatus) AS distinct_statuses,
      |  ${Stable.avg4Sql("o_totalprice")} AS avg_price,
      |  round(max(o_totalprice), 2) AS max_price,
      |  round(min(o_totalprice), 2) AS min_price,
      |  ${Stable.sum2Sql("o_totalprice")} AS sum_price,
      |  CAST(sum(CASE WHEN o_totalprice >= 450000 THEN 1 ELSE 0 END) AS BIGINT) AS critical_orders,
      |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent_orders,
      |  min(o_orderdate) AS first_order_ts,
      |  max(o_orderdate) AS last_order_ts
      |FROM orders""".stripMargin
  ) { (spark, dir) =>
    Tables.load(spark, dir, "orders").agg(
      count(lit(1)).as("total_orders"),
      countDistinct(col("o_custkey")).as("distinct_customers"),
      countDistinct(col("o_orderstatus")).as("distinct_statuses"),
      Stable.avg4(col("o_totalprice")).as("avg_price"),
      round(max(col("o_totalprice")), 2).as("max_price"),
      round(min(col("o_totalprice")), 2).as("min_price"),
      Stable.sum2(col("o_totalprice")).as("sum_price"),
      sum(when(col("o_totalprice") >= 450000, 1).otherwise(0))
        .as("critical_orders"),
      sum(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0))
        .as("urgent_orders"),
      min(col("o_orderdate")).as("first_order_ts"),
      max(col("o_orderdate")).as("last_order_ts"))
  }

  /** A5 region summary + W5 global dense_rank
    * (`05_gold_aggregation.py:164-185`). The rank window is unpartitioned
    * but runs over one row per region.
    */
  val regionSummary: QuerySpec = QuerySpec.sql(
    "q10_region_summary",
    s"""SELECT *, CAST(dense_rank() OVER (
      |    ORDER BY critical_orders DESC, total_orders DESC) AS INT) AS risk_rank
      |FROM (
      |  SELECT r_name,
      |    count(*) AS total_orders,
      |    ${Stable.avg4Sql("o_totalprice")} AS avg_price,
      |    round(max(o_totalprice), 2) AS max_price,
      |    CAST(sum(CASE WHEN o_totalprice >= 450000 THEN 1 ELSE 0 END) AS BIGINT) AS critical_orders,
      |    CAST(sum(CASE WHEN o_totalprice >= 350000 AND o_totalprice < 450000 THEN 1 ELSE 0 END) AS BIGINT) AS high_orders,
      |    ${Stable.avg4Sql("c_acctbal")} AS avg_acctbal
      |  FROM orders
      |    JOIN customer ON o_custkey = c_custkey
      |    JOIN nation ON c_nationkey = n_nationkey
      |    JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY r_name)
      |ORDER BY r_name""".stripMargin
  ) { (spark, dir) =>
    val agg = ordersWithRegion(spark, dir)
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("total_orders"),
        Stable.avg4(col("o_totalprice")).as("avg_price"),
        round(max(col("o_totalprice")), 2).as("max_price"),
        sum(when(col("o_totalprice") >= 450000, 1).otherwise(0))
          .as("critical_orders"),
        sum(when(col("o_totalprice") >= 350000 && col("o_totalprice") < 450000, 1)
          .otherwise(0)).as("high_orders"),
        Stable.avg4(col("c_acctbal")).as("avg_acctbal"))
    agg.withColumn("risk_rank",
        dense_rank().over(
          Window.orderBy(col("critical_orders").desc, col("total_orders").desc))
          .cast("int"))
      .orderBy(col("r_name"))
  }

  /** O2 true top-k: ORDER BY … LIMIT k plans TakeOrderedAndProject — no
    * global sort (`06_display_reporting.py:127-141`, `calculations.py:188-202`).
    */
  val topOrders: QuerySpec = QuerySpec.sql(
    "q11_top_orders",
    """SELECT o_orderkey, o_custkey, o_orderstatus,
      |  round(o_totalprice, 2) AS o_totalprice, o_orderdate
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 20""".stripMargin
  ) { (spark, dir) =>
    Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).as("o_totalprice"), col("o_orderdate"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  /** A9 CASE-bucket histogram (`06_display_reporting.py:172-187`). */
  val priceHistogram: QuerySpec = QuerySpec.sql(
    "q12_price_histogram",
    s"""SELECT CASE WHEN o_totalprice >= 450000 THEN '1: 450k+'
      |            WHEN o_totalprice >= 350000 THEN '2: 350-450k'
      |            WHEN o_totalprice >= 250000 THEN '3: 250-350k'
      |            WHEN o_totalprice >= 100000 THEN '4: 100-250k'
      |            ELSE '5: <100k' END AS price_band,
      |  count(*) AS n_orders,
      |  ${Stable.avg4Sql("o_totalprice")} AS avg_price
      |FROM orders
      |GROUP BY 1
      |ORDER BY price_band""".stripMargin
  ) { (spark, dir) =>
    Tables.load(spark, dir, "orders")
      .groupBy(
        when(col("o_totalprice") >= 450000, "1: 450k+")
          .when(col("o_totalprice") >= 350000, "2: 350-450k")
          .when(col("o_totalprice") >= 250000, "3: 250-350k")
          .when(col("o_totalprice") >= 100000, "4: 100-250k")
          .otherwise("5: <100k").as("price_band"))
      .agg(count(lit(1)).as("n_orders"),
        Stable.avg4(col("o_totalprice")).as("avg_price"))
      .orderBy(col("price_band"))
  }

  /** A10 second-level rollup: monthly re-aggregation OVER the daily gold
    * grain (`06_display_reporting.py:270-282`) — aggregates of
    * pre-aggregates, the medallion pattern.
    */
  val monthlyRollup: QuerySpec = QuerySpec.sql(
    "q13_monthly_rollup",
    s"""WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS order_date,
      |    count(*) AS n_orders,
      |    ${Stable.avg4Sql("o_totalprice")} AS avg_price,
      |    round(max(o_totalprice), 2) AS max_price
      |  FROM orders GROUP BY 1)
      |SELECT CAST(year(order_date) AS BIGINT) AS year,
      |  CAST(month(order_date) AS BIGINT) AS month,
      |  CAST(sum(n_orders) AS BIGINT) AS total_orders,
      |  ${Stable.avg4Sql("avg_price")} AS avg_daily_price,
      |  max(max_price) AS max_price,
      |  count(*) AS active_days
      |FROM daily
      |GROUP BY 1, 2
      |ORDER BY year, month""".stripMargin
  ) { (spark, dir) =>
    val daily = Tables.load(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("order_date"))
      .agg(
        count(lit(1)).as("n_orders"),
        Stable.avg4(col("o_totalprice")).as("avg_price"),
        round(max(col("o_totalprice")), 2).as("max_price"))
    daily
      .groupBy(year(col("order_date")).cast("long").as("year"),
        month(col("order_date")).cast("long").as("month"))
      .agg(
        sum(col("n_orders")).as("total_orders"),
        Stable.avg4(col("avg_price")).as("avg_daily_price"),
        max(col("max_price")).as("max_price"),
        count(lit(1)).as("active_days"))
      .orderBy(col("year"), col("month"))
  }

  /** Engine extension flagged in SURVEY.md §2d: multi-level ROLLUP grouping
    * sets, free from Catalyst (`rollup()`), matching SQL ROLLUP in DuckDB.
    */
  val regionYearRollup: QuerySpec = QuerySpec.sql(
    "q15_region_year_rollup",
    s"""SELECT coalesce(r_name, 'ALL') AS r_name,
      |  CAST(coalesce(year(o_orderdate), -1) AS BIGINT) AS year,
      |  count(*) AS n_orders,
      |  ${Stable.sum2Sql("o_totalprice")} AS sum_price
      |FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, year(o_orderdate))
      |ORDER BY r_name, year""".stripMargin
  ) { (spark, dir) =>
    ordersWithRegion(spark, dir)
      .rollup(col("r_name"), year(col("o_orderdate")).as("yr"))
      .agg(count(lit(1)).as("n_orders"),
        Stable.sum2(col("o_totalprice")).as("sum_price"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("r_name"),
        coalesce(col("yr"), lit(-1)).cast("long").as("year"),
        col("n_orders"), col("sum_price"))
      .orderBy(col("r_name"), col("year"))
  }

  /** Full star coverage: fact ⋈ part ⋈ supplier volume rollup per
    * (brand, supplier-nation). Both dims broadcast at this SF; at scale
    * AQE picks broadcast vs shuffle per runtime size, and the grouped
    * agg does partial map-side combine before the single exchange.
    */
  val brandVolume: QuerySpec = QuerySpec.sql(
    "q37_brand_volume",
    s"""SELECT p_brand,
      |  CAST(s_nationkey AS BIGINT) AS supp_nation,
      |  count(*) AS n_lines,
      |  ${Stable.sum2Sql("l_quantity")} AS sum_qty,
      |  ${Stable.sum2Sql("l_extendedprice * (1 - l_discount)")} AS revenue,
      |  ${Stable.avg4Sql("p_retailprice")} AS avg_retail
      |FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY p_brand, s_nationkey
      |ORDER BY p_brand, supp_nation""".stripMargin
  ) { (spark, dir) =>
    val l = Tables.load(spark, dir, "lineitem")
    val p = Tables.load(spark, dir, "part")
    val su = Tables.load(spark, dir, "supplier")
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
      .groupBy(col("p_brand"), col("s_nationkey").cast("long").as("supp_nation"))
      .agg(
        count(lit(1)).as("n_lines"),
        Stable.sum2(col("l_quantity")).as("sum_qty"),
        Stable.sum2(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        Stable.avg4(col("p_retailprice")).as("avg_retail"))
      .orderBy(col("p_brand"), col("supp_nation"))
  }

  val all: Seq[QuerySpec] = Seq(
    pricingSummary, regionalRisk, dailyRolling, kpiSummary, regionSummary,
    topOrders, priceHistogram, monthlyRollup, regionYearRollup, brandVolume)
}
