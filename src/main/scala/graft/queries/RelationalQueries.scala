package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.sources.Tables

/** Relational operators the reference never reaches for (SURVEY.md §2c
  * "not present in reference: semi join"; §4 "subquery decorrelation …
  * free from Catalyst") surfaced as first-class, oracle-checked queries:
  * explicit left-semi / left-anti joins and a correlated scalar subquery
  * that exercises Catalyst's decorrelation end-to-end.
  */
object RelationalQueries {

  /** Left-SEMI join: customers holding at least one 400k+ order. The fact
    * side is filtered before the join, and semi-join output carries only
    * build-side existence — no fact columns move through the shuffle.
    */
  val semiBigSpenders: QuerySpec = QuerySpec.sql(
    "q51_semi_big_spenders",
    """SELECT c_custkey, c_name, c_nationkey
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_totalprice >= 400000)
      |ORDER BY c_custkey""".stripMargin
  ) { (spark, dir) =>
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_totalprice") >= 400000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      .orderBy(col("c_custkey"))
  }

  /** Left-ANTI join: customers who never placed an URGENT order
    * (NOT EXISTS with a filtered probe side).
    */
  val antiNoOrders: QuerySpec = QuerySpec.sql(
    "q52_anti_no_urgent",
    """SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin
  ) { (spark, dir) =>
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"),
        round(col("c_acctbal"), 2).as("acctbal"))
      .orderBy(col("c_custkey"))
  }

  /** Correlated scalar subquery, submitted as SQL TEXT so Catalyst's
    * decorrelation (rewrite to aggregate + join) runs end-to-end; the
    * same text is the DuckDB oracle. The per-customer mean uses the
    * exact decimal-sum form so the 1.5× threshold compare is
    * partition-order invariant in both engines (see
    * [[graft.functions.Stable]]).
    */
  val aboveCustomerAvg: QuerySpec = {
    val sql =
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        |FROM orders o
        |WHERE o_totalprice > 1.5 *
        |  (SELECT CAST(sum(CAST(i.o_totalprice AS DECIMAL(28,10))) AS DOUBLE)
        |          / count(i.o_totalprice)
        |   FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin
    QuerySpec.sql("q53_above_customer_avg", sql) { (spark, dir) =>
      Tables.load(spark, dir, "orders").createOrReplaceTempView("orders")
      spark.sql(sql)
    }
  }

  /** ntile + percent_rank ranking windows (SURVEY.md §2e lists ntile as
    * an easy extension the reference lacks): quartile assignment and
    * relative rank of each customer's order spend within their nation.
    * The unique-key ORDER BY (total, custkey) makes both functions
    * deterministic.
    */
  val spendQuartiles: QuerySpec = QuerySpec.sql(
    "q54_spend_quartiles",
    """WITH spend AS (
      |  SELECT c_custkey, c_nationkey, count(*) AS n_orders,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(28,10))) AS DOUBLE) AS total
      |  FROM customer JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey, c_nationkey)
      |SELECT c_custkey, c_nationkey, n_orders,
      |  round(total, 2) AS total_spend,
      |  CAST(ntile(4) OVER w AS INT) AS quartile,
      |  round(percent_rank() OVER w + 1e-9, 6) AS pct_rank
      |FROM spend
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY total, c_custkey)
      |ORDER BY c_custkey""".stripMargin
  ) { (spark, dir) =>
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
    val spend = c.join(o, c("c_custkey") === o("o_custkey"))
      .groupBy(col("c_custkey"), col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"),
        graft.functions.Stable.sumD(col("o_totalprice")).as("total"))
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("total"), col("c_custkey"))
    spend
      .select(col("c_custkey"), col("c_nationkey"), col("n_orders"),
        round(col("total"), 2).as("total_spend"),
        ntile(4).over(w).cast("int").as("quartile"),
        round(percent_rank().over(w) + lit(1e-9), 6).as("pct_rank"))
      .orderBy(col("c_custkey"))
  }

  /** The salted skew join run through the oracle gate: result-identical
    * to a plain equi-join (the whole point of salting), so the oracle IS
    * the plain join. Salt comes from a row-distinguishing column, the
    * probe side replicates once per salt value
    * ([[graft.operators.SkewJoin]]).
    */
  val saltedRevenue: QuerySpec = QuerySpec.sql(
    "q57_salted_revenue",
    s"""SELECT o_orderpriority, count(*) AS n_lines,
      |  ${graft.functions.Stable.sum2Sql("l_extendedprice * (1 - l_discount)")} AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin
  ) { (spark, dir) =>
    val l = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"),
        col("l_extendedprice"), col("l_discount"))
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    graft.operators.SkewJoin
      .saltedInnerJoin(l, o, key = "l_orderkey",
        saltSource = "l_partkey", factor = 4)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        graft.functions.Stable
          .sum2(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** FULL OUTER join as a reconciliation audit — the one outer-join
    * flavor the surface lacked (the reference's MERGE is semantically a
    * full outer on `event_id`, `04_silver_transformation.py:196-202`,
    * but [[graft.operators.Upsert]] realizes it as anti-join + union).
    * Two independently-filtered per-customer aggregates (finished
    * orders vs big-ticket orders) are stitched with `full_outer` and
    * each row tagged by side presence. Both inputs are pre-aggregated
    * to customer grain BEFORE the join, so the shuffle moves one row
    * per customer per side, not raw orders; at 100 TB both sides share
    * the `o_custkey` hash partitioning and AQE plans a single exchange
    * per side regardless of fact skew.
    */
  val fullOuterRecon: QuerySpec = QuerySpec.sql(
    "q73_full_outer_recon",
    """WITH f AS (SELECT o_custkey, count(*) AS n_finished
      |           FROM orders WHERE o_orderstatus = 'F' GROUP BY 1),
      |     b AS (SELECT o_custkey, count(*) AS n_big
      |           FROM orders WHERE o_totalprice >= 200000 GROUP BY 1)
      |SELECT coalesce(f.o_custkey, b.o_custkey) AS custkey,
      |  coalesce(n_finished, 0) AS n_finished,
      |  coalesce(n_big, 0) AS n_big,
      |  CASE WHEN f.o_custkey IS NULL THEN 'right_only'
      |       WHEN b.o_custkey IS NULL THEN 'left_only'
      |       ELSE 'both' END AS presence
      |FROM f FULL OUTER JOIN b ON f.o_custkey = b.o_custkey
      |ORDER BY custkey""".stripMargin
  ) { (spark, dir) =>
    val orders = Tables.load(spark, dir, "orders")
    val f = orders.filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey").as("f_custkey"))
      .agg(count(lit(1)).as("n_finished"))
    val b = orders.filter(col("o_totalprice") >= 200000)
      .groupBy(col("o_custkey").as("b_custkey"))
      .agg(count(lit(1)).as("n_big"))
    f.join(b, f("f_custkey") === b("b_custkey"), "full_outer")
      .select(
        coalesce(col("f_custkey"), col("b_custkey")).as("custkey"),
        coalesce(col("n_finished"), lit(0L)).as("n_finished"),
        coalesce(col("n_big"), lit(0L)).as("n_big"),
        when(col("f_custkey").isNull, "right_only")
          .when(col("b_custkey").isNull, "left_only")
          .otherwise("both").as("presence"))
      .orderBy(col("custkey"))
  }

  val all: Seq[QuerySpec] =
    Seq(semiBigSpenders, antiNoOrders, aboveCustomerAvg, spendQuartiles,
      saltedRevenue, fullOuterRecon)
}
