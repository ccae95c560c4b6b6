package graft.queries

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

  val all: Seq[QuerySpec] = Seq(semiBigSpenders, antiNoOrders, aboveCustomerAvg)
}
