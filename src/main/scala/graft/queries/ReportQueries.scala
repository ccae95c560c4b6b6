package graft.queries

import graft.QuerySpec
import graft.functions.Stable
import graft.sources.Tables

/** The reference's SQL-front-door reporting tier (SURVEY.md §3 E3, §2a
  * S10/S11, §2f O3): queries submitted as SQL TEXT via `spark.sql` over
  * temp views — the parser/analyzer/catalog path, not the DSL. The SAME
  * string is the DuckDB oracle (dialect-intersection SQL), which is the
  * strongest possible cross-check: two engines, one query text.
  */
object ReportQueries {

  private def sqlQuery(name: String, tables: Seq[String], sql: String): QuerySpec =
    QuerySpec.sql(name, sql) { (spark, dir) =>
      // register only the referenced tables — registerAll would read 10
      // parquet footers per query invocation
      tables.foreach(t =>
        Tables.load(spark, dir, t).createOrReplaceTempView(t))
      spark.sql(sql)
    }

  /** Top-k revenue report (`06_display_reporting.py:127-141` shape). */
  val topCustomers: QuerySpec = sqlQuery(
    "q32_sql_top_customers", Seq("orders", "customer"),
    s"""SELECT c_custkey, c_name, count(*) AS n_orders,
      |  ${Stable.sum2Sql("o_totalprice")} AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 10""".stripMargin)

  /** CASE-ordered status report (`06:198-215` custom sort-key shape). */
  val statusReport: QuerySpec = sqlQuery(
    "q33_sql_status_report", Seq("orders"),
    s"""SELECT o_orderstatus, count(*) AS n_orders,
      |  ${Stable.avg4Sql("o_totalprice")} AS avg_price,
      |  round(min(o_totalprice), 2) AS min_price,
      |  round(max(o_totalprice), 2) AS max_price
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY CASE WHEN o_orderstatus = 'O' THEN 1
      |              WHEN o_orderstatus = 'P' THEN 2
      |              ELSE 3 END""".stripMargin)

  /** Severity-filtered recent-events report (`06:246-259` shape: filter +
    * order + limit over the event stream).
    */
  val severeRecent: QuerySpec = sqlQuery(
    "q34_sql_severe_recent", Seq("events"),
    """SELECT event_id, ts, event_type, round(value, 2) AS value
      |FROM events
      |WHERE value >= 250
      |ORDER BY ts DESC, event_id DESC
      |LIMIT 50""".stripMargin)

  /** Correlated LATERAL subquery with ORDER BY + LIMIT — the "top-k per
    * outer row" SQL front-door shape (Catalyst plans the correlated
    * limit via LateralJoin; the DSL twin is the q46 top-k-per-key
    * operator). Same text runs in both engines.
    */
  val lateralTopK: QuerySpec = sqlQuery(
    "q80_lateral_topk", Seq("region", "nation", "customer", "orders"),
    """SELECT r.r_name, t.o_orderkey, t.o_totalprice
      |FROM region r, LATERAL (
      |  SELECT o.o_orderkey, o.o_totalprice
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  WHERE n.n_regionkey = r.r_regionkey
      |  ORDER BY o.o_totalprice DESC, o.o_orderkey
      |  LIMIT 3) t
      |ORDER BY r.r_name, t.o_totalprice DESC, t.o_orderkey""".stripMargin)

  val all: Seq[QuerySpec] = Seq(topCustomers, statusReport, severeRecent,
    lateralTopK)
}
