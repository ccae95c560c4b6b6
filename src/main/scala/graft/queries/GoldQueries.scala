package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QuerySpec
import graft.sources.Tables

/** Gold-layer aggregates (SURVEY.md §2d A1–A11, §2f O1–O3) re-expressed over
  * the driver fixture tables. Each query mirrors one aggregation shape of the
  * reference's `05_gold_aggregation.py` / `calculations.py` and carries a
  * DuckDB oracle.
  */
object GoldQueries {

  /** A1-flavor grouped multi-agg (reference `05_gold_aggregation.py:35-54`):
    * per-(returnflag, linestatus) measures incl. conditional counts via
    * sum(when) and a stddev with the reference's coalesce(…, 0.0) guard for
    * 1-row groups (`05:43`).
    */
  val pricingSummary: QuerySpec = QuerySpec.sql(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
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
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(coalesce(stddev_samp(col("l_quantity")), lit(0.0)), 4)
          .as("stddev_qty"),
        sum(when(col("l_quantity") >= 45, 1).otherwise(0))
          .as("big_qty_count"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val all: Seq[QuerySpec] = Seq(pricingSummary)
}
