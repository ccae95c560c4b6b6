package graft.bronze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Stable

/** Data-quality report as a single-pass aggregate (SURVEY.md §2b P1, §2d A6/A7).
  *
  * The reference computes one full scan per audited column
  * (`03_bronze_processing.py:33-51`) plus separate scans for range stats
  * (`03:60-77`) and duplicate reconciliation (`03:84-91`). We fold all of it
  * into ONE aggregation job — at 100 TB the difference is N scans vs one.
  */
object Quality {

  def nullCount(c: String): Column =
    sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as(s"null_$c")

  /** One-row report: row count, per-column null counts, duplicate count on
    * `keyCol`, and min/max/avg (rounded) over `measureCol`.
    */
  def report(df: DataFrame, keyCol: String, measureCol: String,
      tsCol: String): DataFrame = {
    val auditCols = df.columns.toSeq
    df.agg(
      count(lit(1)).as("n_rows"),
      (Seq(
        countDistinct(col(keyCol)).as(s"distinct_$keyCol"),
        (count(lit(1)) - countDistinct(col(keyCol)))
          .as("duplicate_count"),
        round(min(col(measureCol)), 4).as(s"min_$measureCol"),
        round(max(col(measureCol)), 4).as(s"max_$measureCol"),
        Stable.avg4(col(measureCol)).as(s"avg_$measureCol"),
        min(col(tsCol)).as(s"min_$tsCol"),
        max(col(tsCol)).as(s"max_$tsCol")) ++
        auditCols.map(nullCount)): _*)
  }
}
