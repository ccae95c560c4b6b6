package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The documented scale path for exact countDistinct (SURVEY.md §2d A3):
  * HLL-sketch distinct with bounded relative error, mergeable across
  * partitions (unlike exact distinct, it never shuffles raw values).
  */
class ApproxDistinctSpec extends SparkTestBase {

  test("approx_count_distinct is within rsd bounds of exact on the fixture") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val row = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id")).as("approx_default"),
      approx_count_distinct(col("user_id"), 0.01).as("approx_tight"))
      .collect().head
    val exact = row.getLong(0).toDouble
    assert(math.abs(row.getLong(1) - exact) / exact < 0.05)
    assert(math.abs(row.getLong(2) - exact) / exact < 0.02)
  }

  test("sketches merge across partitions consistently") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val once = ev.agg(approx_count_distinct(col("user_id"), 0.01))
      .collect().head.getLong(0)
    val repartitioned = ev.repartition(13)
      .agg(approx_count_distinct(col("user_id"), 0.01))
      .collect().head.getLong(0)
    assert(once === repartitioned) // HLL merge is order-insensitive
  }
}
