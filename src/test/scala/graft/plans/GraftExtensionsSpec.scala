package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.Tables

class GraftExtensionsSpec extends SparkTestBase {

  test("watermark filter over converted ts is pushed to the parquet scan") {
    val wm = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-15T00:00:00Z"))
    // plain load + filter — NOT the hand-tuned loadEventsSince
    val df = Tables.load(spark, sfDir, "events").filter(col("ts") > lit(wm))
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("GreaterThan(ts,"),
      s"expected derived raw-ts pushdown in scan:\n$scan")
    // and the rule is sound: same rows as the hand-tuned loader
    assert(df.count() === Tables.loadEventsSince(spark, sfDir, wm).count())
  }

  test(">= comparisons derive pushdown too") {
    val wm = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-15T00:00:00Z"))
    val df = Tables.load(spark, sfDir, "events").filter(col("ts") >= lit(wm))
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("GreaterThanOrEqual(ts,"), scan)
  }

  test("injected SQL functions evaluate the codegen kernels") {
    val h = spark.sql("SELECT poly_hash('abc') AS h").collect().head.getLong(0)
    assert(h === graft.expressions.PolyHash.hash("abc"))
    val d = spark.sql(
      """SELECT dot_product(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                   array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d"""
        .stripMargin).collect().head.getDouble(0)
    assert(d === 11.0)
    val c = spark.sql(
      """SELECT vec_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c"""
        .stripMargin).collect().head.getDouble(0)
    assert(c === 1.0)
  }
}
