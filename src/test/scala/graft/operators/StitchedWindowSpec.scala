package graft.operators

import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class StitchedWindowSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic events spanning three month boundaries, with clusters
  // straddling each boundary so cross-bucket frames actually occur
  private def fixture = {
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
    val rows = (0 until 3000).map { i =>
      // ~31 days spread + bursts at each month turn
      val t = base + i.toLong * 47 * 60 * 1000 +
        (i % 7) * 13 * 1000
      (i.toLong, new java.sql.Timestamp(t), (i % 100) / 10.0)
    }
    rows.toDF("event_id", "ts", "value")
  }

  test("stitched frames equal the unpartitioned global window exactly") {
    val stitched = StitchedWindow
      .trailing(fixture, "ts", "month", "INTERVAL 1 HOUR",
        Seq("count(*)" -> "n", "sum(CAST(value AS DECIMAL(28,10)))" -> "s"))
      .select(col("event_id"), col("n").cast("long"),
        col("s").cast("double"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val global = fixture
      .select(col("event_id"),
        expr("count(*) OVER (ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR " +
          "PRECEDING AND CURRENT ROW)").cast("long").as("n"),
        expr("sum(CAST(value AS DECIMAL(28,10))) OVER (ORDER BY ts RANGE " +
          "BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)")
          .cast("double").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(stitched === global)
  }

  test("a lookback longer than one bucket stitches across k buckets") {
    val stitched = StitchedWindow
      .trailing(fixture, "ts", "month", "INTERVAL 40 DAYS",
        Seq("count(*)" -> "n"))
      .select(col("event_id"), col("n").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val global = fixture
      .select(col("event_id"),
        expr("count(*) OVER (ORDER BY ts RANGE BETWEEN INTERVAL 40 DAYS " +
          "PRECEDING AND CURRENT ROW)").cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stitched === global)
  }

  test("ghost rows contribute to frames but never to output") {
    val out = StitchedWindow
      .trailing(fixture, "ts", "month", "INTERVAL 1 HOUR",
        Seq("count(*)" -> "n"))
    assert(out.count() === fixture.count())
    assert(out.select("event_id").distinct().count() === fixture.count())
  }

  test("the plan has no single-partition WindowExec") {
    val out = StitchedWindow
      .trailing(fixture, "ts", "month", "INTERVAL 1 HOUR",
        Seq("count(*)" -> "n"))
    out.count() // materialize so AQE fixes the final plan
    val plan = out.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    windows.foreach(w =>
      assert(w.partitionSpec.nonEmpty,
        s"unpartitioned WindowExec in stitched plan:\n$w"))
  }
}
