package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class Scd2Spec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val changes = Seq(
    (1L, ts("2024-01-01 00:00:00"), "bronze"),
    (1L, ts("2024-02-01 00:00:00"), "silver"),
    (1L, ts("2024-03-01 00:00:00"), "gold"),
    (2L, ts("2024-01-15 00:00:00"), "bronze"))

  private def log = changes.toDF("user_id", "ts", "tier")

  test("build chains intervals per key: lead boundaries, versions, " +
      "one open current row") {
    val d = Scd2.build(log, Seq("user_id"), "ts")
      .collect().map(r => (r.getLong(0), r.getString(2),
        r.getTimestamp(1), Option(r.getTimestamp(3)), r.getLong(4),
        r.getBoolean(5))).toSet
    assert(d === Set(
      (1L, "bronze", ts("2024-01-01 00:00:00"),
        Some(ts("2024-02-01 00:00:00")), 1L, false),
      (1L, "silver", ts("2024-02-01 00:00:00"),
        Some(ts("2024-03-01 00:00:00")), 2L, false),
      (1L, "gold", ts("2024-03-01 00:00:00"), None, 3L, true),
      (2L, "bronze", ts("2024-01-15 00:00:00"), None, 1L, true)))
    // null change timestamps are rejected, not sorted somewhere
    val withNull = (changes :+ (3L, null.asInstanceOf[java.sql.Timestamp],
      "x")).toDF("user_id", "ts", "tier")
    assert(Scd2.build(withNull, Seq("user_id"), "ts")
      .filter(col("user_id") === 3L).isEmpty)
  }

  test("merge of a later batch == fresh build over the full log; " +
      "untouched keys' rows pass through without re-windowing") {
    val early = log.filter(col("ts") < lit(ts("2024-02-15 00:00:00")))
    val batch = log.filter(col("ts") >= lit(ts("2024-02-15 00:00:00")))
    val merged = Scd2.merge(Scd2.build(early, Seq("user_id"), "ts"),
      batch, Seq("user_id"), "ts")
    val fresh = Scd2.build(log, Seq("user_id"), "ts")
    assert(merged.collect().map(_.toString).sorted.toSeq ===
      fresh.collect().map(_.toString).sorted.toSeq)
    // the untouched-key path is a broadcast anti-join: existing history
    // must never sort-merge against the touched-key set
    val plan = merged.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("merge past the broadcast bound degrades to a shuffle join " +
      "(backfill batch) with identical results") {
    val early = log.filter(col("ts") < lit(ts("2024-02-15 00:00:00")))
    val batch = log.filter(col("ts") >= lit(ts("2024-02-15 00:00:00")))
    // bound of 0 forces the no-hint branch: the driver must never be
    // asked to hold a dimension-sized touched set
    val merged = Scd2.merge(Scd2.build(early, Seq("user_id"), "ts"),
      batch, Seq("user_id"), "ts", maxBroadcastKeys = 0L)
    val fresh = Scd2.build(log, Seq("user_id"), "ts")
    assert(merged.collect().map(_.toString).sorted.toSeq ===
      fresh.collect().map(_.toString).sorted.toSeq)
    // no broadcast hint anywhere in the logical plan on this branch
    val logical = merged.queryExecution.optimizedPlan.toString
    assert(!logical.toLowerCase.contains("broadcast"), logical.take(2000))
  }

  test("point-in-time join: boundary at valid_from is the NEW version, " +
      "facts before the first version keep nulls") {
    val dim = Scd2.build(log, Seq("user_id"), "ts")
    val facts = Seq(
      (10L, 1L, ts("2024-02-01 00:00:00")), // exactly at a boundary
      (11L, 1L, ts("2024-02-20 12:00:00")), // inside v2
      (12L, 1L, ts("2023-12-25 00:00:00")), // before v1
      (13L, 9L, ts("2024-02-01 00:00:00"))) // unknown key
      .toDF("fact_id", "user_id", "fts")
    val got = Scd2.pointInTime(facts, dim, Seq("user_id"), "fts")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("tier"))) None
         else Some(r.getString(r.fieldIndex("tier"))))).toMap
    assert(got === Map(10L -> Some("silver"), 11L -> Some("silver"),
      12L -> None, 13L -> None))
    // intervals partition time: every fact row survives exactly once
    assert(Scd2.pointInTime(facts, dim, Seq("user_id"), "fts").count() === 4)
  }

  test("snapshotAt reconstructs the dim at a past instant") {
    val dim = Scd2.build(log, Seq("user_id"), "ts")
    val at = Scd2.snapshotAt(dim, lit(ts("2024-02-10 00:00:00")))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(at === Map(1L -> "silver", 2L -> "bronze"))
  }
}
