package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.SparkTestBase

/** The interval-join rewrite must change ONLY the plan, never the result:
  * every test compares against the same query with the rule excluded
  * (Catalyst's excludedRules escape hatch), which plans the original
  * nested-loop join.
  */
class RewriteIntervalJoinSpec extends SparkTestBase {

  private val RuleName = "graft.plans.RewriteIntervalJoin"

  private def withRuleExcluded[A](f: => A): A = {
    spark.conf.set("spark.sql.optimizer.excludedRules", RuleName)
    try f finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  private def events(): DataFrame = {
    import spark.implicits._
    // boundary-heavy synthetic stream: exact window edges, bin edges
    // (ts divisible by the 5-min window), sub-second offsets, two types
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    (0 until 600).map { i =>
      val typ = if (i % 3 == 0) "error" else "signup"
      // steps of 100s hit bin boundaries (300s) and window edges exactly
      (i.toLong, new Timestamp(base + i * 100L * 1000L + (i % 7) * 13L), typ)
    }.toDF("event_id", "ts", "event_type")
  }

  private val naiveSql =
    """SELECT e.event_id AS eid, s.event_id AS sid
      |FROM (SELECT * FROM ij_events WHERE event_type = 'error') e
      |JOIN (SELECT * FROM ij_events WHERE event_type = 'signup') s
      |  ON s.ts >= e.ts - INTERVAL 5 MINUTES
      | AND s.ts < e.ts""".stripMargin

  test("pure range join plans as a hash join on the derived bin") {
    events().createOrReplaceTempView("ij_events")
    val plan = spark.sql(naiveSql).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      plan.take(2000))
    assert(plan.contains("__graft_bin"), plan.take(2000))
  }

  test("rewritten results are identical to the nested-loop plan's") {
    events().createOrReplaceTempView("ij_events")
    val rewritten = spark.sql(naiveSql).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val reference = withRuleExcluded {
      val plan = spark.sql(naiveSql).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
      spark.sql(naiveSql).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
    }
    assert(reference.nonEmpty) // the comparison must compare something
    assert(rewritten === reference)
  }

  test("mirrored bound formulation rewrites and matches too") {
    events().createOrReplaceTempView("ij_events")
    val mirrored =
      """SELECT e.event_id AS eid, s.event_id AS sid
        |FROM (SELECT * FROM ij_events WHERE event_type = 'error') e
        |JOIN (SELECT * FROM ij_events WHERE event_type = 'signup') s
        |  ON e.ts <= s.ts + INTERVAL 5 MINUTES
        | AND e.ts > s.ts""".stripMargin
    val plan = spark.sql(mirrored).queryExecution.executedPlan.toString
    assert(plan.contains("__graft_bin"), plan.take(2000))
    val rewritten = spark.sql(mirrored).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val reference = withRuleExcluded(spark.sql(mirrored).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted)
    assert(rewritten === reference)
  }

  test("left-outer rewrites only with the preserved side bounded") {
    events().createOrReplaceTempView("ij_events")
    // preserved (left) side is the BOUNDED one -> rewrite applies
    val safe =
      """SELECT s.event_id AS sid, e.event_id AS eid
        |FROM (SELECT * FROM ij_events WHERE event_type = 'signup') s
        |LEFT JOIN (SELECT * FROM ij_events WHERE event_type = 'error') e
        |  ON s.ts >= e.ts - INTERVAL 5 MINUTES
        | AND s.ts < e.ts""".stripMargin
    val safePlan = spark.sql(safe).queryExecution.executedPlan.toString
    assert(safePlan.contains("__graft_bin"), safePlan.take(2000))
    val rewritten = spark.sql(safe).collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString))).sorted
    val reference = withRuleExcluded(spark.sql(safe).collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString))).sorted)
    assert(rewritten === reference)
    assert(rewritten.exists(_._2.isEmpty)) // unmatched rows null-extend once

    // preserved (left) side is the ANCHOR -> exploding it would duplicate
    // unmatched rows; the rule must leave the join alone
    val unsafe =
      """SELECT e.event_id AS eid, s.event_id AS sid
        |FROM (SELECT * FROM ij_events WHERE event_type = 'error') e
        |LEFT JOIN (SELECT * FROM ij_events WHERE event_type = 'signup') s
        |  ON s.ts >= e.ts - INTERVAL 5 MINUTES
        | AND s.ts < e.ts""".stripMargin
    val unsafePlan = spark.sql(unsafe).queryExecution.executedPlan.toString
    assert(!unsafePlan.contains("__graft_bin"), unsafePlan.take(2000))
  }

  test("a join that already has a cross-side equality is left alone") {
    events().createOrReplaceTempView("ij_events")
    val equi =
      """SELECT e.event_id AS eid, s.event_id AS sid
        |FROM (SELECT * FROM ij_events WHERE event_type = 'error') e
        |JOIN (SELECT * FROM ij_events WHERE event_type = 'signup') s
        |  ON e.event_id % 10 = s.event_id % 10
        | AND s.ts >= e.ts - INTERVAL 5 MINUTES
        | AND s.ts < e.ts""".stripMargin
    val plan = spark.sql(equi).queryExecution.executedPlan.toString
    assert(!plan.contains("__graft_bin"), plan.take(2000))
  }
}
