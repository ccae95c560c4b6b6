package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class IncrementalAggSpec extends SparkTestBase {

  test("folding three increments equals aggregating the union directly") {
    // Tables.load normalizes the nanosecond ts column to a timestamp
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
    // three disjoint increments by time, as daily batches would arrive
    val cuts = Seq("2024-01-10 00:00:00", "2024-01-20 00:00:00")
      .map(java.sql.Timestamp.valueOf)
    val incs = Seq(
      ev.filter(col("ts") < cuts(0)),
      ev.filter(col("ts") >= cuts(0) && col("ts") < cuts(1)),
      ev.filter(col("ts") >= cuts(1)))
    assert(incs.map(_.count()).sum === ev.count())

    val keys = Seq("event_type")
    val folded = incs.tail.foldLeft(
        IncrementalAgg.partialState(incs.head, keys, "value"))(
        (st, inc) => IncrementalAgg.merge(st,
          IncrementalAgg.partialState(inc, keys, "value"), keys))
    val foldedRows = IncrementalAgg.finalized(folded)
      .select("event_type", "state_cnt", "state_min", "state_max",
        "avg_value", "stddev_value")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5))).toMap

    val direct = ev.groupBy("event_type").agg(
        count(col("value")).as("cnt"), min("value"), max("value"),
        avg("value"), stddev_samp("value"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5))).toMap

    assert(foldedRows.keySet === direct.keySet)
    foldedRows.foreach { case (k, (cnt, mn, mx, av, sd)) =>
      val (dCnt, dMn, dMx, dAv, dSd) = direct(k)
      assert(cnt === dCnt)
      assert(mn === dMn)
      assert(mx === dMx)
      assert(math.abs(av - dAv) < 1e-9, s"$k avg")
      // sum-of-squares formula vs Welford: agree to float tolerance
      assert(math.abs(sd - dSd) < 1e-6, s"$k stddev $sd vs $dSd")
    }

    // decimal-backed state: fold-of-increments is BIT-IDENTICAL to the
    // single-shot state — no float-associativity tolerance
    val oneShot = IncrementalAgg.finalized(
        IncrementalAgg.partialState(ev, keys, "value"))
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val foldedExact = IncrementalAgg.finalized(folded)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(foldedExact === oneShot)
  }

  test("merging an empty delta is a no-op") {
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
    val keys = Seq("event_type")
    val st = IncrementalAgg.partialState(ev, keys, "value")
    val merged = IncrementalAgg.merge(st,
      IncrementalAgg.partialState(ev.filter(lit(false)), keys, "value"), keys)
    assert(merged.collect().toSet === st.collect().toSet)
  }

  test("new groups appear through merge") {
    import spark.implicits._
    val keys = Seq("k")
    val st = IncrementalAgg.partialState(
      Seq(("a", 1.0), ("a", 3.0)).toDF("k", "v"), keys, "v")
    val merged = IncrementalAgg.merge(st, IncrementalAgg.partialState(
      Seq(("b", 5.0)).toDF("k", "v"), keys, "v"), keys)
    val out = IncrementalAgg.finalized(merged)
      .select("k", "state_cnt", "avg_value").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out === Map("a" -> (2L, 2.0), "b" -> (1L, 5.0)))
  }
}
