package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private def events = Seq(
    ("e1", "u1", "2024-01-01 00:00:00", 1.0),
    ("e2", "u1", "2024-01-02 00:00:00", 2.0), // latest for u1
    ("e3", "u2", "2024-01-01 00:00:00", 3.0),
    ("e4", "u2", "2024-01-01 00:00:00", 4.0)  // same ts as e3 -> id tiebreak
  ).toDF("id", "user", "ts", "v").withColumn("ts", col("ts").cast("timestamp"))

  test("keepFirst keeps latest row per key with deterministic tiebreak") {
    val out = Dedup.keepFirst(events, Seq("user"),
      Seq(col("ts").desc, col("id").desc))
      .select("user", "id").collect().map(r => r.getString(0) -> r.getString(1))
    assert(out.toMap === Map("u1" -> "e2", "u2" -> "e4"))
  }

  test("keepLatestByMax agrees with keepFirst on single-order dedup") {
    val a = Dedup.keepFirst(events, Seq("user"),
      Seq(col("ts").desc, col("id").desc))
      .select("user", "id", "v").collect().toSet
    val b = Dedup.keepLatestByMax(events, Seq("user"), "ts", "id")
      .select("user", "id", "v").collect().toSet
    assert(a === b)
  }

  test("exact counts duplicate groups and keeps lowest id") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("k", "doc")
    val out = Dedup.exact(df, Seq("k"), "doc").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set(("a", 1L, 2L), ("b", 3L, 1L)))
  }
}

class UpsertSpec extends SparkTestBase {
  import spark.implicits._

  test("upsert updates matched keys and inserts new ones") {
    val target = Seq(("k1", 1), ("k2", 2)).toDF("k", "v")
    val updates = Seq(("k2", 20), ("k3", 30)).toDF("k", "v")
    val out = Upsert.upsert(target, updates, Seq("k")).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out === Map("k1" -> 1, "k2" -> 20, "k3" -> 30))
  }

  test("upsert is idempotent") {
    val target = Seq(("k1", 1)).toDF("k", "v")
    val updates = Seq(("k1", 10)).toDF("k", "v")
    val once = Upsert.upsert(target, updates, Seq("k"))
    val twice = Upsert.upsert(once, updates, Seq("k"))
    assert(once.collect().toSet === twice.collect().toSet)
  }

  test("upsertEvolve widens the target schema when updates add a column") {
    val target = Seq(("k1", 1), ("k2", 2)).toDF("k", "v")
    val updates = Seq(("k2", 20, "new"), ("k3", 30, "row"))
      .toDF("k", "v", "w")
    val out = Upsert.upsertEvolve(target, updates, Seq("k"))
    assert(out.columns.toSet === Set("k", "v", "w"))
    val rows = out.collect()
      .map(r => r.getString(0) -> ((r.getInt(1), Option(r.getString(2)))))
      .toMap
    assert(rows === Map(
      "k1" -> ((1, None)), // untouched survivor: null in the new column
      "k2" -> ((20, Some("new"))),
      "k3" -> ((30, Some("row")))))
    // strict upsert refuses the same evolution
    intercept[org.apache.spark.sql.AnalysisException](
      Upsert.upsert(target, updates, Seq("k")).collect())
  }

  test("merge applies updates, inserts, and tombstone deletes") {
    val target = Seq(("k1", 1), ("k2", 2), ("k3", 3)).toDF("k", "v")
    val feed = Seq(
      ("k2", 20, false), // update
      ("k3", 0, true), // delete
      ("k4", 40, false), // insert
      ("k9", 0, true) // delete of an absent key: no-op
    ).toDF("k", "v", "deleted")
    val out = Upsert.merge(target, feed, Seq("k"), "deleted").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out === Map("k1" -> 1, "k2" -> 20, "k4" -> 40))
  }

  test("merge replay is idempotent") {
    val target = Seq(("k1", 1), ("k2", 2)).toDF("k", "v")
    val feed = Seq(("k1", 10, false), ("k2", 0, true)).toDF("k", "v", "deleted")
    val once = Upsert.merge(target, feed, Seq("k"), "deleted")
    val twice = Upsert.merge(once, feed, Seq("k"), "deleted")
    assert(once.collect().toSet === twice.collect().toSet)
  }
}

class BandJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val bands = Seq(
    ("LOW", 0.0, 50.0, 2),
    ("MID", 40.0, 120.0, 1), // overlaps LOW on [40,50], higher priority
    ("HIGH", 100.0, 300.0, 3)
  ).toDF("code", "lo", "hi", "priority")

  private def enrich(vals: (String, Double)*) =
    BandJoin.enrich(
      facts = vals.toSeq.toDF("id", "v"),
      factKey = "id",
      dim = bands,
      joinCond = col("v") >= col("lo") && col("v") <= col("hi"),
      pickOrder = Seq(col("priority").asc, col("code").asc),
      fallback = Map("code" -> lit("OTHER"), "priority" -> lit(99)))
      .select("id", "code").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  test("overlap resolves to the lowest priority value") {
    assert(enrich("a" -> 45.0) === Map("a" -> "MID")) // in LOW and MID
  }

  test("inclusive boundaries match their band") {
    assert(enrich("a" -> 0.0, "b" -> 50.0, "c" -> 120.0) ===
      Map("a" -> "LOW", "b" -> "MID", "c" -> "MID"))
  }

  test("non-matching rows fall back to OTHER with priority 99") {
    val out = BandJoin.enrich(
      facts = Seq(("x", 500.0)).toDF("id", "v"),
      factKey = "id",
      dim = bands,
      joinCond = col("v") >= col("lo") && col("v") <= col("hi"),
      pickOrder = Seq(col("priority").asc, col("code").asc),
      fallback = Map("code" -> lit("OTHER"), "priority" -> lit(99)))
    val r = out.select("id", "code", "priority").collect().head
    assert((r.getString(0), r.getString(1), r.getInt(2)) === ("x", "OTHER", 99))
  }

  test("every fact appears exactly once") {
    val n = 200
    val facts = (1 to n).map(i => (s"f$i", i * 2.5)).toDF("id", "v")
    val out = BandJoin.enrich(facts, "id", bands,
      col("v") >= col("lo") && col("v") <= col("hi"),
      Seq(col("priority").asc, col("code").asc),
      Map("code" -> lit("OTHER"), "priority" -> lit(99)))
    assert(out.count() === n)
    assert(out.select("id").distinct().count() === n)
  }
}

class QualitySpec extends SparkTestBase {
  import spark.implicits._

  test("report computes nulls, duplicates, and range in one row") {
    val df = Seq(
      (Some("a"), Some(1.0), Some("2024-01-01 00:00:00")),
      (Some("a"), Some(3.0), Some("2024-01-02 00:00:00")),
      (Some("b"), None, Some("2024-01-03 00:00:00")),
      (None, Some(5.0), None)
    ).toDF("event_id", "value", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val r = graft.bronze.Quality.report(df, "event_id", "value", "ts")
      .collect().head.getValuesMap[Any](Seq(
        "n_rows", "distinct_event_id", "duplicate_count",
        "min_value", "max_value", "null_event_id", "null_value", "null_ts"))
    assert(r("n_rows") === 4L)
    assert(r("distinct_event_id") === 2L)
    assert(r("duplicate_count") === 2L)
    assert(r("min_value") === 1.0)
    assert(r("max_value") === 5.0)
    assert(r("null_event_id") === 1L)
    assert(r("null_value") === 1L)
    assert(r("null_ts") === 1L)
  }
}
