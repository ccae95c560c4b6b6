package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val quotes = Seq(
    ("u1", "2024-01-01 10:00:00", "q1", 100.0),
    ("u1", "2024-01-01 11:00:00", "q2", 110.0),
    ("u2", "2024-01-01 09:00:00", "q3", 90.0)
  ).toDF("user", "ts", "quote_id", "px")
    .withColumn("ts", col("ts").cast("timestamp"))
    .select(col("user"), col("ts"), col("quote_id"), col("px"))

  private def trades(rows: (String, String, String)*) =
    rows.toSeq.toDF("user", "ts", "trade_id")
      .withColumn("ts", col("ts").cast("timestamp"))

  private def join(t: org.apache.spark.sql.DataFrame) =
    AsOfJoin.asofBackward(t, quotes, Seq("user"), "ts", "ts",
        rightTieBreak = Seq(col("quote_id").asc))
      .select("trade_id", "quote_id")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("picks the latest right row at or before each left timestamp") {
    val out = join(trades(
      ("u1", "2024-01-01 10:30:00", "t1"),  // between q1 and q2 -> q1
      ("u1", "2024-01-01 12:00:00", "t2"))) // after q2 -> q2
    assert(out === Map("t1" -> "q1", "t2" -> "q2"))
  }

  test("equal timestamps are inclusive (right row at the same instant wins)") {
    val out = join(trades(("u1", "2024-01-01 11:00:00", "t1")))
    assert(out === Map("t1" -> "q2"))
  }

  test("left rows with no prior right row keep null payload") {
    val out = AsOfJoin.asofBackward(
      trades(("u1", "2024-01-01 08:00:00", "t0")), quotes,
      Seq("user"), "ts", "ts")
      .select("trade_id", "quote_id").collect().head
    assert(out.getString(0) === "t0")
    assert(out.isNullAt(1))
  }

  test("keys partition the match space (no cross-user leakage)") {
    val out = join(trades(("u2", "2024-01-01 12:00:00", "t1")))
    assert(out === Map("t1" -> "q3"))
  }

  test("null payload in the latest right row is NOT backfilled from older rows") {
    import org.apache.spark.sql.types._
    // q2' at 11:00 carries a null px; the joined row must be (q2', null),
    // never a torn (q2', 100.0) composite
    val rows = java.util.List.of(
      org.apache.spark.sql.Row("u1", ts("2024-01-01 10:00:00"), "q1", java.lang.Double.valueOf(100.0)),
      org.apache.spark.sql.Row("u1", ts("2024-01-01 11:00:00"), "q2", null))
    val schema = StructType(Seq(
      StructField("user", StringType), StructField("ts", TimestampType),
      StructField("quote_id", StringType), StructField("px", DoubleType)))
    val q = spark.createDataFrame(rows, schema)
    val out = AsOfJoin.asofBackward(
      trades(("u1", "2024-01-01 12:00:00", "t1")), q, Seq("user"), "ts", "ts")
      .select("trade_id", "quote_id", "px").collect().head
    assert(out.getString(1) === "q2")
    assert(out.isNullAt(2), "px must be q2's null, not q1's 100.0")
  }

  test("left row count is preserved") {
    val t = trades(
      ("u1", "2024-01-01 10:30:00", "a"),
      ("u1", "2024-01-01 10:30:00", "b"), // duplicate left ts is fine
      ("u3", "2024-01-01 10:30:00", "c")) // key with no right rows at all
    assert(AsOfJoin.asofBackward(t, quotes, Seq("user"), "ts", "ts")
      .count() === 3)
  }
}
