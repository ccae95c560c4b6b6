package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.streaming.Sessionize.SessionEvent

class SessionizeSpec extends SparkTestBase {

  private def ev(u: Long, t: String, v: Double = 1.0) =
    SessionEvent(u, Timestamp.valueOf(t), v)

  test("gap splits sessions; counts and sums accumulate within a session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = Sessionize.sessionize(input.toDS(), gapSeconds = 600,
        delayThreshold = "1 minute")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // burst 1: 3 events within 10 min; then a 30-min gap; burst 2
      input.addData(
        ev(1, "2024-01-01 10:00:00", 2.0),
        ev(1, "2024-01-01 10:05:00", 3.0),
        ev(1, "2024-01-01 10:09:00", 5.0))
      q.processAllAvailable()
      input.addData(ev(1, "2024-01-01 10:40:00", 7.0)) // closes burst 1
      q.processAllAvailable()
      val afterSplit = spark.table("sess_out").as[Sessionize.CompletedSession]
        .collect()
      assert(afterSplit.length === 1)
      val s1 = afterSplit.head
      assert(s1.user_id === 1L)
      assert(s1.n_events === 3L)
      assert(s1.sum_value === 10.0)
      assert(s1.start_ts === Timestamp.valueOf("2024-01-01 10:00:00"))
      assert(s1.end_ts === Timestamp.valueOf("2024-01-01 10:09:00"))

      // advancing the watermark far past burst 2 times out the open session
      input.addData(ev(2, "2024-01-01 12:00:00", 1.0))
      q.processAllAvailable()
      input.addData(ev(2, "2024-01-01 12:00:30", 1.0))
      q.processAllAvailable()
      val flushed = spark.table("sess_out").as[Sessionize.CompletedSession]
        .collect().filter(_.user_id == 1L)
      assert(flushed.length === 2)
      val s2 = flushed.maxBy(_.start_ts.getTime)
      assert(s2.n_events === 1L)
      assert(s2.sum_value === 7.0)
    } finally q.stop()
  }

  test("late in-gap events extend the session backwards, not forwards") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = Sessionize.sessionize(input.toDS(), gapSeconds = 600,
        delayThreshold = "1 hour")
      .writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    try {
      input.addData(ev(1, "2024-01-01 10:10:00"), ev(1, "2024-01-01 10:12:00"))
      q.processAllAvailable()
      // late event 9:30 into a still-open watermark window: within gap of
      // session start (10:10 - 10min = 10:00 > 9:30? No: 9:30 < 10:00 —
      // disjoint earlier session, emitted standalone)
      input.addData(ev(1, "2024-01-01 09:30:00", 9.0))
      q.processAllAvailable()
      // late event 10:05 is within the gap of the open session's start
      input.addData(ev(1, "2024-01-01 10:05:00", 5.0))
      q.processAllAvailable()
      // close everything
      input.addData(ev(2, "2024-01-01 13:00:00"))
      q.processAllAvailable()
      input.addData(ev(2, "2024-01-01 13:00:30"))
      q.processAllAvailable()
      val out = spark.table("sess_late").as[Sessionize.CompletedSession]
        .collect().filter(_.user_id == 1L).sortBy(_.start_ts.getTime)
      assert(out.length === 2)
      assert(out(0).start_ts === Timestamp.valueOf("2024-01-01 09:30:00"))
      assert(out(0).n_events === 1L)
      // the main session absorbed the 10:05 late event BACKWARDS
      assert(out(1).start_ts === Timestamp.valueOf("2024-01-01 10:05:00"))
      assert(out(1).end_ts === Timestamp.valueOf("2024-01-01 10:12:00"))
      assert(out(1).n_events === 3L)
    } finally q.stop()
  }

  test("users do not share session state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = Sessionize.sessionize(input.toDS(), gapSeconds = 600,
        delayThreshold = "1 minute")
      .writeStream.format("memory").queryName("sess_multi")
      .outputMode("append").start()
    try {
      input.addData(
        ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:01:00"),
        ev(1, "2024-01-01 10:02:00"), ev(2, "2024-01-01 10:03:00"))
      q.processAllAvailable()
      // close both via a late event advancing the watermark
      input.addData(ev(3, "2024-01-01 11:00:00"))
      q.processAllAvailable()
      input.addData(ev(3, "2024-01-01 11:00:30"))
      q.processAllAvailable()
      val out = spark.table("sess_multi").as[Sessionize.CompletedSession]
        .collect().filter(s => s.user_id == 1L || s.user_id == 2L)
      assert(out.map(_.user_id).sorted.toSeq === Seq(1L, 2L))
      assert(out.forall(_.n_events == 2L))
    } finally q.stop()
  }
}
