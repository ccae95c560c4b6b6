package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

class ClickFunnelSpec extends SparkTestBase {

  private def ev(id: String, t: String, u: String, typ: String) =
    Ev(id, Timestamp.valueOf(t), u, typ, 1.0)

  test("clicks-since-last-purchase counts across micro-batches and resets") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val saved = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Ev]
    val q = ClickFunnel(input.toDF())
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      // batch 1: two clicks, no purchase yet — state must carry over
      input.addData(
        ev("c1", "2024-01-01 10:00:00", "u1", "click"),
        ev("c2", "2024-01-01 10:01:00", "u1", "click"),
        ev("x1", "2024-01-01 10:01:30", "u1", "view"), // ignored type
        ev("c3", "2024-01-01 10:02:00", "u2", "click"))
      q.processAllAvailable()
      assert(spark.table("funnel_out").count() == 0)
      // batch 2: u1 purchases (2 carried clicks + 1 new), then clicks
      // again and purchases again (1 click) — reset must apply in-batch
      input.addData(
        ev("c4", "2024-01-01 10:03:00", "u1", "click"),
        ev("p1", "2024-01-01 10:04:00", "u1", "purchase"),
        ev("c5", "2024-01-01 10:05:00", "u1", "click"),
        ev("p2", "2024-01-01 10:06:00", "u1", "purchase"),
        ev("p3", "2024-01-01 10:07:00", "u2", "purchase"))
      q.processAllAvailable()
      val hits = spark.table("funnel_out")
        .select("user_id", "purchase_id", "clicks_before").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(hits === Set(("u1", "p1", 3L), ("u1", "p2", 1L),
        ("u2", "p3", 1L)))
      // batch 3: the reset survived the p2 emission
      input.addData(ev("p4", "2024-01-01 10:08:00", "u1", "purchase"))
      q.processAllAvailable()
      val p4 = spark.table("funnel_out")
        .filter($"purchase_id" === "p4").select("clicks_before")
        .as[Long].collect().toSeq
      assert(p4 === Seq(0L))
    } finally {
      q.stop()
      saved match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
