package graft.state

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkTestBase

class WatermarkStoreSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("read returns the seed default before any advance") {
    val dir = Files.createTempDirectory("wm").toString + "/wm"
    val store = new WatermarkStore(spark, dir)
    assert(store.read("bronze", ts("1990-01-01 00:00:00")) ===
      ts("1990-01-01 00:00:00"))
  }

  test("advance moves the watermark and accumulates record counts") {
    val dir = Files.createTempDirectory("wm").toString + "/wm"
    val store = new WatermarkStore(spark, dir)
    store.advance("bronze", "time", ts("2024-01-07 00:00:00"), 100L)
    assert(store.read("bronze", ts("1990-01-01 00:00:00")) ===
      ts("2024-01-07 00:00:00"))
    store.advance("bronze", "time", ts("2024-01-14 00:00:00"), 50L)
    val row = store.all().filter("table_name = 'bronze'").collect().head
    assert(row.getAs[Timestamp]("watermark_value") === ts("2024-01-14 00:00:00"))
    assert(row.getAs[Long]("records_processed") === 150L)
  }

  test("advancing one table leaves other tables untouched") {
    val dir = Files.createTempDirectory("wm").toString + "/wm"
    val store = new WatermarkStore(spark, dir)
    store.advance("bronze", "time", ts("2024-01-07 00:00:00"), 10L)
    store.advance("silver", "event_time", ts("2024-01-05 00:00:00"), 5L)
    assert(store.read("bronze", ts("1990-01-01 00:00:00")) ===
      ts("2024-01-07 00:00:00"))
    assert(store.read("silver", ts("1990-01-01 00:00:00")) ===
      ts("2024-01-05 00:00:00"))
    assert(store.all().count() === 2)
  }
}
