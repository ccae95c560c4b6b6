package graft.streaming

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.GeoJsonSource

/** Streaming ingest end-to-end: GeoJSON FeatureCollection files arriving
  * in a landing directory (what [[graft.sources.RestPager.foreachPage]]
  * writes) are picked up by a file-source stream under the explicit
  * schema, flattened by the SAME [[GeoJsonSource.flatten]] used in batch,
  * and deduplicated with watermarked streaming state.
  */
class StreamingIngestSpec extends SparkTestBase {

  private def page(events: (String, Long, Double)*): String = {
    val features = events.map { case (id, timeMs, mag) =>
      s"""{"type":"Feature","id":"$id","properties":{"time":$timeMs,
         |"mag":$mag,"magType":"mb","nst":10,"gap":1.0,"dmin":0.1,"rms":0.5,
         |"net":"us","place":"x","type":"earthquake","status":"reviewed",
         |"horizontalError":1.0,"depthError":1.0,"magError":0.1},
         |"geometry":{"type":"Point","coordinates":[10.0,20.0,30.0]}}"""
        .stripMargin.replace("\n", "")
    }.mkString(",")
    s"""{"type":"FeatureCollection","features":[$features]}"""
  }

  test("files landing in a directory stream through flatten + dedup") {
    val landing = Files.createTempDirectory("land").toString
    def land(name: String, body: String): Unit =
      Files.write(Paths.get(s"$landing/$name"), body.getBytes,
        StandardOpenOption.CREATE)

    val t0 = 1704067200000L // 2024-01-01T00:00:00Z
    land("page1.json", page(("ev1", t0, 5.0), ("ev2", t0 + 60000, 6.0)))

    val stream = GeoJsonSource.flatten(
      spark.readStream
        .schema(GeoJsonSource.featureCollectionSchema)
        .option("multiLine", "true")
        .json(landing))
      .withColumnRenamed("time", "ts")
    val deduped = stream
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

    val q = deduped.writeStream.format("memory")
      .queryName("ingest_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("ingest_out").count() === 2)

      // a later page re-delivers ev2 (watermark-window duplicate) and
      // adds ev3 — only ev3 survives
      land("page2.json", page(("ev2", t0 + 60000, 6.0),
        ("ev3", t0 + 120000, 4.5)))
      q.processAllAvailable()
      val ids = spark.table("ingest_out").select("event_id")
        .collect().map(_.getString(0)).sorted
      assert(ids === Array("ev1", "ev2", "ev3"))
      // flattened columns came through the batch code path
      val r = spark.table("ingest_out").filter(col("event_id") === "ev1")
        .select("latitude", "longitude", "depth", "mag").collect().head
      assert((r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
        === ((20.0, 10.0, 30.0, 5.0)))
    } finally q.stop()
  }
}
