package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class GeoJsonSourceSpec extends SparkTestBase {

  private val featureCollection =
    """{"type":"FeatureCollection","metadata":{"count":3},"features":[
      |{"type":"Feature","id":"us100","properties":{"time":1704067200000,
      | "mag":5.5,"magType":"mb","nst":40,"gap":120.5,"dmin":0.5,"rms":0.9,
      | "net":"us","place":"somewhere","type":"earthquake","status":"reviewed",
      | "horizontalError":1.2,"depthError":3.4,"magError":0.1},
      | "geometry":{"type":"Point","coordinates":[142.3,38.1,29.0]}},
      |{"type":"Feature","id":"us101","properties":{"time":null,
      | "mag":2.0,"magType":"ml","nst":5,"gap":null,"dmin":null,"rms":0.2,
      | "net":"us","place":"nowhere","type":"earthquake","status":"automatic",
      | "horizontalError":null,"depthError":null,"magError":null},
      | "geometry":{"type":"Point","coordinates":[-120.0,36.0,8.0]}},
      |{"type":"Feature","id":"us102","properties":{"time":1704153600000,
      | "mag":6.1,"magType":"mw","nst":80,"gap":45.0,"dmin":1.0,"rms":1.1,
      | "net":"us","place":"elsewhere","type":"earthquake","status":"reviewed",
      | "horizontalError":0.8,"depthError":2.0,"magError":0.05},
      | "geometry":{"type":"Point","coordinates":[30.5,-10.2,620.0]}}
      |]}""".stripMargin.replace("\n", "")

  private def flattened = {
    import spark.implicits._
    GeoJsonSource.flatten(
      spark.read.json(Seq(featureCollection).toDS()))
  }

  test("explodes features and projects nested fields to bronze columns") {
    val rows = flattened.orderBy("event_id").collect()
    assert(rows.length === 2) // null-time feature dropped
    val r = rows.head
    assert(r.getAs[String]("event_id") === "us100")
    assert(r.getAs[java.sql.Timestamp]("time") ===
      java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(1704067200000L)))
    assert(r.getAs[Double]("latitude") === 38.1)   // coordinates[1]
    assert(r.getAs[Double]("longitude") === 142.3) // coordinates[0]
    assert(r.getAs[Double]("depth") === 29.0)      // coordinates[2]
    assert(r.getAs[Double]("mag") === 5.5)
    assert(r.getAs[Int]("nst") === 40)
    assert(r.getAs[String]("status") === "reviewed")
  }

  test("null-time features are dropped, null measurements survive") {
    assert(!flattened.select("event_id").collect()
      .map(_.getString(0)).contains("us101"))
  }

  test("an empty features page parses cleanly under the explicit schema") {
    import spark.implicits._
    val empty = """{"type":"FeatureCollection","metadata":{"count":0},"features":[]}"""
    val df = GeoJsonSource.flatten(
      spark.read.schema(GeoJsonSource.featureCollectionSchema)
        .json(Seq(empty).toDS()))
    assert(df.count() === 0)
    assert(df.columns.contains("event_id")) // schema fixed, not inferred
  }

  test("lineage stamps batch id and ingestion columns") {
    val out = GeoJsonSource.withLineage(flattened, "batch-7")
    assert(out.columns.toSet.contains("ingestion_ts"))
    assert(out.select("batch_id").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("batch-7"))
  }
}
