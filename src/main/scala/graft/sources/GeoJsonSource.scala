package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Native GeoJSON ingestion (SURVEY.md §2a S1/S2).
  *
  * The reference flattens USGS FDSN GeoJSON driver-side in Python —
  * `properties.*` and `geometry.coordinates[0..2]` picked into dicts
  * before `createDataFrame` (`02_ingestion.py:170-207`), so the driver is
  * the bottleneck and the cluster sees only the already-flat rows. Here
  * the raw feed is parsed BY Spark: `spark.read.json` infers the nested
  * `FeatureCollection` schema, `explode(features)` fans out on executors,
  * and nested-field projection + `timestamp_millis` flatten in parallel.
  * At 100 TB of feed files this is the difference between one Python
  * process and the whole cluster doing the parse.
  *
  * Rows with a null event time are dropped (`02:176-178`), and the
  * watermark skip (`event_time <= start_dt`, `02:181-183`) is a plain
  * pushable filter the caller applies.
  */
object GeoJsonSource {

  import org.apache.spark.sql.types._

  /** Explicit FeatureCollection schema. Inference would (a) parse every
    * file TWICE (the codebase convention in [[Tables.loadJsonl]] forbids
    * that at scale), (b) crash on an empty `features` page — `[]` infers
    * as `array<string>` and the nested projection fails to resolve — and
    * (c) let all-null optional fields drift to string between batches.
    */
  val featureCollectionSchema: StructType = StructType(Seq(
    StructField("features", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("properties", StructType(Seq(
        StructField("time", LongType),
        StructField("mag", DoubleType),
        StructField("magType", StringType),
        StructField("nst", LongType),
        StructField("gap", DoubleType),
        StructField("dmin", DoubleType),
        StructField("rms", DoubleType),
        StructField("net", StringType),
        StructField("place", StringType),
        StructField("type", StringType),
        StructField("status", StringType),
        StructField("horizontalError", DoubleType),
        StructField("depthError", DoubleType),
        StructField("magError", DoubleType)))),
      StructField("geometry", StructType(Seq(
        StructField("type", StringType),
        StructField("coordinates", ArrayType(DoubleType)))))))))))

  /** Read one-or-more GeoJSON FeatureCollection files (multiLine — the
    * USGS payload is a single JSON object per file) with the explicit
    * schema.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    flatten(spark.read.option("multiLine", value = true)
      .schema(featureCollectionSchema).json(path))

  /** Flatten an already-parsed FeatureCollection frame to the bronze
    * event schema. Column mapping follows `02_ingestion.py:185-204`.
    */
  def flatten(raw: DataFrame): DataFrame =
    raw
      .select(explode(col("features")).as("f"))
      .select(
        col("f.id").as("event_id"),
        timestamp_millis(col("f.properties.time")).as("time"),
        element_at(col("f.geometry.coordinates"), 2).as("latitude"),
        element_at(col("f.geometry.coordinates"), 1).as("longitude"),
        element_at(col("f.geometry.coordinates"), 3).as("depth"),
        col("f.properties.mag").as("mag"),
        col("f.properties.magType").as("mag_type"),
        col("f.properties.nst").cast("int").as("nst"),
        col("f.properties.gap").as("gap"),
        col("f.properties.dmin").as("dmin"),
        col("f.properties.rms").as("rms"),
        col("f.properties.net").as("net"),
        col("f.properties.place").as("place"),
        col("f.properties.type").as("type"),
        col("f.properties.status").as("status"),
        col("f.properties.horizontalError").as("horizontal_error"),
        col("f.properties.depthError").as("depth_error"),
        col("f.properties.magError").as("mag_error"))
      .filter(col("time").isNotNull)

  /** Lineage columns the reference stamps on every bronze append
    * (`02_ingestion.py:205-207`).
    */
  def withLineage(df: DataFrame, batchId: String): DataFrame =
    df.withColumn("ingestion_ts", current_timestamp())
      .withColumn("ingestion_date", to_date(current_timestamp()))
      .withColumn("batch_id", lit(batchId))
}
