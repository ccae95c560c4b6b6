package graft.state

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Watermark-table incremental CDC state (SURVEY.md §2j).
  *
  * Mirrors the reference's `control_watermark` Delta table
  * (`01_config_setup.py:40-49`): one row per target table holding the
  * highest event time already processed plus a processed-row count.
  * Reads are `SELECT watermark_value WHERE table_name = …`
  * (`02_ingestion.py:75-94`); advances are point UPDATEs
  * (`02:221-227`, `04_silver_transformation.py:213-222`) re-expressed as
  * read-modify-overwrite on the tiny state table — safe under the
  * reference's own single-writer regime (`Pipeline.json:22`).
  */
class WatermarkStore(spark: SparkSession, path: String) {

  val schema: StructType = StructType(Seq(
    StructField("table_name", StringType, nullable = false),
    StructField("watermark_column", StringType, nullable = false),
    StructField("watermark_value", TimestampType, nullable = false),
    StructField("last_updated", TimestampType, nullable = false),
    StructField("records_processed", LongType, nullable = false)))

  // Tables.exists also recovers state stranded at path.__old__ by a
  // crash inside Tables.overwrite — a plain fs.exists would mistake that
  // window for "no state" and the next advance would truncate every
  // table's watermark
  private def exists: Boolean = Tables.exists(spark, path)

  def all(): DataFrame =
    if (exists) spark.read.parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)

  /** Current watermark for a table, seeding `default` on first sight
    * (reference fallback-seed behavior, `02_ingestion.py:81-94`).
    */
  def read(tableName: String, default: Timestamp): Timestamp =
    all().filter(col("table_name") === tableName)
      .select("watermark_value")
      .collect()
      .headOption
      .map(_.getTimestamp(0))
      .getOrElse(default)

  /** Advance after a successful batch: watermark := max event time of the
    * written batch; records_processed accumulates.
    */
  def advance(tableName: String, watermarkColumn: String,
      newValue: Timestamp, records: Long): Unit = {
    val now = new Timestamp(System.currentTimeMillis())
    val prior = all()
    val others = prior.filter(col("table_name") =!= tableName)
    val prevProcessed = prior
      .filter(col("table_name") === tableName)
      .select("records_processed")
      .collect().headOption.map(_.getLong(0)).getOrElse(0L)
    val updated = spark.createDataFrame(
      java.util.List.of(
        Row(tableName, watermarkColumn, newValue, now,
          prevProcessed + records)),
      schema)
    Tables.overwrite(others.unionByName(updated), path)
  }
}

object WatermarkStore {

  /** Event-time scalar out of a collected Row, whatever timestamp flavor
    * the source carried: `TIMESTAMP` surfaces as `java.sql.Timestamp`,
    * `TIMESTAMP_NTZ` (the current fixtures) as `java.time.LocalDateTime`
    * — interpreted at UTC, matching the session zone
    * ([[graft.Sessions]]), so both flavors advance the store to the same
    * instant.
    */
  def timestampAt(row: Row, i: Int): Timestamp = row.get(i) match {
    case t: Timestamp => t
    case ldt: java.time.LocalDateTime =>
      Timestamp.from(ldt.toInstant(java.time.ZoneOffset.UTC))
    case other => throw new IllegalArgumentException(
      s"not an event-time value: $other (${if (other == null) "null" else other.getClass})")
  }
}
