package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Physics
import graft.operators.{BandJoin, Dedup, Upsert}
import graft.sources.Tables
import graft.state.WatermarkStore

/** The reference's full medallion flow composed end-to-end from the
  * engine's operators (SURVEY.md §3 E1–E3), over the `events` fixture:
  *
  *   watermark read (§2j) → pushdown incremental scan (P3) →
  *   dedup-keep-latest (W1) → validation/clamp (P4) → broadcast band
  *   enrichment with priority pick + OTHER fallback (J1–J4) → native
  *   physics/risk expressions (§2i) → calendar projection (§2h) →
  *   MERGE-upsert into silver (S7) → watermark advance (S8) → gold
  *   grouped aggregates (A1/A2) overwrite (S6).
  *
  * Unlike the reference — which materializes three separate counts per
  * run (`04:46,86,127`, re-executing the growing plan each time) — each
  * layer here is computed once; the only actions are the two writes and
  * the watermark max.
  */
object SeismicPipeline {

  case class RunSummary(newRecords: Long, silverRows: Long, goldRows: Long,
      watermark: Timestamp)

  val SeedWatermark: Timestamp =
    Timestamp.from(java.time.Instant.parse("1990-01-01T00:00:00Z"))

  /** The silver "value band" dimension (tectonic-region-dim analog). */
  def bandDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("LOW", "Low band", 0.0, 50.0, 2),
      ("MID", "Mid band", 40.0, 120.0, 1),
      ("HIGH", "High band", 100.0, 300.0, 3))
      .toDF("band_code", "band_name", "lo", "hi", "priority")
  }

  def silverPath(workDir: String) = s"$workDir/silver_events"
  def goldPath(workDir: String) = s"$workDir/gold_band_summary"

  /** One incremental run. Returns the summary; a run with no new records
    * is a no-op (reference early-exit, `04:49-51`).
    */
  def runIncremental(spark: SparkSession, sfDir: String,
      workDir: String): RunSummary = {
    val store = new WatermarkStore(spark, s"$workDir/control_watermark")
    val wm = store.read("silver_events", SeedWatermark)

    val increment = Tables.loadEventsSince(spark, sfDir, wm)
    val newCount = increment.count()
    if (newCount == 0L) {
      // no-op run; silver/gold may not exist yet if the very first run
      // saw no data past the seed watermark
      def countIfExists(path: String): Long =
        if (Tables.exists(spark, path)) spark.read.parquet(path).count()
        else 0L
      return RunSummary(0L, countIfExists(silverPath(workDir)),
        countIfExists(goldPath(workDir)), wm)
    }

    // W1 dedup-keep-latest within the increment; tiebreak over every
    // remaining column so equal-ts duplicates resolve deterministically
    val deduped = Dedup.keepFirst(increment, Seq("event_id"),
      col("ts").desc +: increment.columns.toSeq
        .filterNot(c => c == "event_id" || c == "ts").map(col(_).desc))

    // P4 validation/clamp (value plays depth-km: null→0, clamp [0, 300])
    val validated = deduped.withColumn("value_clean",
      when(col("value").isNull, 0.0)
        .when(col("value") < 0, 0.0)
        .when(col("value") > 300, 300.0)
        .otherwise(col("value")))

    // J1–J4 broadcast band enrichment
    val enriched = BandJoin.enrich(
      facts = validated,
      factKey = "event_id",
      dim = bandDim(spark),
      joinCond = col("value_clean") >= col("lo") &&
        col("value_clean") <= col("hi"),
      pickOrder = Seq(col("priority").asc, col("band_code").asc),
      fallback = Map(
        "band_code" -> lit("OTHER"),
        "band_name" -> lit("Other"),
        "priority" -> lit(99)))

    // §2i native physics + §2h calendar projection
    val mag = col("value_clean") / 50
    val silverNew = enriched.select(
      col("event_id"), col("ts").as("event_time"), col("user_id"),
      col("event_type"), col("value_clean").as("depth_km"),
      col("band_code"), col("band_name"), col("priority"),
      round(mag, 4).as("magnitude"),
      Physics.energyJoulesLog(mag).as("energy_joules_log"),
      Physics.riskLevel(mag).as("risk_level"),
      Physics.depthCategory(col("value_clean")).as("depth_category"),
      Physics.tsunamiPotential(mag, col("value_clean")).as("tsunami_potential"),
      hour(col("ts")).as("hour_of_day"),
      month(col("ts")).as("month"),
      year(col("ts")).as("year"),
      current_timestamp().as("processed_ts"))

    // S7 MERGE-upsert into silver, laid out hive-partitioned by
    // (year, month): every downstream year/month-scoped read — including
    // this pipeline's own next incremental merge — prunes to matching
    // partition directories instead of scanning the whole table
    val silverP = silverPath(workDir)
    val merged =
      if (!Tables.exists(spark, silverP)) silverNew
      else Upsert.upsert(
        spark.read.parquet(silverP).select(silverNew.columns.toIndexedSeq.map(col): _*),
        silverNew, Seq("event_id"))
    Tables.overwritePartitioned(merged, silverP, Seq("year", "month"))

    // S8 watermark advance to max event time of the written batch
    val maxTs = graft.state.WatermarkStore.timestampAt(
      silverNew.agg(max(col("event_time"))).collect().head, 0)
    store.advance("silver_events", "event_time", maxTs, newCount)

    // A1/A2 gold build over the FULL silver table
    val silver = spark.read.parquet(silverP)
    val gold = silver
      .groupBy(col("band_code"), col("year"), col("month"))
      .agg(
        count(lit(1)).as("total_events"),
        round(avg(col("magnitude")) + lit(1e-6), 4).as("avg_magnitude"),
        round(max(col("magnitude")), 4).as("max_magnitude"),
        sum(when(col("risk_level") === "CRITICAL", 1).otherwise(0))
          .as("critical_events"),
        sum(when(col("tsunami_potential"), 1).otherwise(0))
          .as("tsunami_events"))
    Tables.overwrite(gold, goldPath(workDir))

    RunSummary(newCount, silver.count(),
      spark.read.parquet(goldPath(workDir)).count(), maxTs)
  }
}
