package graft.queries

import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.functions.{Physics, Stable}
import graft.sources.Tables

/** The reference's physics/risk derivation layer.
  *
  * Oracle-SQL note: `+ 1e-9` nudges grid-exact rounding ties (see
  * [[graft.functions.Physics]]) and `+ 0` after round() collapses DuckDB's
  * IEEE negative zero to +0 (Spark's BigDecimal round never emits -0).
  * (`calculations.py`,
  * `04_silver_transformation.py:130-163`) exercised over the events fixture:
  * `value / 50` plays magnitude (range ≈ 0–11), `value` plays depth-km.
  * All formulas are native codegen'd expressions (SURVEY.md §2i) — the
  * reference used Python row-at-a-time UDFs for three of them.
  */
object PhysicsQueries {

  /** Event-grain physics enrichment: Gutenberg–Richter, Mercalli,
    * Wells–Coppersmith, Båth, plus the silver depth/risk/tsunami ladders
    * (reference gold_physics_analysis shape, `calculations.py:136-152`).
    */
  val physicsEnrich: QuerySpec = QuerySpec.sql(
    "q16_physics_enrich",
    """WITH base AS (
      |  SELECT event_id, value / 50 AS mag, value AS depth_km FROM events),
      |derived AS (
      |  SELECT *,
      |    round(1.5 * mag - 2.5 * log10(depth_km + 1) + 2.0 + 1e-9, 1) + 0 AS mercalli_intensity
      |  FROM base)
      |SELECT event_id,
      |  round(mag + 1e-9, 2) AS magnitude,
      |  round(depth_km, 2) AS depth_km,
      |  round(1.5 * mag + 4.8 + 1e-9, 2) AS energy_joules_log,
      |  mercalli_intensity,
      |  CASE WHEN mercalli_intensity >= 10 THEN 'X+ (Extreme)'
      |       WHEN mercalli_intensity >= 8 THEN 'VIII-IX (Severe)'
      |       WHEN mercalli_intensity >= 6 THEN 'VI-VII (Strong)'
      |       WHEN mercalli_intensity >= 4 THEN 'IV-V (Moderate)'
      |       WHEN mercalli_intensity >= 2 THEN 'II-III (Weak)'
      |       ELSE 'I (Not Felt)' END AS mercalli_scale,
      |  round(1.5 * mag + 9.1 + 1e-9, 2) AS seismic_moment_log,
      |  round(pow(10, 0.74 * mag - 3.55) + 1e-9, 2) AS rupture_length_km,
      |  round(mag - 1.2 + 1e-9, 1) + 0 AS expected_aftershock_mag,
      |  round(mag * 15 - depth_km * 0.2 +
      |        CASE WHEN depth_km < 70 THEN 25 ELSE 0 END +
      |        CASE WHEN mag >= 7.0 THEN 30 ELSE 0 END + 1e-9, 1) + 0 AS tsunami_risk_score,
      |  CASE WHEN mercalli_intensity >= 8 THEN 'EXTREME'
      |       WHEN mercalli_intensity >= 6 THEN 'HIGH'
      |       WHEN mercalli_intensity >= 4 THEN 'MODERATE'
      |       WHEN mercalli_intensity >= 2 THEN 'LOW'
      |       ELSE 'MINIMAL' END AS damage_potential,
      |  CASE WHEN depth_km < 70 THEN 'SHALLOW'
      |       WHEN depth_km < 300 THEN 'INTERMEDIATE'
      |       ELSE 'DEEP' END AS depth_category,
      |  CASE WHEN mag >= 7 THEN 'CRITICAL'
      |       WHEN mag >= 6 THEN 'HIGH'
      |       WHEN mag >= 5 THEN 'MODERATE'
      |       WHEN mag >= 4 THEN 'LOW'
      |       ELSE 'MINIMAL' END AS risk_level,
      |  (mag >= 7.0 AND depth_km < 70.0) AS tsunami_potential
      |FROM derived
      |ORDER BY event_id""".stripMargin
  ) { (spark, dir) =>
    val mag = col("value") / 50
    val depth = col("value")
    val mmi = Physics.mercalliIntensity(mag, depth)
    Tables.load(spark, dir, "events")
      .select(
        col("event_id"),
        round(mag + lit(1e-9), 2).as("magnitude"),
        round(depth, 2).as("depth_km"),
        Physics.energyJoulesLog(mag).as("energy_joules_log"),
        mmi.as("mercalli_intensity"),
        Physics.mercalliScale(mmi).as("mercalli_scale"),
        Physics.seismicMomentLog(mag).as("seismic_moment_log"),
        Physics.ruptureLengthKm(mag).as("rupture_length_km"),
        Physics.expectedAftershockMag(mag).as("expected_aftershock_mag"),
        Physics.tsunamiRiskScore(mag, depth).as("tsunami_risk_score"),
        Physics.damagePotential(mmi).as("damage_potential"),
        Physics.depthCategory(depth).as("depth_category"),
        Physics.riskLevel(mag).as("risk_level"),
        Physics.tsunamiPotential(mag, depth).as("tsunami_potential"))
      .orderBy(col("event_id"))
  }

  /** A11 physics regional summary (`calculations.py:212-220`): grouped
    * averages of the derived measures + extreme/high conditional counts,
    * here grained by mercalli_scale.
    */
  val physicsSummary: QuerySpec = QuerySpec.sql(
    "q17_physics_summary",
    s"""WITH derived AS (
      |  SELECT value / 50 AS mag, value AS depth_km,
      |    round(1.5 * (value / 50) - 2.5 * log10(value + 1) + 2.0 + 1e-9, 1) + 0 AS mmi,
      |    round((value / 50) * 15 - value * 0.2 +
      |          CASE WHEN value < 70 THEN 25 ELSE 0 END +
      |          CASE WHEN value / 50 >= 7.0 THEN 30 ELSE 0 END + 1e-9, 1) + 0 AS tsunami_score
      |  FROM events)
      |SELECT CASE WHEN mmi >= 10 THEN 'X+ (Extreme)'
      |            WHEN mmi >= 8 THEN 'VIII-IX (Severe)'
      |            WHEN mmi >= 6 THEN 'VI-VII (Strong)'
      |            WHEN mmi >= 4 THEN 'IV-V (Moderate)'
      |            WHEN mmi >= 2 THEN 'II-III (Weak)'
      |            ELSE 'I (Not Felt)' END AS mercalli_scale,
      |  count(*) AS n_events,
      |  ${Stable.avg4Sql("mag")} AS avg_magnitude,
      |  ${Stable.avg4Sql("mmi")} + 0 AS avg_mmi,
      |  ${Stable.avg4Sql("tsunami_score")} + 0 AS avg_tsunami_score,
      |  CAST(sum(CASE WHEN mmi >= 8 THEN 1 ELSE 0 END) AS BIGINT) AS extreme_events,
      |  CAST(sum(CASE WHEN mmi >= 6 AND mmi < 8 THEN 1 ELSE 0 END) AS BIGINT) AS high_events
      |FROM derived
      |GROUP BY 1
      |ORDER BY mercalli_scale""".stripMargin
  ) { (spark, dir) =>
    val mag = col("value") / 50
    val depth = col("value")
    val derived = Tables.load(spark, dir, "events")
      .select(
        mag.as("mag"),
        Physics.mercalliIntensity(mag, depth).as("mmi"),
        Physics.tsunamiRiskScore(mag, depth).as("tsunami_score"))
    derived
      .groupBy(Physics.mercalliScale(col("mmi")).as("mercalli_scale"))
      .agg(
        count(lit(1)).as("n_events"),
        Stable.avg4(col("mag")).as("avg_magnitude"),
        Stable.avg4(col("mmi")).as("avg_mmi"),
        Stable.avg4(col("tsunami_score")).as("avg_tsunami_score"),
        sum(when(col("mmi") >= 8, 1).otherwise(0)).as("extreme_events"),
        sum(when(col("mmi") >= 6 && col("mmi") < 8, 1).otherwise(0))
          .as("high_events"))
      .orderBy(col("mercalli_scale"))
  }

  val all: Seq[QuerySpec] = Seq(physicsEnrich, physicsSummary)
}
