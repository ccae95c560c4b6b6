package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Seismic physics derivations as native Column expressions
  * (SURVEY.md §2i). The reference computes these in `calculations.py:66-116`
  * and three silver-layer Python row-at-a-time UDFs
  * (`04_silver_transformation.py:134-152`); here every formula is a codegen'd
  * Catalyst expression — no serialization boundary, stays inside
  * whole-stage codegen. Constants are the published formulas
  * (Gutenberg–Richter, Wells–Coppersmith 1994, Båth's law).
  */
object Physics {

  /** Rounding epsilon. The fixture's `value` column has 2-decimal
    * granularity, so derived measures (e.g. `1.5*value/50 + 9.1`) land
    * EXACTLY on .xx5 rounding ties; Spark (BigDecimal HALF_UP on the
    * double's exact expansion) and DuckDB (scaled-multiply) then round a
    * tie-adjacent double in opposite directions. Nudging by 1e-9 — far
    * above 1-ulp engine noise, far below the data's granularity — makes
    * both engines round ties identically. The oracle SQL carries the same
    * nudge.
    */
  private val Eps = 1e-9

  private def r(c: Column, scale: Int): Column = round(c + lit(Eps), scale)

  /** Gutenberg–Richter energy, log10 joules (`calculations.py:66-69`). */
  def energyJoulesLog(mag: Column): Column =
    r(lit(1.5) * mag + lit(4.8), 2)

  /** Gutenberg–Richter energy in joules (silver UDF `04:134-135`). */
  def energyJoules(mag: Column): Column =
    pow(lit(10.0), lit(1.5) * mag + lit(4.8))

  /** Modified Mercalli intensity (`calculations.py:70-74`). */
  def mercalliIntensity(mag: Column, depthKm: Column): Column =
    r(lit(1.5) * mag - lit(2.5) * log10(depthKm + lit(1)) + lit(2.0), 1)

  /** Roman-numeral approximation ladder (`calculations.py:76-82`),
    * evaluated on the ROUNDED intensity, as the reference does.
    */
  def mercalliScale(mmi: Column): Column =
    when(mmi >= 10, "X+ (Extreme)")
      .when(mmi >= 8, "VIII-IX (Severe)")
      .when(mmi >= 6, "VI-VII (Strong)")
      .when(mmi >= 4, "IV-V (Moderate)")
      .when(mmi >= 2, "II-III (Weak)")
      .otherwise("I (Not Felt)")

  /** Seismic moment, log scale (`calculations.py:84-87`). */
  def seismicMomentLog(mag: Column): Column =
    r(lit(1.5) * mag + lit(9.1), 2)

  /** Wells–Coppersmith rupture length, km (`calculations.py:88-91`). */
  def ruptureLengthKm(mag: Column): Column =
    r(pow(lit(10.0), lit(0.74) * mag - lit(3.55)), 2)

  /** Båth's law largest-aftershock estimate (`calculations.py:92-95`). */
  def expectedAftershockMag(mag: Column): Column =
    r(mag - lit(1.2), 1)

  /** Reference's custom tsunami score (`calculations.py:96-105`). */
  def tsunamiRiskScore(mag: Column, depthKm: Column): Column =
    r(
      mag * lit(15) - depthKm * lit(0.2) +
        when(depthKm < 70, lit(25)).otherwise(lit(0)) +
        when(mag >= 7.0, lit(30)).otherwise(lit(0)),
      1)

  /** Damage ladder on rounded MMI (`calculations.py:106-113`). */
  def damagePotential(mmi: Column): Column =
    when(mmi >= 8, "EXTREME")
      .when(mmi >= 6, "HIGH")
      .when(mmi >= 4, "MODERATE")
      .when(mmi >= 2, "LOW")
      .otherwise("MINIMAL")

  /** Depth bucket UDF → expression (`04:137-140`). */
  def depthCategory(depthKm: Column): Column =
    when(depthKm < 70, "SHALLOW")
      .when(depthKm < 300, "INTERMEDIATE")
      .otherwise("DEEP")

  /** Magnitude risk ladder UDF → expression (`04:143-147`). */
  def riskLevel(mag: Column): Column =
    when(mag >= 7, "CRITICAL")
      .when(mag >= 6, "HIGH")
      .when(mag >= 5, "MODERATE")
      .when(mag >= 4, "LOW")
      .otherwise("MINIMAL")

  /** Boolean conjunction (`04:159-162`). */
  def tsunamiPotential(mag: Column, depthKm: Column): Column =
    mag >= 7.0 && depthKm < 70.0
}
