package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udf

/** The demonstrated UDF / UDAF extension surface (SURVEY.md §2i).
  *
  * Engine stance: every reference formula ships as a native `Column`
  * expression ([[Physics]]) or codegen kernel
  * ([[graft.expressions.PolyHash]] etc.) — a Scala UDF breaks whole-stage
  * codegen and costs serialization, so these exist as the documented
  * extension POINTS, not the hot path. The reference's equivalents were
  * three Python row-at-a-time UDFs (`04_silver_transformation.py:134-152`),
  * the slowest possible tier.
  */
object Extensions {

  /** Scala-UDF form of the Gutenberg–Richter energy (null-safe). */
  val energyJoulesUdf =
    udf((mag: java.lang.Double) =>
      if (mag == null) null
      else java.lang.Double.valueOf(math.pow(10.0, 1.5 * mag + 4.8)))

  /** Typed Aggregator: total seismic energy of a group expressed in
    * log10 joules, computed stably via max-factored log-sum-exp —
    * `log10(Σ 10^e_i)` without overflowing `10^(1.5·9+4.8)`-scale terms.
    * Demonstrates the `Aggregator[IN, BUF, OUT]` extension point with a
    * non-trivial merge (partial aggregation across partitions works).
    */
  object LogEnergySum extends Aggregator[Double, (Double, Double), Double] {
    // buffer: (runningMax, Σ 10^(e - runningMax))
    def zero: (Double, Double) = (Double.NegativeInfinity, 0.0)

    def reduce(b: (Double, Double), e: Double): (Double, Double) = merge(b, (e, 1.0))

    def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) = {
      if (a._1 == Double.NegativeInfinity) b
      else if (b._1 == Double.NegativeInfinity) a
      else {
        val m = math.max(a._1, b._1)
        (m, a._2 * math.pow(10.0, a._1 - m) + b._2 * math.pow(10.0, b._1 - m))
      }
    }

    def finish(b: (Double, Double)): Double =
      if (b._1 == Double.NegativeInfinity) Double.NegativeInfinity
      else b._1 + math.log10(b._2)

    def bufferEncoder: Encoder[(Double, Double)] = Encoders.tuple(
      Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Register both under stable SQL names so `spark.sql` text can call
    * them (`energy_joules_udf`, `log_energy_sum`).
    */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("energy_joules_udf", energyJoulesUdf)
    spark.udf.register("log_energy_sum",
      org.apache.spark.sql.functions.udaf(LogEnergySum))
  }
}
