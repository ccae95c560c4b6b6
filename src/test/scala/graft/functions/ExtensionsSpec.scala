package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ExtensionsSpec extends SparkTestBase {

  test("registered UDF matches the native expression") {
    import spark.implicits._
    Extensions.register(spark)
    val df = Seq(Some(4.5), Some(7.2), None).toDF("mag")
    val out = df.select(
      expr("energy_joules_udf(mag)").as("u"),
      Physics.energyJoules(col("mag")).as("e")).collect()
    out.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(0))
      else assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6)
    }
  }

  test("LogEnergySum aggregates stably across partitions") {
    import spark.implicits._
    Extensions.register(spark)
    // energies in log10 joules, hugely spread: naive 10^x sum would be
    // dominated by float error; log-sum-exp keeps precision
    val logs = Seq(18.0, 18.0, 12.0, 5.0)
    val df = logs.toDF("elog").repartition(4)
    val got = df.agg(expr("log_energy_sum(elog)")).collect().head.getDouble(0)
    val expected = math.log10(logs.map(math.pow(10, _)).sum)
    assert(math.abs(got - expected) < 1e-12)
  }

  test("LogEnergySum of an empty group is -Infinity (log of zero energy)") {
    import spark.implicits._
    Extensions.register(spark)
    val df = Seq.empty[Double].toDF("elog")
    val got = df.agg(expr("log_energy_sum(elog)")).collect().head.getDouble(0)
    assert(got === Double.NegativeInfinity)
  }
}
