package graft

import org.apache.spark.sql.functions._

/** Dev scratch: measures the interval-join rewrite's effect at a scale
  * where the nested-loop quadratic cost bites (200k × 200k rows → 4·10¹⁰
  * timestamp comparisons naive; rows-per-bin linear work rewritten).
  * Not part of the shipped surface.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("plan-probe")
    val n = 200000L
    // two synthetic streams spread over ~23 days, deterministic
    spark.range(n).select(
        col("id").as("event_id"),
        timestamp_micros(lit(1704067200000000L) + col("id") * 10000000L +
          (col("id") % 97) * 13L).as("ts"))
      .createOrReplaceTempView("errors")
    spark.range(n).select(
        col("id").as("event_id"),
        timestamp_micros(lit(1704067200000000L) + col("id") * 10000000L +
          (col("id") % 89) * 7919L).as("ts"))
      .createOrReplaceTempView("signups")
    val sql =
      """SELECT count(*) AS n FROM signups s JOIN errors e
        |  ON e.ts > s.ts AND e.ts <= s.ts + INTERVAL 5 MINUTES""".stripMargin
    def time(label: String): Unit = {
      val t0 = System.nanoTime()
      val r = spark.sql(sql).collect()(0).getLong(0)
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r pairs)")
    }
    time("rewritten(warm0)")
    time("rewritten")
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "graft.plans.RewriteIntervalJoin")
    time("nested-loop")
    spark.conf.unset("spark.sql.optimizer.excludedRules")
    spark.stop()
  }
}
