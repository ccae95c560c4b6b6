package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Source-format breadth (SURVEY.md §2a): ORC ships in Spark's core
  * distribution, so the engine reads/writes it with the same DataFrame
  * surface as parquet. The spec round-trips a fixture table and requires
  * BIT-IDENTICAL content back, plus predicate pushdown reaching the ORC
  * scan (the same scan-level contract the parquet queries rely on).
  */
class OrcRoundtripSpec extends SparkTestBase {

  test("orc roundtrip preserves the events table exactly") {
    val dir = java.nio.file.Files.createTempDirectory("orc_rt").toString
    val ev = Tables.load(spark, sfDir, "events")
    ev.write.mode("overwrite").orc(s"$dir/events_orc")
    val back = spark.read.orc(s"$dir/events_orc")
    assert(back.schema == ev.schema)
    assert(back.count() == ev.count())
    // full symmetric difference must be empty (exact content equality)
    assert(back.exceptAll(ev).isEmpty && ev.exceptAll(back).isEmpty)
  }

  test("filters push down into the ORC scan") {
    val dir = java.nio.file.Files.createTempDirectory("orc_pd").toString
    Tables.load(spark, sfDir, "events")
      .write.mode("overwrite").orc(s"$dir/ev")
    val plan = spark.read.orc(s"$dir/ev")
      .filter(col("user_id") === 7L).select(col("event_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)"),
      s"no pushed filter in:\n$plan")
  }
}
