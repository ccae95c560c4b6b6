package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Spark's runtime bloom-filter join pruning (`InjectRuntimeFilter`) is
  * part of this engine's 100 TB story: when a fact-to-filtered-dim join
  * cannot broadcast, the optimizer builds a bloom filter from the dim's
  * join keys at runtime and applies it to the fact scan BEFORE the
  * shuffle — the fact side's shuffle volume tracks the dim's
  * selectivity instead of the fact's raw size. This spec pins the plan
  * shape so the capability (and the confs that gate it) stays
  * documented and working.
  *
  * The thresholds are sized for clusters (application side must scan >
  * `applicationSideScanSizeThreshold`, 10 GB by default), so the spec
  * lowers them to fire on fixture-sized data; on a real deployment the
  * defaults already target exactly the joins that need it.
  */
class RuntimeFilterSpec extends SparkTestBase {

  test("a non-broadcast fact-dim join gets a runtime bloom filter on the fact scan") {
    val dir = Files.createTempDirectory("graft_rtf").toString
    spark.range(100000)
      .select(col("id").as("k"), (col("id") % 1000).as("payload"))
      .write.parquet(s"$dir/fact")
    spark.range(5000)
      .select(col("id").as("k"), (col("id") % 7).as("flag"))
      .write.parquet(s"$dir/dim")

    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("flag") === 3)
      val joined = fact.join(dim, "k")
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") &&
        plan.contains("bloom_filter_agg"), plan.take(3000))
      // and the filter sits on the FACT side, pre-shuffle
      val physical = joined.queryExecution.executedPlan.toString
      assert(physical.contains("might_contain"), physical.take(3000))
      // correctness unchanged by the injected filter: dim ids 3,10,...
      // below 5000 — 714 of them, each matching one fact row
      assert(joined.count() == 714)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
