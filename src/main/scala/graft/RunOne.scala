package graft

/** Dev utility: run a single named query with timing and an optional
  * formatted plan dump.
  *
  * Usage: runMain graft.RunOne <queryName> [sfDir] [explain] [metrics]
  *          [exclude=<rules>]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val doExplain = args.contains("explain")
    val spark = Sessions.local(s"graft-$name")
    // A/B a rewrite rule: exclude=graft.plans.RewriteIntervalJoin
    args.collectFirst { case a if a.startsWith("exclude=") =>
      spark.conf.set("spark.sql.optimizer.excludedRules", a.drop(8))
    }
    val fn = SparkEntry.queries(name)
    // warmup: flagship query plus this query at the smallest sf
    SparkEntry.entry(spark).count()
    fn(spark, "/root/testdata/sf0.001").count()
    if (doExplain) fn(spark, sfDir).explain("formatted")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[runone] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    if (args.contains("metrics")) {
      val m = Metrics.measure(spark) { fn(spark, sfDir).count() }
      println(s"[runone] $name metrics: ${m.pretty}")
    }
    spark.stop()
  }
}
