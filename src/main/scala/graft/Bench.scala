package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-bench")
    // JIT/codegen warmup outside any measured window, then run queries in
    // name order so per-query numbers are attributable and stable.
    SparkEntry.entry(spark).count()
    var errors = 0
    // two measured runs per query, min reported: single-shot numbers on a
    // shared box carry ±40% GC/JIT noise that would swamp real regressions
    val Runs = 2
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to Runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case e: Throwable =>
          errors += 1
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val elapsed = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache() // operators persist() internally; un-time it
        elapsed
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"runs":$Runs,"agg":"min","sf":"$sfDir"}""")
    spark.stop()
  }
}
