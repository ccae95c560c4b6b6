package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev micro-benchmark: custom TopKPerKeyExec vs Spark's native window
  * path (`InferWindowGroupLimit`'s sort-based rank limiting) across key
  * cardinalities, on 10M synthetic rows. The window side EXCLUDES
  * `RewriteWindowTopK` — without that, both branches plan the custom
  * operator and the comparison silently measures custom-vs-custom
  * (round 6 found exactly that bug in this bench; the 5-6× round-3
  * number predates `InferWindowGroupLimit` kicking in here).
  *
  * Usage: runMain graft.TopKBench
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("topk-bench")
    val n = 10000000L
    def timeMin(f: => Long): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min

    def bench(keys: Long, k: Int): Unit = {
      val df = spark.range(n)
        .select(col("id"), (col("id") % keys).as("k"),
          ((col("id") * 2654435761L) % 1000000).as("v"))
        .persist()
      df.count() // materialize input outside timing
      val order = Seq(col("v").desc, col("id").asc)
      val tCustom = timeMin(
        operators.Dedup.topKPerKey(df, Seq("k"), order, k).count())
      spark.conf.set("spark.sql.optimizer.excludedRules",
        "graft.plans.RewriteWindowTopK")
      val tNative = timeMin {
        df.withColumn("rn", row_number().over(
            Window.partitionBy(col("k")).orderBy(order: _*)))
          .filter(col("rn") <= k).drop("rn").count()
      }
      spark.conf.unset("spark.sql.optimizer.excludedRules")
      println(f"[topkbench] keys=$keys%-8d k=$k%-3d custom=$tCustom%.2f s " +
        f"native-window=$tNative%.2f s custom/native=${tCustom / tNative}%.2f")
      df.unpersist()
    }
    bench(100L, 5); bench(10000L, 5); bench(100000L, 5); bench(1000000L, 5)
    bench(100000L, 1); bench(1000000L, 1)

    // flush-path cost: a sub-cardinality budget forces partial-stage
    // flushes; the number to watch is how smoothly map-side reduction
    // degrades toward pass-through as the budget shrinks
    val df = spark.range(n)
      .select(col("id"), (col("id") % 100000).as("k"),
        ((col("id") * 2654435761L) % 1000000).as("v"))
      .persist()
    df.count()
    Seq(1 << 16, 1 << 12).foreach { budget =>
      spark.conf.set(graft.plans.TopKPerKeyExec.PartialMaxKeysKey,
        budget.toString)
      val t = timeMin(operators.Dedup.topKPerKey(df, Seq("k"),
        Seq(col("v").desc, col("id").asc), 5).count())
      println(f"[topkbench] flush budget=$budget%-6d keys=100000 k=5: $t%.2f s")
    }
    spark.conf.unset(graft.plans.TopKPerKeyExec.PartialMaxKeysKey)
    spark.stop()
  }
}
