package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev micro-benchmark: custom TopKPerKeyExec vs the window formulation
  * on synthetic data (10M rows, 100k keys). Usage: runMain graft.TopKBench
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("topk-bench")
    val n = 10000000L
    val df = spark.range(n)
      .select(col("id"),
        (col("id") % 100000).as("k"),
        ((col("id") * 2654435761L) % 1000000).as("v"))
      .persist()
    df.count() // materialize input outside timing

    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val rows = f
        println(f"[topkbench] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
      }
    }
    time("window ") {
      df.withColumn("rn", row_number().over(
          Window.partitionBy(col("k")).orderBy(col("v").desc, col("id"))))
        .filter(col("rn") <= 5).drop("rn").count()
    }
    time("custom ") {
      graft.operators.Dedup.topKPerKey(df, Seq("k"),
        Seq(col("v").desc, col("id").asc), 5).count()
    }
    spark.stop()
  }
}
