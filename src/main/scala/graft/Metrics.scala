package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.graftglue.ListenerGlue
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Execution-level metrics for one action: bytes scanned, bytes moved
  * through shuffles, bytes spilled. `.explain` shows the plan SHAPE;
  * this shows what the shape COSTS — the judge of a rewrite at scale is
  * its shuffle volume, not its wall clock at sf0.1 (wall clock here is
  * dominated by fixed overheads that vanish at 1000 executors, while
  * shuffle bytes scale linearly with data).
  *
  * Listener-based (aggregated per-stage task metrics), so it measures
  * ANY action without touching the query code. Single-JVM local mode
  * runs everything it would on a cluster except the network hop — a
  * local shuffle byte is a remote shuffle byte at scale.
  */
final case class PlanMetrics(
    wallSec: Double,
    inputBytes: Long,
    inputRecords: Long,
    shuffleWriteBytes: Long,
    shuffleReadBytes: Long,
    spilledBytes: Long,
    jobs: Long = 0,
    stages: Long = 0) {
  def pretty: String =
    f"wall=$wallSec%.2fs input=${inputBytes / 1e6}%.1fMB/" +
      f"$inputRecords%d rows shuffleWrite=${shuffleWriteBytes / 1e6}%.2fMB " +
      f"shuffleRead=${shuffleReadBytes / 1e6}%.2fMB " +
      f"spilled=${spilledBytes / 1e6}%.1fMB jobs=$jobs stages=$stages"
}

object Metrics {

  /** Run `action` and return its aggregate stage metrics. Metrics from
    * OTHER concurrently-running jobs on the same context would be
    * counted too — callers own quiescence (true for Bench/RunOne/specs).
    */
  def measure(spark: SparkSession)(action: => Unit): PlanMetrics = {
    val input = new LongAdder
    val inputRecs = new LongAdder
    val sw = new LongAdder
    val sr = new LongAdder
    val spill = new LongAdder
    val jobs = new LongAdder
    val stages = new LongAdder
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.increment()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          input.add(m.inputMetrics.bytesRead)
          inputRecs.add(m.inputMetrics.recordsRead)
          sw.add(m.shuffleWriteMetrics.bytesWritten)
          sr.add(m.shuffleReadMetrics.totalBytesRead)
          spill.add(m.diskBytesSpilled + m.memoryBytesSpilled)
        }
        stages.increment()
      }
    }
    val sc = spark.sparkContext
    sc.addSparkListener(listener)
    val t0 = System.nanoTime()
    try {
      action
      ListenerGlue.flush(sc) // async bus: drain before reading adders
    } finally sc.removeSparkListener(listener)
    PlanMetrics((System.nanoTime() - t0) / 1e9, input.sum(), inputRecs.sum(),
      sw.sum(), sr.sum(), spill.sum(), jobs.sum(), stages.sum())
  }
}
