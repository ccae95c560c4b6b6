package graft

/** Dev utility: per-JOB attribution for one named query — which action
  * (call site) submitted each Spark job and how long it ran. The
  * round-12/13 profiling showed sf0.1 wall is job-count bound (~90 ms
  * fixed cost per job), so the optimization lever is WHICH actions run,
  * and this prints exactly that.
  *
  * Usage: runMain graft.JobTrace <queryName> [sfDir]
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Sessions.local(s"graft-trace-$name")
    val fn = SparkEntry.queries(name)
    // warmup (JIT + shared-base builds) outside the traced run
    SparkEntry.entry(spark).count()
    fn(spark, sfDir).count()
    CacheScope.releaseAll()
    spark.catalog.clearCache()

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, String, Long)]()
    val done = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val execs = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse(j.stageInfos.headOption.map(_.name).getOrElse("?"))
        val execId = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
          .getOrElse("-")
        jobs.put(j.jobId, (site, execId, j.time))
      }
      override def onJobEnd(
          j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        done.put(j.jobId, j.time)
      override def onOtherEvent(
          e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
        case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          execs.put(s.executionId, s.description.linesIterator.next())
        case _ => ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    org.apache.spark.graftglue.ListenerGlue.flush(spark.sparkContext)
    spark.sparkContext.removeSparkListener(listener)

    import scala.jdk.CollectionConverters._
    val rows = jobs.asScala.toSeq.sortBy(_._1)
    println(f"[jobtrace] $name: ${rows.size} jobs, wall=$wall%.2f s")
    rows.foreach { case (id, (site, execId, start)) =>
      val dur = done.asScala.get(id).map(e => f"${(e - start) / 1000.0}%.2f s")
        .getOrElse("?")
      val desc = execId.toLongOption.flatMap(i => execs.asScala.get(i))
        .filter(_ != site).map(d => s"  <- $d").getOrElse("")
      println(f"[jobtrace] job $id%3d $dur%9s  $site$desc")
    }
    spark.stop()
  }
}
