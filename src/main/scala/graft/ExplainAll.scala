package graft

/** Dev utility: dump `.explain("formatted")` for a list of queries into
  * per-query text files (one JVM, so shared bases build once and every
  * lifecycle side effect runs exactly as in a sweep).
  *
  * Usage: runMain graft.ExplainAll <outDir> <suffix> <name,name,...> [sfDir]
  *   → <outDir>/<qNN>_<suffix>.txt
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: graft.ExplainAll <outDir> <suffix> <name,...> [sfDir]")
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val spark = Sessions.local("graft-explain")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val df =
        try fn(spark, sfDir)
        catch { case e: Throwable =>
          System.err.println(s"[explain] $name failed: ${e.getMessage}")
          null
        }
      if (df != null) {
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir,
            s"${Bench.short(name)}_$suffix.txt"),
          (s"== $name ($sfDir) ==\n" + plan)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      CacheScope.releaseAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
