package graft

import org.apache.spark.sql.SparkSession

/** Session factory used by Verify/Bench/tests.
  *
  * Tuned for the sandbox (single-JVM `local[N]`) but with settings chosen to
  * also be the right defaults on a large cluster: AQE on (runtime re-plan,
  * skew-join splitting), shuffle partitions sized to the parallelism rather
  * than the Spark default of 200, UTC session time zone so results are
  * reproducible against the DuckDB oracle.
  */
object Sessions {
  def local(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      // custom optimizer rule + SQL functions (graft.plans.GraftExtensions)
      .withExtensions(graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS) which Spark's parquet
      // reader rejects; read as Long and convert in Tables.load.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
