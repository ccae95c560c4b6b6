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

  /** Route JVM scratch I/O (streaming temp checkpoints, shuffle spill
    * via `spark.local.dir`'s java.io.tmpdir default, [[Scratch]] gate
    * layouts) to tmpfs when the host has one: the ten streamed gates
    * each fsync a commit log + state store per micro-batch, and on the
    * sandbox's disk-backed /tmp those fsyncs dominate sub-second
    * batches. On a real cluster this is the usual
    * `spark.local.dir`-on-local-SSD deployment choice, expressed once
    * here. Must run BEFORE the first SparkSession is built (Spark reads
    * java.io.tmpdir lazily at SparkEnv creation); idempotent; falls
    * back silently to the default tmpdir when /dev/shm is absent.
    * Residue on tmpfs stays bounded for the same reason Scratch's is:
    * temp checkpoints are force-deleted on query stop and Scratch
    * layouts are overwrite-per-name.
    *
    * The redirect also moves `spark.local.dir` SHUFFLE SPILL onto RAM —
    * and spill happens exactly under memory pressure, so on a host with
    * a small /dev/shm that converts a slow run into ENOSPC/OOM. Guard:
    * redirect only when the tmpfs has real headroom
    * ([[MinTmpfsHeadroomBytes]] usable), else keep the disk default.
    */
  private[graft] val MinTmpfsHeadroomBytes: Long = 8L << 30

  private[graft] def tmpfsHasHeadroom(p: java.nio.file.Path): Boolean =
    try java.nio.file.Files.getFileStore(p).getUsableSpace >=
      MinTmpfsHeadroomBytes
    catch { case _: java.io.IOException => false }

  private lazy val scratchToTmpfs: Unit = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (sys.env.getOrElse("SPARK_GRAFT_TMPFS", "1") != "0" &&
        java.nio.file.Files.isDirectory(shm) &&
        java.nio.file.Files.isWritable(shm) &&
        tmpfsHasHeadroom(shm)) {
      val d = shm.resolve("graft_tmp")
      java.nio.file.Files.createDirectories(d)
      sys.props("java.io.tmpdir") = d.toString
    }
  }

  def local(appName: String = "graft"): SparkSession = {
    scratchToTmpfs
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      // custom optimizer rule + SQL functions (graft.plans.GraftExtensions)
      .withExtensions(graft.plans.GraftExtensions)
      // scale-adaptive: AQE re-coalesces batch shuffles at runtime, so
      // this is only the pre-AQE ceiling (and the STREAMING state
      // partition count, where AQE is off). Parameterised for
      // experiments; default stays the parallelism so driver benches
      // at different core counts stay comparable.
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
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
