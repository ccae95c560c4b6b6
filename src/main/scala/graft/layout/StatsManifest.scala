package graft.layout

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max statistics manifest + pruned reader — the
  * Delta-Lake-style data-skipping layer above parquet's own row-group
  * stats (SURVEY.md §4; the reference leans on Delta's
  * `dataSkippingNumIndexedCols` implicitly via `OPTIMIZE ZORDER`,
  * `TABLE OPTIMIZATION.py:33-97`).
  *
  * Row-group pruning ([[Optimize.cluster]]) still OPENS every file to
  * read its footer; at 100 TB / millions of files the footer pass is
  * itself the bottleneck. A manifest holding per-FILE `[min, max]`
  * windows for the clustered columns lets the reader drop whole files
  * from the scan list before any footer I/O — the same contract as
  * Delta's `stats` column or Iceberg's manifest entries, here as a plain
  * parquet sidecar under `path/_graft_stats` (the leading underscore
  * keeps it invisible to normal directory scans, like `_metadata`).
  *
  * The manifest is O(#files) and the pruned listing is a driver-side
  * filter over it — the same footprint as the file index every reader
  * already holds. Correctness does NOT depend on the manifest: callers
  * re-apply the exact predicate after the pruned read (pruning is a
  * superset guarantee), so a stale-but-superset manifest degrades to
  * extra I/O, never wrong answers.
  */
object StatsManifest {

  val StatsDir = "_graft_stats"

  /** Range-cluster `df` on `statsCols` into `targetFiles` files at
    * `path`, then build the per-file min/max manifest in ONE scan of the
    * written files. Clustering first is what makes the windows tight —
    * a random layout gives every file the full value range and the
    * manifest prunes nothing (exactly the z-order rationale,
    * [[Optimize.cluster]]).
    */
  def write(df: DataFrame, path: String, statsCols: Seq[String],
      targetFiles: Int): Unit = {
    val spark = df.sparkSession
    val cs = statsCols.map(col)
    df.repartitionByRange(targetFiles, cs: _*)
      .sortWithinPartitions(cs: _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
    // min/max ignore nulls; an all-null file gets null stats and is
    // (correctly) never selected by a range predicate on that column
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    spark.read.parquet(path)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/$StatsDir")
  }

  /** Scan of `path` pruned to the files whose `[min, max]` window on
    * `colName` intersects `[lo, hi]` (inclusive). The returned frame
    * still contains every out-of-range row the surviving files hold —
    * callers apply the exact predicate on top (superset contract).
    */
  def readPruned(spark: SparkSession, path: String, colName: String,
      lo: Any, hi: Any): DataFrame = {
    val m = spark.read.parquet(manifestFiles(spark, path): _*)
      // NOT (window misses range); null stats → null predicate → dropped
      .filter(!(col(s"max_$colName") < lit(lo) ||
        col(s"min_$colName") > lit(hi)))
    val files = m.select("file").collect().map(_.getString(0)).toIndexedSeq
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        spark.read.parquet(path).schema)
    else spark.read.parquet(files: _*)
  }

  /** The manifest's data files, listed explicitly. Passing the
    * underscore-prefixed sidecar DIR as a read root works only through
    * the hidden-name exemption for explicitly-passed roots, and emits
    * Spark's "All paths were ignored" WARN on every read; naming the
    * part files sidesteps both. One driver-side listing of a
    * single-file directory — no data I/O.
    */
  private def manifestFiles(spark: SparkSession, path: String): Seq[String] = {
    val dir = new org.apache.hadoop.fs.Path(s"$path/$StatsDir")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(dir).toIndexedSeq
      .map(_.getPath)
      .filter(p => p.getName.startsWith("part-"))
      .map(_.toString)
  }
}
