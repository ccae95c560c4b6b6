package graft.sources

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared tombstone mechanics for on-disk index layouts
  * ([[graft.operators.IvfAnn]] cells, [[graft.operators.LshIndex]]
  * band rows): a LOGICAL delete is an O(|deletes|) append-only marker
  * file under `<layout>/_tombstones` — the underscore prefix keeps it
  * invisible to the layout's own scan — read back by explicit part
  * file (passing the underscore dir as a read root rides a
  * hidden-name exemption and emits the "All paths were ignored" WARN,
  * the [[graft.layout.StatsManifest]] rationale). Serving layers
  * anti-join the marker set at probe time (broadcast while the marker
  * set is small — see [[MaxBroadcastBytes]]); compaction applies
  * markers physically, and its publish swap replaces the whole
  * directory, clearing the markers with the old layout. The delete
  * path never rewrites data.
  *
  * Lifecycle invariants the index layers rely on:
  *  - a RE-ADMITTED id must not stay masked: append paths call
  *    [[unmark]] so a delete-then-readmit cycle serves the new rows
  *    instead of silently losing the document at the next compaction;
  *  - markers appended DURING a compaction survive it: compactors
  *    snapshot the marker file list up front ([[fileSnapshot]]) and
  *    carry any file that appeared since into the staged layout
  *    ([[carryInto]]) before the publish swap. The residual window is
  *    the swap's rename itself — covered by the layouts' documented
  *    single-writer contract (readers stay lock-free throughout).
  */
object Tombstones {

  /** Fixed marker column name — readers need no schema negotiation
    * with the layout's id column (the anti-join renames at probe time).
    */
  val Col = "__deleted_id"

  private val Dir = "_tombstones"

  /** Above this many marker BYTES on disk, [[filterLive]] stops
    * force-broadcasting and lets the planner choose (a bulk purge
    * backlog between compactions must degrade to a shuffle anti-join,
    * not OOM the driver). Parquet bytes understate row width, so the
    * guard is deliberately far below the executor broadcast budget.
    */
  val MaxBroadcastBytes: Long = 64L << 20

  private def markerDir(layoutPath: String) = new Path(s"$layoutPath/$Dir")

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The marker dir's current part files (empty when none exist). */
  private def partFiles(spark: SparkSession,
      layoutPath: String): Seq[org.apache.hadoop.fs.FileStatus] = {
    val dir = markerDir(layoutPath)
    val f = fs(spark, dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toIndexedSeq
      .filter(_.getPath.getName.startsWith("part-"))
  }

  /** Append ids as tombstone markers — O(|ids|), new file only. */
  def write(spark: SparkSession, layoutPath: String, ids: DataFrame,
      idCol: String): Unit =
    ids.select(col(idCol).as(Col)).distinct()
      .write.mode("append").parquet(s"$layoutPath/$Dir")

  /** The layout's pending markers (None when nothing was deleted). */
  def read(spark: SparkSession, layoutPath: String): Option[DataFrame] = {
    val files = partFiles(spark, layoutPath).map(_.getPath.toString)
    if (files.isEmpty) None else Some(spark.read.parquet(files: _*))
  }

  /** Clear markers for RE-ADMITTED ids: rewrite the marker set minus
    * `ids` through the crash-safe publish swap. Without this, a
    * forgotten-then-reingested document's stale marker hides its new
    * rows at probe time and the next compaction drops them physically
    * — a silent permanent loss (round-8 advice). O(markers), which is
    * bounded by compaction cadence; a no-op when no marker matches.
    *
    * Contract: until the next compaction the layout holds the id's OLD
    * rows and the re-admitted ones side by side. For the index layouts
    * here rows are a deterministic function of content, so a same-
    * content readmit yields exact duplicate rows — harmless to the
    * probe paths (candidate joins are DISTINCT; a search may transiently
    * repeat a neighbor). Re-ingesting an id with CHANGED content must
    * compact between the delete and the readmit, or both versions serve.
    */
  def unmark(spark: SparkSession, layoutPath: String, ids: DataFrame,
      idCol: String): Unit =
    read(spark, layoutPath).foreach { ts =>
      val doomed = ids.select(col(idCol).as(Col)).distinct()
      // cheap pre-check: most appends carry no previously-deleted id,
      // and the common path must not rewrite the marker dir every batch
      if (!ts.join(doomed, Seq(Col), "left_semi").isEmpty) {
        val remaining = ts.join(doomed, Seq(Col), "left_anti")
        if (remaining.isEmpty) {
          // nothing left to mask — drop the marker dir entirely so
          // readers keep the "None when nothing was deleted" contract
          val dir = markerDir(layoutPath)
          fs(spark, dir).delete(dir, true)
        } else {
          val staged = s"$layoutPath/$Dir.__new__"
          remaining.write.mode("overwrite").parquet(staged)
          Tables.publish(spark, staged, s"$layoutPath/$Dir")
        }
      }
    }

  /** Marker part-file names at a point in time — take this BEFORE a
    * compaction reads the markers it will apply.
    */
  def fileSnapshot(spark: SparkSession, layoutPath: String): Set[String] =
    partFiles(spark, layoutPath).map(_.getPath.getName).toSet

  /** Copy marker files that appeared since `snapshot` into the STAGED
    * layout's marker dir, so deletes written while a compaction was
    * running survive its publish swap instead of vanishing with the
    * old directory (the right-to-be-forgotten failure mode). Returns
    * how many files were carried.
    */
  def carryInto(spark: SparkSession, layoutPath: String,
      snapshot: Set[String], stagedPath: String): Int = {
    val late = partFiles(spark, layoutPath)
      .filterNot(st => snapshot.contains(st.getPath.getName))
    if (late.nonEmpty) {
      val dstDir = markerDir(stagedPath)
      val f = fs(spark, dstDir)
      f.mkdirs(dstDir)
      late.foreach { st =>
        FileUtil.copy(f, st.getPath, f,
          new Path(dstDir, st.getPath.getName), false,
          spark.sparkContext.hadoopConfiguration)
      }
    }
    late.size
  }

  /** `df` minus tombstoned rows: an anti-join on `idCol` against the
    * marker set — broadcast while the markers are small, planner's
    * choice past [[MaxBroadcastBytes]] — or `df` unchanged when no
    * markers exist.
    */
  def filterLive(spark: SparkSession, layoutPath: String, df: DataFrame,
      idCol: String,
      maxBroadcastBytes: Long = MaxBroadcastBytes): DataFrame = {
    val files = partFiles(spark, layoutPath)
    if (files.isEmpty) df
    else {
      val ts0 = spark.read.parquet(files.map(_.getPath.toString): _*)
      val ts = if (files.map(_.getLen).sum <= maxBroadcastBytes)
        broadcast(ts0) else ts0
      df.join(ts, df(idCol) === ts(Col), "left_anti")
    }
  }
}
