package graft.sources

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
  * anti-join the marker set at probe time (broadcast — it is bounded
  * by compaction cadence); compaction applies markers physically, and
  * its publish swap replaces the whole directory, clearing the
  * markers with the old layout. The delete path never rewrites data.
  */
object Tombstones {

  /** Fixed marker column name — readers need no schema negotiation
    * with the layout's id column (the anti-join renames at probe time).
    */
  val Col = "__deleted_id"

  private val Dir = "_tombstones"

  /** Append ids as tombstone markers — O(|ids|), new file only. */
  def write(spark: SparkSession, layoutPath: String, ids: DataFrame,
      idCol: String): Unit =
    ids.select(col(idCol).as(Col)).distinct()
      .write.mode("append").parquet(s"$layoutPath/$Dir")

  /** The layout's pending markers (None when nothing was deleted). */
  def read(spark: SparkSession, layoutPath: String): Option[DataFrame] = {
    val dir = new org.apache.hadoop.fs.Path(s"$layoutPath/$Dir")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) None
    else {
      val files = fs.listStatus(dir).toIndexedSeq.map(_.getPath)
        .filter(_.getName.startsWith("part-")).map(_.toString)
      if (files.isEmpty) None else Some(spark.read.parquet(files: _*))
    }
  }

  /** `df` minus tombstoned rows: a broadcast anti-join on `idCol`
    * against the marker set, or `df` unchanged when no markers exist.
    */
  def filterLive(spark: SparkSession, layoutPath: String, df: DataFrame,
      idCol: String): DataFrame =
    read(spark, layoutPath) match {
      case Some(ts) =>
        df.join(broadcast(ts), df(idCol) === ts(Col), "left_anti")
      case None => df
    }
}
