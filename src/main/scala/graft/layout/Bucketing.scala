package graft.layout

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table co-located joins (SURVEY.md §4 / the 100 TB design:
  * "bucketing for co-located joins"). Writing both join sides bucketed by
  * the join key into the session catalog lets Spark plan a SortMergeJoin
  * with NO shuffle exchange on either side — at 100 TB the single
  * biggest join cost simply disappears for repeated joins on the same
  * key. The spec asserts the exchange-free plan.
  */
object Bucketing {

  /** The leftover-location cleanup below derives the managed-table dir
    * as `warehouse/<name>`, which is wrong for a database-qualified
    * `db.tbl` (it lives at `warehouse/db.db/tbl`) and would let a
    * crafted name delete an unintended warehouse path — so bucketed
    * writers only accept plain unqualified identifiers.
    */
  private def requireUnqualified(table: String): Unit =
    require(table.matches("[A-Za-z0-9_]+"),
      s"bucketed tables must be unqualified [A-Za-z0-9_]+ names, got '$table'")

  /** Drop `table` AND its default managed location. Overwrite drops a
    * table known to THIS catalog, but a managed-table location can
    * survive a previous JVM whose (in-memory) catalog died with it —
    * CREATE then fails with LOCATION_ALREADY_EXISTS. Clearing the
    * leftover location keeps writes idempotent across sessions.
    */
  private def dropWithLocation(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(wh, true)
  }

  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    writeBucketedBy(df, table, Seq(key), buckets)

  /** Multi-column bucket spec — bucket (and sort) by ALL the join keys:
    * Spark's co-partitioning check requires every join key by default
    * (`spark.sql.requireAllClusterKeysForCoPartition`), so a table
    * bucketed by a key SUBSET still shuffles under a multi-key join.
    */
  def writeBucketedBy(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int): Unit = {
    val spark = df.sparkSession
    requireUnqualified(table)
    dropWithLocation(spark, table)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table) // Overwrite drops and recreates, bucket spec included
  }

  /** [[writeBucketedBy]] for a `df` that READS FROM `table` itself (a
    * compaction folding the current bulk generation into its
    * replacement): `saveAsTable(table)` would drop the table before the
    * plan ever scans it, silently losing the old generation. The new
    * generation materializes under a staged name first — the scan runs
    * against the intact old table — and swaps in by catalog rename
    * (metadata + one directory move; the bucket spec travels with the
    * table).
    */
  def writeBucketedBySwap(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int): Unit = {
    val spark = df.sparkSession
    requireUnqualified(table)
    val staged = table + "__staged"
    writeBucketedBy(df, staged, keys, buckets)
    dropWithLocation(spark, table)
    spark.sql(s"ALTER TABLE `$staged` RENAME TO `$table`")
  }

  /** Join two same-bucketed catalog tables on their bucket key. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
