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
    // Overwrite drops a table known to THIS catalog, but a managed-table
    // location can survive a previous JVM whose (in-memory) catalog died
    // with it — CREATE then fails with LOCATION_ALREADY_EXISTS. Drop and
    // clear the leftover location so the write is idempotent across
    // sessions.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(wh, true)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table) // Overwrite drops and recreates, bucket spec included
  }

  /** Join two same-bucketed catalog tables on their bucket key. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
