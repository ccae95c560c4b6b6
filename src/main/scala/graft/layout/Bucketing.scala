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
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table) // Overwrite drops and recreates, bucket spec included

  /** Join two same-bucketed catalog tables on their bucket key. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
