package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every verifiable query the engine exposes, one per implemented operator
    * from SURVEY.md §2 (plus the north-star extensions).
    */
  def specs: Seq[QuerySpec] =
    GoldQueries.all ++ EventQueries.all ++ PhysicsQueries.all ++
      TextQueries.all ++ DedupQueries.all ++ SimilarityQueries.all ++
      MultimodalQueries.all ++ ReportQueries.all ++ TemporalQueries.all ++
      AnalyticsQueries.all ++ RelationalQueries.all ++ StreamingQueries.all ++
      SketchQueries.all ++ LayoutQueries.all ++ SamplingQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    GoldQueries.pricingSummary.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(s => s.name -> s.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    specs.flatMap(s => s.oracle.map(s.name -> _)).toMap
}
