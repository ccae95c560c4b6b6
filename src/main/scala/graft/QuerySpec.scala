package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (when SQL-expressible)
  * an ANSI-SQL oracle the driver runs in DuckDB over the same parquet tables.
  *
  * Conventions that keep the driver's hash-compare stable:
  *  - every computed column is aliased identically in Spark and SQL;
  *  - float measures are rounded in-query on both sides;
  *  - output carries a total order (ORDER BY on a unique key) so row order
  *    is deterministic regardless of partitioning.
  */
final case class QuerySpec(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QuerySpec {
  def sql(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, run, Some(oracle))

  /** Non-SQL-expressible op → driver records a weaker rows-only check. */
  def rowsOnly(name: String)(
      run: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, run, None)
}
