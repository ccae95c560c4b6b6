package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (100 TB design, SCALING.md):
  * the reference rebuilds every gold table from the FULL silver table on
  * each daily run (`05_gold_aggregation.py` reads all of silver) — at
  * scale that is a daily full-table scan to absorb one day of rows.
  * Maintained aggregates instead keep a mergeable STATE per group
  * (count, sum, sum-of-squares, min, max) and fold each increment's
  * partial state in: work per run tracks the increment, not the table.
  *
  * All five state measures form commutative monoids, so
  * `merge(state(A), state(B)) == state(A ∪ B)` exactly for the integral
  * measures and up to float associativity for sums (the spec bounds it).
  * Derived measures (avg, sample stddev) are computed at read time from
  * the state — never stored, never drift.
  *
  * Applicability: APPEND-ONLY facts (each row contributes exactly once).
  * Under upserts an updated row would double-count; maintaining
  * aggregates over updating facts needs retraction state (old-value
  * subtraction), which is why [[graft.pipeline.SeismicPipeline]] — whose
  * silver layer is a MERGE target — keeps the reference's full gold
  * rebuild instead.
  */
object IncrementalAgg {

  /** Mergeable state of `valueCol` grouped by `keys`. */
  def partialState(df: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      count(col(valueCol)).as("state_cnt"),
      sum(col(valueCol)).as("state_sum"),
      sum(col(valueCol) * col(valueCol)).as("state_sumsq"),
      min(col(valueCol)).as("state_min"),
      max(col(valueCol)).as("state_max"))

  /** Fold an increment's partial state into the accumulated state —
    * one shuffle over (|state| + |delta|) GROUP rows, independent of
    * the fact-table size.
    */
  def merge(state: DataFrame, delta: DataFrame,
      keys: Seq[String]): DataFrame =
    state.unionByName(delta)
      .groupBy(keys.map(col): _*).agg(
        sum(col("state_cnt")).as("state_cnt"),
        sum(col("state_sum")).as("state_sum"),
        sum(col("state_sumsq")).as("state_sumsq"),
        min(col("state_min")).as("state_min"),
        max(col("state_max")).as("state_max"))

  /** Read-time derived measures from the state. */
  def finalized(state: DataFrame): DataFrame = {
    val n = col("state_cnt")
    val variance = (col("state_sumsq") - col("state_sum") * col("state_sum") / n) /
      (n - 1)
    state
      .withColumn("avg_value", col("state_sum") / n)
      .withColumn("stddev_value",
        when(n > 1, sqrt(greatest(variance, lit(0.0)))).otherwise(lit(0.0)))
  }
}
