package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Partition-order-invariant float aggregates, paired with DuckDB-oracle SQL
  * twins.
  *
  * Spark's shuffle reduce side merges partial aggregates in fetch-arrival
  * order, so `sum`/`avg` over `DoubleType` can differ in the last ulp from
  * run to run — occasionally enough to flip the last digit of a
  * `round(..., 4)` measure against the oracle (observed once on
  * `q08_daily_rolling` across ~2.4 k groups). Summing through
  * `DECIMAL(28,10)` removes the nondeterminism: the cast rounds each value
  * to a fixed 1e-10 grid the same way in both engines (nearest; exact ties
  * don't occur for data doubles), decimal addition is exact, and the single
  * cast back to double of an exact sum is identical everywhere. The result
  * no longer depends on partition count, merge order, or scheduling.
  *
  * At 100 TB this costs one decimal column per measure inside the partial
  * aggregate — still codegen'd, no extra shuffle — and buys reproducible
  * results across cluster re-runs, which matters for incremental/CDC
  * pipelines that diff snapshots.
  */
object Stable {
  private val Dec = DecimalType(28, 10)

  /** Exact double sum: decimal-backed, one cast back at the end. */
  def sumD(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** `round(avg(c) + 1e-6, 4)` with an exact numerator; `count(c)` (not
    * `count(*)`) preserves avg's ignore-nulls semantics.
    */
  def avg4(c: Column): Column = round(sumD(c) / count(c) + lit(1e-6), 4)

  /** `round(sum(c) + 1e-9, 2)` with an exact sum. The 1e-9 nudge makes
    * grid-exact `.xx5` ties (e.g. sums of price·(1−discount) on the 1e-4
    * grid) round up in both engines instead of splitting on HALF_UP vs
    * scaled-multiply semantics.
    */
  def sum2(c: Column): Column = round(sumD(c) + lit(1e-9), 2)

  // --- SQL twins (DuckDB oracle) — keep textually parallel to the above ---

  def sumDSql(e: String): String =
    s"CAST(sum(CAST(($e) AS DECIMAL(28,10))) AS DOUBLE)"

  def avg4Sql(e: String): String =
    s"round(${sumDSql(e)} / count($e) + 1e-6, 4)"

  def sum2Sql(e: String): String =
    s"round(${sumDSql(e)} + 1e-9, 2)"
}
