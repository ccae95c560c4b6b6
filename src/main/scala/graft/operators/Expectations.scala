package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the engine-level analog of the
  * reference's operational DQ notebook (`03_bronze_processing.py:33-77`
  * null audits / range validation) and of Delta Live Tables-style
  * expectation clauses: each constraint is a named boolean `Column`, and
  * the whole set is evaluated in ONE pass over the table (a single
  * aggregate of `sum(when(violated, 1))` per rule — the reference's
  * notebook re-scanned the table once per audited column).
  *
  * Row-level FK/existence rules don't fit a scalar predicate; they are
  * expressed as a separate anti-join count and unioned into the same
  * report shape. [[quarantine]] is the enforcement side: one filter on
  * the conjunction, bad rows kept with a reason bitmap, so a pipeline
  * can route them to a dead-letter table instead of dropping them.
  */
object Expectations {

  final case class Rule(name: String, holds: Column)

  /** One row per rule: (expectation, n_violations). Single scan. */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = rules.map(r =>
      sum(when(!r.holds, 1L).otherwise(0L)).as(r.name))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot to (expectation, n_violations) rows via stack
    val stackArgs = rules.map(r => s"'${r.name}', ${r.name}").mkString(", ")
    wide.selectExpr(
      s"stack(${rules.size}, $stackArgs) AS (expectation, n_violations)")
  }

  /** (clean, quarantined) split — one filter each over the conjunction;
    * quarantined rows carry the list of failed rule names.
    */
  def quarantine(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val allOk = rules.map(_.holds).reduce(_ && _)
    val reasons = array_compact(array(rules.map(r =>
      when(!r.holds, r.name)): _*))
    (df.filter(allOk),
      df.filter(!allOk).withColumn("failed_expectations", reasons))
  }
}
