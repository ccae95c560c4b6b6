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

  /** One row per rule: (expectation, n_violations). Single scan.
    *
    * Empty-table safe: `sum` over zero rows is NULL in SQL, so each count
    * is coalesced to 0 — the same value the oracle's `count(*) FILTER`
    * form yields. Rule names are never parsed as SQL text (the unpivot is
    * built from typed `Column`s), so any string is a valid name.
    */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "Expectations.report needs at least one rule")
    // positional aliases: rule names never enter the parser or collide
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      coalesce(sum(when(!r.holds, 1L).otherwise(0L)), lit(0L)).as(s"__v$i")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("expectation"), col(s"__v$i").as("n_violations"))
    }
    wide.select(explode(array(entries: _*)).as("kv"))
      .select(col("kv.expectation").as("expectation"),
        col("kv.n_violations").as("n_violations"))
  }

  /** (clean, quarantined) split — one filter each over the conjunction;
    * quarantined rows carry the list of failed rule names.
    *
    * Each predicate is coalesced to the documented null semantics (a NULL
    * predicate is NOT a violation) BEFORE conjunction, so the two filters
    * partition the input exactly: a row with a NULL predicate can never
    * vanish from both sides the way a bare `allOk` / `!allOk` pair would.
    */
  def quarantine(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    require(rules.nonEmpty, "Expectations.quarantine needs at least one rule")
    val oks = rules.map(r => coalesce(r.holds, lit(true)))
    val allOk = oks.reduce(_ && _)
    val reasons = array_compact(array(rules.zip(oks).map { case (r, ok) =>
      when(!ok, r.name)
    }: _*))
    (df.filter(allOk),
      df.filter(!allOk).withColumn("failed_expectations", reasons))
  }
}
