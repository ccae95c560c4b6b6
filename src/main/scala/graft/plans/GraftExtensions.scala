package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

import graft.expressions.{DotProduct, PolyHash}

/** Catalyst extension point (SURVEY.md §4 / builder tier (c)):
  * a logical optimizer rule plus SQL-function registration, injected via
  * `SparkSessionExtensions` in [[graft.Sessions]].
  */
object GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => DeriveNanosWatermarkPushdown)
    ext.injectOptimizerRule(_ => RewriteIntervalJoin)
    ext.injectOptimizerRule(_ => RewriteWindowTopK)
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    ext.injectFunction((FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"poly_hash expects 1 argument, got ${children.length}")
        PolyHash(children.head)
      }))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"dot_product expects 2 arguments, got ${children.length}")
        DotProduct(children(0), children(1))
      }))
    ext.injectFunction((FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_cosine"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"vec_cosine expects 2 arguments, got ${children.length}")
        // composition of catalyst nodes over the codegen dot kernel —
        // same tree Vectors.cosine builds
        val (a, b) = (children(0), children(1))
        Divide(DotProduct(a, b),
          Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))))
      }))
  }
}

/** Derives a parquet-pushable coarse predicate from watermark filters
  * over the nanosecond-normalized timestamp.
  *
  * `Tables.load` rewrites the raw nanosecond long as
  * `timestamp_micros(ts div 1000)`; a filter `converted > T` cannot be
  * pushed through that expression, so the scan reads everything and
  * filters late. This rule recognizes
  * `MicrosToTimestamp(raw div 1000) {>|>=} literal` and conjoins the
  * IMPLIED raw predicate (`raw > 1000·t` for `>`, `raw >= 1000·t − 999`
  * for `>=` — `div` TRUNCATES toward zero, so for x ≤ 0 the raw value of
  * quotient q ranges down to 1000q − 999; the looser bound stays sound
  * for pre-1970 timestamps), which the regular
  * pushdown rules then drive into the parquet scan — automatic row-group
  * pruning for every watermark query, not just the hand-tuned loader.
  * Runs inside the operator-optimization fixed point, so the derived
  * conjunct is planted and pushed within the same optimization pass.
  */
object DeriveNanosWatermarkPushdown extends Rule[LogicalPlan] {

  private def micros(tsLit: Literal): Long = tsLit.value.asInstanceOf[Long]

  /** The coarse raw-column twin of a supported comparison, if any. */
  private def derive(e: Expression): Option[Expression] = e match {
    case GreaterThan(
        MicrosToTimestamp(IntegralDivide(raw: AttributeReference, Literal(1000L, LongType), _)),
        lit @ Literal(_, TimestampType)) if raw.dataType == LongType =>
      Some(GreaterThan(raw, Literal(micros(lit) * 1000L, LongType)))
    case GreaterThanOrEqual(
        MicrosToTimestamp(IntegralDivide(raw: AttributeReference, Literal(1000L, LongType), _)),
        lit @ Literal(_, TimestampType)) if raw.dataType == LongType =>
      // trunc(x/1000) = q ⟹ x ≥ 1000q − 999 (negative x), so q ≥ t only
      // implies x ≥ 1000t − 999 — NOT x ≥ 1000t
      Some(GreaterThanOrEqual(raw, Literal(micros(lit) * 1000L - 999L, LongType)))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val derived = conjuncts.flatMap(derive)
        .filterNot(d => conjuncts.exists(_.semanticEquals(d)))
      if (derived.isEmpty) f
      else Filter(derived.foldLeft(cond)(And), child)
  }

  private def splitConjunctivePredicates(condition: Expression): Seq[Expression] =
    condition match {
      case And(l, r) =>
        splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => Seq(other)
    }
}
