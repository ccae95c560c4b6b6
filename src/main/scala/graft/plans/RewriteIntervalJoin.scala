package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DayTimeIntervalType, DoubleType, LongType, TimestampNTZType, TimestampType}

/** Rewrites a pure temporal range θ-join into a bin-bucketed hash
  * equi-join (the optimizer-automated form of the q61 rewrite; same idea
  * as Databricks' RANGE_JOIN bin hint, derived here from the predicate
  * itself).
  *
  * Pattern: an inner (or outer — see [[orientationSafe]]) join whose
  * condition has NO cross-side equality but bounds one side's timestamp
  * inside a fixed-length window of the other's —
  *
  *   bounded ∈ [anchor − W, anchor)   (any open/closed edge mix, W a
  *                                     literal day-time interval, written
  *                                     as `b >= a - W AND b < a` or the
  *                                     mirrored `a <= b + W AND a > b`)
  *
  * Catalyst plans that as BroadcastNestedLoopJoin — every bounded row
  * compared against every anchor row, O(n·m), the join that falls over
  * first at scale. The rewrite:
  *
  *  - bounded side gains `__graft_bin = floorDiv(unix_micros(ts), W)`
  *    (exact integer arithmetic — `Pmod` then subtract, so the quotient
  *    is exactly divisible and the double division is exact);
  *  - anchor side explodes to its two overlapping probe bins
  *    `{bin−1, bin}` (a window exactly one bin wide overlaps ≤ 2 bins);
  *  - the join becomes an equi-join on the bin with the ORIGINAL range
  *    predicate kept as a residual filter, and a Project restores the
  *    original output.
  *
  * Cost after rewrite tracks rows per (bin) — temporal density — instead
  * of |left|·|right|. Injected into the operator-optimization fixed
  * point; idempotent because the rewritten join HAS a cross-side
  * equality (the bin), which makes it ineligible on the next pass.
  */
object RewriteIntervalJoin extends Rule[LogicalPlan] {

  private val BinCol = "__graft_bin"
  private val ProbeCol = "__graft_probe_bin"

  /** bounded-ts attribute, anchor-ts attribute, window micros. */
  private case class Pattern(bounded: AttributeReference,
      anchor: AttributeReference, winMicros: Long)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(_, _, Inner | LeftOuter | RightOuter, Some(cond), _)
        if eligible(j, cond) =>
      detect(j, cond)
        .filter(p => orientationSafe(j, p))
        .map(rewrite(j, _)).getOrElse(j)
  }

  /** Outer joins are rewritable only when the PRESERVED side is the
    * bounded (single-bin, non-exploded) side: each preserved row then
    * appears exactly once when unmatched, and a bounded row can never
    * reach the same anchor row through both probe bins (they are
    * distinct and the bounded row carries one bin). Exploding a
    * preserved side would instead null-extend it twice.
    */
  private def orientationSafe(j: Join, p: Pattern): Boolean = {
    val boundedOnLeft = j.left.outputSet.contains(p.bounded)
    j.joinType match {
      case Inner => true
      case LeftOuter => boundedOnLeft
      case RightOuter => !boundedOnLeft
      case _ => false
    }
  }

  /** Only joins with no cross-side equality: with one, Catalyst already
    * plans a hash join and the range rides as residual. This doubles as
    * the fixed-point guard — the rewritten join carries a bin equality.
    */
  private def eligible(j: Join, cond: Expression): Boolean =
    !splitConjuncts(cond).exists {
      case EqualTo(x, y) => crossSide(j, x, y)
      case EqualNullSafe(x, y) => crossSide(j, x, y)
      case _ => false
    }

  private def crossSide(j: Join, x: Expression, y: Expression): Boolean = {
    val (lx, rx) = (x.references.subsetOf(j.left.outputSet),
      x.references.subsetOf(j.right.outputSet))
    val (ly, ry) = (y.references.subsetOf(j.left.outputSet),
      y.references.subsetOf(j.right.outputSet))
    x.references.nonEmpty && y.references.nonEmpty &&
      ((lx && ry) || (rx && ly))
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Canonicalize every comparison conjunct to "smaller < / <= bigger". */
  private def asLess(e: Expression): Option[(Expression, Expression)] =
    e match {
      case LessThan(a, b) => Some((a, b))
      case LessThanOrEqual(a, b) => Some((a, b))
      case GreaterThan(a, b) => Some((b, a))
      case GreaterThanOrEqual(a, b) => Some((b, a))
      case _ => None
    }

  /** Both session-zoned TIMESTAMP and TIMESTAMP_NTZ qualify. For NTZ the
    * bin expression routes through an NTZ→timestamp cast in the session
    * zone ([[binOf]]); that mapping is monotone only for FIXED-OFFSET
    * zones (a DST fall-back makes it non-injective, and a pair within
    * one window of each other could land more than one bin apart —
    * silently dropping matches), so NTZ eligibility is gated on the
    * session zone having no transitions.
    */
  private def tsAttr(j: Join)(e: Expression): Option[AttributeReference] =
    e match {
      case a: AttributeReference
          if (a.dataType == TimestampType ||
            (a.dataType == TimestampNTZType && fixedOffsetSessionZone)) &&
            (j.left.outputSet.contains(a) || j.right.outputSet.contains(a)) =>
        Some(a)
      case _ => None
    }

  private def fixedOffsetSessionZone: Boolean =
    try java.time.ZoneId.of(conf.sessionLocalTimeZone)
      .getRules.isFixedOffset
    catch { case _: java.time.DateTimeException => false }

  private def oppositeSides(j: Join, a: Attribute, b: Attribute): Boolean =
    (j.left.outputSet.contains(a) && j.right.outputSet.contains(b)) ||
      (j.right.outputSet.contains(a) && j.left.outputSet.contains(b))

  private def intervalMicros(l: Literal): Option[Long] = l match {
    case Literal(v: Long, _: DayTimeIntervalType) => Some(v)
    case _ => None
  }

  private def detect(j: Join, cond: Expression): Option[Pattern] = {
    val less = splitConjuncts(cond).flatMap(asLess)
    // upper bound: bounded < / <= anchor, both bare ts attrs, opposite sides
    val uppers = less.flatMap { case (lo, hi) =>
      for {
        b <- tsAttr(j)(lo)
        a <- tsAttr(j)(hi)
        if oppositeSides(j, a, b)
      } yield (b, a)
    }
    uppers.flatMap { case (b, a) =>
      less.collectFirst {
        // anchor − W < / <= bounded  (parser normalizes `a - W` to
        // TimestampAddInterval(a, negative literal))
        case (TimestampAddInterval(a2: AttributeReference, lit: Literal, _), b2)
            if a2.semanticEquals(a) && b2.semanticEquals(b) &&
              intervalMicros(lit).exists(_ < 0) =>
          Pattern(b, a, -intervalMicros(lit).get)
        // mirrored: anchor < / <= bounded + W
        case (a2, TimestampAddInterval(b2: AttributeReference, lit: Literal, _))
            if a2.semanticEquals(a) && b2.semanticEquals(b) &&
              intervalMicros(lit).exists(_ > 0) =>
          Pattern(b, a, intervalMicros(lit).get)
      }
    }.headOption
  }

  /** floorDiv(unix_micros(ts), w) in exact arithmetic: subtracting the
    * non-negative Pmod makes the numerator exactly divisible, so the
    * double division is exact (quotient magnitude ≪ 2^53) and the cast
    * back to long loses nothing.
    */
  private def binOf(ts: Expression, w: Long): Expression = {
    // UnixMicros takes session-zoned TIMESTAMP only; NTZ goes through a
    // session-zone cast (monotone — NTZ eligibility requires a
    // fixed-offset zone, see tsAttr) applied identically on BOTH sides,
    // so bin adjacency is preserved
    val zoned =
      if (ts.dataType == TimestampNTZType)
        Cast(ts, TimestampType, Some(conf.sessionLocalTimeZone))
      else ts
    val us = UnixMicros(zoned)
    val lw = Literal(w, LongType)
    Cast(Divide(Cast(Subtract(us, Pmod(us, lw)), DoubleType),
      Literal(w.toDouble, DoubleType)), LongType)
  }

  private def rewrite(j: Join, p: Pattern): LogicalPlan = {
    val boundedOnLeft = j.left.outputSet.contains(p.bounded)
    val (boundedSide, anchorSide) =
      if (boundedOnLeft) (j.left, j.right) else (j.right, j.left)

    // bounded side: one bin column
    val binAlias = Alias(binOf(p.bounded, p.winMicros), BinCol)()
    val newBounded =
      Project(boundedSide.output :+ binAlias, boundedSide)

    // anchor side: explode the two probe bins the window can overlap
    val anchorBin = binOf(p.anchor, p.winMicros)
    val gen = Explode(CreateArray(Seq(
      Subtract(anchorBin, Literal(1L, LongType)), anchorBin)))
    val probeAttr = AttributeReference(ProbeCol, LongType,
      nullable = gen.elementSchema.head.nullable)()
    val newAnchor = Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(probeAttr), child = anchorSide)

    val newCond = And(j.condition.get,
      EqualTo(probeAttr, binAlias.toAttribute))
    val (nl, nr) =
      if (boundedOnLeft) (newBounded, newAnchor) else (newAnchor, newBounded)
    Project(j.output, Join(nl, nr, j.joinType, Some(newCond), j.hint))
  }
}
