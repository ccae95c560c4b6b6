package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) bit interleave of two quantized coordinates — the
  * curve behind Delta's `OPTIMIZE ... ZORDER BY` for MULTI-dimensional
  * data skipping. Lexicographic clustering (`layout/Optimize.cluster`)
  * sorts by (a, b): files get tight min/max on `a` but each spans the
  * full `b` range, so a predicate on `b` alone prunes nothing.
  * Interleaving the bits gives every file a bounded range in BOTH
  * dimensions (a contiguous z-range is a small set of quad-tree cells),
  * so either-dimension predicates skip files
  * (`ZOrderSpec` measures exactly this against the lexicographic layout).
  *
  * Inputs are `bits`-quantized non-negative longs (see
  * `layout/Optimize.zvalue` for the normalizing quantizer); output
  * occupies `2·bits` low bits, LSB-first interleave (`a` even bits, `b`
  * odd bits).
  */
case class ZOrderInterleave(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"z_order requires two bigint arguments, got " +
        s"${left.dataType} and ${right.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "z_order"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderInterleave.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long],
      bits)

  protected override def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.ZOrderInterleave.interleave($a, $b, $bits)")

  protected override def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ZOrderInterleave =
    copy(left = newLeft, right = newRight)
}

object ZOrderInterleave {
  /** LSB-first interleave: out[2i] = a[i], out[2i+1] = b[i]. */
  def interleave(a: Long, b: Long, bits: Int): Long = {
    var out = 0L
    var i = 0
    while (i < bits) {
      out |= ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    out
  }
}
