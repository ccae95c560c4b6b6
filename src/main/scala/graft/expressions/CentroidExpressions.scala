package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Nearest-centroid assignment as a native codegen kernel — the hot
  * per-row operation of the whole ANN training/encode tier
  * ([[graft.operators.IvfAnn]], [[graft.operators.ProductQuantizer]],
  * [[graft.operators.IvfPq]]).
  *
  * The pure-expression formulation (`array_min(transform(<literal
  * centroid array>, …))` with a [[DotProduct]] per element) is correct
  * but pays an interpreted lambda round-trip and a per-row
  * 16-struct array materialization per evaluation — and at production
  * coarse-quantizer sizes (`clusters ≈ √n`, thousands of cells) the
  * literal array bloats the expression tree itself. This kernel holds
  * the centroid table as a plain JVM reference object (the
  * [[MinHashSignature]] pattern — `ctx.addReferenceObj`, nothing embeds
  * in generated source) and runs one tight fused loop.
  *
  * Bit-exactness contract: the score is `cnorm2(i) − 2·(v·c_i)` with the
  * dot accumulated left-to-right in doubles (identical to
  * [[DotProduct]]), and the argmin keeps the FIRST strict improvement
  * scanning cells in ascending id order — exactly `array_min` /
  * `min(struct(score, cell))` tie-breaking (ties go to the lower cell).
  * Comparison is `java.lang.Double.compare`, matching Spark's total
  * order for doubles on every value the score can take (scores are
  * `+0.0`-signed by construction: `cnorm2` is a sum of squares, so the
  * `-0.0 < +0.0` divergence from SQL semantics cannot arise).
  * Centroid vectors must match the input's length — the training
  * contract ([[graft.operators.CentroidState]] derives both from the
  * same corpus); extra input components are ignored like a zip would,
  * but a SHORT or null-holed input vector throws a descriptive error
  * instead of reading out of bounds (parquet array columns are
  * `containsNull=true` by default even when hole-free, so the check
  * lives in the kernel, not in `checkInputDataTypes`).
  */
case class NearestCell(child: Expression, cells: Array[Int],
    cvecs: Array[Array[Float]], cnorm2: Array[Double])
    extends UnaryExpression {

  require(cells.nonEmpty && cells.length == cvecs.length &&
    cells.length == cnorm2.length, "malformed centroid table")
  // equal-length centroids let the kernel validate the input vector ONCE
  // per row instead of once per (cell × component) in the scoring loop
  require(cvecs.forall(_.length == cvecs(0).length),
    "centroid vectors must share one dimensionality")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_cell requires array<float>, got $t")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_cell"

  protected override def nullSafeEval(input: Any): Any =
    NearestCell.compute(input.asInstanceOf[ArrayData], cells, cvecs, cnorm2)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cellsRef = ctx.addReferenceObj("cells", cells, "int[]")
    val cvecsRef = ctx.addReferenceObj("cvecs", cvecs, "float[][]")
    val cnorm2Ref = ctx.addReferenceObj("cnorm2", cnorm2, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.NearestCell.compute($c, $cellsRef, $cvecsRef, $cnorm2Ref)")
  }

  protected override def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

object NearestCell {
  def compute(v: ArrayData, cells: Array[Int], cvecs: Array[Array[Float]],
      cnorm2: Array[Double]): Int = {
    // validate ONCE per row (the constructor requires equal-length
    // centroids), keeping the per-cell scoring loop to multiply-adds
    val dim = cvecs(0).length
    if (v.numElements() < dim) throw new IllegalArgumentException(
      s"nearest_cell: input vector has ${v.numElements()} components, " +
        s"centroid has $dim")
    var j0 = 0
    while (j0 < dim) {
      if (v.isNullAt(j0)) throw new IllegalArgumentException(
        s"nearest_cell: null component at index $j0")
      j0 += 1
    }
    var best = 0.0
    var bestCell = 0
    var first = true
    var i = 0
    while (i < cells.length) {
      val c = cvecs(i)
      var dot = 0.0
      var j = 0
      while (j < c.length) {
        dot += v.getFloat(j).toDouble * c(j).toDouble
        j += 1
      }
      val score = cnorm2(i) - 2.0 * dot
      if (first || java.lang.Double.compare(score, best) < 0) {
        best = score
        bestCell = cells(i)
        first = false
      }
      i += 1
    }
    bestCell
  }

  def column(vec: Column, cells: Array[Int], cvecs: Array[Array[Float]],
      cnorm2: Array[Double]): Column =
    ColumnGlue.toColumn(
      NearestCell(ColumnGlue.toExpression(vec), cells, cvecs, cnorm2))
}
