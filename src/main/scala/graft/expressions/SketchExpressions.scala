package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Bloom-filter membership as a native codegen kernel.
  *
  * A Bloom probe is per-row scalar work; the join formulation
  * ([[graft.operators.Sketches.bloomProbe]]'s original shape — one
  * broadcast hash join per hash function) pays `nHashes` join operators
  * and their column plumbing for what is a handful of shifts and loads.
  * The packed filter rides along as a JVM `long[]` reference object
  * (64 bits per slot — the [[graft.operators.Sketches.collectFilter]]
  * dense packing of the oracle-portable 32-bit build words), the same
  * way [[NearestCell]] carries its centroid table: the filter is
  * broadcast-sized BY DEFINITION (`mBits ≤ 2^28` = 32 MB packed — the
  * `Sketches.bloomBits` cap), so shipping it inside the serialized
  * expression is exactly a broadcast, minus the join machinery.
  *
  * Bit-exactness: probe positions replay the Kirsch–Mitzenmacher double
  * hashing `(h mod m + j·(1 + h mod (m−1))) mod m` in the same BIGINT
  * arithmetic the DuckDB oracle and the build side use (hashes are
  * non-negative by the [[graft.operators.Sketches.uniformHash]]
  * contract, so `%` and `pmod` agree), and a missing word is an all-zero
  * word — identical to the join formulation's left-join + coalesce.
  */
case class BloomContains(child: Expression, words: Array[Long], mBits: Int,
    nHashes: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_contains requires a bigint hash, got $t")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  protected override def nullSafeEval(input: Any): Any =
    BloomContains.compute(input.asInstanceOf[Long], words, mBits, nHashes)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wordsRef = ctx.addReferenceObj("bloomWords", words, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.BloomContains.compute($c, $wordsRef, $mBits, $nHashes)")
  }

  protected override def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)
}

object BloomContains {
  def compute(h: Long, words: Array[Long], mBits: Int, nHashes: Int): Boolean = {
    val step = 1L + h % (mBits - 1)
    val base = h % mBits
    var j = 0
    while (j < nHashes) {
      val pos = (base + j * step) % mBits
      val slot = (pos >> 6).toInt // 64 bits per long (collectFilter packing)
      if (slot >= words.length ||
        ((words(slot) >>> (pos & 63).toInt) & 1L) == 0L) return false
      j += 1
    }
    true
  }

  def column(h: Column, words: Array[Long], mBits: Int, nHashes: Int): Column =
    ColumnGlue.toColumn(
      BloomContains(ColumnGlue.toExpression(h), words, mBits, nHashes))
}
