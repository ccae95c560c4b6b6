package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot scalar kernels
  * (SURVEY.md §2i "custom Expression beats UDF" tier).
  *
  * The pure-`functions._` formulations of these kernels run through
  * interpreted higher-order-function lambdas (`aggregate`/`transform`
  * evaluate their lambda per element via the interpreter — they are not
  * part of whole-stage codegen), which dominated the benchmark at sf0.1:
  * a 64-float dot product over 12.5 M candidate pairs, and a per-character
  * hash over every shingle of every document. These expressions generate
  * tight Java loops instead, while computing bit-for-bit the same values,
  * so the DuckDB oracles (and the HOF reference implementations kept in
  * the test suite) remain exact.
  */

/** Polynomial rolling hash `h := (h*31 + codepoint) mod 1e9+7` over a
  * string — the codegen twin of [[graft.functions.Text.charHash]].
  */
case class PolyHash(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  protected override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.PolyHash.hash($c.toString())")

  protected override def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  final val P = 1000000007L

  /** Codepoint-wise left fold — matches `ascii()` per single-char token
    * of `split(s, '')` in both Spark and DuckDB.
    */
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % P
      i += Character.charCount(cp)
    }
    h
  }
}

/** Double-precision dot product of two float arrays, left-to-right
  * accumulation — the codegen twin of [[graft.functions.Vectors.dot]]
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`), and bit-identical to it.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires two array<float> arguments, got " +
        s"${left.dataType} and ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  // a null ELEMENT nulls the whole product — matching the HOF reference
  // (zip_with's null*x is null, and aggregate's acc+null propagates);
  // reading through getFloat would silently treat nulls as garbage.
  // Mismatched LENGTHS null it too: zip_with pads the shorter array with
  // nulls (and the DuckDB oracle's out-of-range b[i] is NULL), so a
  // partial dot product would contradict the bit-identical contract.
  override def nullable: Boolean = true

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |for (int $i = 0; !${ev.isNull} && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  protected override def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points. */
object NativeKernels {
  def polyHash(s: Column): Column =
    ColumnGlue.toColumn(PolyHash(ColumnGlue.toExpression(s)))

  def dotProduct(a: Column, b: Column): Column =
    ColumnGlue.toColumn(
      DotProduct(ColumnGlue.toExpression(a), ColumnGlue.toExpression(b)))

  def minhashSignature(hashes: Column, a: Seq[Long], b: Seq[Long],
      p: Long): Column =
    ColumnGlue.toColumn(
      MinHashSignature(ColumnGlue.toExpression(hashes), a, b, p))

  def simhash(hashes: Column, bits: Int): Column =
    ColumnGlue.toColumn(SimHash(ColumnGlue.toExpression(hashes), bits))

  def shingleHashes(tokens: Column, n: Int): Column =
    ColumnGlue.toColumn(ShingleHashes(ColumnGlue.toExpression(tokens), n))

  def vocabHits(tokens: Column, vocab: Seq[String]): Column =
    ColumnGlue.toColumn(VocabHits(ColumnGlue.toExpression(tokens), vocab))

  def sqEncode(vec: Column, lo: Seq[Double], range: Seq[Double]): Column =
    ColumnGlue.toColumn(SqEncode(ColumnGlue.toExpression(vec), lo, range))

  def sqL2Distance(query: Column, codes: Column, lo: Seq[Double],
      range: Seq[Double]): Column =
    ColumnGlue.toColumn(SqL2Distance(ColumnGlue.toExpression(query),
      ColumnGlue.toExpression(codes), lo, range))
}

/** Full k-component MinHash signature in one pass over the shingle-hash
  * array: `sig_j = min_x (a_j·x + b_j) mod p` — the codegen twin of
  * [[graft.operators.MinHashLSH.signature]] (16 interpreted
  * `array_min(transform(...))` lambdas otherwise).
  */
case class MinHashSignature(child: Expression, a: Seq[Long], b: Seq[Long],
    p: Long) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<bigint>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  protected override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      MinHashSignature.compute(xs, a.toArray, b.toArray, p))
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("aConsts", a.toArray, "long[]")
    val bRef = ctx.addReferenceObj("bConsts", b.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.expressions.MinHashSignature.compute($c, $aRef, $bRef, ${p}L));
       """.stripMargin
    })
  }

  protected override def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  def compute(xs: ArrayData, a: Array[Long], b: Array[Long], p: Long): Array[Long] = {
    val k = a.length
    val sig = Array.fill(k)(Long.MaxValue)
    val n = xs.numElements()
    var i = 0
    while (i < n) {
      val x = xs.getLong(i)
      var j = 0
      while (j < k) {
        val v = (a(j) * x + b(j)) % p
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }
}

/** tf-weighted SimHash over an array of token hashes — the codegen twin
  * of the 32-iteration interpreted `aggregate(sequence(0, 31), ...)`
  * formulation in [[graft.queries.DedupQueries]]. Bit i of the result is
  * set when more token hashes have bit i set than cleared.
  */
case class SimHash(child: Expression, bits: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash requires array<bigint>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  protected override def nullSafeEval(input: Any): Any =
    SimHash.compute(input.asInstanceOf[ArrayData], bits)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.SimHash.compute($c, $bits)")

  protected override def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHash {
  def compute(hs: ArrayData, bits: Int): Long = {
    val counts = new Array[Int](bits)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      // a null hash contributes -1 on every bit, exactly like the HOF
      // reference where IF(null-condition, 1, -1) takes the else branch —
      // identical to hash value 0
      val h = if (hs.isNullAt(i)) 0L else hs.getLong(i)
      var j = 0
      while (j < bits) {
        if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

/** Distinct hashed word n-gram shingles from a token array in one pass —
  * the codegen twin of [[graft.operators.MinHashLSH.shingleHashes]]
  * (`array_distinct(transform(shingles, charHash))` over
  * `array_join(slice(...))` shingles otherwise). Preserves first-occurrence
  * order exactly like `array_distinct`.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  protected override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      ShingleHashes.compute(input.asInstanceOf[ArrayData], n))

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      |  graft.expressions.ShingleHashes.compute($c, $n));
     """.stripMargin)

  protected override def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  def compute(toks: ArrayData, n: Int): Array[Long] = {
    val m = toks.numElements()
    val words = new Array[String](m)
    var i = 0
    // null tokens are dropped from each shingle, matching array_join's
    // null-element skip in the HOF reference
    while (i < m) {
      words(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i).toString
      i += 1
    }
    def joined(from: Int, len: Int): String = {
      val sb = new java.lang.StringBuilder()
      var j = 0
      var first = true
      while (j < len) {
        val w = words(from + j)
        if (w != null) {
          if (!first) sb.append(' ')
          sb.append(w)
          first = false
        }
        j += 1
      }
      sb.toString
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (m < n) {
      seen.add(PolyHash.hash(joined(0, m)))
    } else {
      var s = 0
      while (s <= m - n) {
        seen.add(PolyHash.hash(joined(s, n)))
        s += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }
}

/** Count of token occurrences present in a fixed vocabulary — the codegen
  * twin of [[graft.functions.Text.vocabHits]]
  * (`size(filter(toks, isInCollection))` otherwise).
  */
case class VocabHits(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vocab_hits requires array<string>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "vocab_hits"

  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    vocab.foreach(s.add)
    s
  }

  protected override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    var hits = 0L
    var i = 0
    val m = toks.numElements()
    while (i < m) {
      // null tokens never match — filter(isInCollection) drops them too
      if (!toks.isNullAt(i) &&
        vocabSet.contains(toks.getUTF8String(i).toString)) hits += 1L
      i += 1
    }
    hits
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("vocabSet", vocabSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val hits = ctx.freshName("hits")
      s"""
         |long $hits = 0L;
         |int $m = $c.numElements();
         |for (int $i = 0; $i < $m; $i++) {
         |  if (!$c.isNullAt($i) &&
         |      $setRef.contains($c.getUTF8String($i).toString())) $hits++;
         |}
         |${ev.value} = $hits;
       """.stripMargin
    })
  }

  protected override def withNewChildInternal(newChild: Expression): VocabHits =
    copy(child = newChild)
}

/** SQ8 scalar-quantization encode: per-dimension 8-bit code
  * `clamp(round(((x − lo_i) · 255) / (hi_i − lo_i)), 0, 255)` against
  * trained corpus ranges ([[graft.operators.ScalarQuantizer]]). The
  * arithmetic ORDER is part of the contract — subtract, multiply by 255,
  * divide by the precomputed `range_i = hi_i − lo_i`, round half-up,
  * clamp — because the DuckDB oracle replays exactly that expression and
  * the persisted codes must be bit-stable across engines. A degenerate
  * dimension (`range_i = 0`) encodes to 0. Out-of-range inputs (vectors
  * APPENDED after training) saturate at 0/255 via the clamp.
  */
case class SqEncode(child: Expression, lo: Seq[Double], range: Seq[Double])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) =>
      if (lo.length == range.length) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"sq_encode stats disagree: ${lo.length} lo vs ${range.length} range")
    case t => TypeCheckResult.TypeCheckFailure(
      s"sq_encode requires array<float>, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "sq_encode"
  // dimension mismatch with the trained stats nulls the row (the
  // DotProduct length contract); so does a null element
  override def nullable: Boolean = true

  protected override def nullSafeEval(input: Any): Any = {
    val out = SqEncode.compute(input.asInstanceOf[ArrayData],
      lo.toArray, range.toArray)
    if (out == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val loRef = ctx.addReferenceObj("sqLo", lo.toArray, "double[]")
    val rgRef = ctx.addReferenceObj("sqRange", range.toArray, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val arr = ctx.freshName("codes")
      s"""
         |int[] $arr = graft.expressions.SqEncode.compute($c, $loRef, $rgRef);
         |if ($arr == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($arr); }
       """.stripMargin
    })
  }

  protected override def withNewChildInternal(newChild: Expression): SqEncode =
    copy(child = newChild)
}

object SqEncode {
  /** Exact half-up rounding of a non-negative double WITHOUT the
    * `floor(t + 0.5)` trick (whose fp addition misrounds values like
    * 0.49999999999999994): for |t| < 2^52 the fractional part `t − ⌊t⌋`
    * is exact, so the comparison is too — matching both Spark's
    * BigDecimal HALF_UP `round()` and DuckDB's half-away `round()` on
    * every non-negative double in the code domain.
    */
  def roundHalfUp(t: Double): Double = {
    val f = math.floor(t)
    if (t - f >= 0.5) f + 1.0 else f
  }

  def compute(xs: ArrayData, lo: Array[Double],
      range: Array[Double]): Array[Int] = {
    val n = xs.numElements()
    if (n != lo.length) return null
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) return null
      val r = range(i)
      out(i) =
        if (r <= 0.0) 0
        else {
          val t = roundHalfUp(((xs.getFloat(i).toDouble - lo(i)) * 255.0) / r)
          if (t < 0.0) 0 else if (t > 255.0) 255 else t.toInt
        }
      i += 1
    }
    out
  }
}

/** Asymmetric SQ8 L2 distance: squared L2 between a FLOAT query and the
  * DECODED reconstruction of an [[SqEncode]] code row —
  * `Σ_i (q_i − (lo_i + (c_i · range_i) / 255))²`, left-to-right, all
  * double — fused decode+distance so the per-pair hot loop touches only
  * the 1-byte-per-dimension codes, never a materialized float
  * reconstruction. Bit-identical to the DuckDB oracle's
  * `list_sum(list_transform(...))` over the decoded list.
  */
case class SqL2Distance(left: Expression, right: Expression,
    lo: Seq[Double], range: Seq[Double]) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sq_l2_distance requires (array<float>, array<int>), got $l and $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_l2_distance"
  override def nullable: Boolean = true

  protected override def nullSafeEval(a: Any, b: Any): Any =
    SqL2Distance.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      lo.toArray, range.toArray)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val loRef = ctx.addReferenceObj("sqLo", lo.toArray, "double[]")
    val rgRef = ctx.addReferenceObj("sqRange", range.toArray, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val d = ctx.freshName("d")
      s"""
         |Double $d = graft.expressions.SqL2Distance.compute(
         |  $a, $b, $loRef, $rgRef);
         |if ($d == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $d.doubleValue(); }
       """.stripMargin
    })
  }

  protected override def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqL2Distance =
    copy(left = newLeft, right = newRight)
}

object SqL2Distance {
  def compute(q: ArrayData, codes: ArrayData, lo: Array[Double],
      range: Array[Double]): java.lang.Double = {
    val n = q.numElements()
    if (n != codes.numElements() || n != lo.length) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (q.isNullAt(i) || codes.isNullAt(i)) return null
      val xhat = lo(i) + (codes.getInt(i).toDouble * range(i)) / 255.0
      val d = q.getFloat(i).toDouble - xhat
      acc += d * d
      i += 1
    }
    acc
  }
}
