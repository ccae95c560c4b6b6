package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types._

/** Real byte-level media decode for the multimodal tier: binary netpbm
  * P6 (PPM) — a public, header-plus-raw-pixels format whose decode is
  * pure byte arithmetic, implementable as codegen kernels with no codec
  * library. Replaces the round-11 hash-derived decode stand-in: these
  * expressions parse an actual P6 header (magic, '#' comments,
  * whitespace-separated width/height/maxval per the published netpbm
  * spec) and aggregate actual pixel BYTES.
  *
  * Decode errors are DATA, not control flow: a malformed payload yields
  * `valid = false` (zeros elsewhere) / an empty grid rather than
  * killing the job — at 100 TB some blobs WILL be truncated or
  * mis-tagged, and per-row total functions keep the scan inside
  * whole-stage codegen with no exception unwinding in the hot path.
  *
  * Reference behavior cited: the format is
  * https://netpbm.sourceforge.net/doc/ppm.html (public spec);
  * the seismic reference repo has no media tier (north-star brief).
  */
object Netpbm {

  /** Parsed P6 header: `[width, height, maxval, dataOffset]`, or null
    * when the payload is not a well-formed single-byte-sample P6 whose
    * pixel data is fully present. Token grammar per the spec: "P6",
    * then three decimal tokens separated by whitespace runs that may
    * contain `#`-to-end-of-line comments, then EXACTLY ONE whitespace
    * byte before the raw RGB samples (one byte per sample — maxval
    * must be < 256; 2-byte-sample P6 is rejected as unsupported).
    */
  def parseHeader(b: Array[Byte]): Array[Int] = parseHeaderAt(b, 0)

  /** [[parseHeader]] from an arbitrary offset — the frame walker for
    * concatenated-P6 video streams ([[streamDecode]]) re-parses each
    * frame's header where the previous frame's samples ended.
    */
  def parseHeaderAt(b: Array[Byte], start: Int): Array[Int] = {
    if (b == null || b.length < start + 2 ||
      b(start) != 'P' || b(start + 1) != '6') return null
    def isWs(c: Byte): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == 11
    var i = start + 2
    val vals = new Array[Int](3)
    var v = 0
    while (v < 3) {
      var progressed = true
      var sawWs = false
      while (progressed) {
        progressed = false
        while (i < b.length && isWs(b(i))) { i += 1; progressed = true; sawWs = true }
        if (i < b.length && b(i) == '#') {
          while (i < b.length && b(i) != '\n') i += 1
          progressed = true
        }
      }
      if (!sawWs) return null // tokens must be whitespace-separated
      if (i >= b.length || b(i) < '0' || b(i) > '9') return null
      var x = 0
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        x = x * 10 + (b(i) - '0')
        if (x > 1000000) return null
        i += 1
      }
      vals(v) = x
      v += 1
    }
    if (i >= b.length || !isWs(b(i))) return null
    i += 1 // exactly one whitespace byte, then raw samples
    if (vals(0) <= 0 || vals(1) <= 0 || vals(2) <= 0 || vals(2) > 255)
      return null
    if (b.length.toLong - i < vals(0).toLong * vals(1).toLong * 3L) return null
    Array(vals(0), vals(1), vals(2), i)
  }

  val DecodeSchema: StructType = StructType(Seq(
    StructField("valid", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("maxval", IntegerType, nullable = false),
    StructField("n_px", LongType, nullable = false),
    StructField("r_sum", LongType, nullable = false),
    StructField("g_sum", LongType, nullable = false),
    StructField("b_sum", LongType, nullable = false)))

  /** Single-pass decode: header fields plus per-channel byte sums. */
  def decode(b: Array[Byte]): InternalRow = {
    val h = parseHeader(b)
    if (h == null)
      return new GenericInternalRow(
        Array[Any](false, 0, 0, 0, 0L, 0L, 0L, 0L))
    val w = h(0); val ht = h(1); val off = h(3)
    val n = w.toLong * ht
    var rs = 0L; var gs = 0L; var bs = 0L
    var p = 0
    val end = (n * 3).toInt
    while (p < end) {
      rs += b(off + p) & 0xFF
      gs += b(off + p + 1) & 0xFF
      bs += b(off + p + 2) & 0xFF
      p += 3
    }
    new GenericInternalRow(Array[Any](true, w, ht, h(2), n, rs, gs, bs))
  }

  /** Downsampled mean-luminance grid: the image divided into `gw × gh`
    * cells (pixel (x, y) belongs to cell `(y·gh/h, x·gw/w)` — integer
    * division), each cell reporting `Σ(r+g+b) / (3·pixels)` as a
    * double, row-major. Empty payloads/parse failures yield an EMPTY
    * array; a cell with no pixels (image smaller than the grid) yields
    * 0.0. This is the feature extractor for media near-dup ANN: means
    * are invariant to the byte-level re-encodes checksums trip on.
    */
  def lumaGrid(b: Array[Byte], gw: Int, gh: Int): ArrayData = {
    val h = parseHeader(b)
    if (h == null) return new GenericArrayData(Array.empty[Double])
    val w = h(0); val ht = h(1); val off = h(3)
    val sums = new Array[Long](gw * gh)
    val cnts = new Array[Long](gw * gh)
    var p = 0
    val n = w * ht
    while (p < n) {
      val x = p % w
      val y = p / w
      val cell = (y * gh / ht) * gw + (x * gw / w)
      val base = off + 3 * p
      sums(cell) += (b(base) & 0xFF) + (b(base + 1) & 0xFF) + (b(base + 2) & 0xFF)
      cnts(cell) += 1
      p += 1
    }
    new GenericArrayData(Array.tabulate(gw * gh)(c =>
      if (cnts(c) == 0L) 0.0 else sums(c).toDouble / (3.0 * cnts(c))))
  }

  val StreamSchema: StructType = StructType(Seq(
    StructField("valid", BooleanType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_px_total", LongType, nullable = false),
    StructField("first_luma_sum", LongType, nullable = false),
    StructField("last_luma_sum", LongType, nullable = false)))

  /** Decode a VIDEO stream of concatenated P6 frames (the public
    * `image2pipe` ppm convention): walk frame headers back-to-back,
    * require constant dimensions (as real fixed-geometry streams do),
    * and fold per-frame luminance for the FIRST and LAST frames — the
    * temporal-drift signal a scene-change / static-clip filter gates
    * on. The stream must end exactly on a frame boundary; anything
    * else (mid-stream parse failure, trailing bytes, zero frames,
    * dimension change) is `valid=false`.
    */
  def streamDecode(b: Array[Byte]): InternalRow = {
    def invalid = new GenericInternalRow(
      Array[Any](false, 0L, 0, 0, 0L, 0L, 0L))
    if (b == null || b.length == 0) return invalid
    var off = 0
    var n = 0L
    var w = -1; var ht = -1
    var firstLuma = 0L; var lastLuma = 0L
    while (off < b.length) {
      val hdr = parseHeaderAt(b, off)
      if (hdr == null) return invalid
      if (w < 0) { w = hdr(0); ht = hdr(1) }
      else if (w != hdr(0) || ht != hdr(1)) return invalid
      val bytes = 3 * w * ht
      var s = 0L
      var i = hdr(3)
      val end = hdr(3) + bytes
      while (i < end) { s += b(i) & 0xFF; i += 1 }
      if (n == 0L) firstLuma = s
      lastLuma = s
      n += 1
      off = end
    }
    new GenericInternalRow(Array[Any](true, n, w, ht,
      n * w.toLong * ht, firstLuma, lastLuma))
  }

  /** Nearest-neighbor resize producing a REAL smaller (or larger) P6
    * blob: output pixel `(ox, oy)` copies input pixel
    * `(ox·w/ow, oy·h/oh)` (integer division — the standard floor
    * mapping), under a fresh canonical header. Malformed input → empty
    * bytes (data, not control flow). This is the "resize the decoded
    * image" verb as actual byte work: the output is itself a decodable
    * P6 payload, so resize → decode chains verify end-to-end.
    */
  def resize(b: Array[Byte], ow: Int, oh: Int): Array[Byte] = {
    val hdr = parseHeader(b)
    if (hdr == null) return Array.empty[Byte]
    val w = hdr(0); val h = hdr(1); val off = hdr(3)
    val head = s"P6\n$ow $oh\n${hdr(2)}\n".getBytes("US-ASCII")
    val out = new Array[Byte](head.length + 3 * ow * oh)
    System.arraycopy(head, 0, out, 0, head.length)
    var oy = 0
    var o = head.length
    while (oy < oh) {
      val sy = oy * h / oh
      var ox = 0
      while (ox < ow) {
        val sx = ox * w / ow
        val s = off + 3 * (sy * w + sx)
        out(o) = b(s); out(o + 1) = b(s + 1); out(o + 2) = b(s + 2)
        o += 3; ox += 1
      }
      oy += 1
    }
    out
  }

  /** Mean luminance of every `stride`-th frame of a concatenated-P6
    * video stream, in frame order — the REAL frame-sampling verb
    * (decode only the sampled frames' pixels; skipped frames cost one
    * header parse + an offset jump, exactly how a seekable container
    * is subsampled). Malformed stream → empty array.
    */
  def sampleFrameLumas(b: Array[Byte], stride: Int): ArrayData = {
    val empty = new GenericArrayData(Array.empty[Double])
    if (b == null || b.length == 0 || stride < 1) return empty
    val means = scala.collection.mutable.ArrayBuffer.empty[Double]
    var off = 0
    var f = 0
    while (off < b.length) {
      val hdr = parseHeaderAt(b, off)
      if (hdr == null) return empty
      val w = hdr(0); val h = hdr(1)
      val end = hdr(3) + 3 * w * h
      if (f % stride == 0) {
        var s = 0L
        var i = hdr(3)
        while (i < end) { s += b(i) & 0xFF; i += 1 }
        means += s.toDouble / (3.0 * w * h)
      }
      off = end
      f += 1
    }
    new GenericArrayData(means.toArray)
  }

  /** Low 8 bits of each int → one byte (null elements → 0). The encode
    * side's missing builtin: Spark has no array<int> → binary kernel,
    * and `chr()`-concat detours through UTF-8 (code points ≥ 128 become
    * two bytes). Generic: also packs sketch registers, code words, etc.
    */
  def packBytes(xs: ArrayData): Array[Byte] = {
    val n = xs.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) out(i) = (xs.getInt(i) & 0xFF).toByte
      i += 1
    }
    out
  }

  def decodeColumn(payload: Column): Column =
    ColumnGlue.toColumn(PpmDecode(ColumnGlue.toExpression(payload)))

  def streamDecodeColumn(payload: Column): Column =
    ColumnGlue.toColumn(PpmStreamDecode(ColumnGlue.toExpression(payload)))

  def resizeColumn(payload: Column, ow: Int, oh: Int): Column =
    ColumnGlue.toColumn(PpmResize(ColumnGlue.toExpression(payload), ow, oh))

  def sampleFrameLumasColumn(payload: Column, stride: Int): Column =
    ColumnGlue.toColumn(
      PpmSampleFrames(ColumnGlue.toExpression(payload), stride))

  def lumaGridColumn(payload: Column, gw: Int, gh: Int): Column =
    ColumnGlue.toColumn(
      PpmLumaGrid(ColumnGlue.toExpression(payload), gw, gh))

  def packBytesColumn(xs: Column): Column =
    ColumnGlue.toColumn(PackBytes(ColumnGlue.toExpression(xs)))
}

/** P6 header + per-channel sums as one codegen kernel (see [[Netpbm]]). */
case class PpmDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ppm_decode requires a binary payload, got $t")
  }
  override def dataType: DataType = Netpbm.DecodeSchema
  override def prettyName: String = "ppm_decode"

  protected override def nullSafeEval(input: Any): Any =
    Netpbm.decode(input.asInstanceOf[Array[Byte]])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Netpbm.decode($c)")

  protected override def withNewChildInternal(newChild: Expression): PpmDecode =
    copy(child = newChild)
}

/** Concatenated-P6 video stream walk (see [[Netpbm.streamDecode]]). */
case class PpmStreamDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ppm_stream_decode requires a binary payload, got $t")
  }
  override def dataType: DataType = Netpbm.StreamSchema
  override def prettyName: String = "ppm_stream_decode"

  protected override def nullSafeEval(input: Any): Any =
    Netpbm.streamDecode(input.asInstanceOf[Array[Byte]])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Netpbm.streamDecode($c)")

  protected override def withNewChildInternal(
      newChild: Expression): PpmStreamDecode =
    copy(child = newChild)
}

/** `gw × gh` mean-luminance grid over a P6 payload (see [[Netpbm]]). */
case class PpmLumaGrid(child: Expression, gw: Int, gh: Int)
    extends UnaryExpression {
  require(gw >= 1 && gh >= 1, s"grid must be >= 1x1, got ${gw}x$gh")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ppm_luma_grid requires a binary payload, got $t")
  }
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "ppm_luma_grid"

  protected override def nullSafeEval(input: Any): Any =
    Netpbm.lumaGrid(input.asInstanceOf[Array[Byte]], gw, gh)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.Netpbm.lumaGrid($c, $gw, $gh)")

  protected override def withNewChildInternal(newChild: Expression): PpmLumaGrid =
    copy(child = newChild)
}

/** Nearest-neighbor P6 resize to `ow × oh` (see [[Netpbm.resize]]). */
case class PpmResize(child: Expression, ow: Int, oh: Int)
    extends UnaryExpression {
  require(ow >= 1 && oh >= 1, s"resize target must be >= 1x1, got ${ow}x$oh")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ppm_resize requires a binary payload, got $t")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "ppm_resize"

  protected override def nullSafeEval(input: Any): Any =
    Netpbm.resize(input.asInstanceOf[Array[Byte]], ow, oh)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Netpbm.resize($c, $ow, $oh)")

  protected override def withNewChildInternal(newChild: Expression): PpmResize =
    copy(child = newChild)
}

/** Sampled-frame luminance means over a P6 stream
  * (see [[Netpbm.sampleFrameLumas]]).
  */
case class PpmSampleFrames(child: Expression, stride: Int)
    extends UnaryExpression {
  require(stride >= 1, s"stride must be >= 1, got $stride")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ppm_sample_frames requires a binary payload, got $t")
  }
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "ppm_sample_frames"

  protected override def nullSafeEval(input: Any): Any =
    Netpbm.sampleFrameLumas(input.asInstanceOf[Array[Byte]], stride)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.Netpbm.sampleFrameLumas($c, $stride)")

  protected override def withNewChildInternal(
      newChild: Expression): PpmSampleFrames =
    copy(child = newChild)
}

/** array<int> → binary, low byte per element (see [[Netpbm.packBytes]]). */
case class PackBytes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pack_bytes requires array<int>, got $t")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pack_bytes"

  protected override def nullSafeEval(input: Any): Any =
    Netpbm.packBytes(input.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Netpbm.packBytes($c)")

  protected override def withNewChildInternal(newChild: Expression): PackBytes =
    copy(child = newChild)
}
