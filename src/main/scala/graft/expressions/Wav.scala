package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types._

/** Real byte-level AUDIO decode for the multimodal tier: RIFF/WAVE PCM
  * (the public wav container — ASCII chunk ids, little-endian sizes,
  * 16-bit signed samples). Like [[Netpbm]], this is a single-pass
  * codegen kernel over the payload `binary`: a generic CHUNK WALK
  * (unknown chunks — LIST, fact, cue — are skipped by their declared
  * size, as a real parser must) finds `fmt ` and `data`, validates the
  * supported encoding (PCM, mono, 16-bit), then folds the samples into
  * the loudness/shape facts a curation pipeline filters on: total
  * absolute amplitude, peak, zero crossings. Malformed or unsupported
  * payloads are DATA (`valid=false`), never exceptions.
  *
  * Reference behavior: the RIFF/WAVE layout is public
  * (https://www.rfc-editor.org/rfc/rfc2361, the multimedia programming
  * interface spec); the seismic reference repo has no audio tier
  * (north-star brief: "multimodal columns").
  */
object Wav {

  val DecodeSchema: StructType = StructType(Seq(
    StructField("valid", BooleanType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("sum_abs", LongType, nullable = false),
    StructField("peak", IntegerType, nullable = false),
    StructField("zero_crossings", LongType, nullable = false)))

  private def invalid: InternalRow = new GenericInternalRow(
    Array[Any](false, 0, 0, 0, 0L, 0L, 0L, 0, 0L))

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  /** Single-pass decode; see object doc. */
  def decode(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 44) return invalid
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return invalid
    var i = 12
    var fmtOk = false
    var channels = 0; var rate = 0; var bits = 0
    var dataOff = -1; var dataLen = 0L
    while (i + 8 <= b.length && (dataOff < 0 || !fmtOk)) {
      val size = le32(b, i + 4)
      val body = i + 8
      if (size < 0 || body + size > b.length) return invalid
      if (tag(b, i, "fmt ")) {
        if (size < 16) return invalid
        val audioFormat = le16(b, body)
        channels = le16(b, body + 2)
        rate = le32(b, body + 4).toInt
        bits = le16(b, body + 14)
        if (audioFormat != 1) return invalid // PCM only
        fmtOk = true
      } else if (tag(b, i, "data")) {
        dataOff = body
        dataLen = size
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      i = body + size.toInt + (size.toInt & 1)
    }
    if (!fmtOk || dataOff < 0) return invalid
    // supported shape: mono 16-bit (the curation corpus contract);
    // anything else is a valid wav this kernel does not decode
    if (channels != 1 || bits != 16 || rate <= 0) return invalid
    if (dataLen % 2 != 0) return invalid
    val n = dataLen / 2
    var sumAbs = 0L
    var peak = 0
    var zc = 0L
    var prev = 0
    var k = 0
    while (k < n) {
      val u = le16(b, dataOff + 2 * k.toInt)
      val s = if (u >= 0x8000) u - 0x10000 else u // sign-extend
      val a = math.abs(s)
      sumAbs += a
      if (a > peak) peak = a
      if (k > 0 && s.toLong * prev < 0) zc += 1
      prev = s
      k += 1
    }
    new GenericInternalRow(Array[Any](true, channels, rate, bits, n,
      n * 1000L / rate, sumAbs, peak, zc))
  }

  def decodeColumn(payload: Column): Column =
    ColumnGlue.toColumn(WavDecode(ColumnGlue.toExpression(payload)))
}

/** RIFF/WAVE PCM header walk + sample fold as one codegen kernel. */
case class WavDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"wav_decode requires a binary payload, got $t")
  }
  override def dataType: DataType = Wav.DecodeSchema
  override def prettyName: String = "wav_decode"

  protected override def nullSafeEval(input: Any): Any =
    Wav.decode(input.asInstanceOf[Array[Byte]])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Wav.decode($c)")

  protected override def withNewChildInternal(newChild: Expression): WavDecode =
    copy(child = newChild)
}
