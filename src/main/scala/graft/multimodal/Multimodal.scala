package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Multimodal-column plumbing (north-star extension): image/audio/video
  * treated as opaque `binary` payloads with typed metadata, plus decode /
  * feature-extract / frame-sample stages.
  *
  * Two decode tiers:
  *
  *  - REAL: binary netpbm P6 images ([[ppmAssets]] encodes genuine P6
  *    blobs — ASCII header, '#' comments, raw RGB bytes — from a
  *    deterministic pixel formula; [[graft.expressions.PpmDecode]] /
  *    [[graft.expressions.PpmLumaGrid]] parse the header and aggregate
  *    the pixel BYTES as codegen kernels). The DuckDB oracle replays the
  *    generating formula, so any off-by-one in the byte-level parse
  *    breaks the gate. Heavier codecs (JPEG/H.264) need a library this
  *    environment lacks, but they slot into the same column shapes.
  *  - STUB: deterministic hash-derived pseudo-metadata ([[decodeSeed]],
  *    [[fakeFeatures]], [[frameCount]]) kept for the block-checksum and
  *    frame-sampling plumbing whose physics don't depend on pixels.
  *
  * Scale shape: decode is per-row work inside the scan stage (codegen
  * expressions — no shuffle, no UDF boundary) or behind
  * [[Dataset.mapPartitions]] where a real codec object needs
  * per-partition init ([[decodePpmPartitioned]]); payload bytes never
  * hit the driver.
  *
  * `mapPartitions` here is the Scala-native equivalent of PySpark's
  * `mapInPandas` (this is a Scala library — no Python worker exists to
  * host a pandas UDF): both hand the stage a partition-sized iterator of
  * batches with per-partition init, which is the contract a Python
  * decode stage would plug into unchanged on a PySpark deployment.
  */
object Multimodal {

  val FeatureDims = 4
  val FrameChunkBytes = 64

  /** Typed asset row: opaque payload + metadata. */
  case class Asset(asset_id: Long, kind: String, payload: Array[Byte],
      n_bytes: Int)

  /** Build a binary asset table from the `documents` fixture: the text
    * payload stands in for encoded media bytes; `kind` is derived
    * deterministically from the source tag.
    */
  def assets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (Text.charHash(col("source")) % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      octet_length(col("text").cast("binary")).as("n_bytes"))

  /** Deterministic decode seed from the payload bytes (stub for "decode
    * the media header"): portable polynomial hash of the byte stream,
    * which for UTF-8 payloads equals the text hash the oracle computes.
    */
  def decodeSeed(payload: Column): Column =
    Text.charHash(decode(payload, "UTF-8"))

  /** Pseudo-feature vector from the seed (stub for "run the feature
    * extractor"): `f_i = ((seed * i) mod 1009) / 1009`, i = 1..dims.
    */
  def fakeFeatures(seed: Column, dims: Int = FeatureDims): Column =
    transform(sequence(lit(1), lit(dims)),
      i => (seed * i % 1009).cast("double") / 1009.0)

  /** Frame-sample count (stub for "sample every k-th video frame"):
    * ceil(n_bytes / chunk).
    */
  def frameCount(nBytes: Column, chunkBytes: Int = FrameChunkBytes): Column =
    ceil(nBytes.cast("double") / chunkBytes).cast("long")

  /** Typed dimension metadata for image-kind assets (stub for "parse
    * the media header"): deterministic pseudo-dimensions from the seed.
    */
  def dimensionMeta(seed: Column): Column =
    struct(
      (seed % 1920 + 1).cast("int").as("width"),
      (seed % 1080 + 1).cast("int").as("height"))

  /** Resize stage (stub for "resize the decoded image"): scales the
    * dimension metadata and the estimated payload size by `factor`;
    * plumbing (struct rewrite, per-row arithmetic) is real, pixels are
    * not. Matches how a real pipeline records post-transform metadata
    * without rewriting the payload until materialization.
    */
  def resizeMeta(meta: Column, nBytes: Column, factor: Double): Column =
    struct(
      ceil(meta.getField("width") * factor).cast("int").as("width"),
      ceil(meta.getField("height") * factor).cast("int").as("height"),
      ceil(nBytes * factor * factor).cast("long").as("est_bytes"))

  /** Frame sampling as a GENERATOR (stub for "take every k-th video
    * frame"): one output row per sampled frame index — `0, stride,
    * 2·stride, …` below [[frameCount]] — with a per-frame seed
    * (`seed + frame_idx`, the deterministic stand-in for decoding that
    * frame). The fan-out runs executor-side inside the scan stage
    * (`explode(sequence(...))`, zero shuffle), which is the shape that
    * matters at 100 TB of video: rows-per-asset scales with duration,
    * never with driver involvement. Columns added: `frame_idx`,
    * `frame_seed`.
    */
  def sampleFrames(assets: DataFrame, stride: Int,
      nBytesCol: String = "n_bytes", seedCol: String = "seed"): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val frames = frameCount(col(nBytesCol))
    // last sampled index: stride * floor((frames - 1) / stride); a
    // zero-frame asset explodes an empty array, i.e. emits no rows
    val indices = when(frames > 0,
      sequence(lit(0L), (frames - 1) - pmod(frames - 1, lit(stride.toLong)),
        lit(stride.toLong))).otherwise(array().cast("array<bigint>"))
    assets.withColumn("frame_idx", explode(indices))
      .withColumn("frame_seed", col(seedCol) + col("frame_idx"))
  }

  // ------------------------------------------------------------------
  // REAL tier: binary netpbm P6 (see class doc and graft.expressions.Netpbm)
  // ------------------------------------------------------------------

  /** Deterministic pixel formula for the synthetic image corpus: byte
    * `i` of asset `d`'s raw RGB stream is `(d·31 + i·7 + (i² mod 251))
    * mod 256`. Chosen to be exactly replayable as BIGINT arithmetic in
    * the oracle (all operands non-negative, so `%` agrees across
    * engines) while exercising the full 0–255 byte range.
    */
  def ppmPixelByte(assetId: Column, i: Column): Column =
    (assetId * 31L + i * 7L + (i * i) % 251L) % 256L

  /** Image dimensions per asset: 16–32 × 12–22 (small enough that the
    * oracle's per-pixel replay stays cheap; the decode kernels are
    * O(bytes) regardless).
    */
  def ppmWidth(assetId: Column): Column = (lit(16L) + assetId % 17L).cast("int")
  def ppmHeight(assetId: Column): Column = (lit(12L) + assetId % 11L).cast("int")

  /** Encode a REAL binary P6 blob per document: ASCII header (every
    * 5th asset carries a `# g` comment line — the published netpbm
    * grammar allows comments anywhere in header whitespace, and the
    * gate must prove the parser skips them), then `w·h·3` raw bytes
    * from [[ppmPixelByte]] packed by the
    * [[graft.expressions.PackBytes]] kernel (builtins can't make
    * arbitrary bytes: `chr()` detours through UTF-8). Columns:
    * `asset_id, kind, width, height, payload, n_bytes`.
    */
  def ppmAssets(docs: DataFrame): DataFrame = {
    val d = col("doc_id")
    val w = ppmWidth(d)
    val h = ppmHeight(d)
    val nBytes = (w.cast("long") * h * 3L)
    val header = concat(lit("P6\n"), w.cast("string"), lit(" "),
      h.cast("string"),
      when(d % 5L === 0L, lit("\n# g\n255\n")).otherwise(lit("\n255\n")))
    val pixels = graft.expressions.Netpbm.packBytesColumn(
      transform(sequence(lit(0L), nBytes - 1L),
        i => ppmPixelByte(d, i).cast("int")))
    docs.select(
      d.as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (Text.charHash(col("source")) % 3 + 1).cast("int")).as("kind"),
      w.as("width"), h.as("height"),
      concat(header.cast("binary"), pixels).as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")))
  }

  /** Header + channel sums from the payload BYTES (codegen kernel). */
  def ppmDecode(payload: Column): Column =
    graft.expressions.Netpbm.decodeColumn(payload)

  /** `gw × gh` mean-luminance feature grid from the payload bytes. */
  def ppmLumaGrid(payload: Column, gw: Int, gh: Int): Column =
    graft.expressions.Netpbm.lumaGridColumn(payload, gw, gh)

  // ------------------------------------------------------------------
  // REAL tier, video: concatenated P6 frames (image2pipe ppm stream)
  // ------------------------------------------------------------------

  /** Video fixture geometry/formula: every asset is `2 + d mod 4`
    * frames of 8×6 RGB; byte `i` of frame `f` is
    * `(d·31 + f·17 + i·7) mod 256` — frame-dependent so the first/last
    * luminance drift is a real temporal signal, BIGINT-replayable.
    */
  val VideoW = 8
  val VideoH = 6
  def videoFrames(assetId: Column): Column = lit(2L) + assetId % 4L
  def videoPixelByte(assetId: Column, f: Column, i: Column): Column =
    (assetId * 31L + f * 17L + i * 7L) % 256L

  /** Encode a REAL ppm video stream per document: `videoFrames(d)` P6
    * frames back-to-back, each with its own ASCII header — the layout
    * `ffmpeg -f image2pipe -vcodec ppm` produces. Columns: `asset_id,
    * kind, n_frames, payload, n_bytes`.
    */
  def videoAssets(docs: DataFrame): DataFrame = {
    val d = col("doc_id")
    val hdr = array(s"P6\n$VideoW $VideoH\n255\n".map(c => lit(c.toInt)): _*)
    val frameBytes = lit(3L * VideoW * VideoH)
    val stream = flatten(transform(
      sequence(lit(0L), videoFrames(d) - 1L),
      f => concat(hdr, transform(sequence(lit(0L), frameBytes - 1L),
        i => videoPixelByte(d, f, i).cast("int")))))
    docs.select(
      d.as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (Text.charHash(col("source")) % 3 + 1).cast("int")).as("kind"),
      videoFrames(d).as("n_frames"),
      graft.expressions.Netpbm.packBytesColumn(stream).as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")))
  }

  /** Frame walk + first/last luminance from the payload BYTES. */
  def videoDecode(payload: Column): Column =
    graft.expressions.Netpbm.streamDecodeColumn(payload)

  // ------------------------------------------------------------------
  // REAL tier, audio: RIFF/WAVE PCM (see graft.expressions.Wav)
  // ------------------------------------------------------------------

  /** Deterministic 16-bit sample formula for the synthetic audio
    * corpus: sample `i` of asset `d` is `(d·57 + i·13) mod 4001 − 2000`
    * (signed, ±2000) — BIGINT-replayable in the oracle, sign-rich so
    * zero-crossing counts are a real signal.
    */
  def wavSample(assetId: Column, i: Column): Column =
    (assetId * 57L + i * 13L) % 4001L - 2000L

  def wavRate(assetId: Column): Column =
    (lit(8000L) + (assetId % 3L) * 4000L).cast("int")
  def wavSampleCount(assetId: Column): Column = lit(400L) + assetId % 300L

  private def le2(x: Column): Column = array(
    pmod(x, lit(256L)).cast("int"),
    pmod(shiftright(x, 8), lit(256L)).cast("int"))
  private def le4(x: Column): Column = array(
    pmod(x, lit(256L)).cast("int"),
    pmod(shiftright(x, 8), lit(256L)).cast("int"),
    pmod(shiftright(x, 16), lit(256L)).cast("int"),
    pmod(shiftright(x, 24), lit(256L)).cast("int"))
  private def ascii(s: String): Column =
    array(s.map(c => lit(c.toInt)): _*)

  /** Encode a REAL RIFF/WAVE PCM blob per document: canonical 44-byte
    * header (RIFF size, `fmt ` PCM mono 16-bit block, `data` size — all
    * little-endian, built with the same [[graft.expressions.PackBytes]]
    * kernel as the image tier) followed by [[wavSample]] samples as
    * 16-bit LE. Columns: `asset_id, kind, sample_rate, n_samples,
    * payload, n_bytes`.
    */
  def wavAssets(docs: DataFrame): DataFrame = {
    val d = col("doc_id")
    val n = wavSampleCount(d)
    val rate = wavRate(d).cast("long")
    val dataSize = n * 2L
    val headerInts = concat(
      ascii("RIFF"), le4(dataSize + 36L), ascii("WAVE"),
      ascii("fmt "), le4(lit(16L)), le2(lit(1L)), le2(lit(1L)),
      le4(rate), le4(rate * 2L), le2(lit(2L)), le2(lit(16L)),
      ascii("data"), le4(dataSize))
    val sampleBytes = flatten(transform(sequence(lit(0L), n - 1L),
      i => le2(pmod(wavSample(d, i), lit(65536L)))))
    docs.select(
      d.as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (Text.charHash(col("source")) % 3 + 1).cast("int")).as("kind"),
      wavRate(d).as("sample_rate"), n.as("n_samples"),
      graft.expressions.Netpbm.packBytesColumn(
        concat(headerInts, sampleBytes)).as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")))
  }

  /** Header + loudness/shape facts from the payload BYTES (codegen). */
  def wavDecode(payload: Column): Column =
    graft.expressions.Wav.decodeColumn(payload)

  case class PpmDecoded(asset_id: Long, kind: String, valid: Boolean,
      width: Int, height: Int, maxval: Int, n_px: Long,
      r_sum: Long, g_sum: Long, b_sum: Long)

  /** The batched-decode pattern: one codec instance per PARTITION (real
    * codecs are expensive to open), streamed over the iterator — the
    * Scala twin of a `mapInPandas` batch UDF. Decodes the same real P6
    * bytes as [[ppmDecode]] (asserted equal in the spec); the expression
    * form is preferred in queries (stays inside whole-stage codegen),
    * this form is the integration seam a library-backed codec plugs
    * into.
    */
  def decodePpmPartitioned(assets: Dataset[Asset]): Dataset[PpmDecoded] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val codec = PpmCodec.open() // once per partition
      it.map(codec.decode)
    }
  }
}

/** Real P6 codec over the shared [[graft.expressions.Netpbm]] parse
  * kernels; `open()` models per-partition codec initialization.
  */
final class PpmCodec private () {

  def decode(a: Multimodal.Asset): Multimodal.PpmDecoded = {
    val r = graft.expressions.Netpbm.decode(a.payload)
    Multimodal.PpmDecoded(a.asset_id, a.kind, r.getBoolean(0), r.getInt(1),
      r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5), r.getLong(6),
      r.getLong(7))
  }
}

object PpmCodec {
  def open(): PpmCodec = new PpmCodec()
}
