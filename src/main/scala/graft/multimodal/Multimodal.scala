package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Multimodal-column plumbing (north-star extension): image/audio/video
  * treated as opaque `binary` payloads with typed metadata, plus decode /
  * feature-extract / frame-sample stages.
  *
  * The decode step is a STUB — no image/audio codec libraries exist in
  * this environment — but everything Spark-side is real and tested:
  * binary columns, metadata structs, the per-partition batched decode
  * pattern, and deterministic pseudo-features that the DuckDB oracle can
  * reproduce. Swapping [[FakeCodec]] for a real codec (JavaCV, TwelveMonkeys,
  * a JNI binding) changes no plumbing.
  *
  * Scale shape: decode is per-row work behind [[Dataset.mapPartitions]] —
  * the codec initializes ONCE per partition (the expensive part with real
  * codecs), then streams the iterator. No shuffle; parallelism = input
  * partitions; payload bytes never hit the driver.
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

  case class DecodedAsset(asset_id: Long, kind: String, n_bytes: Int,
      seed: Long, features: Array[Double], n_frames: Int)

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

  /** The batched-decode pattern: one codec instance per PARTITION (real
    * codecs are expensive to open), streamed over the iterator — the
    * Scala twin of a `mapInPandas` batch UDF. Produces exactly the same
    * values as the expression stubs above (asserted in the spec).
    */
  def decodePartitioned(assets: Dataset[Asset]): Dataset[DecodedAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val codec = FakeCodec.open() // once per partition
      it.map(codec.decode)
    }
  }
}

/** Stand-in for a real media codec; `open()` models per-partition codec
  * initialization. Deterministic: mirrors the expression-level stubs.
  */
final class FakeCodec private () {
  import Multimodal._

  def decode(a: Multimodal.Asset): Multimodal.DecodedAsset = {
    val seed = graft.expressions.PolyHash.hash(
      new String(a.payload, java.nio.charset.StandardCharsets.UTF_8))
    val features = Array.tabulate(FeatureDims)(
      i => (seed * (i + 1) % 1009).toDouble / 1009.0)
    val frames = math.ceil(a.n_bytes.toDouble / FrameChunkBytes).toLong.toInt
    Multimodal.DecodedAsset(a.asset_id, a.kind, a.n_bytes, seed, features, frames)
  }
}

object FakeCodec {
  def open(): FakeCodec = new FakeCodec()
}
