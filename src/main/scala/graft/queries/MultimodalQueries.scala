package graft.queries

import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.multimodal.Multimodal
import graft.sources.Tables

/** Multimodal tier exercised end-to-end (north-star extension): encode
  * REAL binary netpbm P6 images, decode them at the byte level with the
  * codegen kernels ([[graft.expressions.PpmDecode]] — q30/q31), and run
  * block-checksum dedup over binary payloads (q77). The DuckDB oracle
  * replays the pixel-generating formula, never the parse — so the
  * byte-level decode is what the hash compare actually verifies.
  */
object MultimodalQueries {

  private val charHashSource = graft.functions.Text.charHashSql("source")

  /** DuckDB CTEs replaying the synthetic image corpus by its generating
    * formula ([[Multimodal.ppmPixelByte]]): per-asset dimensions and
    * per-channel byte sums. The SPARK side never sees the formula at
    * decode time — it parses the actual P6 header and sums the actual
    * payload bytes ([[graft.expressions.PpmDecode]]) — so any
    * off-by-one in the byte-level parse (comment skip, the single
    * whitespace before raw data, channel interleave) hash-mismatches.
    */
  private def ppmSumsCtes: String =
    s"""dims AS (
      |  SELECT doc_id AS asset_id,
      |    (['image', 'audio', 'video'])[CAST($charHashSource % 3 + 1 AS INT)] AS kind,
      |    CAST(16 + doc_id % 17 AS INT) AS width,
      |    CAST(12 + doc_id % 11 AS INT) AS height
      |  FROM documents),
      |sums AS (
      |  SELECT asset_id, kind, width, height,
      |    CAST(width AS BIGINT) * height AS n_px,
      |    CAST(list_sum([(asset_id*31 + i*7 + (i*i)%251) % 256
      |      FOR i IN range(0, CAST(width AS BIGINT)*height*3) IF i % 3 = 0]) AS BIGINT) AS r_sum,
      |    CAST(list_sum([(asset_id*31 + i*7 + (i*i)%251) % 256
      |      FOR i IN range(0, CAST(width AS BIGINT)*height*3) IF i % 3 = 1]) AS BIGINT) AS g_sum,
      |    CAST(list_sum([(asset_id*31 + i*7 + (i*i)%251) % 256
      |      FOR i IN range(0, CAST(width AS BIGINT)*height*3) IF i % 3 = 2]) AS BIGINT) AS b_sum
      |  FROM dims)""".stripMargin

  /** Per-asset REAL image decode: P6 header fields and per-channel
    * means computed from the payload bytes by the codegen kernel, with
    * the encoded blob's exact length cross-checked (header arithmetic:
    * magic + dimension digits + optional comment + one separator +
    * `3·w·h` samples).
    */
  val assetDecode: QuerySpec = QuerySpec.sql(
    "q30_asset_decode",
    s"""WITH $ppmSumsCtes
      |SELECT asset_id, kind, TRUE AS valid, width, height,
      |  CAST(255 AS INT) AS maxval, n_px, r_sum, g_sum, b_sum,
      |  CAST(3 + length(CAST(width AS VARCHAR)) + 1
      |    + length(CAST(height AS VARCHAR)) + 5
      |    + CASE WHEN asset_id % 5 = 0 THEN 4 ELSE 0 END
      |    + n_px * 3 AS INT) AS n_bytes,
      |  round(CAST(r_sum AS DOUBLE) / n_px + 1e-9, 6) AS r_mean,
      |  round(CAST(g_sum AS DOUBLE) / n_px + 1e-9, 6) AS g_mean,
      |  round(CAST(b_sum AS DOUBLE) / n_px + 1e-9, 6) AS b_mean
      |FROM sums
      |ORDER BY asset_id""".stripMargin
  ) { (spark, dir) =>
    Multimodal.ppmAssets(Tables.load(spark, dir, "documents"))
      .withColumn("d", Multimodal.ppmDecode(col("payload")))
      .select(col("asset_id"), col("kind"),
        col("d.valid").as("valid"),
        col("d.width").as("width"), col("d.height").as("height"),
        col("d.maxval").as("maxval"), col("d.n_px").as("n_px"),
        col("d.r_sum").as("r_sum"), col("d.g_sum").as("g_sum"),
        col("d.b_sum").as("b_sum"), col("n_bytes"),
        round(col("d.r_sum").cast("double") / col("d.n_px") + lit(1e-9), 6)
          .as("r_mean"),
        round(col("d.g_sum").cast("double") / col("d.n_px") + lit(1e-9), 6)
          .as("g_mean"),
        round(col("d.b_sum").cast("double") / col("d.n_px") + lit(1e-9), 6)
          .as("b_mean"))
      .orderBy(col("asset_id"))
  }

  /** Per-kind rollup of the REAL decoded corpus — the "profile your
    * media corpus before training" scan, now over parsed headers and
    * summed pixel bytes rather than payload sizes.
    */
  val kindProfile: QuerySpec = QuerySpec.sql(
    "q31_kind_profile",
    s"""WITH $ppmSumsCtes
      |SELECT kind, count(*) AS n_assets,
      |  CAST(count(*) AS BIGINT) AS n_valid,
      |  CAST(sum(n_px) AS BIGINT) AS total_px,
      |  CAST(max(width) AS INT) AS max_width,
      |  CAST(min(height) AS INT) AS min_height,
      |  round(CAST(sum(r_sum + g_sum + b_sum) AS DOUBLE)
      |    / (3.0 * sum(n_px)) + 1e-9, 6) AS mean_luma
      |FROM sums
      |GROUP BY kind
      |ORDER BY kind""".stripMargin
  ) { (spark, dir) =>
    Multimodal.ppmAssets(Tables.load(spark, dir, "documents"))
      .withColumn("d", Multimodal.ppmDecode(col("payload")))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_assets"),
        sum(when(col("d.valid"), 1L).otherwise(0L)).as("n_valid"),
        sum(col("d.n_px")).as("total_px"),
        max(col("d.width")).as("max_width"),
        min(col("d.height")).as("min_height"),
        round((sum(col("d.r_sum") + col("d.g_sum") + col("d.b_sum"))
            .cast("double") / (lit(3.0) * sum(col("d.n_px"))))
          + lit(1e-9), 6).as("mean_luma"))
      .orderBy(col("kind"))
  }

  /** Fixed-size binary block chunking + per-block checksums — the
    * content-addressable-storage shape (dedupe/transfer at block
    * granularity): each asset's payload splits into 64-byte blocks via a
    * `sequence`+`explode` generator, every block gets an md5, and the
    * per-asset rollup reports block counts, distinct-block counts (intra-
    * asset dedup potential), and the head checksum. Block bytes travel as
    * hex text because the oracle's engine has no BLOB slicing — the md5
    * is over the hex string in BOTH engines, byte-identical either way.
    * At scale this is pure per-row generator work: no shuffle until the
    * (already tiny) per-asset rollup.
    */
  val binaryBlocks: QuerySpec = QuerySpec.sql(
    "q77_binary_blocks",
    s"""WITH assets AS (
      |  SELECT doc_id AS asset_id,
      |    (['image', 'audio', 'video'])[CAST($charHashSource % 3 + 1 AS INT)] AS kind,
      |    octet_length(CAST(text AS BLOB)) AS n_bytes,
      |    hex(CAST(text AS BLOB)) AS hx
      |  FROM documents),
      |b AS (
      |  SELECT asset_id, kind, CAST(n_bytes AS BIGINT) AS n_bytes,
      |    greatest(CAST(ceil(n_bytes / 64.0) AS BIGINT), 1) AS n_blocks, hx
      |  FROM assets),
      |bl AS (
      |  SELECT asset_id, kind, n_bytes, n_blocks,
      |    [md5(substring(hx, CAST(i * 128 + 1 AS BIGINT), 128))
      |     FOR i IN range(0, n_blocks)] AS bhs
      |  FROM b)
      |SELECT asset_id, kind, n_bytes, n_blocks,
      |  CAST(len(list_distinct(bhs)) AS BIGINT) AS n_distinct_blocks,
      |  bhs[1] AS head_md5,
      |  CAST(n_bytes - 64 * (n_blocks - 1) AS BIGINT) AS tail_bytes
      |FROM bl
      |ORDER BY asset_id""".stripMargin
  ) { (spark, dir) =>
    val a = Multimodal.assets(Tables.load(spark, dir, "documents"))
      .select(col("asset_id"), col("kind"),
        col("n_bytes").cast("long").as("n_bytes"),
        greatest(ceil(col("n_bytes") / 64.0).cast("long"), lit(1L))
          .as("n_blocks"),
        hex(col("payload")).as("hx"))
    a.select(col("asset_id"), col("kind"), col("n_bytes"), col("n_blocks"),
        col("hx"), explode(sequence(lit(0L), col("n_blocks") - 1)).as("blk"))
      .withColumn("bh",
        md5(expr("cast(substring(hx, blk * 128 + 1, 128) as binary)")))
      .groupBy(col("asset_id"), col("kind"), col("n_bytes"), col("n_blocks"))
      .agg(countDistinct(col("bh")).as("n_distinct_blocks"),
        max(when(col("blk") === 0, col("bh"))).as("head_md5"))
      .withColumn("tail_bytes",
        col("n_bytes") - lit(64L) * (col("n_blocks") - 1))
      .orderBy(col("asset_id"))
  }

  /** Per-asset REAL audio decode: the RIFF/WAVE PCM kernel
    * ([[graft.expressions.WavDecode]]) chunk-walks the actual header
    * bytes and folds the actual 16-bit LE samples into loudness/shape
    * facts (sum |s|, peak, zero crossings — the filters an audio
    * curation pipeline gates on). As with q30, the oracle replays the
    * SAMPLE FORMULA, never the parse: a wrong chunk offset, endianness
    * slip, or sign-extension bug hash-mismatches. All-integer except
    * the rounded mean.
    */
  val audioDecode: QuerySpec = QuerySpec.sql(
    "q189_audio_decode",
    s"""WITH a AS (
      |  SELECT doc_id AS asset_id,
      |    (['image', 'audio', 'video'])[CAST($charHashSource % 3 + 1 AS INT)] AS kind,
      |    8000 + (doc_id % 3) * 4000 AS rate,
      |    400 + doc_id % 300 AS n
      |  FROM documents),
      |s AS (
      |  SELECT asset_id, kind, rate, n,
      |    [(asset_id*57 + i*13) % 4001 - 2000
      |     FOR i IN range(0, n)] AS smp
      |  FROM a)
      |SELECT asset_id, kind, TRUE AS valid, CAST(1 AS INT) AS channels,
      |  CAST(rate AS INT) AS sample_rate, CAST(16 AS INT) AS bits,
      |  CAST(n AS BIGINT) AS n_samples,
      |  CAST(n * 1000 // rate AS BIGINT) AS duration_ms,
      |  CAST(list_sum(list_transform(smp, x -> abs(x))) AS BIGINT) AS sum_abs,
      |  CAST(list_max(list_transform(smp, x -> abs(x))) AS INT) AS peak,
      |  CAST(len([i FOR i IN range(1, n) IF smp[i] * smp[i+1] < 0])
      |    AS BIGINT) AS zero_crossings,
      |  round(CAST(list_sum(list_transform(smp, x -> abs(x))) AS DOUBLE)
      |    / n + 1e-9, 6) AS mean_abs
      |FROM s
      |ORDER BY asset_id""".stripMargin
  ) { (spark, dir) =>
    Multimodal.wavAssets(Tables.load(spark, dir, "documents"))
      .withColumn("d", Multimodal.wavDecode(col("payload")))
      .select(col("asset_id"), col("kind"),
        col("d.valid").as("valid"), col("d.channels").as("channels"),
        col("d.sample_rate").as("sample_rate"), col("d.bits").as("bits"),
        col("d.n_samples").as("n_samples"),
        col("d.duration_ms").as("duration_ms"),
        col("d.sum_abs").as("sum_abs"), col("d.peak").as("peak"),
        col("d.zero_crossings").as("zero_crossings"),
        round(col("d.sum_abs").cast("double") / col("d.n_samples")
          + lit(1e-9), 6).as("mean_abs"))
      .orderBy(col("asset_id"))
  }

  /** Per-asset REAL video probe: the concatenated-P6 stream kernel
    * ([[graft.expressions.PpmStreamDecode]]) walks actual frame headers
    * back-to-back and folds first/last-frame luminance — the temporal
    * drift a static-clip / scene-change filter gates on. Oracle replays
    * the frame formula; a frame-boundary slip (header length, byte
    * stride) hash-mismatches. All-integer except the rounded drift.
    */
  val videoProbe: QuerySpec = QuerySpec.sql(
    "q190_video_probe",
    s"""WITH a AS (
      |  SELECT doc_id AS asset_id,
      |    (['image', 'audio', 'video'])[CAST($charHashSource % 3 + 1 AS INT)] AS kind,
      |    2 + doc_id % 4 AS nf
      |  FROM documents),
      |s AS (
      |  SELECT asset_id, kind, nf,
      |    CAST(list_sum([(asset_id*31 + i*7) % 256
      |      FOR i IN range(0, 144)]) AS BIGINT) AS first_luma,
      |    CAST(list_sum([(asset_id*31 + (nf-1)*17 + i*7) % 256
      |      FOR i IN range(0, 144)]) AS BIGINT) AS last_luma
      |  FROM a)
      |SELECT asset_id, kind, TRUE AS valid,
      |  CAST(nf AS BIGINT) AS n_frames,
      |  CAST(8 AS INT) AS width, CAST(6 AS INT) AS height,
      |  CAST(nf * 48 AS BIGINT) AS n_px_total,
      |  first_luma, last_luma,
      |  round(abs(CAST(last_luma AS DOUBLE) - first_luma) / 144.0
      |    + 1e-9, 6) AS luma_drift
      |FROM s
      |ORDER BY asset_id""".stripMargin
  ) { (spark, dir) =>
    Multimodal.videoAssets(Tables.load(spark, dir, "documents"))
      .withColumn("d", Multimodal.videoDecode(col("payload")))
      .select(col("asset_id"), col("kind"),
        col("d.valid").as("valid"),
        col("d.n_frames").as("n_frames"),
        col("d.width").as("width"), col("d.height").as("height"),
        col("d.n_px_total").as("n_px_total"),
        col("d.first_luma_sum").as("first_luma"),
        col("d.last_luma_sum").as("last_luma"),
        round(abs(col("d.last_luma_sum").cast("double")
            - col("d.first_luma_sum")) / lit(144.0) + lit(1e-9), 6)
          .as("luma_drift"))
      .orderBy(col("asset_id"))
  }

  /** REAL resize → decode round trip: every asset's P6 payload is
    * nearest-neighbor-resized to 8×6 BY THE BYTE KERNEL
    * ([[graft.expressions.PpmResize]] — the output is itself a
    * decodable P6 blob), then the RESIZED bytes are decoded and their
    * channel sums served. The oracle replays the floor-mapping
    * coordinate arithmetic (`sx = ox·w/8`, `sy = oy·h/6`) over the
    * pixel formula — a resize stride/offset slip or a header slip in
    * the EMITTED blob hash-mismatches. Replaces the round-11 metadata-
    * only resize stub with actual pixel work.
    */
  val resizeDecode: QuerySpec = QuerySpec.sql(
    "q191_resize_decode",
    s"""WITH dims AS (
      |  SELECT doc_id AS asset_id,
      |    (['image', 'audio', 'video'])[CAST($charHashSource % 3 + 1 AS INT)] AS kind,
      |    CAST(16 + doc_id % 17 AS INT) AS width,
      |    CAST(12 + doc_id % 11 AS INT) AS height
      |  FROM documents),
      |sums AS (
      |  SELECT asset_id, kind,
      |    CAST(list_sum(list_transform(
      |      [3*(((p//8) * height // 6) * width + ((p%8) * width // 8)) + 0
      |       FOR p IN range(0, 48)],
      |      j -> (asset_id*31 + j*7 + (j*j)%251) % 256)) AS BIGINT) AS r_sum,
      |    CAST(list_sum(list_transform(
      |      [3*(((p//8) * height // 6) * width + ((p%8) * width // 8)) + 1
      |       FOR p IN range(0, 48)],
      |      j -> (asset_id*31 + j*7 + (j*j)%251) % 256)) AS BIGINT) AS g_sum,
      |    CAST(list_sum(list_transform(
      |      [3*(((p//8) * height // 6) * width + ((p%8) * width // 8)) + 2
      |       FOR p IN range(0, 48)],
      |      j -> (asset_id*31 + j*7 + (j*j)%251) % 256)) AS BIGINT) AS b_sum
      |  FROM dims)
      |SELECT asset_id, kind, TRUE AS valid, CAST(8 AS INT) AS width,
      |  CAST(6 AS INT) AS height, CAST(48 AS BIGINT) AS n_px,
      |  r_sum, g_sum, b_sum,
      |  round(CAST(r_sum + g_sum + b_sum AS DOUBLE) / 144.0 + 1e-9, 6)
      |    AS luma_mean
      |FROM sums
      |ORDER BY asset_id""".stripMargin
  ) { (spark, dir) =>
    Multimodal.ppmAssets(Tables.load(spark, dir, "documents"))
      .withColumn("small",
        graft.expressions.Netpbm.resizeColumn(col("payload"), 8, 6))
      .withColumn("d", Multimodal.ppmDecode(col("small")))
      .select(col("asset_id"), col("kind"),
        col("d.valid").as("valid"), col("d.width").as("width"),
        col("d.height").as("height"), col("d.n_px").as("n_px"),
        col("d.r_sum").as("r_sum"), col("d.g_sum").as("g_sum"),
        col("d.b_sum").as("b_sum"),
        round((col("d.r_sum") + col("d.g_sum") + col("d.b_sum"))
            .cast("double") / lit(144.0) + lit(1e-9), 6).as("luma_mean"))
      .orderBy(col("asset_id"))
  }

  /** REAL frame sampling: every 2nd frame of each video stream is
    * decoded BY OFFSET WALK ([[graft.expressions.PpmSampleFrames]] —
    * skipped frames cost a header parse + jump, exactly how a seekable
    * container subsamples) and served as one row per sampled frame.
    * Replaces the byte-count frame stub with actual per-frame pixel
    * work; the oracle replays the frame formula for sampled indices.
    */
  val frameSample: QuerySpec = QuerySpec.sql(
    "q192_frame_sample",
    s"""WITH a AS (
      |  SELECT doc_id AS asset_id,
      |    (['image', 'audio', 'video'])[CAST($charHashSource % 3 + 1 AS INT)] AS kind,
      |    2 + doc_id % 4 AS nf
      |  FROM documents),
      |f AS (
      |  SELECT asset_id, kind,
      |    unnest([f FOR f IN range(0, nf) IF f % 2 = 0]) AS f
      |  FROM a)
      |SELECT asset_id, kind, CAST(f AS BIGINT) AS frame_idx,
      |  round(CAST(list_sum([(asset_id*31 + f*17 + i*7) % 256
      |      FOR i IN range(0, 144)]) AS DOUBLE) / 144.0 + 1e-9, 6)
      |    AS luma_mean
      |FROM f
      |ORDER BY asset_id, frame_idx""".stripMargin
  ) { (spark, dir) =>
    Multimodal.videoAssets(Tables.load(spark, dir, "documents"))
      .select(col("asset_id"), col("kind"),
        posexplode(graft.expressions.Netpbm
          .sampleFrameLumasColumn(col("payload"), 2)).as(Seq("pos", "luma")))
      .select(col("asset_id"), col("kind"),
        (col("pos") * 2L).cast("long").as("frame_idx"),
        round(col("luma") + lit(1e-9), 6).as("luma_mean"))
      .orderBy(col("asset_id"), col("frame_idx"))
  }

  val all: Seq[QuerySpec] = Seq(assetDecode, kindProfile, binaryBlocks,
    audioDecode, videoProbe, resizeDecode, frameSample)
}
