package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.multimodal.Multimodal.Asset

class MultimodalSpec extends SparkTestBase {

  private def assetsDf = Multimodal.assets(
    spark.read.parquet(s"$sfDir/documents.parquet"))

  test("assets carry a true binary payload with size metadata") {
    val schema = assetsDf.schema
    assert(schema("payload").dataType ===
      org.apache.spark.sql.types.BinaryType)
    val r = assetsDf.select(col("n_bytes"),
      octet_length(col("payload"))).collect()
    assert(r.forall(x => x.getInt(0) === x.getInt(1)))
  }

  test("kind assignment is deterministic and covers all three modalities") {
    val kinds = assetsDf.select("kind").distinct()
      .collect().map(_.getString(0)).toSet
    assert(kinds === Set("image", "audio", "video"))
    val a = assetsDf.select("asset_id", "kind").collect().toSet
    val b = assetsDf.select("asset_id", "kind").collect().toSet
    assert(a === b)
  }

  private def ppmAssetsDf = Multimodal.ppmAssets(
    spark.read.parquet(s"$sfDir/documents.parquet"))

  test("ppm assets encode REAL P6 blobs: magic, header dims, payload " +
      "length, and pixel bytes match the generating formula") {
    val rows = ppmAssetsDf
      .select("asset_id", "width", "height", "payload").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getLong(0); val w = r.getInt(1); val h = r.getInt(2)
      val b = r.getAs[Array[Byte]](3)
      assert(b(0) == 'P' && b(1) == '6', s"asset $d: bad magic")
      val hdr = graft.expressions.Netpbm.parseHeader(b)
      assert(hdr != null, s"asset $d: unparseable header")
      assert(hdr(0) == w && hdr(1) == h && hdr(2) == 255)
      assert(b.length == hdr(3) + 3 * w * h, s"asset $d: payload length")
      // spot-check raw bytes against the formula at both ends
      Seq(0, 3 * w * h - 1).foreach { i =>
        val expect = ((d * 31 + i.toLong * 7 + (i.toLong * i) % 251) % 256).toInt
        assert((b(hdr(3) + i) & 0xFF) == expect, s"asset $d byte $i")
      }
    }
  }

  test("partition-batched codec decode matches the codegen expression " +
      "over the same real P6 bytes") {
    import spark.implicits._
    val typed = ppmAssetsDf
      .select(col("asset_id"), col("kind"), col("payload"),
        octet_length(col("payload")).as("n_bytes")).as[Asset]
    val viaPartitions = Multimodal.decodePpmPartitioned(typed)
      .collect().map(r => (r.asset_id, r.valid, r.width, r.height,
        r.maxval, r.n_px, r.r_sum, r.g_sum, r.b_sum)).toSet
    val viaExpression = ppmAssetsDf
      .withColumn("d", Multimodal.ppmDecode(col("payload")))
      .select(col("asset_id"), col("d.valid"), col("d.width"),
        col("d.height"), col("d.maxval"), col("d.n_px"), col("d.r_sum"),
        col("d.g_sum"), col("d.b_sum"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getInt(2),
        r.getInt(3), r.getInt(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8))).toSet
    assert(viaPartitions === viaExpression)
    assert(viaExpression.forall(_._2), "every encoded asset must decode")
  }

  test("resize scales dimension metadata and size estimate deterministically") {
    val withMeta = assetsDf
      .withColumn("seed", Multimodal.decodeSeed(col("payload")))
      .withColumn("meta", Multimodal.dimensionMeta(col("seed")))
      .withColumn("resized",
        Multimodal.resizeMeta(col("meta"), col("n_bytes"), 0.5))
    val r = withMeta.select(
      col("meta.width"), col("meta.height"),
      col("resized.width"), col("resized.height"),
      col("n_bytes"), col("resized.est_bytes")).collect()
    r.foreach { row =>
      assert(row.getInt(2) === math.ceil(row.getInt(0) * 0.5).toInt)
      assert(row.getInt(3) === math.ceil(row.getInt(1) * 0.5).toInt)
      assert(row.getLong(5) === math.ceil(row.getInt(4) * 0.25).toLong)
    }
    // deterministic across evaluations
    val a = withMeta.select("asset_id", "resized").collect().map(_.toString).sorted.toSeq
    val b = withMeta.select("asset_id", "resized").collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }

  test("frame count is ceil of payload size over chunk size") {
    import spark.implicits._
    val df = Seq((1L, 0), (2L, 1), (3L, 64), (4L, 65)).toDF("id", "n")
    val out = df.select(col("id"), Multimodal.frameCount(col("n")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("frame sampling emits every k-th index; empty assets emit none") {
    import spark.implicits._
    // 320 bytes -> 5 frames, stride 2 -> indices 0,2,4; 0 bytes -> none;
    // 65 bytes -> 2 frames, stride 2 -> index 0 only
    val df = Seq((1L, 320, 100L), (2L, 0, 7L), (3L, 65, 50L))
      .toDF("asset_id", "n_bytes", "seed")
    val out = Multimodal.sampleFrames(df, stride = 2)
      .select("asset_id", "frame_idx", "frame_seed")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((1L, 0L, 100L), (1L, 2L, 102L), (1L, 4L, 104L),
      (3L, 0L, 50L)))
    // over the fixture: rows per asset == ceil(frameCount / stride)
    val assets = assetsDf
      .withColumn("seed", Multimodal.decodeSeed(col("payload")))
    val counts = Multimodal.sampleFrames(assets, stride = 3)
      .groupBy("asset_id").count()
      .join(assets.select(col("asset_id"),
        Multimodal.frameCount(col("n_bytes")).as("fc")), "asset_id")
      .select("count", "fc").collect()
    assert(counts.nonEmpty)
    counts.foreach(r => assert(r.getLong(0) === (r.getLong(1) + 2) / 3))
  }
}
