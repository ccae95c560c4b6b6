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

  test("partition-batched codec decode matches the expression stubs") {
    import spark.implicits._
    val typed = assetsDf.as[Asset]
    val viaPartitions = Multimodal.decodePartitioned(typed)
      .select(col("asset_id"), col("seed"), col("features"), col("n_frames"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Double](2).toList, r.getInt(3))).toSet
    val viaExpressions = assetsDf
      .withColumn("seed", Multimodal.decodeSeed(col("payload")))
      .withColumn("features", Multimodal.fakeFeatures(col("seed")))
      .withColumn("n_frames", Multimodal.frameCount(col("n_bytes")))
      .select(col("asset_id"), col("seed"), col("features"), col("n_frames"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Double](2).toList, r.getLong(3).toInt)).toSet
    assert(viaPartitions === viaExpressions)
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
