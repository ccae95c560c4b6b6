package graft.queries

import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.multimodal.Multimodal
import graft.sources.Tables

/** Multimodal plumbing exercised end-to-end (north-star extension): build
  * binary assets, decode (stubbed — see [[Multimodal]]), extract pseudo
  * features, frame-sample, and roll up per kind. The DuckDB oracle
  * reproduces the deterministic stubs byte-for-byte.
  */
object MultimodalQueries {

  private val charHashText = graft.functions.Text.charHashSql("text")
  private val charHashSource = graft.functions.Text.charHashSql("source")

  /** Per-asset decode: payload bytes → seed, 4 pseudo-features, frame
    * count, with kind + size metadata.
    */
  val assetDecode: QuerySpec = QuerySpec.sql(
    "q30_asset_decode",
    s"""WITH assets AS (
      |  SELECT doc_id AS asset_id,
      |    (['image', 'audio', 'video'])[CAST($charHashSource % 3 + 1 AS INT)] AS kind,
      |    octet_length(CAST(text AS BLOB)) AS n_bytes,
      |    $charHashText AS seed
      |  FROM documents)
      |SELECT asset_id, kind, CAST(n_bytes AS INT) AS n_bytes, seed,
      |  round(CAST(seed * 1 % 1009 AS DOUBLE) / 1009.0 + 1e-9, 6) AS f1,
      |  round(CAST(seed * 2 % 1009 AS DOUBLE) / 1009.0 + 1e-9, 6) AS f2,
      |  round(CAST(seed * 3 % 1009 AS DOUBLE) / 1009.0 + 1e-9, 6) AS f3,
      |  round(CAST(seed * 4 % 1009 AS DOUBLE) / 1009.0 + 1e-9, 6) AS f4,
      |  CAST(ceil(n_bytes / 64.0) AS BIGINT) AS n_frames
      |FROM assets
      |ORDER BY asset_id""".stripMargin
  ) { (spark, dir) =>
    val a = Multimodal.assets(Tables.load(spark, dir, "documents"))
      .withColumn("seed", Multimodal.decodeSeed(col("payload")))
      .withColumn("features", Multimodal.fakeFeatures(col("seed")))
      .withColumn("n_frames", Multimodal.frameCount(col("n_bytes")))
    a.select(col("asset_id"), col("kind"), col("n_bytes"), col("seed"),
        round(element_at(col("features"), 1) + lit(1e-9), 6).as("f1"),
        round(element_at(col("features"), 2) + lit(1e-9), 6).as("f2"),
        round(element_at(col("features"), 3) + lit(1e-9), 6).as("f3"),
        round(element_at(col("features"), 4) + lit(1e-9), 6).as("f4"),
        col("n_frames"))
      .orderBy(col("asset_id"))
  }

  /** Per-kind rollup of the decoded assets — the "profile your media
    * corpus before training" scan.
    */
  val kindProfile: QuerySpec = QuerySpec.sql(
    "q31_kind_profile",
    s"""WITH assets AS (
      |  SELECT doc_id AS asset_id,
      |    (['image', 'audio', 'video'])[CAST($charHashSource % 3 + 1 AS INT)] AS kind,
      |    octet_length(CAST(text AS BLOB)) AS n_bytes
      |  FROM documents)
      |SELECT kind, count(*) AS n_assets,
      |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
      |  ${graft.functions.Stable.avg4Sql("n_bytes")} AS avg_bytes,
      |  CAST(max(n_bytes) AS INT) AS max_bytes,
      |  CAST(sum(CAST(ceil(n_bytes / 64.0) AS BIGINT)) AS BIGINT) AS total_frames
      |FROM assets
      |GROUP BY kind
      |ORDER BY kind""".stripMargin
  ) { (spark, dir) =>
    Multimodal.assets(Tables.load(spark, dir, "documents"))
      .withColumn("n_frames", Multimodal.frameCount(col("n_bytes")))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).cast("long").as("total_bytes"),
        graft.functions.Stable.avg4(col("n_bytes")).as("avg_bytes"),
        max(col("n_bytes")).as("max_bytes"),
        sum(col("n_frames")).as("total_frames"))
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

  val all: Seq[QuerySpec] = Seq(assetDecode, kindProfile, binaryBlocks)
}
