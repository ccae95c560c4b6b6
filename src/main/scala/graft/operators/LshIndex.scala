package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Persisted MinHash-LSH band index with O(delta) incremental
  * maintenance — the dedup-index counterpart of [[IvfAnn]]'s cell
  * layout (reference scope: the corpus-dedup north star; the reference
  * itself recomputes dedup from scratch each run, `03_bronze_processing
  * .py:63-87` row_number dedup).
  *
  * The index is a plain parquet table of `(doc_id, band, bkt)` rows —
  * [[MinHashLSH.Bands]] rows per document, one per signature band. A
  * NEW batch of documents is admitted by:
  *
  *  1. computing the batch's signatures/band rows (pure scalar scan,
  *     O(|delta|), no corpus access);
  *  2. probing the persisted index with an equi-join on `(band, bkt)` —
  *     candidate cost tracks true collision density, never
  *     |delta|×|corpus|;
  *  3. Jaccard-verifying candidates against ONLY the collided corpus
  *     docs' shingles (semi-join — O(matches) corpus re-reads);
  *  4. appending the non-duplicate docs' band rows — the corpus is
  *     never rewritten and the quantizer-free index never retrains.
  *
  * At 100 TB the index table is bucketed by `bkt` so the probe is a
  * co-located join; here it is a plain parquet dir and the probe
  * shuffles |delta|·Bands + collided index rows only (AQE broadcasts
  * the delta side when small, which is the steady-state ingest shape).
  */
object LshIndex {

  /** `(idCol, band, bkt)` band-bucket rows for every input doc:
    * the exploded LSH index entries of `shCol` (distinct shingle
    * hashes). Exactly [[MinHashLSH.Bands]] rows per input row.
    */
  def bandRows(df: DataFrame, idCol: String, shCol: String): DataFrame = {
    import MinHashLSH.{Bands, RowsPerBand}
    df.withColumn("__sig", MinHashLSH.signature(col(shCol)))
      .select(col(idCol), explode(array((0 until Bands).map { b =>
        struct(lit(b).as("band"),
          array_join(slice(col("__sig"), b * RowsPerBand + 1, RowsPerBand), "_")
            .as("bkt"))
      }: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.bkt").as("bkt"))
  }

  /** Materialize the index for a corpus (crash-safe overwrite swap). */
  def write(corpus: DataFrame, idCol: String, shCol: String,
      path: String): Unit =
    Tables.overwrite(bandRows(corpus, idCol, shCol), path)

  /** Probe the persisted index with a delta batch: distinct
    * `(deltaId, indexId)` pairs sharing any band bucket. Only the
    * index rows whose buckets collide ever leave the scan; pending
    * logical deletes ([[delete]]) are filtered with a broadcast
    * anti-join against the (compaction-bounded) tombstone set.
    */
  def candidates(spark: SparkSession, path: String, delta: DataFrame,
      idCol: String, shCol: String): DataFrame = {
    val index = graft.sources.Tombstones
      .filterLive(spark, path, spark.read.parquet(path), idCol)
    bandRows(delta, idCol, shCol).as("d")
      .join(index.as("c"),
        col("d.band") === col("c.band") && col("d.bkt") === col("c.bkt"))
      .select(col(s"d.$idCol").as("deltaId"), col(s"c.$idCol").as("indexId"))
      .distinct()
  }

  /** LOGICAL delete of documents from the index — the shared
    * [[graft.sources.Tombstones]] mechanics: O(|deletes|) append-only
    * markers. [[candidates]] skips tombstoned docs at probe time — a
    * forgotten document must stop blocking new admissions IMMEDIATELY,
    * not at compaction cadence — and the next [[compact]] drops their
    * band rows physically (its publish swap clears the markers with
    * the old directory). The right-to-be-forgotten shape for the dedup
    * index: the delete path never rewrites the corpus.
    */
  def delete(spark: SparkSession, path: String, ids: DataFrame,
      idCol: String): Unit =
    graft.sources.Tombstones.write(spark, path, ids, idCol)

  /** The index's pending tombstones (None when nothing was deleted). */
  def tombstones(spark: SparkSession, path: String): Option[DataFrame] =
    graft.sources.Tombstones.read(spark, path)

  /** Append a batch's band rows to the index — O(|batch|), new files
    * only, no rewrite. Caller admits the batch first (see
    * [[candidates]] + Jaccard verify).
    */
  def append(batch: DataFrame, idCol: String, shCol: String,
      path: String): Unit =
    Tables.append(bandRows(batch, idCol, shCol), path)

  /** Compact the index: per-batch appends accumulate one small file
    * each, and probe cost degrades with file COUNT (open/footer per
    * file) long before it degrades with rows. The rewrite coalesces to
    * `targetFiles` and swaps in via the crash-safe publish chain —
    * the [[IvfAnn.compactCells]] discipline for the dedup index
    * (content untouched, spec-asserted). At scale, compact into files
    * BUCKETED by `bkt` so the admission probe becomes a co-located
    * join.
    */
  def compact(spark: SparkSession, path: String, targetFiles: Int = 1): Unit = {
    val staged = path + ".__compact__"
    val base = spark.read.parquet(path)
    // index schema is (idCol, band, bkt) — id is the first column by
    // [[bandRows]] construction; pending tombstones apply physically here
    val live = graft.sources.Tombstones
      .filterLive(spark, path, base, base.columns.head)
    live.repartition(targetFiles)
      .write.mode("overwrite").parquet(staged)
    Tables.publish(spark, staged, path)
  }
}
