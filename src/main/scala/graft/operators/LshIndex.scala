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
  * Two physical layouts serve the probe: the plain parquet dir (the
  * ingest tier — appends are cheap, the probe shuffles |delta|·Bands +
  * collided index rows, AQE broadcasts the delta side when small), and
  * the [[compactBucketed]] catalog table bucketed by `bkt` (the 100 TB
  * steady state — [[candidatesBucketed]] plans with zero exchange over
  * the index side, so the corpus-sized scan never moves however big
  * the delta).
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

  /** The probe join shared by every serving tier: prebuilt delta band
    * rows equi-joined to an index frame on `(band, bkt)`. Taking the
    * band rows (not the raw delta) lets a multi-tier probe reuse ONE
    * signature scan of the delta across tiers ([[candidatesHybrid]]).
    */
  private def probeBands(dBand: DataFrame, index: DataFrame,
      idCol: String): DataFrame =
    dBand.as("d")
      .join(index.as("c"),
        col("d.band") === col("c.band") && col("d.bkt") === col("c.bkt"))
      .select(col(s"d.$idCol").as("deltaId"), col(s"c.$idCol").as("indexId"))

  private def probe(index: DataFrame, delta: DataFrame, idCol: String,
      shCol: String): DataFrame =
    probeBands(bandRows(delta, idCol, shCol), index, idCol)

  /** Probe the persisted index with a delta batch: distinct
    * `(deltaId, indexId)` pairs sharing any band bucket. Only the
    * index rows whose buckets collide ever leave the scan; pending
    * logical deletes ([[delete]]) are filtered with an anti-join
    * against the (compaction-bounded) tombstone set.
    */
  def candidates(spark: SparkSession, path: String, delta: DataFrame,
      idCol: String, shCol: String): DataFrame =
    probe(graft.sources.Tombstones
        .filterLive(spark, path, spark.read.parquet(path), idCol),
      delta, idCol, shCol).distinct()

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
    * [[candidates]] + Jaccard verify). Any stale tombstone matching a
    * batch id is cleared ([[graft.sources.Tombstones.unmark]]): a
    * forgotten-then-readmitted document must serve its NEW band rows,
    * not stay masked until a compaction silently drops them.
    */
  def append(batch: DataFrame, idCol: String, shCol: String,
      path: String): Unit = {
    Tables.append(bandRows(batch, idCol, shCol), path)
    graft.sources.Tombstones
      .unmark(batch.sparkSession, path, batch, idCol)
  }

  /** Compact the index: per-batch appends accumulate one small file
    * each, and probe cost degrades with file COUNT (open/footer per
    * file) long before it degrades with rows. The rewrite coalesces to
    * `targetFiles` and swaps in via the crash-safe publish chain —
    * the [[IvfAnn.compactCells]] discipline for the dedup index
    * (content untouched, spec-asserted). `idCol` names the id column
    * explicitly — inferring it from column position would silently
    * anti-join tombstones against the wrong column if a layout ever
    * arrived reordered, permanently losing the deletes. Markers
    * appended while the compaction ran are carried into the new layout
    * instead of vanishing with the publish swap. For the 100 TB
    * steady-state probe layout, see [[compactBucketed]].
    */
  def compact(spark: SparkSession, path: String, idCol: String,
      targetFiles: Int = 1): Unit = {
    val staged = path + ".__compact__"
    val base = spark.read.parquet(path)
    require(base.columns.contains(idCol),
      s"id column '$idCol' not in index schema ${base.columns.mkString(",")}")
    val snap = graft.sources.Tombstones.fileSnapshot(spark, path)
    // pending tombstones apply physically here
    val live = graft.sources.Tombstones.filterLive(spark, path, base, idCol)
    live.repartition(targetFiles)
      .write.mode("overwrite").parquet(staged)
    // deletes that arrived mid-compaction ride into the new layout
    graft.sources.Tombstones.carryInto(spark, path, snap, staged)
    Tables.publish(spark, staged, path)
  }

  /** Compact the index into a catalog table BUCKETED by `(band, bkt)`
    * — the steady-state serving layout at 100 TB: the admission probe
    * joins on `(band, bkt)`, and a scan of a table bucketed on exactly
    * those keys already satisfies the join's clustering, so
    * [[candidatesBucketed]] plans with NO exchange over the index side
    * (spec-pinned; bucketing on `bkt` alone would still shuffle —
    * Spark's co-partitioning check requires ALL join keys). The
    * corpus-sized side of every future probe stops moving; only the
    * delta shuffles. Pending tombstones apply physically here, exactly
    * like [[compact]].
    */
  def compactBucketed(spark: SparkSession, path: String, table: String,
      buckets: Int, idCol: String): Unit = {
    val base = spark.read.parquet(path)
    require(base.columns.contains(idCol),
      s"id column '$idCol' not in index schema ${base.columns.mkString(",")}")
    val live = graft.sources.Tombstones.filterLive(spark, path, base, idCol)
    graft.layout.Bucketing
      .writeBucketedBy(live, table, Seq("band", "bkt"), buckets)
  }

  /** [[candidates]] against a [[compactBucketed]] catalog table: same
    * distinct `(deltaId, indexId)` contract, but the index side reads
    * pre-clustered by `bkt` — a small delta broadcasts (index side
    * streamed, zero exchange), and a LARGE backfill delta degrades to a
    * sort-merge join where only the DELTA shuffles into the index's
    * bucket layout. Either way the index never moves.
    *
    * Delete contract: the table is a COMPACTED generation — pending
    * markers were applied physically when it was built, and this probe
    * has no marker dir to consult, so deletes written AFTER the
    * compaction are NOT masked here. Immediate masking goes through
    * [[candidatesHybrid]] (the path tier's markers mask both tiers) or
    * a re-run of [[compactBucketed]].
    */
  def candidatesBucketed(spark: SparkSession, table: String,
      delta: DataFrame, idCol: String, shCol: String): DataFrame = {
    graft.layout.Bucketing.recoverSwap(spark, table)
    probe(spark.table(table), delta, idCol, shCol).distinct()
  }

  /** [[compactBucketed]] PLUS ingest-tier truncation — the two-tier
    * (lambda) layout rollover: after this call `table` serves the
    * compacted bulk and `path` is an EMPTY band-rows dir that receives
    * subsequent [[append]]s, which [[candidatesHybrid]] probes
    * alongside the table.
    *
    * Rollover N>1 folds BOTH tiers — `table` ∪ `path` — into the new
    * bulk generation: the table holds everything compacted by earlier
    * rollovers, and compacting only the ingest tier would OVERWRITE the
    * bulk with the latest appends, silently un-indexing the whole
    * compacted corpus (round-9 verdict). Because the new generation
    * reads from the table it replaces, it materializes under a staged
    * catalog name and swaps in by rename
    * ([[graft.layout.Bucketing.writeBucketedBySwap]]). Pending
    * tombstones apply physically to both tiers; markers that arrive
    * while the rollover runs are carried into the truncated ingest dir
    * ([[graft.sources.Tombstones.carryInto]] — the [[compact]]
    * discipline) so [[candidatesHybrid]] keeps masking them in either
    * tier. Truncation publishes through the crash-safe swap.
    *
    * Crash/retry contract: a rollover interrupted mid-swap is recovered
    * by [[graft.layout.Bucketing.recoverSwap]] (called here before the
    * bulk-exists check — without it a retry would take the empty-bulk
    * branch and rebuild the table from the ingest tier alone). A retry
    * after a crash BETWEEN the swap and the truncate re-folds rows the
    * staged generation already absorbed, leaving exact-duplicate band
    * rows in the bulk — harmless by design: probes close with
    * `distinct()` and the index already tolerates full-row duplicates
    * from same-content re-admission ([[append]] after [[delete]]).
    */
  def compactBucketedAndTruncate(spark: SparkSession, path: String,
      table: String, buckets: Int, idCol: String): Unit =
    compactBucketedAndTruncate(spark, path, table, buckets, idCol, () => ())

  /** Test seam: `midRollover` runs after the new bulk generation is
    * materialized (live read done) and before the ingest tier
    * truncates — the race window the marker snapshot/carry covers.
    */
  private[graft] def compactBucketedAndTruncate(spark: SparkSession,
      path: String, table: String, buckets: Int, idCol: String,
      midRollover: () => Unit): Unit = {
    val snap = graft.sources.Tombstones.fileSnapshot(spark, path)
    val pathRows = spark.read.parquet(path)
    require(pathRows.columns.contains(idCol),
      s"id column '$idCol' not in index schema ${pathRows.columns.mkString(",")}")
    // a crashed earlier swap may have left the bulk under its staged
    // name — promote it BEFORE the exists check, or this rollover would
    // take the empty-bulk branch and rebuild the table from the ingest
    // tier alone, silently un-indexing the compacted corpus
    graft.layout.Bucketing.recoverSwap(spark, table)
    val bulk =
      if (spark.catalog.tableExists(table)) Some(spark.table(table)) else None
    val all = bulk.fold(pathRows)(_.unionByName(pathRows))
    // pending tombstones apply physically here — to BOTH tiers
    val live = graft.sources.Tombstones.filterLive(spark, path, all, idCol)
    if (bulk.isEmpty)
      graft.layout.Bucketing
        .writeBucketedBy(live, table, Seq("band", "bkt"), buckets)
    else
      graft.layout.Bucketing
        .writeBucketedBySwap(live, table, Seq("band", "bkt"), buckets)
    midRollover()
    val staged = path + ".__truncate__"
    pathRows.limit(0).coalesce(1)
      .write.mode("overwrite").parquet(staged)
    // deletes that arrived mid-rollover ride into the truncated tier as
    // markers instead of vanishing with the publish swap
    graft.sources.Tombstones.carryInto(spark, path, snap, staged)
    Tables.publish(spark, staged, path)
  }

  /** Per-doc shingle arrays minus corpus-wide HOT shingles (document
    * frequency > `capDf`): boilerplate shingles collapse signature
    * variance and concentrate docs into few hot buckets (the q23
    * `MaxShingleDf` rationale applied to the index itself). Docs whose
    * every shingle is hot drop out — they carry no distinguishing
    * content to dedup by and would otherwise re-pin the hottest
    * buckets. One explode + one groupBy + one semi-join + one regroup;
    * shingle sets are order-free (signatures are min-reductions), so
    * the regrouped order is immaterial.
    */
  def dfCapShingles(corpus: DataFrame, idCol: String, shCol: String,
      capDf: Long): DataFrame = {
    val ex = corpus.select(col(idCol), explode(col(shCol)).as("__s"))
    val keep = ex.groupBy(col("__s"))
      .agg(countDistinct(col(idCol)).as("df"))
      .filter(col("df") <= capDf)
      .select(col("__s"))
    ex.join(keep, Seq("__s"), "left_semi")
      .groupBy(col(idCol))
      .agg(collect_list(col("__s")).as(shCol))
  }

  /** Skew-GATED index rebuild — the decision leg completing the dedup
    * index's maintenance loop (q128 MEASURES bucket skew; this ACTS on
    * it — the [[IvfAnn.retrainIfDrifted]] pattern for the LSH family):
    * the index's total `candidate_pairs` (Σ s·(s−1)/2 over band
    * buckets — its exact probe-join cost) is computed from the index
    * rows alone, one O(index) groupBy with no corpus access. When it
    * exceeds `pairBudget`, the index rebuilds over [[dfCapShingles]]
    * shingle sets and swaps in through the crash-safe publish chain;
    * below budget nothing is touched. The expensive path hides behind
    * the cheap telemetry — q121's discipline.
    * @return (candidate_pairs observed, whether a rebuild ran)
    */
  def rebucketIfSkewed(spark: SparkSession, path: String,
      corpus: DataFrame, idCol: String, shCol: String,
      capDf: Long, pairBudget: Long): (Long, Boolean) =
    rebucketIfSkewed(spark, path, corpus, idCol, shCol, capDf, pairBudget,
      () => ())

  /** Test seam: `midRebuild` runs after the rebuilt rows materialize
    * and before the publish swap — the marker-carry race window.
    */
  private[graft] def rebucketIfSkewed(spark: SparkSession, path: String,
      corpus: DataFrame, idCol: String, shCol: String,
      capDf: Long, pairBudget: Long, midRebuild: () => Unit): (Long, Boolean) = {
    val pairs = spark.read.parquet(path)
      .groupBy(col("band"), col("bkt")).agg(count(lit(1)).as("s"))
      .agg(coalesce(sum(expr("(s * (s - 1)) div 2")), lit(0L)))
      .head.getLong(0)
    if (pairs <= pairBudget) (pairs, false)
    else {
      val staged = path + ".__rebucket__"
      val snap = graft.sources.Tombstones.fileSnapshot(spark, path)
      // the rebuild sources band rows from the CALLER's corpus, which
      // may still hold logically deleted docs — pending markers apply
      // physically here, or the publish swap would resurrect forgotten
      // documents and destroy their markers (round-9 advice)
      graft.sources.Tombstones.filterLive(spark, path,
          bandRows(dfCapShingles(corpus, idCol, shCol, capDf), idCol, shCol),
          idCol)
        .write.mode("overwrite").parquet(staged)
      midRebuild()
      // deletes that arrived mid-rebuild ride into the new layout
      graft.sources.Tombstones.carryInto(spark, path, snap, staged)
      Tables.publish(spark, staged, path)
      (pairs, true)
    }
  }

  /** Probe BOTH tiers of a [[compactBucketedAndTruncate]] layout in one
    * pass — the steady-state serving shape at 100 TB: the bucketed
    * table side plans exchange-free (the corpus never moves), the
    * path side holds only band rows appended since the last rollover
    * (small — broadcasts or shuffles cheaply), and deletes written
    * AFTER the rollover mask rows in EITHER tier (the path's marker
    * set applies to both). Admission semantics are identical to the
    * single-tier [[candidates]] — pinned by the q141 oracle, which is
    * the sequential-recurrence SQL with no notion of tiers.
    */
  def candidatesHybrid(spark: SparkSession, table: String, path: String,
      delta: DataFrame, idCol: String, shCol: String): DataFrame = {
    import graft.sources.Tombstones
    // ONE MinHash scan of the delta probes BOTH tiers: the band-rows
    // frame is cached (registered in CacheScope) and reused — the
    // delta's signature scan is the dominant per-row admission cost
    // and used to run once per tier. Unioning the index sides instead
    // would forfeit the bucketed side's exchange-free plan.
    graft.layout.Bucketing.recoverSwap(spark, table)
    val dBand = graft.CacheScope.cache(bandRows(delta, idCol, shCol))
    probeBands(dBand,
        Tombstones.filterLive(spark, path, spark.table(table), idCol), idCol)
      .unionByName(probeBands(dBand,
        Tombstones.filterLive(spark, path, spark.read.parquet(path), idCol),
        idCol))
      .distinct()
  }
}
