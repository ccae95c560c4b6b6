package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.operators.CentroidState.Cent

/** IVF (inverted-file) approximate nearest neighbour — the scale path
  * past sign-bucket LSH (SCALING.md "Dedup / similarity"): a coarse
  * k-means quantizer partitions the corpus into cells; each query scores
  * only its `nProbe` nearest cells instead of the full corpus, so scored
  * pairs track `nProbe / clusters` of brute force while recall stays
  * high for clustered data.
  *
  * The trained quantizer is driver-held O(clusters·dim) state
  * ([[CentroidState]] — the Spark MLlib `KMeans` pattern), so:
  *
  *  - seeding is deterministic (the `clusters` lowest-id vectors), so
  *    re-runs build the same index — no `rand()`, reproducible like every
  *    other operator here;
  *  - each Lloyd iteration is ONE corpus scan: nearest-cell assignment is
  *    an inline `array_min` expression over the literal centroid table
  *    (no crossJoin, no argmin shuffle, no join-back), feeding a single
  *    partially-aggregated per-(cell, dim) decimal mean whose k·dim-row
  *    result is collected — the batch analog of "train for n steps";
  *  - assignment and probe selection at search time are likewise pure
  *    per-row expressions (zero shuffle before the candidate join), and
  *    the final top-k runs through the custom
  *    [[graft.plans.TopKPerKeyPlan]] operator so the map-side
  *    bounded-heap reduction applies before the one remaining shuffle.
  *
  * At 10 B vectors: centroids are O(clusters·dim) — always driver/
  * broadcast-sized; the corpus is written bucketed by cell so a probe
  * reads `nProbe` buckets; raising `clusters` keeps cell size constant as
  * the corpus grows (clusters ≈ sqrt(n) is the classical sizing).
  */
object IvfAnn {

  /** Probe sides are `queries · nProbe` rows — a bounded request batch
    * by the search contract. This guard makes the contract EXPLICIT
    * instead of a comment: at or below the bound the probe side
    * broadcasts and the corpus never shuffles (the plan the gate pins);
    * above it the search degrades to a plain shuffle join — slower, but
    * it completes instead of OOMing the executors on a broadcast that
    * was never going to fit. The bound is in BYTES, not rows, because
    * per-row payloads differ by orders of magnitude between callers
    * (IvfAnn carries one `dim`-float vector per probe row; IvfPq
    * carries a full `m × codes`-double ADC table) — callers pass their
    * estimated row width and the guard compares against a conservative
    * slice of the default broadcast budget.
    */
  private[operators] val MaxBroadcastProbeBytes: Long = 256L << 20

  private[operators] def probeSide(probed: DataFrame, probeRows: Long,
      bytesPerRow: Long): DataFrame =
    if (probeRows * bytesPerRow <= MaxBroadcastProbeBytes) broadcast(probed)
    else probed

  /** Train the coarse quantizer driver-side: deterministic lowest-id
    * seeds, then `iters` Lloyd passes of one corpus scan each.
    */
  private[operators] def lloyd(corpus: DataFrame, idCol: String,
      vecCol: String, clusters: Int, iters: Int): Seq[Cent] = {
    var cents: Seq[Cent] = corpus.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(clusters)
      .collect().zipWithIndex
      .map { case (r, i) => Cent(i + 1, r.getSeq[Float](1).toArray) }
      .toSeq
    var i = 0
    while (i < iters) {
      // decimal-backed mean (Stable rationale): centroids come out
      // bit-identical regardless of partitioning, so the trained index
      // is reproducible run to run
      val means = corpus
        .select(CentroidState.nearestCell(col(vecCol), cents).as("cell"),
          posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg((graft.functions.Stable.sumD(col("x")) / count(col("x")))
          .as("mu"))
        .collect()
      cents = CentroidState.fromMeans(means.toSeq)
      i += 1
    }
    cents
  }

  /** Train the coarse quantizer: (cell, cvec, cnorm2). */
  def centroids(corpus: DataFrame, idCol: String, vecCol: String,
      clusters: Int, iters: Int): DataFrame =
    CentroidState.toDF(corpus.sparkSession,
      lloyd(corpus, idCol, vecCol, clusters, iters))

  /** Hard assignment: one cell per vector — a pure projection (the
    * argmin is an inline expression over the collected centroid table;
    * ties break toward the lower cell id).
    */
  def assign(vecs: DataFrame, cents: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val cs = CentroidState.collect(cents)
    vecs.select(col(idCol),
      CentroidState.nearestCell(col(vecCol), cs).as("cell"))
  }

  /** Probe assignment: each query's `nProbe` nearest cells — the same
    * scoring, one row per (query, probed cell), still projection-only.
    */
  def probes(queries: DataFrame, cents: DataFrame, qidCol: String,
      qvecCol: String, nProbe: Int): DataFrame = {
    val cs = CentroidState.collect(cents)
    queries.select(col(qidCol),
      explode(CentroidState.nearestCells(col(qvecCol), cs, nProbe))
        .as("cell"))
  }

  /** End-to-end IVF search: top-`k` cosine neighbours per query scored
    * only inside the query's probed cells.
    *
    * @return (qid, neighbor, cosine)
    */
  def search(corpus0: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, clusters: Int, nProbe: Int, iters: Int = 2): DataFrame = {
    // the corpus feeds seeding, one scan per Lloyd iteration, and the
    // final cell-pruned scoring — persist once instead of re-reading
    // parquet for each of those jobs
    val corpus = CentroidState.ensureCached(corpus0)
    val cents = lloyd(corpus, idCol, vecCol, clusters, iters)
    val corpusByCell = corpus
      .select(col(idCol), col(vecCol), Vectors.norm(col(vecCol)).as("__n"),
        CentroidState.nearestCell(col(vecCol), cents).as("cell"))
    val qcached = CentroidState.ensureCached(queries)
    val probed = qcached
      .select(col(qidCol), col(qvecCol),
        Vectors.norm(col(qvecCol)).as("__qn"),
        explode(CentroidState.nearestCells(col(qvecCol), cents, nProbe))
          .as("cell"))
    // within the probe-row bound the probe side broadcasts and the
    // corpus never shuffles: candidate generation is a map-side hash
    // join on cell; an oversized query batch degrades to a shuffle join
    // per probe row: the query vector (dim floats) + norm + ids
    val scored = probeSide(probed, qcached.count() * nProbe,
        bytesPerRow = cents.head.cvec.length * 4L + 64L)
      .join(corpusByCell, "cell")
      .filter(col(qidCol) =!= col(idCol) && col("__qn") > 0 && col("__n") > 0)
      .select(col(qidCol), col(idCol).as("neighbor"),
        (Vectors.dot(col(qvecCol), col(vecCol)) / (col("__qn") * col("__n")))
          .as("cosine"))
    Dedup.topKPerKey(scored, Seq(qidCol),
      Seq(col("cosine").desc, col("neighbor").asc), k)
  }

  /** nProbe-vs-recall calibration on a bounded query sample — the IVF
    * family's analog of the LSH bucket-bits calibration: before a
    * full-corpus run, this one report is how `nProbe` is picked. Trains
    * ONCE, scores the candidate join ONCE at `max(nProbes)` cells with
    * each candidate tagged by its cell's probe rank, then reads every
    * sweep point off that cached frame — recall@k is measured against
    * the brute-force top-k over the same sample (exact on the sample
    * because the sample is bounded; `queries · corpus` pairs, the q27
    * broadcast shape, NOT corpus²).
    *
    * @return one row per nProbe: (n_probe, n_truth, hits, recall)
    */
  def recallSweep(corpus0: DataFrame, idCol: String, vecCol: String,
      nQueries: Int, k: Int, clusters: Int, nProbes: Seq[Int],
      iters: Int = 2): DataFrame = {
    val corpus = CentroidState.ensureCached(corpus0)
    val cents = lloyd(corpus, idCol, vecCol, clusters, iters)
    val corpusByCell = corpus
      .select(col(idCol), col(vecCol), Vectors.norm(col(vecCol)).as("__n"),
        CentroidState.nearestCell(col(vecCol), cents).as("cell"))
    val queries = corpus.filter(col(idCol) < nQueries)
      .select(col(idCol).as("__qid"), col(vecCol).as("__qv"),
        Vectors.norm(col(vecCol)).as("__qn"))
    val cos = Vectors.dot(col("__qv"), col(vecCol)) /
      (col("__qn") * col("__n"))
    // exact ground truth over the bounded sample (broadcast query side)
    val bf = broadcast(queries).join(corpusByCell,
        col("__qid") =!= col(idCol) && col("__qn") > 0 && col("__n") > 0)
      .select(col("__qid").as("qid"), col(idCol).as("neighbor"),
        cos.as("cos"))
    val gt = Dedup.topKPerKey(bf, Seq("qid"),
        Seq(col("cos").desc, col("neighbor").asc), k)
      .select(col("qid"), col("neighbor"))
      .transform(graft.CacheScope.cache)
    // one candidate join at the WIDEST sweep point; probe_rank lets every
    // narrower nProbe reuse it as a filter instead of a fresh search, and
    // fanning the candidates out over the (tiny) sweep frame reads every
    // sweep point through ONE top-k + one aggregation instead of a job
    // chain per point
    val maxProbe = nProbes.max
    val probed = queries.select(col("__qid"), col("__qv"), col("__qn"),
      posexplode(CentroidState.nearestCells(col("__qv"), cents, maxProbe))
        .as(Seq("__pos", "cell")))
    val cand = probeSide(probed, queries.count() * maxProbe,
        bytesPerRow = cents.head.cvec.length * 4L + 64L)
      .join(corpusByCell, "cell")
      .filter(col("__qid") =!= col(idCol) && col("__qn") > 0 && col("__n") > 0)
      .select(col("__qid").as("qid"), (col("__pos") + 1).as("probe_rank"),
        col(idCol).as("neighbor"), cos.as("cos"))
    val sweepDf = corpus.sparkSession
      .createDataFrame(nProbes.map(Tuple1(_))).toDF("n_probe")
    val hits = Dedup.topKPerKey(
        cand.crossJoin(broadcast(sweepDf))
          .filter(col("probe_rank") <= col("n_probe")),
        Seq("n_probe", "qid"), Seq(col("cos").desc, col("neighbor").asc), k)
      .join(broadcast(gt), Seq("qid", "neighbor"))
      .groupBy(col("n_probe")).agg(count(lit(1)).as("hits"))
    // hits is ≤ |nProbes| rows — broadcast it as the BUILD side (a left
    // outer join can only build right, so hinting the sweep side would
    // silently fall back to a sort-merge join); a sweep point with zero
    // hits must still report
    sweepDf
      .join(broadcast(hits), Seq("n_probe"), "left")
      .crossJoin(gt.agg(count(lit(1)).as("n_truth")))
      .select(col("n_probe"), col("n_truth"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        round(coalesce(col("hits"), lit(0L)) / col("n_truth") + lit(1e-9), 4)
          .as("recall"))
      .orderBy(col("n_probe"))
  }

  /** Materialize an assigned corpus hive-partitioned by `cell` — the
    * physical layout behind the sizing claim above ("the corpus is
    * written bucketed by cell so a probe reads `nProbe` buckets"): with
    * one directory per cell, a probe's scan prunes to exactly its
    * probed cells' FILES (spec-asserted on the file set, not the plan
    * string), turning `nProbe / clusters` from a compute ratio into an
    * I/O ratio. At 10 B vectors with clusters ≈ sqrt(n), each cell is a
    * few thousand vectors — a handful of parquet files per probe.
    */
  def writePartitionedByCell(corpus: DataFrame, idCol: String,
      vecCol: String, cents: DataFrame, path: String): Unit = {
    val cs = CentroidState.collect(cents)
    corpus.select(col(idCol), col(vecCol),
        CentroidState.nearestCell(col(vecCol), cs).as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
  }

  /** Incrementally append a delta batch to an existing
    * [[writePartitionedByCell]] layout WITHOUT retraining: each new
    * vector is assigned to its nearest EXISTING centroid (the same pure
    * projection as [[assign]]) and its rows land as new files under the
    * matching `cell=` directories. This is how a production index
    * absorbs a day's new embeddings at 10 B-vector scale — an
    * O(|delta|) append, zero corpus rewrite, zero quantizer retrain —
    * and searches over the layout see old and new vectors uniformly
    * because partition pruning is directory-based, not file-based.
    * Centroid drift is bounded by retraining cadence, the classical
    * IVF maintenance trade (re-run [[centroids]] +
    * [[writePartitionedByCell]] when recall decays).
    */
  def appendPartitionedByCell(delta: DataFrame, idCol: String,
      vecCol: String, cents: DataFrame, path: String): Unit = {
    val cs = CentroidState.collect(cents)
    delta.select(col(idCol), col(vecCol),
        CentroidState.nearestCell(col(vecCol), cs).as("cell"))
      .write.mode("append").partitionBy("cell").parquet(path)
    // a forgotten-then-readmitted vector must serve its NEW rows — a
    // stale tombstone would mask them at probe time and the next
    // compaction would drop them physically (round-8 advice)
    graft.sources.Tombstones.unmark(delta.sparkSession, path, delta, idCol)
  }

  /** Compact a cell layout in place: every cell's rows are rewritten
    * as ONE file (a `repartition` on `cell` puts each cell wholly in
    * one task, so `partitionBy` emits one file per cell directory),
    * then swapped in via [[graft.sources.Tables.publish]]'s crash-safe
    * rename chain — the layout stays addressable (old or new, never
    * neither) throughout. This is the third leg of index maintenance:
    * [[appendPartitionedByCell]] absorbs deltas as small files, probe
    * I/O degrades with file COUNT (per-file open/footer cost), and
    * periodic compaction restores one-file-per-cell without touching
    * centroids or assignments. Content is untouched by construction —
    * the spec asserts file counts drop and search results are
    * identical.
    */
  def compactCells(spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String): Unit = {
    val staged = path + ".__compact__"
    val base = spark.read.parquet(path)
    // `idCol` is explicit — inferring it from column position would
    // silently anti-join tombstones against the wrong column on a
    // reordered layout, permanently losing the deletes (round-8 advice);
    // pending tombstones apply physically here
    require(base.columns.contains(idCol),
      s"id column '$idCol' not in layout schema ${base.columns.mkString(",")}")
    val snap = graft.sources.Tombstones.fileSnapshot(spark, path)
    val live = graft.sources.Tombstones.filterLive(spark, path, base, idCol)
    live.repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(staged)
    // deletes that arrived mid-compaction ride into the new layout
    // instead of vanishing with the publish swap
    graft.sources.Tombstones.carryInto(spark, path, snap, staged)
    // the publish swap replaces the whole directory, so the applied
    // tombstones vanish with the old layout — no separate cleanup step
    graft.sources.Tables.publish(spark, staged, path)
  }

  /** LOGICAL delete from a cell layout — O(|deletes|), append-only
    * markers via the shared [[graft.sources.Tombstones]] mechanics:
    * [[searchPartitioned]] anti-joins them at probe time, and the next
    * [[compactCells]] applies them PHYSICALLY (its publish swap
    * replaces the directory, clearing the markers with the old
    * layout). This is the right-to-be-forgotten shape at 10 B vectors:
    * the delete path never rewrites the corpus, and the serving
    * penalty — one broadcast anti-join against the (small) tombstone
    * set — is bounded by compaction cadence, exactly like small-file
    * growth under [[appendPartitionedByCell]].
    */
  def deleteFromCells(spark: org.apache.spark.sql.SparkSession,
      path: String, ids: DataFrame, idCol: String): Unit =
    graft.sources.Tombstones.write(spark, path, ids, idCol)

  /** The layout's pending tombstones (None when nothing was deleted). */
  def tombstones(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[DataFrame] =
    graft.sources.Tombstones.read(spark, path)

  /** Scan ONLY the given cells' partitions of a
    * [[writePartitionedByCell]] layout (partition pruning does the
    * file-set restriction; nothing else is read).
    */
  def readCells(spark: org.apache.spark.sql.SparkSession, path: String,
      cells: Seq[Int]): DataFrame =
    spark.read.parquet(path).filter(col("cell").isin(cells: _*))

  /** End-to-end IVF search AGAINST the on-disk layout: the query
    * batch's probed cells are computed from the trained centroids
    * (pure projection), their union prunes the corpus READ to those
    * cells' files (≤ `queries · nProbe` cells, bounded by `clusters`),
    * and scoring proceeds exactly as [[search]] — same probe-side
    * broadcast guard, same custom top-k. This is the shape a 10 B-
    * vector deployment runs: I/O tracks the probe set, not the corpus;
    * results are spec-asserted equal to the in-memory [[search]].
    */
  def searchPartitioned(spark: org.apache.spark.sql.SparkSession,
      path: String, cents: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, nProbe: Int): DataFrame = {
    val cs = CentroidState.collect(cents)
    val qcached = CentroidState.ensureCached(queries)
    // persist the probed frame: the wanted-cell collect below and the
    // scored join both read it, and without the cache each would re-run
    // the per-query centroid-scoring projection as its own job (the
    // probe side is ≤ queries · nProbe rows — bounded by the search
    // contract, so caching it is cheap); registered in CacheScope like
    // every internal cache
    val probed = CentroidState.ensureCached(qcached
      .select(col(qidCol), col(qvecCol),
        Vectors.norm(col(qvecCol)).as("__qn"),
        explode(CentroidState.nearestCells(col(qvecCol), cs, nProbe))
          .as("cell")))
    // the union of probed cells — ≤ clusters values of driver state
    val wanted = probed.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    // pending logical deletes are filtered at probe time — a broadcast
    // anti-join against the (small, compaction-bounded) tombstone set
    val corpus = graft.sources.Tombstones
      .filterLive(spark, path, readCells(spark, path, wanted), idCol)
      .withColumn("__n", Vectors.norm(col(vecCol)))
    val scored = probeSide(probed, qcached.count() * nProbe,
        bytesPerRow = cs.head.cvec.length * 4L + 64L)
      .join(corpus, "cell")
      .filter(col(qidCol) =!= col(idCol) && col("__qn") > 0 && col("__n") > 0)
      .select(col(qidCol), col(idCol).as("neighbor"),
        (Vectors.dot(col(qvecCol), col(vecCol)) / (col("__qn") * col("__n")))
          .as("cosine"))
    Dedup.topKPerKey(scored, Seq(qidCol),
      Seq(col("cosine").desc, col("neighbor").asc), k)
  }

  /** Write a SELF-CONTAINED index directory: the cell layout AND the
    * quantizer that produced it travel together (`dir/cells`,
    * `dir/centroids`) — the serving layer needs both, and versioning
    * them separately invites quantizer/layout skew (a search against
    * cells written under other centroids probes the wrong cells and
    * silently loses recall). Combined with
    * [[graft.sources.Snapshots.commit]] this is zero-downtime index
    * publishing: each retrain commits a full index version while
    * searches pinned to the previous version keep serving (q124).
    */
  def writeIndex(corpus: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame, dir: String): Unit = {
    writePartitionedByCell(corpus, idCol, vecCol, cents, s"$dir/cells")
    cents.coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
  }

  /** Search a [[writeIndex]] directory: the quantizer loads from the
    * index itself (O(clusters) driver rows), then the search runs
    * against the colocated cell layout — same probe-side broadcast
    * guard, partition pruning, and custom top-k as
    * [[searchPartitioned]].
    */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      idCol: String, vecCol: String, queries: DataFrame, qidCol: String,
      qvecCol: String, k: Int, nProbe: Int): DataFrame =
    searchPartitioned(spark, s"$dir/cells",
      spark.read.parquet(s"$dir/centroids"), idCol, vecCol,
      queries, qidCol, qvecCol, k, nProbe)

  /** Index-staleness telemetry — the WHEN-to-retrain signal that closes
    * the maintenance loop ([[appendPartitionedByCell]] appends without
    * retraining; [[compactCells]] defragments; this reports when the
    * quantizer itself has gone stale): per cell, the mean squared L2
    * distance to the assigned centroid for each generation in `genCol`
    * (`base` = the training generation, `delta` = appended batches),
    * and their ratio. Drift ≫ 1 means appended vectors land far from
    * the centroids the index was trained on — probe recall decays and a
    * retrain ([[centroids]]) + rewrite is due.
    *
    * One scan of the tagged corpus: assignment is the pure-projection
    * kernel, the centroid join broadcasts O(clusters) rows, and the
    * per-cell aggregation is map-side combinable. Means use the
    * decimal-backed [[graft.functions.Stable]] path, so the report is
    * bit-reproducible (and SQL-expressible — q117's oracle replays
    * training and the distance algebra verbatim).
    *
    * @return (cell, n_base, n_delta, base_d2, delta_d2, drift) — drift
    *         is null for cells missing either generation
    */
  def driftReport(vecs: DataFrame, genCol: String, vecCol: String,
      cents: DataFrame): DataFrame = {
    // (consumed by retrainIfDrifted below — report, decide, rebuild)
    val cs = CentroidState.collect(cents)
    val v = col(vecCol)
    val assigned = vecs.select(col(genCol),
      CentroidState.nearestCell(v, cs).as("cell"), v)
    val d2 = col("cnorm2") - lit(2.0) * Vectors.dot(v, col("cvec")) +
      Vectors.dot(v, v)
    def genD2(gen: String) =
      when(col(genCol) === gen, d2)
    assigned.join(broadcast(cents), "cell")
      .groupBy(col("cell"))
      .agg(
        count(when(col(genCol) === "base", 1)).as("n_base"),
        count(when(col(genCol) === "delta", 1)).as("n_delta"),
        graft.functions.Stable.avg4(genD2("base")).as("base_d2"),
        graft.functions.Stable.avg4(genD2("delta")).as("delta_d2"))
      .withColumn("drift",
        // explicit zero guard: Spark's x/0.0 is null while DuckDB's is
        // inf (q26's rationale) — make the degenerate cell portable
        when(col("base_d2") > 0,
          round(col("delta_d2") / col("base_d2") + lit(1e-9), 4)))
  }

  /** Corpus-wide drift ratio recombined driver-side from a
    * [[driftReport]] frame (≤ clusters rows): the count-weighted mean
    * delta-generation squared distance over the count-weighted mean
    * base-generation one. None when either generation is missing
    * entirely (cells missing a generation contribute nothing — the
    * per-cell null semantics). Shared by the IVF and IVF+PQ retrain
    * gates ([[retrainIfDrifted]], [[IvfPq.retrainIfDrifted]]).
    */
  def globalDriftRatio(report: DataFrame): Option[Double] = {
    val rep = report
      .select(col("n_base"), col("n_delta"), col("base_d2"),
        col("delta_d2"))
      .collect()
    var (nBase, nDelta) = (0L, 0L)
    var (sumBase, sumDelta) = (0.0, 0.0)
    rep.foreach { r =>
      val (nb, nd) = (r.getLong(0), r.getLong(1))
      if (nb > 0 && !r.isNullAt(2)) { nBase += nb; sumBase += r.getDouble(2) * nb }
      if (nd > 0 && !r.isNullAt(3)) { nDelta += nd; sumDelta += r.getDouble(3) * nd }
    }
    if (nBase > 0 && nDelta > 0 && sumBase > 0)
      Some((sumDelta / nDelta) / (sumBase / nBase))
    else None
  }

  /** Drift-GATED retrain — the decision leg that closes the maintenance
    * loop ([[appendPartitionedByCell]] absorbs, [[compactCells]]
    * defragments, [[driftReport]] measures, THIS acts): compute the
    * corpus-wide drift ratio from the per-cell report, and when it
    * exceeds `tau`, retrain the quantizer on the full LIVE tagged
    * corpus and rewrite the cell layout at `path` through the same
    * crash-safe staged-publish swap as [[compactCells]] (the layout
    * stays addressable — old or new, never neither). Below `tau`
    * nothing is touched and the existing centroids come back.
    *
    * The rebuild sources vectors from the CALLER's corpus, which may
    * still hold logically deleted ids — pending tombstones apply
    * physically before training and re-encode ([[deleteFromCells]]
    * markers must neither shape the retrained centroids nor be
    * resurrected into the new layout), and markers that arrive while
    * the retrain runs are carried into the staged layout — the
    * [[compactCells]] snapshot/carry discipline.
    *
    * Retraining costs what [[centroids]] + [[writePartitionedByCell]]
    * cost — `iters` corpus scans and one partitioned rewrite — which is
    * exactly why it hides behind the ratio gate instead of running on
    * every append.
    *
    * @return (centroids now governing `path`, whether a retrain ran)
    */
  def retrainIfDrifted(spark: org.apache.spark.sql.SparkSession,
      path: String, tagged: DataFrame, genCol: String, idCol: String,
      vecCol: String, cents: DataFrame, clusters: Int, iters: Int,
      tau: Double): (DataFrame, Boolean) =
    retrainIfDrifted(spark, path, tagged, genCol, idCol, vecCol, cents,
      clusters, iters, tau, () => ())

  /** Test seam: `midRetrain` runs after the rebuilt layout materializes
    * and before the publish swap — the marker-carry race window.
    */
  private[graft] def retrainIfDrifted(spark: org.apache.spark.sql.SparkSession,
      path: String, tagged: DataFrame, genCol: String, idCol: String,
      vecCol: String, cents: DataFrame, clusters: Int, iters: Int,
      tau: Double, midRetrain: () => Unit): (DataFrame, Boolean) = {
    val ratio = globalDriftRatio(driftReport(tagged, genCol, vecCol, cents))
    if (!ratio.exists(_ > tau)) (cents, false)
    else {
      val snap = graft.sources.Tombstones.fileSnapshot(spark, path)
      val full = graft.sources.Tombstones.filterLive(spark, path,
        tagged.select(col(idCol), col(vecCol)), idCol)
      val retrained = centroids(full, idCol, vecCol, clusters, iters)
      val cs = CentroidState.collect(retrained)
      val staged = path + ".__retrain__"
      full.select(col(idCol), col(vecCol),
          CentroidState.nearestCell(col(vecCol), cs).as("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(staged)
      midRetrain()
      // deletes that arrived mid-retrain ride into the new layout
      graft.sources.Tombstones.carryInto(spark, path, snap, staged)
      graft.sources.Tables.publish(spark, staged, path)
      (retrained, true)
    }
  }
}
