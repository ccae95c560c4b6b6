package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Stable, Text}
import graft.sources.{Tables, Tombstones}

/** Persisted BM25 inverted index with O(delta) incremental maintenance —
  * the KEYWORD-retrieval tier beside the vector families ([[IvfAnn]],
  * [[IvfPq]], [[ScalarQuantizer]], [[BinaryQuantizer]]) and the dedup
  * families ([[LshIndex]], [[SimHashIndex]]). A training-data pipeline
  * needs lexical search as much as embeddings: decontamination probes,
  * targeted corpus audits ("every document mentioning X"), and the BM25
  * leg of hybrid retrieval (reference scope: the corpus-curation north
  * star; the reference itself has no retrieval surface at all).
  *
  * Layout under `dir` — ONE partitioned table, `postings/`, so every
  * lifecycle op is a single parquet commit (round-13: the previous
  * three-directory layout cost each streamed [[append]] 3 write jobs —
  * postings + doclens + stats — per micro-batch; at 100 TB that is 3
  * object-store commits where 1 suffices, and at gate scale it was the
  * q162 job-count ceiling):
  *  - bucket partitions `bkt >= 0` — `(term, doc_id, tf, dl)` posting
  *    rows, `bkt = pmod(xxhash64(term), Buckets)`: a probe touches only
  *    its query terms' bucket DIRECTORIES (partition pruning — the
  *    probed bucket ids are collected from the bounded query batch and
  *    pushed as literals), so probe I/O tracks query vocabulary, never
  *    corpus size. `dl` (document token length) is denormalized into
  *    the posting row — the classic inverted-file trick that makes
  *    scoring a single equi-join with zero side lookups. The bucket
  *    modulus itself lives in `postings/_buckets` (self-describing
  *    layout — [[growBucketsIfHot]] can change it, and it must move
  *    atomically with the rows it bucketed).
  *  - partition `bkt = -1` ([[DlBkt]]) — doclen rows `(doc_id, dl)`,
  *    consulted only by [[delete]] to price a forgotten document's
  *    stats correction; never read at probe time (probes prune to
  *    their query terms' non-negative buckets).
  *  - partition `bkt = -2` ([[StBkt]]) — additive `(n_docs, sum_dl)`
  *    stats rows: one per [[write]]/[[append]], one NEGATIVE row per
  *    [[delete]]. Serving stats are the SUM of the rows, so corpus-wide
  *    n/avgdl cost O(ops) rows to read — never a corpus scan. Rows grow
  *    with operation count, not data, so the partition stays tiny.
  * Meta rows carry the posting columns as NULLs (and vice versa), so
  * one schema serves the whole table; readers select their partition by
  * `bkt` literal and parquet prunes the rest.
  *
  * Lifecycle contracts (the shared index-family discipline):
  *  - [[append]] is O(|batch|) new files; it REFUSES ids with a pending
  *    tombstone (fail-fast) instead of [[LshIndex]]'s unmark-and-serve-
  *    both: BM25 stats are content-weighted, so serving a readmitted
  *    doc's old and new postings side by side would corrupt tf/df
  *    rather than be absorbed by a DISTINCT the way the dedup families'
  *    candidate joins absorb duplicate band rows. Compact first.
  *  - [[delete]] is O(|deletes|): a marker masks the doc's postings at
  *    probe time immediately, and one negative `stats` row (priced
  *    from `doclens` at delete time, NOT at probe time) keeps n/avgdl
  *    exact — so the served scores equal an index built on the live
  *    set, which is exactly what the q160 oracle checks.
  *  - [[compact]] applies markers physically through the crash-safe
  *    staged publish, with the [[Tombstones.fileSnapshot]]/`carryInto`
  *    discipline so deletes landing mid-compaction survive the swap.
  */
object TextIndex {

  /** Term-hash partition count for the postings layout. 64 directories
    * keeps per-bucket vocabulary ~1/64 while staying far under any
    * filesystem's directory-count pain; at 100 TB raise it with corpus
    * vocabulary (it is a layout constant, invisible to results).
    */
  val Buckets = 64

  /** Reserved meta partitions of the single-table layout (term hashes
    * land in [0, modulus), so negatives can never collide with a real
    * bucket): [[DlBkt]] holds doclen rows, [[StBkt]] the additive stats
    * rows. Probes prune to non-negative buckets and never read either.
    */
  val DlBkt = -1
  val StBkt = -2

  /** BM25 constants (the standard Robertson defaults). Literals — the
    * oracle SQL spells the same decimal strings, so both engines bind
    * bit-identical doubles.
    */
  val K1 = 1.2
  val B = 0.75

  private def bkt(term: Column, buckets: Int): Column =
    pmod(xxhash64(term), lit(buckets.toLong)).cast("int")

  /** The layout's bucket modulus AND positional flag live IN the
    * postings directory (`postings/_buckets`: line 1 the modulus, line
    * 2 `pos=true|false`) so they travel atomically with every publish
    * swap — a probe or append computing `bkt` with a stale modulus
    * would prune the WRONG directories and silently miss postings, and
    * sniffing the positional flag from parquet footers cost an extra
    * file-listing pass per append/phrase/proximity call on an index
    * that can hold millions of files at 100 TB (round-11 advice). A
    * layout written before the flag existed (modulus-only `_buckets`)
    * falls back to the old one-time schema sniff — assuming
    * non-positional would let appends write `pos`-less rows into a
    * positional directory and turn phrase probes away from an index
    * that actually has positions.
    */
  def readLayout(spark: SparkSession, dir: String): (Int, Boolean) = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/postings/_buckets")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"$dir/postings/_buckets missing — not a " +
      "TextIndex layout (or a pre-modulus one; rebuild via write())")
    val in = fs.open(p)
    val lines =
      try scala.io.Source.fromInputStream(in).getLines()
        .map(_.trim).filter(_.nonEmpty).toList
      finally in.close()
    val withPos =
      if (lines.exists(_.startsWith("pos="))) lines.contains("pos=true")
      else spark.read.parquet(s"$dir/postings").schema.fieldNames
        .contains("pos")
    (lines.head.toInt, withPos)
  }

  def readBuckets(spark: SparkSession, dir: String): Int =
    readLayout(spark, dir)._1

  private def writeBucketsFile(spark: SparkSession, postingsDir: String,
      buckets: Int, withPositions: Boolean): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$postingsDir/_buckets")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"$buckets\npos=$withPositions\n".getBytes("UTF-8"))
    finally out.close()
  }

  /** The stats partition's current part-file names — the [[compact]]/
    * [[growBucketsIfHot]] rewrites snapshot this BEFORE reading the
    * table, then [[carryLateStats]] copies any file that appeared since
    * into the staged layout before the publish swap. Deletes are the
    * one concurrent writer the layouts sanction, and a delete appends a
    * negative stats row here: without the carry, a delete landing
    * mid-rewrite would keep its tombstone (markers have their own
    * snapshot/carry) but LOSE its totals correction with the old
    * directory — served n/avgdl would silently drift from the live set.
    * (The previous three-directory layout was immune only because its
    * `stats/` dir sat outside the postings swap.)
    */
  private def statsFiles(spark: SparkSession, post: String): Set[String] = {
    val dir = new org.apache.hadoop.fs.Path(s"$post/bkt=$StBkt")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Set.empty
    else fs.listStatus(dir).toIndexedSeq.map(_.getPath.getName)
      .filter(_.startsWith("part-")).toSet
  }

  private def carryLateStats(spark: SparkSession, post: String,
      snapshot: Set[String], staged: String): Unit = {
    val src = new org.apache.hadoop.fs.Path(s"$post/bkt=$StBkt")
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(src)) {
      val late = fs.listStatus(src).toIndexedSeq
        .filter(st => st.getPath.getName.startsWith("part-") &&
          !snapshot.contains(st.getPath.getName))
      if (late.nonEmpty) {
        val dst = new org.apache.hadoop.fs.Path(s"$staged/bkt=$StBkt")
        fs.mkdirs(dst)
        late.foreach { st =>
          org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs,
            new org.apache.hadoop.fs.Path(dst, st.getPath.getName), false,
            spark.sparkContext.hadoopConfiguration)
        }
      }
    }
  }

  /** `(bkt, term, doc_id, tf, dl)` posting rows for a document batch —
    * one scan: tokenize, per-(doc, term) counts, and the doc length
    * re-joined from the same token frame. Zero-token documents vanish
    * (they have no postings and no length — both engines agree).
    */
  def postings(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int = Buckets, withPositions: Boolean = false): DataFrame = {
    val tok = docs
      .select(col(idCol).as("doc_id"),
        posexplode(Text.tokens(col(textCol))).as(Seq("p", "term")))
    // positional layouts add `pos` (sorted 0-based token offsets) per
    // posting row — the phrase/proximity probe's adjacency input; the
    // rest of the row and the bucket layout are identical, so every
    // lifecycle op (append/delete/compact/grow) carries it untouched
    val tf =
      if (withPositions)
        tok.groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"),
            sort_array(collect_list(col("p"))).as("pos"))
      else
        tok.groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
    // (doc, term) -> tf is already grouped; dl = sum of the doc's tfs —
    // a second agg over the SAME frame, so the token scan runs once
    val dl = tf.select(col("doc_id"), col("tf"))
      .groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val base = tf.join(dl, "doc_id")
    val cols = Seq(bkt(col("term"), buckets).as("bkt"), col("term"),
      col("doc_id"), col("tf"), col("dl")) ++
      (if (withPositions) Seq(col("pos")) else Nil)
    base.select(cols: _*)
  }

  /** `(doc_id, dl)` for a batch (token-bearing docs only). */
  private def doclens(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        size(Text.tokens(col(textCol))).cast("long").as("dl"))
      .filter(col("dl") > 0)

  private def totalsRow(dls: DataFrame): DataFrame =
    dls.agg(count(lit(1)).cast("long").as("n_docs"),
      coalesce(sum(col("dl")), lit(0L)).as("sum_dl"))

  /** The single-table frame for one ingested batch: posting rows in
    * their term-hash buckets, the batch's doclen rows at [[DlBkt]], and
    * ONE additive stats row at [[StBkt]] — unioned so [[write]] and
    * [[append]] commit everything in one parquet write job instead of
    * three (round-13 §1.2/§6: q162's three streamed appends paid 3
    * commits each for one batch's worth of data).
    */
  private def batchRows(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int, withPositions: Boolean): DataFrame = {
    val nulls = Seq(lit(null).cast("long").as("n_docs"),
      lit(null).cast("long").as("sum_dl"))
    val posN = if (withPositions)
      Seq(lit(null).cast("array<int>").as("pos")) else Nil
    val post = postings(docs, idCol, textCol, buckets, withPositions)
      .select(Seq(col("bkt"), col("term"), col("doc_id"), col("tf"),
        col("dl")) ++ (if (withPositions) Seq(col("pos")) else Nil) ++
        nulls: _*)
    val dls = doclens(docs, idCol, textCol)
    val dlRows = dls.select(Seq(lit(DlBkt).as("bkt"),
      lit(null).cast("string").as("term"), col("doc_id"),
      lit(null).cast("long").as("tf"), col("dl")) ++ posN ++ nulls: _*)
    val stRow = totalsRow(dls).select(Seq(lit(StBkt).as("bkt"),
      lit(null).cast("string").as("term"),
      lit(null).cast("long").as("doc_id"),
      lit(null).cast("long").as("tf"), lit(null).cast("long").as("dl")) ++
      posN ++ Seq(col("n_docs"), col("sum_dl")): _*)
    post.unionByName(dlRows).unionByName(stRow)
  }

  /** Build the index for a corpus — ONE write job into the staged
    * sibling, then the whole-directory swap ([[Tables.publish]]), so a
    * crash mid-build never leaves postings without their totals (the
    * [[IvfPq.writeIndex]] crash-consistency discipline).
    */
  def write(docs: DataFrame, idCol: String, textCol: String,
      dir: String, buckets: Int = Buckets,
      withPositions: Boolean = false): Unit = {
    val spark = docs.sparkSession
    val staged = dir + ".__stage__"
    // NOT clustered by bucket before the partitioned write: the
    // repartition shuffle measurably slows every build at gate scale
    // (+1-3.5 s per write-heavy gate, round-11 measured) for a file-
    // count concern that compact() already owns — it restores one file
    // per bucket, and at 100 TB a build is followed by a compact as a
    // matter of course
    batchRows(docs, idCol, textCol, buckets, withPositions)
      .write.mode("overwrite").partitionBy("bkt").parquet(s"$staged/postings")
    writeBucketsFile(spark, s"$staged/postings", buckets, withPositions)
    Tables.publish(spark, staged, dir)
  }

  /** Absorb a batch — O(|batch|) and ONE parquet commit: new posting
    * files into their bucket partitions, the batch's doclen files into
    * [[DlBkt]], one additive totals row into [[StBkt]]. Fails fast if
    * any batch id has a pending tombstone (see the class doc for why
    * this family cannot serve old and new rows side by side).
    */
  def append(batch: DataFrame, idCol: String, textCol: String,
      dir: String): Unit = {
    val spark = batch.sparkSession
    Tombstones.read(spark, s"$dir/postings").foreach { ts =>
      val pending = ts.join(
        batch.select(col(idCol).as(Tombstones.Col)).distinct(),
        Seq(Tombstones.Col), "left_semi")
      require(pending.isEmpty,
        "TextIndex.append: batch contains tombstoned ids — compact() " +
          "the index before re-ingesting a deleted document (BM25 tf/df " +
          "cannot serve a doc's old and new postings side by side)")
    }
    // the layout self-describes its encoding: a positional index's
    // appended rows must carry positions too, or a later phrase probe
    // would silently miss the appended docs
    val (nb, withPos) = readLayout(spark, dir)
    batchRows(batch, idCol, textCol, nb, withPos)
      .write.mode("append").partitionBy("bkt").parquet(s"$dir/postings")
  }

  /** Forget documents — O(|deletes|): tombstone markers mask the docs'
    * postings at probe time IMMEDIATELY, and one negative stats row
    * (the docs' count and summed length, looked up in the [[DlBkt]]
    * doclen partition now so probes never pay for it) keeps served
    * n/avgdl equal to the live set's. Ids already marked are skipped,
    * so a repeated delete cannot double-subtract; ids never indexed
    * contribute nothing.
    */
  def delete(spark: SparkSession, dir: String, ids: DataFrame,
      idCol: String): Unit = {
    val doomed0 = ids.select(col(idCol).as("doc_id")).distinct()
    val doomed = Tombstones.read(spark, s"$dir/postings") match {
      case Some(ts) => doomed0.join(ts,
        doomed0("doc_id") === ts(Tombstones.Col), "left_anti")
      case None => doomed0
    }
    val hit = spark.read.parquet(s"$dir/postings")
      .filter(col("bkt") === DlBkt)
      .select(col("doc_id"), col("dl"))
      .join(broadcast(doomed), "doc_id")
      .transform(graft.CacheScope.cache)
    // the hit count rides the stats write as an OBSERVED metric instead
    // of its own count action (round-13 §1.2): the negative totals row
    // is written unconditionally — a no-op delete appends an additive
    // (0, 0) row, which changes no sum — and only the marker write
    // stays gated on n > 0 (an empty marker dir would flip the
    // "None when nothing was deleted" probe contract).
    val posN = if (readLayout(spark, dir)._2)
      Seq(lit(null).cast("array<int>").as("pos")) else Nil
    val obs = org.apache.spark.sql.Observation()
    hit.observe(obs, count(lit(1)).as("n"))
      .agg((-count(lit(1))).cast("long").as("n_docs"),
        (-coalesce(sum(col("dl")), lit(0L))).as("sum_dl"))
      .select(Seq(lit(StBkt).as("bkt"),
        lit(null).cast("string").as("term"),
        lit(null).cast("long").as("doc_id"),
        lit(null).cast("long").as("tf"),
        lit(null).cast("long").as("dl")) ++ posN ++
        Seq(col("n_docs"), col("sum_dl")): _*)
      .write.mode("append").partitionBy("bkt").parquet(s"$dir/postings")
    if (obs.get("n").asInstanceOf[Long] > 0L)
      Tombstones.write(spark, s"$dir/postings", hit, "doc_id")
    graft.CacheScope.release(hit)
  }

  /** The index's serving stats: ONE row `(n_docs, sum_dl)` — the sum of
    * the additive totals rows (live set exactly, since every delete
    * subtracted its docs). Partition-pruned to [[StBkt]]: O(operations)
    * rows read, never a corpus scan.
    */
  def totals(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/postings")
      .filter(col("bkt") === StBkt)
      .agg(sum(col("n_docs")).cast("long").as("n_docs"),
        sum(col("sum_dl")).cast("long").as("sum_dl"))

  /** Apply pending tombstones physically and restore one file per
    * bucket: ONE staged rewrite of the whole table drops marked docs'
    * posting AND doclen rows together (one marker set, one pass — the
    * stats rows carry a NULL doc_id so no marker can ever match them
    * and they ride along untouched: they are already correct, additive,
    * deletes subtracted at delete time). Markers written while the
    * rewrite ran are carried into the published layout
    * ([[Tombstones.carryInto]]) and keep masking — their doclen rows
    * also survive, correctly: a re-delete is refused while the marker
    * is pending, and the NEXT compact applies both sides at once. The
    * single publish swap clears the applied markers with the old
    * directory; postings and doclens can never be staged against
    * different marker sets (the hazard the previous two-directory
    * layout had to order its publishes around).
    */
  def compact(spark: SparkSession, dir: String): Unit =
    compact(spark, dir, () => ())

  /** Test seam: `midCompact` runs after the marker snapshot and the
    * (eager) marker-file listing of the live read, before the staged
    * rewrite materializes — the race window the snapshot/carry
    * discipline covers.
    */
  private[graft] def compact(spark: SparkSession, dir: String,
      midCompact: () => Unit): Unit = {
    val post = s"$dir/postings"
    val snap = Tombstones.fileSnapshot(spark, post)
    val statsSnap = statsFiles(spark, post)
    val live = Tombstones.filterLive(spark, post,
      spark.read.parquet(post), "doc_id")
    midCompact()
    val staged = post + ".__tmp__"
    live.repartition(col("bkt"))
      .write.mode("overwrite").partitionBy("bkt").parquet(staged)
    // the modulus and positional flag are unchanged by compaction but
    // must travel with the staged layout — the publish swap replaces
    // the whole directory
    val (nb, withPos) = readLayout(spark, dir)
    writeBucketsFile(spark, staged, nb, withPos)
    Tombstones.carryInto(spark, post, snap, staged)
    carryLateStats(spark, post, statsSnap, staged)
    Tables.publish(spark, staged, post)
  }

  /** Skew-gated BUCKET growth — the when-to-rebucket decision leg for
    * the postings layout (the [[LshIndex.rebucketIfSkewed]] /
    * [[IvfAnn.retrainIfDrifted]] discipline for this family). The
    * signal is the hottest bucket's LIVE posting-row count: probe cost
    * per query term is one bucket directory, so a bucket that outgrew
    * `maxPostingsPerBucket` makes every probe of its terms scan that
    * much. Above the budget the postings rewrite under DOUBLE the
    * modulus through the staged publish (snapshot/carry for mid-rebuild
    * deletes; pending markers apply physically, like [[compact]]), and
    * the new modulus travels inside the published directory. Doubling
    * splits a bucket's VOCABULARY in half (expected); a single
    * ultra-hot TERM cannot be split by any modulus — its posting list
    * is irreducible probe cost (cap-df pruning is a different, score-
    * changing lever this engine deliberately does not hide in a layout
    * op). Purely physical: serving results are bit-identical before and
    * after (spec-pinned; q163 serves through the post-decision layout).
    *
    * Returns one row `(grown, buckets_before, buckets_after,
    * max_bucket_rows)`.
    */
  def growBucketsIfHot(spark: SparkSession, dir: String,
      maxPostingsPerBucket: Long): DataFrame = {
    import spark.implicits._
    val post = s"$dir/postings"
    val (before, withPos) = readLayout(spark, dir)
    // signal over ALL posting rows (masked ones included: a probe's
    // bucket scan pays for tombstoned rows too until a compact drops
    // them) — but never the meta partitions, which no probe reads
    val statsSnap = statsFiles(spark, post)
    val rows = spark.read.parquet(post)
    val maxRows = rows.filter(col("bkt") >= 0)
      .groupBy(col("bkt")).agg(count(lit(1)).as("n"))
      .agg(coalesce(max(col("n")), lit(0L))).collect().head.getLong(0)
    val grow = maxRows > maxPostingsPerBucket
    if (grow) {
      val after = before * 2
      val staged = post + ".__grow__"
      // purely physical: every row rides along (tombstone APPLICATION
      // is compact's job — applying here would strand stale doclen
      // rows), and every marker file present at carry time — pending
      // or written mid-rebuild — is copied into the staged layout
      // (empty snapshot = carry all), so masking semantics and the
      // delete lifecycle are untouched by the re-bucketing. Meta rows
      // (bkt < 0) keep their reserved partitions — only term rows
      // re-bucket under the doubled modulus.
      rows.withColumn("bkt",
          when(col("bkt") < 0, col("bkt")).otherwise(bkt(col("term"), after)))
        .repartition(col("bkt"))
        .write.mode("overwrite").partitionBy("bkt").parquet(staged)
      writeBucketsFile(spark, staged, after, withPos)
      Tombstones.carryInto(spark, post, Set.empty, staged)
      carryLateStats(spark, post, statsSnap, staged)
      Tables.publish(spark, staged, post)
    }
    Seq((grow, before, if (grow) before * 2 else before, maxRows))
      .toDF("grown", "buckets_before", "buckets_after", "max_bucket_rows")
  }

  /** Term-level index health — the oracle-checkable half of the
    * telemetry pair ([[growBucketsIfHot]]'s bucket signal is layout
    * arithmetic DuckDB can't replay; these are corpus facts it can):
    * one row `(vocab, max_df, hot_terms, total_postings)` over the LIVE
    * postings, where `hot_terms` counts terms present in more than
    * `hotFrac` of the live corpus — the stopword mass that dominates
    * probe cost and posting-list skew. A maintenance-time full scan of
    * the index (the q117/q128 discipline), never a probe-path cost.
    */
  def healthReport(spark: SparkSession, dir: String,
      hotFrac: Double): DataFrame = {
    val live = Tombstones.filterLive(spark, s"$dir/postings",
      spark.read.parquet(s"$dir/postings").filter(col("bkt") >= 0),
      "doc_id")
    val dfr = live.groupBy(col("term")).agg(count(lit(1)).as("df"))
    dfr.crossJoin(broadcast(totals(spark, dir)))
      .agg(count(lit(1)).cast("long").as("vocab"),
        max(col("df")).cast("long").as("max_df"),
        sum(when(col("df").cast("double") >
          lit(hotFrac) * col("n_docs").cast("double"), 1L).otherwise(0L))
          .cast("long").as("hot_terms"),
        sum(col("df")).cast("long").as("total_postings"))
  }

  /** BM25 top-k per query — the probe path. One signature scan of the
    * bounded query batch yields `(qid, term, qtf)`; the postings read is
    * partition-pruned to the query terms' buckets (literal `bkt IN`
    * pushed from the collected — bounded — query vocabulary) and then
    * narrowed to the exact terms by a broadcast join; per-term document
    * frequency aggregates that already-pruned frame, so NOTHING in the
    * probe scales with corpus size except the probed posting lists
    * themselves. Scores sum per (query, doc) through [[Stable]]'s
    * decimal grid (partition-order-invariant despite the float `ln`),
    * and top-k per query runs on the bounded-heap
    * [[graft.plans.TopKPerKeyPlan]] operator — no full per-query sort.
    *
    * Output: `(qid, rank, doc_id, bm25)`, rank 1..k by (score desc,
    * doc_id), bm25 rounded to 4 decimals.
    */
  def searchTopK(spark: SparkSession, dir: String, queries: DataFrame,
      qidCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qt = graft.CacheScope.cache(
      queries.select(col(qidCol).as("qid"),
          explode(Text.tokens(col(textCol))).as("term"))
        .groupBy(col("qid"), col("term"))
        .agg(count(lit(1)).as("qtf")))
    // bounded by the query batch contract — same discipline as the
    // probed-cell collects in IvfAnn.searchPartitioned; the modulus
    // comes from the layout itself (growBucketsIfHot may have changed it)
    val nb = readBuckets(spark, dir)
    val bkts = qt.select(bkt(col("term"), nb).as("b")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val qTerms = qt.select(col("term")).distinct()
    val post = graft.CacheScope.cache(
      Tombstones.filterLive(spark, s"$dir/postings",
          spark.read.parquet(s"$dir/postings")
            .filter(col("bkt").isin(bkts: _*))
            // project away the single-table meta columns (n_docs/sum_dl
            // would collide with the stats crossJoin below) and anything
            // else the scorer never reads — §2.3 project-before-exchange
            .select(col("term"), col("doc_id"), col("tf"), col("dl")),
          "doc_id")
        .join(broadcast(qTerms), "term"))
    val dfr = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = totals(spark, dir)

    val nD = col("n_docs").cast("double")
    val idf = log(lit(1.0) +
      (nD - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val tfNorm = (col("tf").cast("double") * lit(K1 + 1)) /
      (col("tf").cast("double") + lit(K1) *
        (lit(1 - B) + lit(B) * col("dl").cast("double") * nD /
          col("sum_dl").cast("double")))
    val scored = qt.join(post, "term").join(broadcast(dfr), "term")
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("doc_id"),
        (col("qtf").cast("double") * idf * tfNorm).as("c"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(Stable.sumD(col("c")).as("score"))
    val top = Dedup.topKPerKey(scored, Seq("qid"),
      Seq(col("score").desc, col("doc_id").asc), k)
    // qt/post stay registered in CacheScope until the caller's
    // releaseAll() — releasing here would unpersist before the caller
    // materializes the (lazy) result and recompute both scans
    top
      .withColumn("rank", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("qid"), col("rank"), col("doc_id"),
        round(col("score") + lit(1e-9), 4).as("bm25"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Exact-phrase probe over a POSITIONAL layout — the decontamination
    * primitive bag-of-words BM25 cannot express ("does this eval
    * question appear VERBATIM in the corpus?"). Fails fast unless the
    * index was written `withPositions = true`. The probe keeps
    * [[searchTopK]]'s shape — bucket-pruned postings read, broadcast
    * term narrowing, tombstone mask — so cost is O(query-vocabulary
    * posting lists + their position arrays), never a corpus scan.
    *
    * Adjacency is position arithmetic, not a self-join per term pair:
    * phrase slot `i` matching at token offset `p` anchors candidate
    * start `base = p − i`, and `base` is a verbatim occurrence iff ALL
    * `m` slots anchor it — one (qid, doc, base) groupBy counting slot
    * hits (unique by construction: offsets are distinct within a
    * posting row, so each slot hits a base at most once; a term
    * repeated in the phrase occupies multiple slots and must match at
    * multiple offsets).
    *
    * Output: `(qid, doc_id, n_occurrences)` for docs with ≥1 verbatim
    * occurrence — all-integer, no float surface.
    */
  def phraseSearch(spark: SparkSession, dir: String, queries: DataFrame,
      qidCol: String, textCol: String): DataFrame = {
    val (nb, withPos) = readLayout(spark, dir)
    require(withPos,
      "phraseSearch needs a positional layout: write(..., withPositions = true)")
    val qslots = graft.CacheScope.cache(
      queries.select(col(qidCol).as("qid"),
        posexplode(Text.tokens(col(textCol))).as(Seq("slot", "term"))))
    val qlen = qslots.groupBy(col("qid")).agg(count(lit(1)).as("m"))
    val bkts = qslots.select(bkt(col("term"), nb).as("b")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val qTerms = qslots.select(col("term")).distinct()
    val post = Tombstones.filterLive(spark, s"$dir/postings",
        spark.read.parquet(s"$dir/postings")
          .filter(col("bkt").isin(bkts: _*))
          .select(col("term"), col("doc_id"), col("pos")), "doc_id")
      .join(broadcast(qTerms), "term")
    qslots.join(post, "term")
      .select(col("qid"), col("doc_id"), col("slot"),
        explode(col("pos")).as("p"))
      .select(col("qid"), col("doc_id"),
        (col("p").cast("long") - col("slot").cast("long")).as("base"),
        col("slot"))
      .groupBy(col("qid"), col("doc_id"), col("base"))
      .agg(count(lit(1)).as("hits"))
      .join(broadcast(qlen), "qid")
      .filter(col("hits") === col("m"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_occurrences"))
  }

  /** Unordered proximity probe over a POSITIONAL layout: documents
    * where ALL distinct query terms co-occur within some `window`
    * consecutive tokens, with the TIGHTEST such span reported — the
    * "quoted-with-slop" relative of [[phraseSearch]] (plagiarism /
    * decontamination sweeps tolerate reordering and inserted words;
    * verbatim phrase match does not).
    *
    * The minimal cover is computed relationally (no per-doc sweep
    * state): every probed position is a candidate window END; for each
    * (end, term) the best start contribution is the term's latest
    * position ≤ end; a window end where all `m` terms have one yields
    * span `end − min(best) + 1`, and the per-doc minimum over ends is
    * exact. Cost is O(Σ positions² per doc) over PROBED posting rows
    * only — bounded by the query vocabulary's lists, never the corpus,
    * and the oracle replays the identical joins.
    *
    * Output: `(qid, doc_id, min_span)`, min_span ≤ window — all-integer.
    */
  def proximitySearch(spark: SparkSession, dir: String, queries: DataFrame,
      qidCol: String, textCol: String, window: Int): DataFrame = {
    val (nb, withPos) = readLayout(spark, dir)
    require(withPos,
      "proximitySearch needs a positional layout: write(..., withPositions = true)")
    val qterms = graft.CacheScope.cache(
      queries.select(col(qidCol).as("qid"),
        explode(array_distinct(Text.tokens(col(textCol)))).as("term")))
    val qm = qterms.groupBy(col("qid")).agg(count(lit(1)).as("m"))
    val bkts = qterms.select(bkt(col("term"), nb).as("b")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val post = Tombstones.filterLive(spark, s"$dir/postings",
        spark.read.parquet(s"$dir/postings")
          .filter(col("bkt").isin(bkts: _*))
          .select(col("term"), col("doc_id"), col("pos")), "doc_id")
      .join(broadcast(qterms.select(col("term")).distinct()), "term")
    val tp = graft.CacheScope.cache(
      qterms.join(post, "term")
        .select(col("qid"), col("doc_id"), col("term"),
          explode(col("pos")).as("p0"))
        .select(col("qid"), col("doc_id"), col("term"),
          col("p0").cast("long").as("p")))
    val ends = tp.select(col("qid"), col("doc_id"), col("p").as("end"))
      .distinct()
    ends.join(tp, Seq("qid", "doc_id"))
      .filter(col("p") <= col("end"))
      .groupBy(col("qid"), col("doc_id"), col("end"), col("term"))
      .agg(max(col("p")).as("bp"))
      .groupBy(col("qid"), col("doc_id"), col("end"))
      .agg(count(lit(1)).as("covered"), min(col("bp")).as("start"))
      .join(broadcast(qm), "qid")
      .filter(col("covered") === col("m"))
      .select(col("qid"), col("doc_id"),
        (col("end") - col("start") + lit(1L)).as("span"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(min(col("span")).cast("long").as("min_span"))
      .filter(col("min_span") <= window)
  }

  /** DuckDB-oracle CTE chain replaying [[searchTopK]] over `corpusCte`
    * and `queriesCte` (each `SELECT doc_id|qid, text ...`): tokenize →
    * postings/doclens/totals → per-term df → the BM25 kernel with the
    * SAME decimal literals → decimal-grid sum → rank. Kept textually
    * parallel to the Column expressions above — the bit-equality of the
    * two engines' scores is the gate.
    */
  def bm25OracleSql(corpusCte: String, queriesCte: String, k: Int): String =
    s"""WITH ${bm25CtesSql(corpusCte, queriesCte)},
      |ranked AS (SELECT *, row_number() OVER (PARTITION BY qid
      |    ORDER BY score DESC, doc_id) AS rk FROM scored)
      |SELECT qid, CAST(rk AS BIGINT) AS rank, doc_id,
      |  round(score + 1e-9, 4) AS bm25
      |FROM ranked WHERE rk <= $k
      |ORDER BY qid, rank""".stripMargin

  /** The [[bm25OracleSql]] CTE chain up to `scored (qid, doc_id, score)`
    * — exposed so composition oracles (hybrid rank fusion) can extend it.
    */
  def bm25CtesSql(corpusCte: String, queriesCte: String): String =
    s"""live AS ($corpusCte),
      |tok AS (SELECT doc_id,
      |    unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
      |      t -> t != '')) AS term
      |  FROM live),
      |post AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
      |  FROM tok GROUP BY 1, 2),
      |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
      |  FROM tok GROUP BY 1),
      |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
      |qdocs AS ($queriesCte),
      |qt AS (SELECT qid, unnest(list_filter(
      |      regexp_split_to_array(lower(text), '\\s+'), t -> t != '')) AS term
      |  FROM qdocs),
      |qtf AS (SELECT qid, term, CAST(count(*) AS BIGINT) AS qtf
      |  FROM qt GROUP BY 1, 2),
      |dfr AS (SELECT term, CAST(count(*) AS BIGINT) AS df
      |  FROM post GROUP BY 1),
      |contrib AS (
      |  SELECT q.qid, p.doc_id,
      |    CAST(q.qtf AS DOUBLE)
      |      * ln(1.0 + (CAST(s.n_docs AS DOUBLE) - CAST(f.df AS DOUBLE)
      |          + 0.5) / (CAST(f.df AS DOUBLE) + 0.5))
      |      * (CAST(p.tf AS DOUBLE) * ${K1 + 1})
      |      / (CAST(p.tf AS DOUBLE) + $K1 * (${1 - B}
      |          + $B * CAST(d.dl AS DOUBLE) * CAST(s.n_docs AS DOUBLE)
      |            / CAST(s.sum_dl AS DOUBLE))) AS c
      |  FROM qtf q JOIN post p USING (term) JOIN dfr f USING (term)
      |    JOIN dl d ON d.doc_id = p.doc_id CROSS JOIN stats s),
      |scored AS (
      |  SELECT qid, doc_id, ${Stable.sumDSql("c")} AS score
      |  FROM contrib GROUP BY 1, 2)""".stripMargin
}
