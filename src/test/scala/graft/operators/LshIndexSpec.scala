package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.Text

class LshIndexSpec extends SparkTestBase {

  private def withSh(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        MinHashLSH.shingleHashes(Text.tokens(col("text")), 3).as("sh"))
  }

  test("bandRows emits exactly Bands rows per doc, equal docs collide everywhere") {
    val df = withSh(Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy dog",
      3L -> "completely different text with no shared shingles at all"))
    val rows = LshIndex.bandRows(df, "doc_id", "sh")
    assert(rows.count() === 3L * MinHashLSH.Bands)
    // identical docs have identical signatures => same bucket in every band
    val collisions = rows.filter(col("doc_id") === 1L).as("a")
      .join(rows.filter(col("doc_id") === 2L).as("b"),
        col("a.band") === col("b.band") && col("a.bkt") === col("b.bkt"))
      .count()
    assert(collisions === MinHashLSH.Bands.toLong)
  }

  test("write + probe + append round-trips through disk, O(delta) admission") {
    val corpus = withSh(Seq(
      10L -> "shared text body one two three four five six seven",
      11L -> "unrelated corpus document about entirely other things here"))
    val path = graft.Scratch.fresh("lshindex_spec") + "/idx"
    LshIndex.write(corpus, "doc_id", "sh", path)
    assert(spark.read.parquet(path).count() === 2L * MinHashLSH.Bands)

    // delta: one exact dup of doc 10, one novel doc
    val delta = withSh(Seq(
      20L -> "shared text body one two three four five six seven",
      21L -> "a fresh never before seen document with novel content"))
    val cand = LshIndex.candidates(spark, path, delta, "doc_id", "sh")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((20L, 10L)))
    assert(!cand.exists(_._1 == 21L))

    // admit only the novel doc; index grows by Bands rows
    LshIndex.append(delta.filter(col("doc_id") === 21L), "doc_id", "sh", path)
    assert(spark.read.parquet(path).count() === 3L * MinHashLSH.Bands)
    // the appended doc is immediately probe-able by the next batch
    val cand2 = LshIndex.candidates(spark, path,
        withSh(Seq(30L -> "a fresh never before seen document with novel content")),
        "doc_id", "sh")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand2.contains((30L, 21L)))
  }

  test("deleted docs stop blocking admissions immediately; compact applies physically") {
    val path = graft.Scratch.fresh("lshindex_forget") + "/idx"
    val corpus = withSh(Seq(
      10L -> "shared text body one two three four five six seven",
      11L -> "unrelated corpus document about entirely other things here"))
    LshIndex.write(corpus, "doc_id", "sh", path)
    val probe = withSh(Seq(
      20L -> "shared text body one two three four five six seven"))
    def collides() = LshIndex.candidates(spark, path, probe, "doc_id", "sh")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(collides().contains((20L, 10L)))
    // forget doc 10 — markers only, index files untouched
    import spark.implicits._
    LshIndex.delete(spark, path, Seq(10L).toDF("doc_id"), "doc_id")
    assert(spark.read.parquet(path).count() === 2L * MinHashLSH.Bands)
    assert(!collides().exists(_._2 == 10L))
    // compaction drops the band rows physically and clears the markers
    LshIndex.compact(spark, path, "doc_id")
    assert(spark.read.parquet(path).count() === 1L * MinHashLSH.Bands)
    assert(LshIndex.tombstones(spark, path).isEmpty)
    assert(!collides().exists(_._2 == 10L))
  }

  test("delete-then-readmit: append clears the stale marker so the doc " +
      "serves and survives compaction") {
    val path = graft.Scratch.fresh("lshindex_readmit") + "/idx"
    val corpus = withSh(Seq(
      10L -> "shared text body one two three four five six seven",
      11L -> "unrelated corpus document about entirely other things here"))
    LshIndex.write(corpus, "doc_id", "sh", path)
    import spark.implicits._
    LshIndex.delete(spark, path, Seq(10L).toDF("doc_id"), "doc_id")
    // doc 10 is re-ingested: the stale marker must not mask its NEW rows
    LshIndex.append(
      withSh(Seq(10L -> "shared text body one two three four five six seven")),
      "doc_id", "sh", path)
    assert(LshIndex.tombstones(spark, path).isEmpty,
      "re-admission must clear the matching tombstone")
    val probe = withSh(Seq(
      20L -> "shared text body one two three four five six seven"))
    def collides() = LshIndex.candidates(spark, path, probe, "doc_id", "sh")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(collides().contains((20L, 10L)),
      "re-admitted doc must be visible at probe time")
    // compaction must KEEP the re-admitted rows (round-8 advice: the old
    // marker used to drop them physically, losing the doc forever)
    LshIndex.compact(spark, path, "doc_id")
    assert(collides().contains((20L, 10L)),
      "re-admitted doc must survive compaction")
  }

  test("bucketed steady-state probe: index side plans with no exchange") {
    val path = graft.Scratch.fresh("lshindex_bucketed") + "/idx"
    val docs = (0L until 40L).map(i =>
      i -> s"document number $i body with distinct words w$i x$i y$i z$i")
    LshIndex.write(withSh(docs), "doc_id", "sh", path)
    val table = "lsh_idx_bucketed_spec"
    try {
      LshIndex.compactBucketed(spark, path, table, buckets = 8, "doc_id")
      val delta = withSh(Seq(
        100L -> "document number 7 body with distinct words w7 x7 y7 z7",
        101L -> "a wholly novel document that matches nothing in the index"))
      // force the sort-merge path (a broadcast delta would trivially
      // leave the index exchange-free) — the claim under test is the
      // LARGE-delta shape: only the delta shuffles into the index's
      // bucket layout
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val cand = LshIndex.candidatesBucketed(spark, table, delta,
        "doc_id", "sh")
      val plan = cand.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      val exchanges = "Exchange".r.findAllIn(plan).length
      // distinct() adds its own exchange after the join; the JOIN itself
      // must only shuffle the delta side — with the index side also
      // shuffling this would be 3
      assert(exchanges <= 2,
        s"index side of the probe must not shuffle ($exchanges exchanges):\n$plan")
      // same answer as the plain-path probe
      val got = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = LshIndex.candidates(spark, path, delta, "doc_id", "sh")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want)
      assert(got.contains((100L, 7L)) && !got.exists(_._1 == 101L))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("two-tier rollover: truncated ingest path + bucketed bulk serve " +
      "as one index") {
    val path = graft.Scratch.fresh("lshindex_tiered") + "/idx"
    val corpus = withSh(Seq(
      10L -> "shared text body one two three four five six seven",
      11L -> "unrelated corpus document about entirely other things here"))
    LshIndex.write(corpus, "doc_id", "sh", path)
    val table = "lsh_tiered_spec_bulk"
    try {
      LshIndex.compactBucketedAndTruncate(spark, path, table,
        buckets = 4, "doc_id")
      // ingest tier is empty (schema preserved), bulk holds everything
      assert(spark.read.parquet(path).count() === 0L)
      assert(spark.table(table).count() === 2L * MinHashLSH.Bands)
      def hybrid(probe: org.apache.spark.sql.DataFrame) =
        LshIndex.candidatesHybrid(spark, table, path, probe, "doc_id", "sh")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val dupOf10 = withSh(Seq(
        20L -> "shared text body one two three four five six seven"))
      assert(hybrid(dupOf10).contains((20L, 10L)),
        "bulk-tier rows must serve after the rollover")
      // a post-rollover admission lands in the path tier…
      LshIndex.append(
        withSh(Seq(30L -> "a wholly new document admitted after rollover")),
        "doc_id", "sh", path)
      val dupOf30 = withSh(Seq(
        40L -> "a wholly new document admitted after rollover"))
      assert(hybrid(dupOf30).contains((40L, 30L)),
        "delta-tier rows must serve immediately")
      // …and a post-rollover delete masks BULK rows too
      import spark.implicits._
      LshIndex.delete(spark, path, Seq(10L).toDF("doc_id"), "doc_id")
      assert(!hybrid(dupOf10).exists(_._2 == 10L),
        "a delete after the rollover must mask the bulk tier")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("second rollover folds BOTH tiers into the new bulk generation") {
    val path = graft.Scratch.fresh("lshindex_rollover2") + "/idx"
    val corpus = withSh(Seq(
      10L -> "shared text body one two three four five six seven",
      11L -> "unrelated corpus document about entirely other things here"))
    LshIndex.write(corpus, "doc_id", "sh", path)
    val table = "lsh_rollover2_bulk"
    try {
      // rollover #1: path holds the whole index (the q141 shape)
      LshIndex.compactBucketedAndTruncate(spark, path, table,
        buckets = 4, "doc_id")
      // an admission wave lands in the truncated ingest tier…
      LshIndex.append(
        withSh(Seq(30L -> "a wholly new document admitted after rollover")),
        "doc_id", "sh", path)
      // …then rollover #2 — the steady state the API exists for: the
      // bulk table must come out as tier-1 ∪ tier-2, not just the
      // ingest-tier rows (round-9 verdict: the old code overwrote the
      // bulk with only the appends, un-indexing the compacted corpus)
      LshIndex.compactBucketedAndTruncate(spark, path, table,
        buckets = 4, "doc_id")
      assert(spark.read.parquet(path).count() === 0L)
      assert(spark.table(table).count() === 3L * MinHashLSH.Bands)
      def hybrid(probe: org.apache.spark.sql.DataFrame) =
        LshIndex.candidatesHybrid(spark, table, path, probe, "doc_id", "sh")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // a dup of a TIER-1 doc must still be refused after rollover #2
      assert(hybrid(withSh(Seq(
          20L -> "shared text body one two three four five six seven")))
        .contains((20L, 10L)),
        "rollover #2 must keep serving docs compacted by rollover #1")
      // and the wave admitted between the rollovers serves from the bulk
      assert(hybrid(withSh(Seq(
          40L -> "a wholly new document admitted after rollover")))
        .contains((40L, 30L)))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("a rollover retry after a swap crash recovers the staged bulk " +
      "instead of rebuilding it from the ingest tier") {
    val path = graft.Scratch.fresh("lshindex_swapcrash") + "/idx"
    val corpus = withSh(Seq(
      10L -> "shared text body one two three four five six seven",
      11L -> "unrelated corpus document about entirely other things here"))
    LshIndex.write(corpus, "doc_id", "sh", path)
    val table = "lsh_swapcrash_bulk"
    try {
      LshIndex.compactBucketedAndTruncate(spark, path, table,
        buckets = 4, "doc_id")
      LshIndex.append(
        withSh(Seq(30L -> "a wholly new document admitted after rollover")),
        "doc_id", "sh", path)
      // simulate rollover #2 crashing in the swap's middle window: the
      // fold (bulk ∪ wave) is fully staged and the old bulk has been
      // renamed away — `table` does not exist. The pre-fix retry saw
      // tableExists=false, took the empty-bulk branch, and rebuilt the
      // bulk from the ingest tier alone — un-indexing docs 10/11.
      val fold = spark.table(table).unionByName(spark.read.parquet(path))
      graft.layout.Bucketing.writeBucketedBy(fold, table + "__staged",
        Seq("band", "bkt"), 4)
      spark.sql(s"ALTER TABLE `$table` RENAME TO `${table}__old`")
      assert(!spark.catalog.tableExists(table))
      // the retry must recover the staged generation before deciding
      LshIndex.compactBucketedAndTruncate(spark, path, table,
        buckets = 4, "doc_id")
      assert(spark.read.parquet(path).count() === 0L)
      def hybrid(probe: org.apache.spark.sql.DataFrame) =
        LshIndex.candidatesHybrid(spark, table, path, probe, "doc_id", "sh")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(hybrid(withSh(Seq(
          20L -> "shared text body one two three four five six seven")))
        .contains((20L, 10L)),
        "tier-1 docs must survive a crash-interrupted rollover")
      assert(hybrid(withSh(Seq(
          40L -> "a wholly new document admitted after rollover")))
        .contains((40L, 30L)),
        "the staged wave must survive the recovery")
    } finally {
      Seq(table, table + "__staged", table + "__old")
        .foreach(n => spark.sql(s"DROP TABLE IF EXISTS `$n`"))
    }
  }

  test("a delete landing mid-rollover survives the truncate publish") {
    val path = graft.Scratch.fresh("lshindex_rollover_race") + "/idx"
    val corpus = withSh(Seq(
      10L -> "shared text body one two three four five six seven",
      11L -> "unrelated corpus document about entirely other things here"))
    LshIndex.write(corpus, "doc_id", "sh", path)
    val table = "lsh_rollover_race_bulk"
    import spark.implicits._
    try {
      // the delete lands AFTER the live read built the new bulk but
      // BEFORE the truncate publishes — the exact window where the old
      // code dropped the marker with the swapped-out directory
      LshIndex.compactBucketedAndTruncate(spark, path, table,
        buckets = 4, "doc_id",
        () => LshIndex.delete(spark, path, Seq(10L).toDF("doc_id"),
          "doc_id"))
      assert(LshIndex.tombstones(spark, path).isDefined,
        "the mid-rollover marker must be carried into the truncated tier")
      val cand = LshIndex.candidatesHybrid(spark, table, path,
          withSh(Seq(
            20L -> "shared text body one two three four five six seven")),
          "doc_id", "sh")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!cand.exists(_._2 == 10L),
        "a delete written during the rollover must keep masking the bulk")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("rebuild applies pending tombstones and carries mid-rebuild deletes") {
    // docs 1/2 identical (hot pair => pairs > 0 fires the gate), doc 3
    // unique; capDf=5 keeps every shingle (df <= 2), so the rebuild is
    // content-preserving except for the deletes under test
    val docs = withSh(Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta theta",
      3L -> "totally different content with its own words here"))
    val path = graft.Scratch.fresh("lshindex_rebucket_ts") + "/idx"
    LshIndex.write(docs, "doc_id", "sh", path)
    import spark.implicits._
    // doc 2 is forgotten BEFORE the rebuild: the rebuild reads the
    // caller's corpus (which still contains doc 2), so without the
    // filterLive the publish would resurrect it and destroy its marker
    LshIndex.delete(spark, path, Seq(2L).toDF("doc_id"), "doc_id")
    // doc 3 is forgotten DURING the rebuild: its marker must be carried
    val (_, rebuilt) = LshIndex.rebucketIfSkewed(spark, path, docs,
      "doc_id", "sh", capDf = 5L, pairBudget = 0L,
      () => LshIndex.delete(spark, path, Seq(3L).toDF("doc_id"), "doc_id"))
    assert(rebuilt)
    assert(spark.read.parquet(path).select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet === Set(1L, 3L),
      "pre-rebuild delete must be applied physically, not resurrected")
    assert(LshIndex.tombstones(spark, path).isDefined,
      "the mid-rebuild marker must survive the publish swap")
    val cand = LshIndex.candidates(spark, path,
        withSh(Seq(
          20L -> "alpha beta gamma delta epsilon zeta eta theta",
          30L -> "totally different content with its own words here")),
        "doc_id", "sh")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((20L, 1L)))
    assert(!cand.exists(_._2 == 2L), "forgotten doc 2 must not serve")
    assert(!cand.exists(_._2 == 3L),
      "the carried marker must mask doc 3 at probe time")
  }

  test("hybrid probe computes the delta's band rows ONCE for both tiers") {
    val path = graft.Scratch.fresh("lshindex_hybrid_once") + "/idx"
    LshIndex.write(withSh(Seq(
        10L -> "shared text body one two three four five six seven")),
      "doc_id", "sh", path)
    val table = "lsh_hybrid_once_bulk"
    try {
      LshIndex.compactBucketedAndTruncate(spark, path, table,
        buckets = 4, "doc_id")
      LshIndex.append(
        withSh(Seq(30L -> "a wholly new document admitted after rollover")),
        "doc_id", "sh", path)
      val delta = withSh(Seq(
        20L -> "shared text body one two three four five six seven"))
      val cand = LshIndex.candidatesHybrid(spark, table, path, delta,
        "doc_id", "sh")
      // both tier probes must read the CACHED band-rows frame — the
      // delta's MinHash signature scan is the dominant admission cost
      // and used to run once per tier (round-9 verdict #4)
      val plan = cand.queryExecution.executedPlan.toString
      val scans = "InMemoryTableScan".r.findAllIn(plan).length
      assert(scans >= 2,
        s"both tiers must probe the cached delta band rows:\n$plan")
      assert(cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        .contains((20L, 10L)))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      graft.CacheScope.releaseAll()
    }
  }

  test("hybrid probe keeps the bulk table exchange-free") {
    val path = graft.Scratch.fresh("lshindex_hybrid_pin") + "/idx"
    val docs = (0L until 40L).map(i =>
      i -> s"document number $i body with distinct words w$i x$i y$i z$i")
    LshIndex.write(withSh(docs), "doc_id", "sh", path)
    val table = "lsh_hybrid_pin_bulk"
    try {
      LshIndex.compactBucketedAndTruncate(spark, path, table,
        buckets = 8, "doc_id")
      LshIndex.append(
        withSh(Seq(50L -> "a post rollover admission with words v50 u50")),
        "doc_id", "sh", path)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val delta = withSh(Seq(
        100L -> "document number 7 body with distinct words w7 x7 y7 z7"))
      val plan = LshIndex.candidatesHybrid(spark, table, path, delta,
        "doc_id", "sh").queryExecution.executedPlan.toString
      // exchanges with the table side co-located: delta into the table's
      // bucket layout (1), both sides of the path-tier join (2), the
      // closing distinct (1) = 4. A shuffling table side makes it 5.
      val exchanges = "Exchange".r.findAllIn(plan).length
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(exchanges <= 4,
        s"bulk table side of the hybrid probe must not shuffle " +
          s"($exchanges exchanges):\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("rebucketIfSkewed: below budget nothing moves; above it hot " +
      "shingles drop and pair cost falls") {
    // two near-identical docs (one hot collision) + one unique doc
    val docs = withSh(Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta theta",
      3L -> "totally different content with its own words here"))
    val path = graft.Scratch.fresh("lshindex_rebucket") + "/idx"
    LshIndex.write(docs, "doc_id", "sh", path)
    val before = spark.read.parquet(path)
      .collect().map(_.toString).sorted.toSeq
    // generous budget: the gate must NOT fire and must NOT touch files
    val (pairs1, rebuilt1) = LshIndex.rebucketIfSkewed(spark, path, docs,
      "doc_id", "sh", capDf = 1L, pairBudget = 1000L)
    assert(!rebuilt1 && pairs1 > 0)
    assert(spark.read.parquet(path)
      .collect().map(_.toString).sorted.toSeq === before)
    // zero budget: rebuild fires; docs 1/2's shared shingles have df=2
    // > capDf=1 so they drop out entirely (all-boilerplate), doc 3's
    // unique shingles survive
    val (pairs2, rebuilt2) = LshIndex.rebucketIfSkewed(spark, path, docs,
      "doc_id", "sh", capDf = 1L, pairBudget = 0L)
    assert(rebuilt2 && pairs2 === pairs1)
    val after = spark.read.parquet(path)
    assert(after.select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet === Set(3L))
    // the rebuilt index's probe cost is below the old one
    val pairsAfter = after
      .groupBy(col("band"), col("bkt")).agg(count(lit(1)).as("s"))
      .agg(coalesce(sum(expr("(s * (s - 1)) div 2")), lit(0L)))
      .head.getLong(0)
    assert(pairsAfter < pairs1)
  }

  test("compact coalesces append fragments without changing content") {
    val path = graft.Scratch.fresh("lshindex_compact") + "/idx"
    val docs = (0L until 6L).map(i =>
      i -> s"document number $i with its own words here now")
    LshIndex.write(withSh(docs.take(1)), "doc_id", "sh", path)
    docs.drop(1).foreach(d =>
      LshIndex.append(withSh(Seq(d)), "doc_id", "sh", path))
    def files() = spark.read.parquet(path).select(input_file_name())
      .distinct().count()
    def content() = spark.read.parquet(path)
      .collect().map(_.toString).sorted.toSeq
    val before = content()
    assert(files() >= 6L) // one fragment per append
    LshIndex.compact(spark, path, "doc_id")
    assert(files() === 1L)
    assert(content() === before)
  }
}
