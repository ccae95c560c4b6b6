package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AnnRouterSpec extends SparkTestBase {

  private def corpus = graft.sources.Tables.load(spark, sfDir, "embeddings")
    .select(col("vec_id"), col("embedding"))

  private def calFrame(points: Seq[(Int, Double)]) = {
    import spark.implicits._
    points.toDF("refine", "recall")
  }

  test("chooseRefine picks the SMALLEST budget meeting the target") {
    val cal = calFrame(Seq(1 -> 0.2, 2 -> 0.55, 4 -> 0.8, 8 -> 0.95))
    assert(AnnRouter.chooseRefine(cal, 0.5) === 2)
    assert(AnnRouter.chooseRefine(cal, 0.8) === 4) // boundary: >= is met
    assert(AnnRouter.chooseRefine(cal, 0.1) === 1)
  }

  test("chooseRefine caps at the widest measured budget when no point " +
      "meets the target") {
    val cal = calFrame(Seq(1 -> 0.2, 2 -> 0.3, 8 -> 0.6, 4 -> 0.5))
    assert(AnnRouter.chooseRefine(cal, 0.99) === 8)
  }

  test("routeBinaryRefine serves searchRefined at the budget the " +
      "calibration slice prices, and tags it") {
    val (k, nServe, nCal, target) = (3, 20, 10, 0.25)
    val refines = Seq(1, 2, 4, 8)
    val queries = corpus.filter(col("vec_id") < nServe)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    // the router's calibration slice (qid < nCal over the SHARED ranked
    // frame) must equal the standalone instrument on the same slice
    val expectedRefine = AnnRouter.chooseRefine(
      BinaryQuantizer.recallSweep(corpus, "vec_id", "embedding",
        nQueries = nCal, k = k, refines = refines), target)
    val routed = AnnRouter.routeBinaryRefine(corpus, "vec_id", "embedding",
        queries, "qid", "qv", k = k, refines = refines, target = target,
        calFilter = col("qid") < nCal)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(routed.map(_._4).distinct.toSeq === Seq(expectedRefine),
      "every served row must carry the routed budget")
    val expected = BinaryQuantizer.searchRefined(corpus, "vec_id",
        "embedding", queries, "qid", "qv", k = k, refine = expectedRefine)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(routed.map(t => (t._1, t._2, t._3)).toSet === expected,
      "routed serving must equal the chosen tier's direct search")
    assert(routed.length === nServe * k)
    graft.CacheScope.releaseAll()
  }

  test("routeTiers at target 1.0 falls through to a tier with perfect " +
      "calibration recall and serves exact top-k") {
    import spark.implicits._
    // adversarial fixture: the first 32 dims are CONSTANT (prefix tiers
    // see nothing), magnitudes in the last 32 dims are id-PERMUTED so a
    // low-id tie-broken shortlist misses true neighbors
    val dim = 64
    val fixture = (0L until 40L).map { i =>
      val m = 1.0f + 0.01f * ((i * 17) % 40)
      (i, Array.tabulate(dim)(d => if (d < 32) 1.0f else m))
    }.toDF("vec_id", "embedding")
    val (k, nServe, nCal) = (3, 10, 6)
    val queries = fixture.filter(col("vec_id") < nServe)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val routed = AnnRouter.routeTiers(fixture, "vec_id", "embedding",
        queries, "qid", "qv", k = k, refine = 2, widths = Seq(16, 32),
        dim = dim, target = 1.0, calFilter = col("qid") < nCal)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    // the full-float tier trivially hits 1.0, so routing always succeeds;
    // on THIS fixture no cheaper tier can (prefixes are blind, binary
    // codes split only two magnitude groups)
    assert(routed.map(_._4).distinct.toSeq === Seq("exact"))
    val brute = Matryoshka.search(fixture, "vec_id", "embedding",
        queries, "qid", "qv", dims = dim, k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(routed.map(t => (t._1, t._2, t._3)).toSet === brute)
    graft.CacheScope.releaseAll()
  }

  test("routeTiers fails fast on an empty calibration slice instead of " +
      "routing on NaN recalls") {
    import spark.implicits._
    val dim = 64
    val fixture = (0L until 20L).map(i =>
      (i, Array.tabulate(dim)(d => 0.01f * ((i + d) % 7))))
      .toDF("vec_id", "embedding")
    val queries = fixture.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val e = intercept[IllegalArgumentException] {
      AnnRouter.routeTiers(fixture, "vec_id", "embedding", queries,
        "qid", "qv", k = 3, refine = 2, widths = Seq(16), dim = dim,
        target = 0.9, calFilter = col("qid") < 0) // matches nothing
    }
    assert(e.getMessage.contains("calFilter"))
    graft.CacheScope.releaseAll()
  }

  test("routeTiers picks the CHEAPEST qualifying tier, not the best") {
    // real fixture, permissive target: the binary tier (8 B/vec) prices
    // cheapest; assert the router's decision matches an independent
    // recall measurement through the same public APIs
    val (k, nServe, nCal, refine, dim) = (3, 10, 6, 4, 64)
    val widths = Seq(16, 32)
    val queries = corpus.filter(col("vec_id") < nServe)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val calQ = queries.filter(col("qid") < nCal)
    val gt = Matryoshka.search(corpus, "vec_id", "embedding", calQ,
        "qid", "qv", dims = dim, k = k)
      .select(col("qid"), col("neighbor"))
    def recallOf(served: org.apache.spark.sql.DataFrame): Double =
      served.select(col("qid"), col("neighbor"))
        .join(gt, Seq("qid", "neighbor"), "left_semi")
        .count().toDouble / (nCal * k)
    val cal = Seq(
      ("bq", dim / 8, recallOf(BinaryQuantizer.searchRefined(corpus,
        "vec_id", "embedding", calQ, "qid", "qv", k, refine)))) ++
      widths.map(d => (s"mrl$d", 4 * d,
        recallOf(Matryoshka.searchRefined(corpus, "vec_id", "embedding",
          calQ, "qid", "qv", d, dim, k, refine)))) :+
      (("exact", 4 * dim, 1.0))
    val target = 0.3
    val want = cal.filter(_._3 >= target).minBy(t => (t._2, t._1))._1
    val got = AnnRouter.routeTiers(corpus, "vec_id", "embedding", queries,
        "qid", "qv", k = k, refine = refine, widths = widths, dim = dim,
        target = target, calFilter = col("qid") < nCal)
      .select(col("tier")).distinct().collect().map(_.getString(0)).toSeq
    assert(got === Seq(want))
    graft.CacheScope.releaseAll()
  }
}
