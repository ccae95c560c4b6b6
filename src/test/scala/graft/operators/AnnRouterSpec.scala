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
}
