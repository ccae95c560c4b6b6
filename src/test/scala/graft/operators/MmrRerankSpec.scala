package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MmrRerankSpec extends SparkTestBase {
  import spark.implicits._

  // one query, hand-built geometry: two near-identical highly-relevant
  // vectors (10, 11), one orthogonal moderately-relevant vector (20),
  // one diagonal low-relevance vector (30)
  private def cands = Seq(
    (1L, 10L, 0.95, Array(1f, 0f, 0f, 0f)),
    (1L, 11L, 0.94, Array(0.999f, 0.045f, 0f, 0f)), // ~dup of 10
    (1L, 20L, 0.80, Array(0f, 1f, 0f, 0f)),          // orthogonal topic
    (1L, 30L, 0.60, Array(0.7f, 0.7f, 0.1f, 0f))
  ).toDF("qid", "id", "rel", "vec")

  private def picks(k: Int, lambda: Double): Seq[(Long, Long)] =
    MmrRerank.rerank(cands, "qid", "id", "rel", "vec", k, lambda)
      .select(col("rank"), col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq

  test("rank 1 is pure relevance; rank 2 jumps the near-duplicate") {
    // with lambda=0.6, candidate 11 (cos~1 to the pick) scores
    // 0.6*0.94 - 0.4*~1 ~= 0.16 << 0.6*0.8 - 0.4*0 = 0.48 for the
    // orthogonal 20 — so rank 2 switches topic; at rank 3 the dup's
    // penalty (~0.16) still beats the diagonal 30's (0.36 - 0.4*0.70
    // ~= 0.08), so the dup seats LAST, not second
    assert(picks(3, 0.6) === Seq((1L, 10L), (2L, 20L), (3L, 11L)))
    assert(picks(4, 0.6).last === (4L, 30L))
  }

  test("lambda = 1.0 degenerates to plain relevance top-k") {
    assert(picks(3, 1.0) === Seq((1L, 10L), (2L, 11L), (3L, 20L)))
  }

  test("k beyond the shortlist stops at the shortlist (no null picks)") {
    assert(picks(9, 0.6).size === 4)
  }

  test("selection is per-query independent") {
    val two = cands.unionByName(
      Seq((2L, 40L, 0.5, Array(0f, 0f, 1f, 0f)),
        (2L, 41L, 0.4, Array(0f, 0f, 0f, 1f)))
        .toDF("qid", "id", "rel", "vec"))
    val got = MmrRerank.rerank(two, "qid", "id", "rel", "vec", 2, 0.6)
      .select(col("qid"), col("rank"), col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 1L, 10L), (1L, 2L, 20L),
      (2L, 1L, 40L), (2L, 2L, 41L)))
  }
}
