package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  private def sym(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("path graph a-b-c matches the hand-computed iteration") {
    // deg: a=1, b=2, c=1; n=3; r0 = 1/3
    // r1(a) = 0.15/3 + 0.85·(r0(b)/2); r1(b) = 0.15/3 + 0.85·(r0(a)+r0(c))
    val out = PageRank.ranks(sym(Seq((0L, 1L), (1L, 2L))), "src", "dst",
        iters = 1, damping = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val third = 1.0 / 3.0
    val base = (1.0 - 0.85) / 3.0
    assert(math.abs(out(0L) - (base + 0.85 * third / 2)) < 1e-9)
    assert(math.abs(out(2L) - (base + 0.85 * third / 2)) < 1e-9)
    assert(math.abs(out(1L) - (base + 0.85 * (third + third))) < 1e-9)
  }

  test("rank mass is conserved across iterations (no dangling loss)") {
    val edges = sym(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L)))
    val total = PageRank.ranks(edges, "src", "dst", iters = 3,
        damping = 0.85)
      .agg(sum(col("rank"))).collect().head.getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9)
  }

  test("the hub of a star outranks every leaf") {
    val star = sym((1L to 6L).map(i => (0L, i)))
    val out = PageRank.ranks(star, "src", "dst", iters = 2, damping = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    (1L to 6L).foreach(i => assert(out(0L) > out(i)))
  }

  test("ranks are invariant to edge partitioning (decimal grid)") {
    val edges = sym(Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L), (1L, 3L)))
    def run(parts: Int) = PageRank.ranks(edges.repartition(parts), "src",
        "dst", iters = 2, damping = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(run(1) === run(7))
    graft.CacheScope.releaseAll()
  }
}