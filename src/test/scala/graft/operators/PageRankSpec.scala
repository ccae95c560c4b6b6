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

  test("a source-only node (out-edges, no in-edge) keeps its floor " +
      "rank and its mass stays in the system") {
    // 0 -> 1, 1 -> 2, 2 -> 1: node 0 is never a dst — legal under the
    // directed contract. It must survive every round at the (1-d)/n
    // floor (pre-fix it vanished from round 2 onward, taking its
    // outgoing mass with it).
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    val out = PageRank.ranks(edges, "src", "dst", iters = 3, damping = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.keySet == Set(0L, 1L, 2L))
    assert(math.abs(out(0L) - 0.15 / 3) < 1e-9)
    // every node has out-degree >= 1, so totality conserves rank mass
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
    graft.CacheScope.releaseAll()
  }

  test("a sink node (in-edges only, out-degree 0) fails fast with the " +
      "contract message instead of silently losing its mass") {
    // 0 -> 1, 0 -> 2, 1 -> 2: node 2 is never a src. Pre-guard it was
    // silently dropped from the rank frame and ranks stopped summing
    // to 1 — the dual of the source-only asymmetry fixed in round 11.
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L)).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      PageRank.ranks(edges, "src", "dst", iters = 1, damping = 0.85)
        .collect()
    }
    assert(e.getMessage.contains("out-degree 0"), e.getMessage)
    graft.CacheScope.releaseAll()
  }

  test("analyzed plan size is constant in the iteration count") {
    val edges = sym(Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    def planNodes(iters: Int): Int =
      PageRank.ranks(edges, "src", "dst", iters, damping = 0.85)
        .queryExecution.analyzed.collect { case p => p }.size
    // cacheTruncated rebuilds each round from its row RDD, so the
    // returned frame's tree never embeds earlier rounds
    assert(planNodes(10) == planNodes(2))
    graft.CacheScope.releaseAll()
  }

  test("convergence variant stops under maxIters and matches the " +
      "fixed-iteration run at its stop count") {
    val edges = sym(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L)))
    val (rc, rounds) = PageRank.ranksConverged(edges, "src", "dst",
      tol = 1e-6, maxIters = 50, damping = 0.85)
    val got = rc.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(rounds > 1 && rounds < 50, s"rounds=$rounds")
    val fixed = PageRank.ranks(edges, "src", "dst", iters = rounds,
        damping = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got === fixed) // bit-identical: same decimal-grid steps
    graft.CacheScope.releaseAll()
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
