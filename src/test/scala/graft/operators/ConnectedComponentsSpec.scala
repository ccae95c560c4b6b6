package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ConnectedComponentsSpec extends SparkTestBase {

  /** Driver-side union-find — the algorithm-independent oracle. */
  private def unionFind(n: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(n.map(x => x -> x): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    n.map(x => x -> find(x)).toMap
  }

  test("chain, triangle, and cross-component isolation resolve to min ids") {
    import spark.implicits._
    // chain 1-2-3-4 (needs multiple propagation rounds), triangle 10-11-12,
    // disjoint pair 20-21
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (21L, 20L)).toDF("s", "d")
    val out = ConnectedComponents.components(edges, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("dedupGroups keeps singletons and flags the canonical row") {
    import spark.implicits._
    val corpus = (1L to 6L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val rows = ConnectedComponents.dedupGroups(corpus, "id", edges, "s", "d")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(rows === Map(
      1L -> (1L, 3L, true), 2L -> (1L, 3L, false), 3L -> (1L, 3L, false),
      4L -> (4L, 1L, true), 5L -> (5L, 1L, true), 6L -> (6L, 1L, true)))
  }

  test("self-loops keep nodes alive without connecting anything") {
    import spark.implicits._
    val edges = Seq((5L, 5L), (7L, 8L)).toDF("s", "d")
    val out = ConnectedComponents.components(edges, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(5L -> 5L, 7L -> 7L, 8L -> 7L))
  }

  test("a long path converges logarithmically with constant plan size") {
    import spark.implicits._
    // the 12-node chain that OOM'd the plain-propagation loop when its
    // per-round lineage truncation regressed (round-7 verdict item 1)
    val edges = (1L until 12L).map(i => (i, i + 1)).toDF("s", "d")
    val (labels, rounds, planSizes) =
      ConnectedComponents.componentsWithStats(edges, "s", "d")
    val out = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size === 12 && out.values.forall(_ == 1L))
    // star-contraction halves diameter geometrically: O(log n), not O(n)
    assert(rounds <= 5, s"12-chain took $rounds rounds")
    // lineage-truncation regression guard: each round's edge frame must
    // analyze to the same (tiny) plan — growth here is the 2^rounds
    // driver OOM coming back
    assert(planSizes.nonEmpty && planSizes.distinct.size === 1,
      s"per-round plan sizes drifted: $planSizes")
    assert(planSizes.head <= 3, s"round plan unexpectedly deep: $planSizes")
  }

  test("a 64-node path still converges within the default bound") {
    import spark.implicits._
    val edges = (1L until 64L).map(i => (i, i + 1)).toDF("s", "d")
    val (labels, rounds, _) =
      ConnectedComponents.componentsWithStats(edges, "s", "d")
    val out = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size === 64 && out.values.forall(_ == 1L))
    assert(rounds <= 8, s"64-chain took $rounds rounds")
  }

  test("random graphs match a driver-side union-find oracle") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val n = 60 + trial * 20
      val edgeList = (0 until n).map { _ =>
        (rnd.nextInt(n).toLong + 1L, rnd.nextInt(n).toLong + 1L)
      }.filter { case (a, b) => a != b }
      val nodes = edgeList.flatMap(e => Seq(e._1, e._2)).distinct
      val expect = unionFind(nodes, edgeList)
      val out = ConnectedComponents
        .components(edgeList.toDF("s", "d"), "s", "d")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out === expect, s"trial $trial mismatch")
    }
  }

  test("a 10^5-edge supernode star converges in <=3 rounds, constant plan") {
    import spark.implicits._
    // one hub adjacent to 10^5 spokes, hub id ABOVE every spoke — the
    // adversarial orientation: the symmetrized frame carries all 10^5
    // neighbours under the hub's window key in one task (the round-8
    // verdict's unpinned spill scenario). Large-star is the cure the
    // operator docstring claims: every spoke > m rewires to the
    // neighbourhood min in ONE pass, so the star must collapse in a
    // constant number of rounds with the per-round plan staying tiny —
    // degree concentration must never show up as extra rounds or plan
    // growth.
    val hub = 100001L
    val edges = (1L to 100000L).map(i => (hub, i)).toDF("s", "d")
    val (labels, rounds, planSizes) =
      ConnectedComponents.componentsWithStats(edges, "s", "d")
    val out = labels.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.length === 100001 && out.forall(_._2 == 1L))
    assert(rounds <= 3, s"supernode star took $rounds rounds")
    assert(planSizes.distinct.size <= 1,
      s"per-round plan sizes drifted: $planSizes")
  }

  test("empty edge frame yields empty labels") {
    import spark.implicits._
    val edges = Seq.empty[(Long, Long)].toDF("s", "d")
    assert(ConnectedComponents.components(edges, "s", "d").count() === 0L)
  }
}
