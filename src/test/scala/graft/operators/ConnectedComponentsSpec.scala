package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ConnectedComponentsSpec extends SparkTestBase {

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

  test("a long path converges within the iteration bound") {
    import spark.implicits._
    val edges = (1L until 12L).map(i => (i, i + 1)).toDF("s", "d")
    val out = ConnectedComponents.components(edges, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size === 12 && out.values.forall(_ == 1L))
  }
}
