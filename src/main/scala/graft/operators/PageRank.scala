package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Stable

/** PageRank over a document graph — the graph-centrality QUALITY PRIOR
  * web-corpus pipelines attach to documents (Common Crawl curation
  * filters on centrality-family signals; here the graph is whatever the
  * caller links — near-dup edges, citation/link edges, co-occurrence).
  * Beside [[ConnectedComponents]] (integer labels, convergence loop)
  * this is the other classic iterative-graph shape: FLOAT state,
  * fixed iteration count.
  *
  * Distribution: nodes/degrees/ranks are node-sized frames keyed by
  * node id; each iteration is one join of the edge list to the current
  * ranks (co-partitioned on the node key at scale — edges shuffle once
  * per iteration, ranks are the small side) plus one
  * map-side-combinable aggregation of contributions. Per-node
  * contribution sums ride the decimal grid ([[Stable.sumD]]), so ranks
  * are bit-reproducible across partition counts — which is what lets a
  * DuckDB oracle replay the unrolled iterations exactly. Driver holds
  * nothing; iteration count is a constant, so plan size is bounded.
  *
  * Contract: `edges` is DIRECTED (callers symmetrize undirected
  * graphs); every node must have out-degree ≥ 1 (true by construction
  * for symmetrized edge lists — no dangling-mass term needed).
  */
object PageRank {

  /** `(node, deg, rank)` after `iters` iterations of
    * `r' = (1−d)/n + d · Σ_in r_u/deg_u` from a uniform start.
    */
  def ranks(edges0: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double): DataFrame = {
    val edges = graft.CacheScope.cache(
      edges0.select(col(srcCol).as("__s"), col(dstCol).as("__t")))
    val deg = graft.CacheScope.cache(
      edges.groupBy(col("__s")).agg(count(lit(1)).as("deg")))
    val n1 = deg.agg(count(lit(1)).cast("double").as("n"))
    var r: DataFrame = deg.crossJoin(broadcast(n1))
      .select(col("__s").as("node"), (lit(1.0) / col("n")).as("rank"))
    (1 to iters).foreach { _ =>
      val contrib = edges
        .join(r.withColumnRenamed("node", "__s"), "__s")
        .join(deg, "__s")
        .groupBy(col("__t"))
        .agg(Stable.sumD(col("rank") / col("deg")).as("s"))
      // symmetrized graphs leave no rank-less nodes: every node has an
      // in-edge, so the contribution frame covers all of them
      r = contrib.crossJoin(broadcast(n1))
        .select(col("__t").as("node"),
          (lit(1.0 - damping) / col("n") + lit(damping) * col("s"))
            .as("rank"))
    }
    r.join(deg.withColumnRenamed("__s", "node"), "node")
      .select(col("node"), col("deg"), col("rank"))
  }
}