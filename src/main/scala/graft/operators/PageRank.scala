package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Stable

/** PageRank over a document graph — the graph-centrality QUALITY PRIOR
  * web-corpus pipelines attach to documents (Common Crawl curation
  * filters on centrality-family signals; here the graph is whatever the
  * caller links — near-dup edges, citation/link edges, co-occurrence).
  * Beside [[ConnectedComponents]] (integer labels, convergence loop)
  * this is the other classic iterative-graph shape: FLOAT state, with
  * either a fixed iteration count ([[ranks]]) or an L1-delta
  * convergence loop ([[ranksConverged]]).
  *
  * Distribution: nodes/degrees/ranks are node-sized frames keyed by
  * node id; each iteration is one join of the edge list to the current
  * ranks (co-partitioned on the node key at scale — edges shuffle once
  * per iteration, ranks are the small side) plus one
  * map-side-combinable aggregation of contributions. Per-node
  * contribution sums ride the decimal grid ([[Stable.sumD]]), so ranks
  * are bit-reproducible across partition counts — which is what lets a
  * DuckDB oracle replay the unrolled iterations exactly. Driver holds
  * nothing. Each round's rank frame is plan-truncated (rebuilt over its
  * own row RDD — cached too in the convergence loop, where each round
  * materializes twice), so the analyzed plan stays a constant-size tree
  * however many rounds run (the same discipline as
  * [[ConnectedComponents]] — without it the tree grows with the
  * iteration count and every analyzer/canonicalizer walk pays for it).
  *
  * Contract: `edges` is DIRECTED (callers symmetrize undirected
  * graphs); every node must have out-degree ≥ 1 (so no dangling-mass
  * term is needed). Nodes with out-edges but NO in-edges are legal —
  * e.g. a page that links out but is never linked to — and keep their
  * `(1−d)/n` floor rank each round: the iteration rebuilds ranks by
  * left-joining the node universe to the contribution sums, so a node
  * the contribution groupBy never mentions is retained at zero
  * contribution rather than silently dropped from round 2 onward.
  */
object PageRank {

  /** One iteration step: `r' = (1−d)/n + d · Σ_in r_u/deg_u` over the
    * full node universe (zero contribution coalesced in, see contract).
    *
    * The returned frame is plan-TRUNCATED (rebuilt over its own row
    * RDD, one LogicalRDD node) so the analyzed tree stays constant-size
    * however many rounds run — but whether it is also PERSISTED is the
    * caller's choice: the fixed-iteration path runs ONE action over a
    * linear lineage (each round's RDD evaluates exactly once inside it,
    * so a persist per round is pure overhead — round 11 measured it at
    * ~½ the query's wall), while the convergence path materializes each
    * round twice (delta check + next round) and caches.
    */
  private def step(edges: DataFrame, deg: DataFrame, nodes: DataFrame,
      n: Double, r: DataFrame, damping: Double,
      cached: Boolean): DataFrame = {
    val contrib = edges
      .join(r.withColumnRenamed("node", "__s"), "__s")
      .join(deg, "__s")
      .groupBy(col("__t"))
      .agg(Stable.sumD(col("rank") / col("deg")).as("s"))
    // n is a driver-side scalar (counted once in [[prepare]]'s contract
    // aggregate), so the damping floor needs no per-round broadcast
    // crossJoin — the division below binds the same IEEE double the
    // previous `lit(1-d) / col(n)` runtime division did
    val next = nodes.join(contrib, Seq("__t"), "left")
      .select(col("__t").as("node"),
        (lit(1.0 - damping) / lit(n) +
          lit(damping) * coalesce(col("s"), lit(0.0))).as("rank"))
    if (cached) graft.CacheScope.cacheTruncated(next)
    else next.sparkSession.createDataFrame(next.rdd, next.schema)
  }

  private def prepare(edges0: DataFrame, srcCol: String, dstCol: String)
      : (DataFrame, DataFrame, DataFrame, Double, DataFrame) = {
    val edges = graft.CacheScope.cache(
      edges0.select(col(srcCol).as("__s"), col(dstCol).as("__t")))
    val deg = graft.CacheScope.cache(
      edges.groupBy(col("__s")).agg(count(lit(1)).as("deg")))
    // node universe: out-degree >= 1 for every node per the contract,
    // so deg's keys ARE the nodes. ENFORCE the contract instead of
    // trusting it: a node appearing only as a destination (a sink)
    // would be silently dropped from the rank frame and the mass sent
    // to it would vanish — ranks no longer sum to 1, with no error.
    // One distinct+anti pass over the (cached) edge frame, bounded by
    // the edge count, failing fast with the remedy in the message. This
    // action also materializes the edges/deg caches — which is why it
    // stays a SEQUENTIAL first action: folding it into a union with the
    // node count made both legs race to fill the caches and re-run the
    // whole upstream pair lineage twice (round-13 measured 9 -> 33 jobs
    // on q177's deep lineage before this was split back out).
    val sink = edges.select(col("__t")).distinct()
      .join(deg.select(col("__s").as("__t")), Seq("__t"), "left_anti")
      .limit(1).collect()
    require(sink.isEmpty,
      s"PageRank contract violated: node '${sink.headOption.map(_.get(0)).orNull}' " +
        "appears only as a destination (out-degree 0) — its incoming " +
        "mass would silently vanish. Totalize upstream: add self-loops " +
        "for sinks or drop edges into them before calling.")
    // node count over the now-cached deg — a driver scalar, so the
    // per-round damping floor needs no broadcast crossJoin (round-13
    // §1.2: that crossJoin cost a broadcast-build job EVERY round)
    val n = deg.count().toDouble
    val nodes = deg.select(col("__s").as("__t"))
    val r0 = deg.select(col("__s").as("node"), (lit(1.0) / lit(n)).as("rank"))
    (edges, deg, nodes, n, r0)
  }

  /** `(node, deg, rank)` after `iters` iterations from a uniform start. */
  def ranks(edges0: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double): DataFrame = {
    val (edges, deg, nodes, n, r0) = prepare(edges0, srcCol, dstCol)
    var r = r0
    (1 to iters).foreach { _ =>
      r = step(edges, deg, nodes, n, r, damping, cached = false)
    }
    r.join(deg.withColumnRenamed("__s", "node"), "node")
      .select(col("node"), col("deg"), col("rank"))
  }

  /** [[ranks]] iterated until the L1 delta `Σ|r'−r|` drops below `tol`
    * (or `maxIters` rounds, whichever first) — the production shape
    * when the iteration count isn't known up front. Returns the final
    * `(node, deg, rank)` frame plus the number of rounds run. The
    * delta rides the same decimal grid as the rank sums, so the round
    * count is a deterministic function of the input — never of
    * partitioning. One extra node-sized aggregation materializes per
    * round (that action also populates the round's cache); the
    * PREVIOUS round's cache is released as soon as its successor is
    * materialized, so live cache stays O(1) in rounds.
    */
  def ranksConverged(edges0: DataFrame, srcCol: String, dstCol: String,
      tol: Double, maxIters: Int, damping: Double): (DataFrame, Int) = {
    require(tol > 0 && maxIters >= 1, s"need tol>0, maxIters>=1")
    val (edges, deg, nodes, n, r0) = prepare(edges0, srcCol, dstCol)
    var r = r0
    var rounds = 0
    var delta = Double.MaxValue
    while (delta >= tol && rounds < maxIters) {
      val next = step(edges, deg, nodes, n, r, damping, cached = true)
      delta = next.join(r.withColumnRenamed("rank", "prev"), "node")
        .agg(Stable.sumD(abs(col("rank") - col("prev"))).as("d"))
        .head().getDouble(0)
      graft.CacheScope.release(r)
      r = next
      rounds += 1
    }
    (r.join(deg.withColumnRenamed("__s", "node"), "node")
      .select(col("node"), col("deg"), col("rank")), rounds)
  }
}
