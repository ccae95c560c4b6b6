package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list by iterative
  * min-label propagation — the step that turns near-duplicate PAIRS
  * (MinHash/SimHash/embedding output) into dedup GROUPS with one
  * canonical representative each.
  *
  * Each iteration is one shuffle: every node adopts the minimum label
  * among itself and its neighbours; fixpoint after O(component diameter)
  * rounds. Near-dup graphs are overwhelmingly tiny cliques/chains, so
  * 2–3 rounds converge in practice; `maxIter` bounds adversarial chains.
  * Each round's label frame persists through the [[graft.CacheScope]]
  * registry (every round's sum is an action, so the cache materializes
  * immediately and the next round reads memory, never a recompute
  * fan-out — the DAG blowup an uncached loop hits by round ~10), and
  * the registry releases the whole chain after the consuming query
  * materializes. `localCheckpoint` would cut lineage harder but its
  * persisted RDDs escape the registry AND make released frames
  * unrecomputable; with plain registered caches a post-release re-read
  * is merely slow, never wrong. (At extreme scale the same loop
  * upgrades to the large-star/small-star rewiring of Kiveris et al.,
  * which shrinks diameter logarithmically — the per-round dataflow
  * shape is identical.)
  *
  * The driver loop carries only the convergence COUNT per round (one
  * scalar), never node data.
  */
object ConnectedComponents {

  /** @return (node, component) for every node present in `edges`;
    *         component = smallest node id reachable.
    */
  def components(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 20): DataFrame = {
    val sym = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct()
      .transform(graft.CacheScope.cache)
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
      .transform(graft.CacheScope.cache)
    // labels only ever DECREASE, so the label total strictly drops while
    // anything changes: comparing one overflow-safe decimal sum per round
    // detects the fixpoint without a join-and-count job
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast(
        org.apache.spark.sql.types.DecimalType(38, 0))))
        .head.getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighbour = sym
        .join(labels.withColumnRenamed("node", "b"), "b")
        .select(col("a").as("node"), col("label"))
      val next = labels.union(neighbour)
        .groupBy("node").agg(min("label").as("label"))
        .transform(graft.CacheScope.cache)
      val nextSum = labelSum(next)
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      i += 1
    }
    labels
  }

  /** Dedup-group assignment for a corpus: every row of `df` gets the
    * component of its `idCol` (own id when it appears in no edge), the
    * group size, and a canonical flag (minimum id wins).
    */
  def dedupGroups(df: DataFrame, idCol: String, edges: DataFrame,
      srcCol: String, dstCol: String): DataFrame = {
    val comp = components(edges, srcCol, dstCol)
      .withColumnRenamed("node", idCol)
    df.select(col(idCol))
      .join(comp, Seq(idCol), "left")
      .withColumn("component", coalesce(col("label"), col(idCol)))
      .drop("label")
      .withColumn("group_size",
        count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("component"))))
      .withColumn("is_canonical", col(idCol) === col("component"))
  }
}
