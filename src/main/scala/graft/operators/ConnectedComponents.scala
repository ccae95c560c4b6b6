package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step that
  * turns near-duplicate PAIRS (MinHash/SimHash/embedding output) into
  * dedup GROUPS with one canonical representative each.
  *
  * Algorithm: alternating large-star / small-star edge rewiring
  * (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected
  * Components in MapReduce and Beyond", SoCC'14; reference computes the
  * same groups driver-side in its notebook dedup cell). Each round:
  *
  *  - '''large-star''': every node `u` links each STRICTLY LARGER
  *    neighbour to `m(u) = min(Γ(u) ∪ {u})`;
  *  - '''small-star''': edges oriented large→small; every node links
  *    its smaller neighbours AND itself to `m(u)`.
  *
  * Both steps preserve connectivity and only ever rewire edges toward
  * smaller ids; the unique fixpoint is a forest of stars whose centres
  * are the component minima. Component DIAMETER shrinks geometrically,
  * so rounds are O(log n) even for path graphs — versus O(diameter)
  * for plain min-label propagation, whose 20-round bound an adversarial
  * chain actually hits. Near-dup graphs (tiny cliques/chains) converge
  * in 1–2 rounds.
  *
  * Scale/driver safety:
  *  - each round's edge frame is persisted at the ROW-RDD level
  *    ([[graft.CacheScope.cacheRdd]]) and rebuilt over that RDD — the
  *    logical plan stays ONE `LogicalRDD` node per round instead of
  *    doubling (each round references the previous frame in both the
  *    join and the union branch; without truncation the analyzed tree
  *    is 2^rounds nodes and the SQL listener's `explainString` OOMs the
  *    driver by round ~11 — [[ConnectedComponentsSpec]] pins constant
  *    plan size), and the convergence stats ride a `treeAggregate` over
  *    the same RDD so materialization and the check share one job;
  *  - round N's interior frame is released as soon as round N+1
  *    materializes, so cache footprint is O(1) rounds, not O(rounds);
  *  - the driver loop carries only the per-round convergence stats
  *    (count + two checksums — three scalars), never node data;
  *  - convergence is detected by stable (count, Σa, Σb) and CONFIRMED
  *    by an exact set-equality check before exiting, so a checksum
  *    collision can never truncate the fixpoint early.
  */
object ConnectedComponents {

  /** @return (node, component) for every node present in `edges`;
    *         component = smallest node id reachable.
    */
  def components(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 20): DataFrame =
    componentsWithStats(edges, srcCol, dstCol, maxIter)._1

  /** Per-round driver-side stats: rounds actually run and the analyzed
    * logical-plan node count of each round's edge frame (spec hook —
    * the plan-growth regression guard asserts these stay constant).
    */
  private[graft] def componentsWithStats(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 20): (DataFrame, Int, Seq[Int]) = {
    val spark = edges.sparkSession

    // every node that appears at all (self-loops keep a node alive even
    // though they carry no connectivity)
    val nodes = edges.select(col(srcCol).as("node"))
      .union(edges.select(col(dstCol).as("node")))
      .distinct()
      .transform(graft.CacheScope.cache)

    // canonical undirected edge set: (small, large), self-loops dropped
    val e0 = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
    val schema = e0.schema

    // (edge count, Σhash(a), Σhash(b)) in ONE treeAggregate job over the
    // round's row RDD — the SAME action that materializes the round's
    // cache, so the convergence check no longer pays a separate
    // scan-and-aggregate pass per round (round-13 §1.2/§5; previously
    // stats ran its own 2-exchange agg after the eager AQE
    // materialization). Wrapping hash sums are order-independent and
    // deterministic, and exact-once (action results, not accumulators);
    // edges only rewire toward smaller ids so a stable triple is a
    // convergence CANDIDATE, confirmed exactly below before the loop
    // exits — a checksum collision can only cost one extra (empty)
    // except check, never a wrong fixpoint or a different round count.
    def stats(rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row])
        : (Long, Long, Long) = {
      def h(x: Any): Long = if (x == null) 0L else x.hashCode.toLong
      rdd.treeAggregate((0L, 0L, 0L))(
        { case ((n, ha, hb), r) => (n + 1L, ha + h(r.get(0)), hb + h(r.get(1))) },
        { case ((n1, a1, b1), (n2, a2, b2)) => (n1 + n2, a1 + a2, b1 + b2) })
    }

    var eR = graft.CacheScope.cacheRdd(e0.rdd)
    var e = spark.createDataFrame(eR, schema)
    var prev = stats(eR)
    val planSizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    var converged = prev._1 == 0L // no real edges: every node is its own star
    var rounds = 0
    // Each star op computes its neighbourhood minimum with a WINDOW over
    // one exchange instead of groupBy+join-back (two), and small-star
    // emits both targets through ONE explode pass instead of a
    // self-reusing union — a full round is 3 exchanges (large window,
    // small window, closing distinct). Large-star's intermediate skips
    // its own distinct: duplicates can at most double small-star's
    // input (|large| ≤ 2|e|) and the closing distinct subsumes it.
    // Supernode skew note: a window buffers each key's rows in one task
    // (spilling, not failing), and large-star itself is the cure — a
    // hub's larger neighbours all rewire to its minimum in one round,
    // so degree concentration collapses as the rounds proceed.
    while (!converged && rounds < maxIter) {
      // ---- large-star: (v, m(u)) for v ∈ Γ(u), v > u -----------------
      val sym = e.select(col("a"), col("b"))
        .union(e.select(col("b").as("a"), col("a").as("b")))
      val wA = org.apache.spark.sql.expressions.Window.partitionBy(col("a"))
      val large = sym
        .withColumn("m", least(col("a"), min(col("b")).over(wA)))
        .filter(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b"))

      // ---- small-star over large→small orientation: (v, m(u)) for
      //      v ∈ Γ(u) ∪ {u} ------------------------------------------
      val small = large
        .select(greatest(col("a"), col("b")).as("a"),
          least(col("a"), col("b")).as("b"))
        .withColumn("m", min(col("b")).over(wA))
        .select(explode(array(col("b"), col("a"))).as("x"), col("m"))
        .filter(col("x") =!= col("m"))
        .select(least(col("x"), col("m")).as("a"),
          greatest(col("x"), col("m")).as("b"))
        .distinct()

      val nextR = graft.CacheScope.cacheRdd(small.rdd)
      val next = spark.createDataFrame(nextR, schema)
      val cur = stats(nextR) // ONE job: materializes `next` AND aggregates
      planSizes += next.queryExecution.analyzed.collect { case p => p }.size
      if (cur == prev) {
        // checksums can collide; only an exact set check may end the
        // loop. Both sides are distinct with equal counts (the stats
        // triple matched), so one-directional emptiness proves equality.
        converged = next.except(e).isEmpty
      }
      graft.CacheScope.releaseRdd(eR)
      e = next
      eR = nextR
      prev = cur
      rounds += 1
    }

    // at the star fixpoint every non-root node carries exactly one
    // canonical edge (root, node) with root < node, so the star map is
    // b → min(a); groupBy-min also degrades gracefully at a maxIter
    // cutoff instead of duplicating rows
    val starMap = e.groupBy(col("b").as("node"))
      .agg(min(col("a")).as("root"))
    val labels = nodes.join(starMap, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("root"), col("node")).as("label"))
      .transform(graft.CacheScope.cache)
    (labels, rounds, planSizes.toSeq)
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
