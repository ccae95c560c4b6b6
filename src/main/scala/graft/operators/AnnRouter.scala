package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Calibration-driven ANN serving — cost-based index selection for the
  * quantization ladder: MEASURE the recall each candidate budget buys
  * on a bounded calibration slice, STORE/READ that as a tiny
  * calibration frame, then ROUTE the batch through the cheapest budget
  * meeting the caller's recall target. The decision input is
  * O(sweep points), never data-sized, so routing adds nothing to the
  * serving plan's shuffle shape.
  *
  * The first routed axis is the binary tier's refine budget
  * ([[BinaryQuantizer.searchRefined]]'s `refine`): the prefilter's
  * shortlist width is THE knob that trades exact-re-rank I/O against
  * recall at the 64×-compressed rung, and a measured sweep over it
  * (recall rises monotonically with the budget) is exactly the pick-
  * the-knee decision an operator would otherwise make by hand from
  * q151/q89-style sweeps.
  *
  * At 100 TB: calibration is the bounded-sample instrument the sweep
  * queries already are (corpus never shuffles — broadcast query side),
  * and here it doesn't even re-scan — calibration and serving read the
  * SAME widest-budget ranked frame ([[BinaryQuantizer.rankedExact]]),
  * so the router's total cost is one binary scan + one bounded re-rank
  * regardless of how many budgets it prices.
  */
object AnnRouter {

  /** Pick the smallest refine budget whose measured recall meets
    * `target`; if none does, serve the widest budget measured (best
    * available — the cap keeps the contract bound). `cal` is a
    * (refine, …, recall) calibration frame ([[BinaryQuantizer
    * .recallSweep]] output or a persisted copy) — ≤ sweep-points rows,
    * so the collect is O(budgets), not data.
    */
  def chooseRefine(cal: DataFrame, target: Double): Int = {
    val rows = cal.select(col("refine").cast("int"),
        col("recall").cast("double"))
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    require(rows.nonEmpty, "empty calibration frame")
    val ok = rows.filter(_._2 >= target).map(_._1)
    if (ok.nonEmpty) ok.min else rows.map(_._1).max
  }

  /** Route a query batch through the binary prefilter at the cheapest
    * refine budget meeting `target`: ONE train + pack + widest-budget
    * Hamming scan + exact re-rank over the FULL batch
    * ([[BinaryQuantizer.rankedExact]]); the rows of that frame
    * satisfying `calFilter` (the caller's bounded calibration slice of
    * the batch) price every budget in `refines` against exact ground
    * truth; serving is then just `ham_rk <= chosen·k` + top-k over the
    * same frame — calibration costs no second scan. Output distances
    * are exact squared L2; `refine` records the routed budget.
    * @return (qidCol, neighbor, dist, refine)
    */
  def routeBinaryRefine(corpus0: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String, k: Int,
      refines: Seq[Int], target: Double, calFilter: Column): DataFrame = {
    val corpus = CentroidState.ensureCached(corpus0)
    val ranked = graft.CacheScope.cache(BinaryQuantizer.rankedExact(
      corpus, idCol, vecCol, queries, qidCol, qvecCol, k * refines.max))
    val calQ = queries.filter(calFilter)
    val gt = BinaryQuantizer.exactTopK(corpus, idCol, vecCol, calQ,
        qidCol, qvecCol, k)
      .transform(graft.CacheScope.cache)
    val cal = BinaryQuantizer.sweepTail(corpus.sparkSession,
      ranked.join(broadcast(calQ.select(col(qidCol))), qidCol), gt,
      qidCol, k, refines)
    val chosen = chooseRefine(cal, target)
    Dedup.topKPerKey(ranked.filter(col("ham_rk") <= chosen * k),
        Seq(qidCol), Seq(col("dist").asc, col("neighbor").asc), k)
      .select(col(qidCol), col("neighbor"), col("dist"),
        lit(chosen).as("refine"))
  }

  /** The second routed axis — ACROSS tiers of the quantization ladder
    * rather than within one tier's budget: price each candidate tier by
    * its stage-1 scan bytes per vector (binary codes: dim/8 B; an MRL
    * prefix of d dims: 4·d B; full floats: 4·dim B), measure each
    * tier's SERVED recall on the bounded calibration slice, and route
    * the batch through the CHEAPEST tier meeting the target — the
    * cost-based-optimizer decision for ANN serving. Every candidate
    * re-ranks exactly, so the tier choice moves recall and scan I/O,
    * never distance correctness; the full-float tier always qualifies,
    * so a decision always exists (no fallback path to reason about).
    * Decision input is O(tiers) numbers; only the winning tier's plan
    * runs over the full batch. @return (qidCol, neighbor, dist, tier)
    */
  def routeTiers(corpus0: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String, k: Int,
      refine: Int, widths: Seq[Int], dim: Int, target: Double,
      calFilter: Column): DataFrame = {
    val corpus = CentroidState.ensureCached(corpus0)
    def exactServe(q: DataFrame): DataFrame =
      Matryoshka.search(corpus, idCol, vecCol, q, qidCol, qvecCol, dim, k)
        .select(col(qidCol), col("neighbor"), col("pdist").as("dist"))
    val tiers: Seq[(String, Int, DataFrame => DataFrame)] =
      (("bq", dim / 8, (q: DataFrame) => BinaryQuantizer.searchRefined(
        corpus, idCol, vecCol, q, qidCol, qvecCol, k, refine)) +:
        widths.map(d => (s"mrl$d", 4 * d, (q: DataFrame) =>
          Matryoshka.searchRefined(corpus, idCol, vecCol, q, qidCol,
            qvecCol, d, dim, k, refine)))) :+
        (("exact", 4 * dim, exactServe _))
    val calQ = graft.CacheScope.cache(queries.filter(calFilter))
    val truth = (calQ.count() * k).toDouble
    // an empty calibration slice makes every tier's recall 0/0 = NaN,
    // which compares false against ANY target — minBy over the empty
    // filter would then throw an opaque UnsupportedOperationException.
    // Fail with the actual contract violation instead.
    require(truth > 0,
      "routeTiers: calFilter matched no queries — recall over an empty " +
        "calibration slice is undefined; widen the filter")
    val gt = graft.CacheScope.cache(
      exactServe(calQ).select(col(qidCol), col("neighbor")))
    val cal = tiers.map { case (name, cost, serve) =>
      val hits = serve(calQ).select(col(qidCol), col("neighbor"))
        .join(gt, Seq(qidCol, "neighbor"), "left_semi").count()
      (name, cost, hits / truth)
    }
    val chosen = cal.filter(_._3 >= target).minBy(t => (t._2, t._1))
    tiers.find(_._1 == chosen._1).get._3(queries)
      .withColumn("tier", lit(chosen._1))
  }
}
