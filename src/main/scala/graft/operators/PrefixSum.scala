package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT running total (inclusive prefix sum) in a global
  * key order — the scan primitive behind sequence packing (q193/q194)
  * and any "cut a totally-ordered stream at cumulative boundaries"
  * operator.
  *
  * The naive spelling — `sum(v) OVER (ORDER BY key)` with no partition
  * key — plans as a SINGLE-partition WindowExec: one task sorts and
  * scans the whole input, the same scale-killer
  * [[graft.operators.StitchedWindow]] exists to avoid for time-range
  * frames. Prefix sums need a different stitch because the offset a row
  * inherits comes from ALL preceding rows, not a bounded lookback. The
  * classic two-phase scan does it exactly:
  *
  *  1. split the key space into `buckets` contiguous ranges (boundaries
  *     sampled once per call via `approxQuantile` — balance, never
  *     correctness, depends on the sampling: whatever boundaries come
  *     back, every key lands in exactly one range and ranges cover the
  *     line, so the stitched sum is the global sum);
  *  2. per-bucket totals via one partial-aggregated `groupBy` — only
  *     `buckets` rows ever shuffle, and the driver folds them into
  *     EXCLUSIVE offsets (O(buckets) driver state, the same bounded
  *     shape as IVF centroids or LSH probe literals);
  *  3. the full data shuffles ONCE into the bucket partitioning, each
  *     bucket runs the local `ROWS UNBOUNDED PRECEDING` window in
  *     parallel, and the broadcast offset map lifts local sums to
  *     global ones.
  *
  * At 100 TB: phase 2 is a scan with map-side combine (no data-sized
  * shuffle); phase 3 is the one unavoidable exchange (any global-order
  * operator must co-locate ranges), sized by `buckets` ≈ 2–3× cores so
  * each range sorts in memory. Ties in `key` would make the local
  * window order — and therefore per-row (not total) sums —
  * partitioning-dependent, so the key must be unique — a caller
  * contract (checking it would cost a full distinct pass), same as the
  * total-order convention every hash-compared gate already carries.
  */
object PrefixSum {

  /** Adds `out` = inclusive running `sum(valueCol)` over `df` ordered by
    * the (unique, non-null, numeric) `keyCol`. `valueCol` is cast to
    * long; `buckets` bounds both the driver-side offset state and the
    * window parallelism.
    */
  def running(df: DataFrame, keyCol: String, valueCol: String, out: String,
      buckets: Int = 32): DataFrame = {
    require(buckets >= 1, s"PrefixSum.running needs buckets >= 1, got $buckets")
    require(!df.columns.contains("__bk"),
      "PrefixSum.running reserves column name __bk")

    // Range boundaries: interior quantiles of the key. Approximate and
    // sampling-dependent by design — they steer only which bucket a key
    // lands in, and the stitch is exact for ANY assignment that keeps
    // ranges contiguous (enforced by the <=-count bucket expression
    // below, which is monotone in the key regardless of boundary
    // placement). Duplicate quantiles (heavy skew) collapse to fewer,
    // still-correct buckets.
    val bnds: Seq[Double] =
      if (buckets == 1) Seq.empty
      else df.stat
        .approxQuantile(keyCol, (1 until buckets).map(_.toDouble / buckets).toArray, 0.01)
        .distinct.sorted.toSeq

    // bucket = how many boundaries sit at or below the key — a monotone
    // step function of the key, evaluated against the boundary literal
    // inside one codegen'd higher-order filter (O(buckets) comparisons
    // per row; buckets is small by contract).
    val key = col(keyCol)
    val bucket: Column =
      if (bnds.isEmpty) lit(0)
      else size(filter(typedlit(bnds), b => b <= key.cast("double")))

    // Cached: the totals collect and the final windowed job would
    // otherwise each recompute the input lineage from scratch — if
    // that lineage were not bit-stable across recomputations (a
    // sampled or rand()-derived key or value), the collected offsets
    // could disagree with the rows the window job actually scans,
    // which is silent corruption. The cache makes both phases read ONE
    // materialization (and drops a redundant full scan in the
    // bargain); it registers in CacheScope, so gate runners release it.
    val bucketed = graft.CacheScope.cache(df.withColumn("__bk", bucket))

    // Per-bucket totals -> exclusive offsets. The agg's shuffle carries
    // at most `buckets` rows per upstream task (map-side combine); the
    // collect is the bounded O(buckets) driver state documented above.
    val totals = bucketed.groupBy(col("__bk"))
      .agg(sum(col(valueCol).cast("long")).as("__t"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsets: Map[Int, Long] = totals
      .scanLeft((Int.MinValue, 0L)) { case ((_, acc), (bk, t)) => (bk, acc + t) }
      .sliding(2)
      .collect { case Array((_, excl), (bk, _)) => bk -> excl }
      .toMap

    val w = Window.partitionBy(col("__bk")).orderBy(key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .withColumn(out,
        sum(col(valueCol).cast("long")).over(w) +
          coalesce(element_at(typedlit(offsets), col("__bk")), lit(0L)))
      .drop("__bk")
  }
}
