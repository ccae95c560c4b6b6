package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Stable

/** Temperature-based source re-weighting — the standard pretraining
  * corpus-mixing computation (multilingual / multi-source balancing):
  * sampling weight of source `i` is `n_i^α / Σ_j n_j^α`, with
  * temperature `α < 1` flattening the natural distribution so
  * low-resource sources are seen more often than their raw token share
  * (α = 1 keeps natural proportions; α = 0 makes every source equal).
  *
  * The output is the per-source training allocation: the re-weighted
  * share of a `budget`-token mix, and the epoch count (allocation ÷
  * source size) a data loader repeats each source for.
  *
  * Scale shape: one map-side-combinable aggregation to one row per
  * source (sources ≈ tens, never data-sized), then a 1-row totals
  * cross join — nothing here grows with corpus size except the first
  * agg's scan, and per-document selection downstream stays the q41/q66
  * portable-hash gate (reproducible in any engine, no `rand()`).
  *
  * Determinism: the weight denominator `Σ n_i^α` is summed through
  * [[Stable.sumD]] (exact decimal, order/partition-invariant), and
  * α = 0.5 routes through `sqrt` — IEEE-correctly-rounded in every
  * engine, unlike general `pow`, so the 0.5 gate query hash-matches the
  * oracle bit-for-bit. Other α use `pow` and carry the usual
  * last-ulp caveat (fine for planning, not for hash gates).
  */
object TemperatureMix {

  /** `n^α` with the sqrt special case that keeps α = 0.5 bit-portable. */
  private def weight(n: Column, alpha: Double): Column =
    if (alpha == 0.5) sqrt(n.cast("double"))
    else pow(n.cast("double"), lit(alpha))

  /** Per-source allocation of `budget` tokens at temperature `alpha`.
    *
    * @param docs     one row per document
    * @param sourceCol source/domain label column name
    * @param tokenCol  per-document token count column name
    * @return (source, n_docs, n_tokens, natural_share, temp_share,
    *          target_tokens, epochs) — one row per source
    */
  def plan(docs: DataFrame, sourceCol: String, tokenCol: String,
      alpha: Double, budget: Column): DataFrame = {
    // the per-source frame feeds both the output rows and the totals —
    // persist it (tens of rows) so the corpus-sized input is scanned and
    // aggregated ONCE, not once per consumer. Cache ownership: the
    // returned plan references this cache lazily, so it cannot be
    // unpersisted here — it registers in graft.CacheScope, and callers
    // release it after materializing (CacheScope.releaseAll(), as the
    // gate runners do), so long-lived sessions no longer accumulate
    // MEMORY_AND_DISK entries across plan() calls
    val per = docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).as("n_tokens"))
      .transform(graft.CacheScope.cache)
    val tot = per.agg(
      sum(col("n_tokens")).as("total_tokens"),
      Stable.sumD(weight(col("n_tokens"), alpha)).as("z"))
    val share = weight(col("n_tokens"), alpha) / col("z")
    val target = (budget.cast("double") * share + lit(1e-9))
    per.crossJoin(tot)
      .select(col(sourceCol), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("total_tokens")
          + lit(1e-9), 4).as("natural_share"),
        round(share + lit(1e-9), 4).as("temp_share"),
        round(target, 0).cast("long").as("target_tokens"),
        round(round(target, 0) / col("n_tokens") + lit(1e-9), 4)
          .as("epochs"))
      .orderBy(col(sourceCol))
  }

  /** MATERIALIZE the [[plan]]: per-document copy counts that realize
    * each source's token target — `full = target div src_tokens`
    * complete epochs for every document, plus one extra copy for the
    * greedy prefix (documents in deterministic portable-hash priority
    * order until the remainder budget is crossed). Everything is
    * integer arithmetic and one PARTITIONED window over the corpus, so
    * the materialization is bit-reproducible and shuffle-bounded by the
    * source partitioning; a pretraining loader repeats each doc
    * `n_copies` times and the realized token count lands within one
    * document of `target_tokens` per source.
    */
  def materialize(docs: DataFrame, sourceCol: String, idCol: String,
      tokenCol: String, alpha: Double, budget: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = plan(docs, sourceCol, tokenCol, alpha, budget)
      .select(col(sourceCol), col("n_tokens").as("__src_tokens"),
        col("target_tokens").as("__target"))
    val pr = docs.join(broadcast(p), sourceCol)
      .withColumn("__h", Sketches.uniformHash(col(idCol)))
      .withColumn("__full", expr("__target div __src_tokens"))
      .withColumn("__rem",
        col("__target") - col("__full") * col("__src_tokens"))
    val wnd = Window.partitionBy(col(sourceCol))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    pr.withColumn("__cum_before",
        coalesce(sum(col(tokenCol)).over(wnd), lit(0L)))
      .withColumn("n_copies", col("__full") +
        when(col("__cum_before") < col("__rem"), 1L).otherwise(0L))
      .filter(col("n_copies") > 0)
      .select(col(sourceCol), col(idCol), col(tokenCol), col("n_copies"),
        col("__cum_before").as("cum_before"))
  }
}
