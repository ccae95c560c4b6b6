package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weight-monotone priority sampling — the quality-aware
  * companion to q108's uniform hash reservoir (SURVEY §2 sampling tier).
  *
  * Each row holds an integer weight `w ≥ 1` and competes with `w`
  * TICKETS: ticket `t ∈ [0, w)` hashes `(id, t)` through the portable
  * uniform hash ([[Sketches.uniformHash]]), and the row's priority key
  * is its MINIMUM ticket. The k smallest keys per stratum win. This is
  * classic min-wise sampling with integer replication: a weight-w row
  * behaves exactly like w unit rows (the same trick q103 uses for
  * temperature-mix copy counts), so selection probability grows
  * monotonically with weight while staying fully deterministic,
  * engine-reproducible, and mergeable (the min of ticket minima over
  * shards is the corpus ticket minimum — same semigroup as KMV).
  *
  * Design note: the textbook Efraimidis–Spirakis exponential key
  * `u^(1/w)` gives exact probability-proportional-to-size but routes
  * through `ln`/`pow`, which are NOT bit-identical across engines
  * (unlike IEEE sqrt) — a cross-engine gate on it would be flaky at the
  * k-th boundary. Integer tickets keep every arithmetic step exact, at
  * the cost of O(w) hash evaluations per row — bounded by capping
  * weights to a small band (the caller maps quality scores onto it).
  *
  * The key computation is a pure projection (no shuffle, no explode —
  * the ticket array lives inside one `transform`/`array_min`
  * expression); the only exchange is the bounded-heap top-k
  * ([[Dedup.topKPerKey]]), so the whole sample is one ≤ strata·k-row
  * shuffle at any corpus size.
  */
object WeightedSample {

  /** Minimum-ticket priority key for a row with `weight` tickets.
    * Lower key = higher priority; `P(key < other.key)` increases with
    * weight. Pointwise monotone: adding tickets can only lower the key
    * (the w-ticket set is a prefix of the (w+1)-ticket set).
    *
    * `weight < 1` yields NULL (no tickets, never sampled) — guarded
    * explicitly because Spark's `sequence(0, w-1)` DESCENDS for w ≤ 0
    * (tickets for negative t) while SQL `generate_series` is empty;
    * the guard keeps both engines on the same "no tickets" answer.
    */
  def minTicket(id: Column, weight: Column): Column =
    when(weight >= 1,
      array_min(transform(sequence(lit(0), weight - 1),
        t => Sketches.uniformHash(
          concat(id.cast("string"), lit(":"), t.cast("string"))))))

  /** The k lowest-keyed rows per stratum; ties break on `id`. Output
    * carries the input columns plus `ticket`. Ticketless rows
    * (weight < 1 → null key) hold ZERO tickets and are excluded before
    * the top-k — ordering alone would still seat them whenever a
    * stratum has fewer than k ticketed rows.
    */
  def sample(df: DataFrame, strataCols: Seq[String], idCol: String,
      weightCol: String, k: Int): DataFrame = {
    require(!df.columns.contains("ticket"),
      "input already has a 'ticket' column — it would be silently " +
        "overwritten by the sampler's priority key; rename it first")
    Dedup.topKPerKey(
      df.withColumn("ticket", minTicket(col(idCol), col(weightCol)))
        .filter(col("ticket").isNotNull),
      strataCols,
      Seq(col("ticket").asc, col(idCol).asc), k)
  }
}
