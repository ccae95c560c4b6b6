package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) maintenance — the warehouse verb
  * behind "state of X as of event time": a change log becomes interval
  * rows `[valid_from, valid_to)` with a version sequence and a current
  * flag, facts enrich against the version covering their event time,
  * and new change batches fold in incrementally. The reference's Delta
  * MERGE workflows stop at type-1 upserts ([[Upsert]], q06/q60); this
  * is the history-preserving tier on top, built from the same keyed
  * shapes ([[AsOfJoin]] is the join-time twin of [[pointInTime]] when
  * no materialized dim exists).
  *
  * Contract: the change log carries ONE row per (keys, ts) — equal-
  * timestamp changes to one key have no defined order in any engine;
  * pre-dedup with the keep-latest operator ([[Dedup]]). NULL change
  * timestamps are rejected (an interval cannot start at unknown time).
  *
  * Scale: [[build]] is one hash partition on the key + an in-partition
  * sort (the q36 gaps-and-islands shape); [[merge]] re-windows ONLY the
  * keys the batch touches (broadcast semi/anti joins against the
  * bounded touched-key set — untouched history never shuffles);
  * [[pointInTime]] is an equi-join on the key with the interval
  * predicate as a residual filter — per-key fanout is the key's version
  * count, never a quadratic candidate space.
  */
object Scd2 {

  /** Change log → SCD2 rows: all change-log columns with `tsCol`
    * replaced by `valid_from`, plus `valid_to` (null = open),
    * `version` (1-based per key, in time order), `is_current`.
    */
  def build(changes: DataFrame, keys: Seq[String], tsCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol).asc)
    changes
      .filter(col(tsCol).isNotNull)
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("is_current", col("valid_to").isNull)
      .withColumnRenamed(tsCol, "valid_from")
  }

  /** Broadcast bound for the touched-key set, in DISTINCT KEY ROWS. A
    * normal change batch touches a sliver of the dimension and the set
    * broadcasts (exchange-free pass-through for untouched history); a
    * batch that touches most keys — a full reload or backfill — would
    * make that broadcast dimension-sized and OOM the driver, so past
    * the bound the hint is dropped and AQE picks the join (shuffled —
    * slower, but it completes). Key rows are key columns only (tens of
    * bytes), so 2M rows stays well inside the default broadcast budget.
    */
  private[operators] val MaxBroadcastTouchedKeys: Long = 2L << 20

  /** Fold a new change batch into an existing SCD2 frame: the touched
    * keys' chains are replayed from (their existing rows ∪ the batch)
    * and re-versioned; untouched keys pass through an anti-join against
    * the bounded-broadcast touched-key set without moving (see
    * [[MaxBroadcastTouchedKeys]]). The result is
    * bit-identical to [[build]] over the full change log — maintained ≡
    * fresh, the lifecycle discipline every index family here pins.
    * Batch rows must be new (keys, ts) pairs: re-stating an existing
    * change timestamp would duplicate an interval boundary, violating
    * the one-row-per-(keys, ts) contract.
    */
  def merge(existing: DataFrame, batch: DataFrame, keys: Seq[String],
      tsCol: String,
      maxBroadcastKeys: Long = MaxBroadcastTouchedKeys): DataFrame = {
    // cached: the frame feeds three consumers (the shape-deciding
    // count, the untouched anti-join, the replay semi-join) — uncached
    // it would re-aggregate the batch per consumer
    val distinctKeys =
      graft.CacheScope.cache(batch.select(keys.map(col): _*).distinct())
    // one cheap count over the batch decides the shape; the cost is
    // bounded by the batch itself, never the dimension
    val touched =
      if (distinctKeys.count() <= maxBroadcastKeys) broadcast(distinctKeys)
      else distinctKeys
    val untouched = existing.join(touched, keys, "left_anti")
    val attrs = existing.columns.filterNot(c =>
      keys.contains(c) || Seq("valid_from", "valid_to", "version",
        "is_current").contains(c)).toSeq
    val replay = existing.join(touched, keys, "left_semi")
      .select((keys.map(col) ++ attrs.map(col) ++
        Seq(col("valid_from").as(tsCol))): _*)
      .unionByName(batch.select((keys.map(col) ++ attrs.map(col) ++
        Seq(col(tsCol))): _*))
    untouched.unionByName(build(replay, keys, tsCol))
  }

  /** Point-in-time enrichment: each fact row joined to the dim version
    * covering its event time (`valid_from ≤ t < valid_to`, open
    * intervals unbounded). Intervals partition time within a key by
    * construction, so every fact matches at most one version; facts
    * before a key's first version (or with no key match) keep nulls.
    */
  def pointInTime(facts: DataFrame, dim: DataFrame, keys: Seq[String],
      factTs: String): DataFrame = {
    val cond = facts(factTs) >= dim("valid_from") &&
      (dim("valid_to").isNull || facts(factTs) < dim("valid_to"))
    val joined = facts.join(dim,
      keys.map(k => facts(k) === dim(k)).reduce(_ && _) && cond, "left")
    keys.foldLeft(joined)((df, k) => df.drop(dim(k)))
  }

  /** The dim as it stood at time `t` — time travel over the intervals. */
  def snapshotAt(dim: DataFrame, t: Column): DataFrame =
    dim.filter(col("valid_from") <= t &&
      (col("valid_to").isNull || col("valid_to") > t))
}
