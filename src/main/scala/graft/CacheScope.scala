package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Session-wide registry of operator- and query-internal caches.
  *
  * Operators persist intermediates whose lifetime the operator itself
  * cannot end: the frames they return reference the cache LAZILY, so an
  * `unpersist` before the caller materializes would silently recompute
  * (or worse, re-scan a corpus mid-search). The previous contract —
  * "callers own cleanup via `spark.catalog.clearCache()`" — worked for
  * the gate but left long-lived sessions accumulating MEMORY_AND_DISK
  * entries per call with no way to release *only* what the engine
  * created.
  *
  * This registry makes cache scope explicit:
  *  - every internal persist goes through [[cache]], which registers the
  *    frame (idempotent — a frame the CALLER already persisted is left
  *    alone and stays the caller's to release);
  *  - [[releaseAll]] unpersists exactly the registered frames — call it
  *    after materializing a query's output (the gate runners do; a
  *    long-lived session calls it between queries without clobbering its
  *    own caches the way `clearCache()` would);
  *  - [[withCached]] scopes it: `withCached { q.write.parquet(...) }`
  *    releases the engine's caches when the block's materialization
  *    finishes.
  *
  * `CacheScopeSpec` pins the contract: after each cache-using gate query
  * materializes and `releaseAll()` runs, the Spark cache is empty — an
  * operator adding a raw `.persist` without registering it fails the
  * spec.
  */
object CacheScope {

  private val registry =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[DataFrame, java.lang.Boolean]())

  private val rddRegistry =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[org.apache.spark.rdd.RDD[_], java.lang.Boolean]())

  /** Persist `df` (MEMORY_AND_DISK) and register it for [[releaseAll]],
    * unless the caller already persisted it — then ownership stays with
    * the caller and this is a no-op (avoids the double-cache warning and
    * keeps one owner per cache entry).
    */
  def cache(df: DataFrame): DataFrame =
    if (df.storageLevel == StorageLevel.NONE) {
      df.persist(StorageLevel.MEMORY_AND_DISK)
      registry.add(df)
      df
    } else df

  /** Persist `df` AND truncate its logical plan: the returned frame is
    * rebuilt over `df`'s row RDD, so its analyzed plan is a single
    * `LogicalRDD` node regardless of how deep the input lineage was.
    * This is the loop-safe variant for iterative operators (connected
    * components, Lloyd iterations): a loop that embeds the previous
    * round's frame more than once doubles its logical plan every round
    * (caching materializes DATA but keeps the full PLAN, and the
    * analyzer / cache canonicalizer / SQL-listener `explainString` all
    * walk the tree — 2^rounds nodes OOMs the driver by round ~11).
    * Rebuilding from the RDD keeps lineage as a linear DAG: a
    * post-[[releaseAll]] re-read recomputes through RDD lineage —
    * slow, never wrong — so the registry contract is unchanged.
    */
  def cacheTruncated(df: DataFrame): DataFrame =
    cache(df.sparkSession.createDataFrame(df.rdd, df.schema))

  /** RDD-level variant of [[cache]] for iterative operators that
    * materialize a round's rows AND aggregate over them in the SAME
    * action ([[graft.operators.ConnectedComponents]]'s per-round
    * convergence stats ride a `treeAggregate` over the persisted row
    * RDD — one job instead of a separate scan-and-agg pass). Registered
    * here so [[releaseAll]] keeps the `getPersistentRDDs`-empty
    * contract `CacheScopeSpec` pins.
    */
  def cacheRdd[T](rdd: org.apache.spark.rdd.RDD[T]): org.apache.spark.rdd.RDD[T] =
    if (rdd.getStorageLevel == StorageLevel.NONE) {
      rdd.persist(StorageLevel.MEMORY_AND_DISK)
      rddRegistry.add(rdd)
      rdd
    } else rdd

  /** [[release]] for [[cacheRdd]] entries. */
  def releaseRdd(rdd: org.apache.spark.rdd.RDD[_]): Unit =
    if (rddRegistry.remove(rdd)) { rdd.unpersist(blocking = false); () }

  /** Release ONE registered frame early (loop interiors: round N's
    * intermediate is dead as soon as round N+1 materializes; holding
    * every round until [[releaseAll]] would grow the cache linearly
    * with iteration count). No-op for unregistered frames — a caller's
    * own cache is never touched.
    */
  def release(df: DataFrame): Unit =
    if (registry.remove(df)) df.unpersist(blocking = false)

  /** Number of live registered caches (spec hook). */
  def activeCount: Int = registry.size + rddRegistry.size

  /** Unpersist every registered frame and RDD (non-blocking) and clear
    * the registries. Safe to call at any point AFTER the consuming
    * query materialized; anything still needed later recomputes
    * correctly.
    */
  def releaseAll(): Unit = {
    val it = registry.iterator()
    while (it.hasNext) {
      it.next().unpersist(blocking = false)
      it.remove()
    }
    val rit = rddRegistry.iterator()
    while (rit.hasNext) {
      rit.next().unpersist(blocking = false)
      rit.remove()
    }
  }

  /** Run `body` (which should MATERIALIZE whatever it builds), then
    * release the engine caches registered during it.
    */
  def withCached[T](body: => T): T =
    try body finally releaseAll()
}
