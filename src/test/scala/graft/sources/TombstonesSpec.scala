package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the tombstone lifecycle invariants the index layers rely on
  * (round-8 advice): re-admitted ids drop their stale markers, deletes
  * written during a compaction survive its publish swap, and the
  * probe-time anti-join only force-broadcasts small marker sets.
  */
class TombstonesSpec extends SparkTestBase {

  import spark.implicits._

  private def ids(xs: Long*) = xs.toDF("id")

  private def markerSet(path: String): Set[Long] =
    Tombstones.read(spark, path)
      .map(_.collect().map(_.getLong(0)).toSet).getOrElse(Set.empty)

  test("unmark clears exactly the re-admitted ids, keeps the rest") {
    val path = graft.Scratch.fresh("ts_unmark") + "/layout"
    ids(1L, 2L, 3L).write.parquet(path)
    Tombstones.write(spark, path, ids(1L, 2L), "id")
    assert(markerSet(path) === Set(1L, 2L))
    Tombstones.unmark(spark, path, ids(2L, 9L), "id")
    assert(markerSet(path) === Set(1L))
    // the surviving marker still masks its row at probe time
    val live = Tombstones.filterLive(spark, path,
      spark.read.parquet(path), "id").collect().map(_.getLong(0)).toSet
    assert(live === Set(2L, 3L))
  }

  test("unmark with no matching marker rewrites nothing") {
    val path = graft.Scratch.fresh("ts_unmark_noop") + "/layout"
    ids(1L).write.parquet(path)
    Tombstones.write(spark, path, ids(1L), "id")
    val before = Tombstones.fileSnapshot(spark, path)
    Tombstones.unmark(spark, path, ids(7L, 8L), "id")
    assert(Tombstones.fileSnapshot(spark, path) === before)
    assert(markerSet(path) === Set(1L))
  }

  test("carryInto ships only markers written after the snapshot") {
    val path = graft.Scratch.fresh("ts_carry") + "/layout"
    val staged = graft.Scratch.fresh("ts_carry") + "/staged"
    ids(1L, 2L, 3L).write.parquet(path)
    ids(1L, 2L, 3L).write.parquet(staged)
    Tombstones.write(spark, path, ids(1L), "id")
    // a compactor snapshots, reads, rewrites… meanwhile a delete lands
    val snap = Tombstones.fileSnapshot(spark, path)
    Tombstones.write(spark, path, ids(3L), "id")
    val carried = Tombstones.carryInto(spark, path, snap, staged)
    assert(carried === 1)
    // the staged layout carries ONLY the late delete — the snapshot's
    // markers were applied physically by the rewrite it shipped with
    assert(markerSet(staged) === Set(3L))
  }

  test("filterLive stops force-broadcasting past the marker byte bound") {
    val path = graft.Scratch.fresh("ts_bcast") + "/layout"
    ids(1L, 2L, 3L).write.parquet(path)
    Tombstones.write(spark, path, ids(2L), "id")
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.toString
    val small = Tombstones.filterLive(spark, path,
      spark.read.parquet(path), "id")
    assert(planOf(small).contains("broadcast"),
      s"small marker set should hint broadcast:\n${planOf(small)}")
    // shrink the bound instead of writing 64 MB of markers
    val guarded = Tombstones.filterLive(spark, path,
      spark.read.parquet(path), "id", maxBroadcastBytes = 0L)
    assert(!planOf(guarded).contains("broadcast"),
      s"oversized marker set must not force-broadcast:\n${planOf(guarded)}")
    // semantics identical either way
    assert(guarded.collect().map(_.getLong(0)).toSet === Set(1L, 3L))
  }
}
