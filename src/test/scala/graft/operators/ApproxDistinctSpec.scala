package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The documented scale path for exact countDistinct (SURVEY.md §2d A3):
  * HLL-sketch distinct with bounded relative error, mergeable across
  * partitions (unlike exact distinct, it never shuffles raw values).
  */
class ApproxDistinctSpec extends SparkTestBase {

  test("approx_count_distinct is within rsd bounds of exact on the fixture") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val row = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id")).as("approx_default"),
      approx_count_distinct(col("user_id"), 0.01).as("approx_tight"))
      .collect().head
    val exact = row.getLong(0).toDouble
    assert(math.abs(row.getLong(1) - exact) / exact < 0.05)
    assert(math.abs(row.getLong(2) - exact) / exact < 0.02)
  }

  test("sketches merge across partitions consistently") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val once = ev.agg(approx_count_distinct(col("user_id"), 0.01))
      .collect().head.getLong(0)
    val repartitioned = ev.repartition(13)
      .agg(approx_count_distinct(col("user_id"), 0.01))
      .collect().head.getLong(0)
    assert(once === repartitioned) // HLL merge is order-insensitive
  }

  /** q44's exact `percentile` has a sketch twin for the 100 TB path:
    * `approx_percentile(col, p, accuracy)` guarantees rank error ≤
    * n/accuracy. Unlike HLL above, the quantile sketch is NOT bit-stable
    * across partitionings (merge order moves the answer within the
    * bound) — so the contract to assert, here and at scale, is the RANK
    * bound under every partitioning, not value equality. Exact
    * reproducibility needs the exact percentile (q44) or a post-sketch
    * snap-to-data pass.
    */
  test("approx_percentile honors its rank-error contract under repartitioning") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val n = li.count()
    val accuracy = 1000
    val row = li.agg(
      expr(s"approx_percentile(l_extendedprice, 0.5, $accuracy)").as("ap"),
      expr("percentile(l_extendedprice, 0.5)").as("exact")).collect().head
    val approxMedian = row.getDouble(0)
    // rank of the approx answer must be within n/accuracy of n/2
    val rank = li.filter(col("l_extendedprice") <= approxMedian).count()
    val maxRankErr = n.toDouble / accuracy
    assert(math.abs(rank - n / 2.0) <= maxRankErr + 1,
      s"rank $rank vs ${n / 2.0} (allowed ±$maxRankErr)")
    val repartitioned = li.repartition(13)
      .agg(expr(s"approx_percentile(l_extendedprice, 0.5, $accuracy)"))
      .collect().head.getDouble(0)
    val rankRep = li.filter(col("l_extendedprice") <= repartitioned).count()
    assert(math.abs(rankRep - n / 2.0) <= maxRankErr + 1,
      s"rank $rankRep vs ${n / 2.0} (allowed ±$maxRankErr)")
  }
}
