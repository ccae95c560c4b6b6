package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Partition-stitched GLOBAL rolling windows over event-grain data.
  *
  * A trailing time-range frame with no partition key (`ORDER BY ts RANGE
  * BETWEEN <lookback> PRECEDING AND CURRENT ROW` — the reference's
  * rolling-count shape at event grain, `05_gold_aggregation.py:107-113`)
  * plans as a SINGLE-partition WindowExec: one task sorts and scans the
  * entire input — the canonical scale-killer.
  *
  * The stitch makes it parallel and exact: bucket rows by a coarse
  * calendar unit, copy each bucket's trailing `lookback` of rows into
  * the NEXT bucket as ghost rows (they contribute to frames but are
  * dropped from output), evaluate the identical frame PARTITIONED by
  * bucket, and filter the ghosts. Any row's frame reaches back at most
  * `lookback`, and every candidate row is either in its own bucket or
  * ghost-copied from the previous bucket's tail, so per-row frames are
  * identical to the unpartitioned plan — which is exactly what the q84
  * DuckDB oracle (a plain global window) verifies.
  *
  * At 100 TB: work and memory are per-bucket (a month of a year-spanning
  * table), ghost duplication is `lookback / bucket` of the data (an hour
  * copied per month ≈ 0.1%), and buckets scale out across executors.
  * Requires `lookback` ≤ one bucket; a longer lookback just needs ghost
  * copies from every bucket within reach (k-bucket generalization).
  */
object StitchedWindow {

  /** Trailing-frame aggregates over the whole stream, stitched by
    * `bucket` (a `date_trunc` unit, e.g. "month").
    *
    * @param lookback SQL interval literal, e.g. "INTERVAL 1 HOUR";
    *                 must not exceed one bucket
    * @param aggs     (aggregate SQL, output column) pairs evaluated over
    *                 the trailing frame, e.g. `("count(*)", "n_1h")`
    */
  def trailing(df: DataFrame, tsCol: String, bucket: String,
      lookback: String, aggs: Seq[(String, String)]): DataFrame = {
    require(aggs.nonEmpty, "StitchedWindow.trailing needs at least one agg")
    val b = date_trunc(bucket, col(tsCol))
    val bNext = date_trunc(bucket, col(tsCol) + expr(s"$lookback"))
    // ONE scan: each row emits its own (bucket, ghost=false) tag, plus a
    // forward (next-bucket, ghost=true) copy when ts + lookback crosses a
    // bucket boundary — those rows can fall inside next-bucket frames. (A
    // union of a filtered second branch would scan the input twice: the
    // boundary predicate is an expression, nothing pushes to the source.)
    val tags = when(bNext > b,
      array(struct(b.as("b"), lit(false).as("g")),
        struct(bNext.as("b"), lit(true).as("g"))))
      .otherwise(array(struct(b.as("b"), lit(false).as("g"))))
    val tagged = df
      .select(col("*"), explode(tags).as("__e"))
      .withColumn("__b", col("__e.b"))
      .withColumn("__ghost", col("__e.g"))
      .drop("__e")
    val frame = s"PARTITION BY __b ORDER BY $tsCol " +
      s"RANGE BETWEEN $lookback PRECEDING AND CURRENT ROW"
    val windowed = aggs.foldLeft(tagged) {
      case (d, (agg, name)) => d.withColumn(name, expr(s"$agg OVER ($frame)"))
    }
    windowed.filter(!col("__ghost")).drop("__b", "__ghost")
  }
}
