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
  * copied per month ≈ 0.1%), and buckets scale out across executors. A
  * lookback LONGER than one bucket works too: each row ghost-copies into
  * every bucket its window reaches (duplication `≈ lookback / bucket`×,
  * the inherent cost of that frame shape).
  */
object StitchedWindow {

  /** Trailing-frame aggregates over the whole stream, stitched by
    * `bucket` (a `date_trunc` unit, e.g. "month").
    *
    * @param lookback SQL interval literal, e.g. "INTERVAL 1 HOUR" (may
    *                 exceed one bucket — ghosts fan out accordingly)
    * @param aggs     (aggregate SQL, output column) pairs evaluated over
    *                 the trailing frame, e.g. `("count(*)", "n_1h")`
    */
  def trailing(df: DataFrame, tsCol: String, bucket: String,
      lookback: String, aggs: Seq[(String, String)]): DataFrame = {
    require(aggs.nonEmpty, "StitchedWindow.trailing needs at least one agg")
    val b = date_trunc(bucket, col(tsCol))
    val bLast = date_trunc(bucket, col(tsCol) + expr(s"$lookback"))
    // ONE scan: each row emits its own (bucket, ghost=false) tag plus a
    // (forward bucket, ghost=true) copy for EVERY bucket its lookback
    // window reaches into — `sequence` enumerates the bucket starts from
    // the row's own through b(ts + lookback), so a lookback longer than
    // one bucket just fans out to more ghosts (k-bucket stitching falls
    // out for free). For the common lookback ≤ bucket case this is the
    // 1-or-2-element array. (A union of a filtered ghost branch would
    // scan the input twice: the boundary predicate is an expression,
    // nothing pushes to the source.)
    val tags = transform(
      sequence(b, bLast, expr(s"INTERVAL 1 $bucket")),
      (bk, i) => struct(bk.as("b"), (i > 0).as("g")))
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
