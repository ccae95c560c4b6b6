package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Broadcast range (θ) join against a small banded dimension with
  * priority tie-break and a fallback for non-matching rows
  * (SURVEY.md §2c J1–J4).
  *
  * Reference shape: events × 12 tectonic-region bboxes via
  * `crossJoin(broadcast(regions)).filter(lat/lon between …)` then
  * `row_number() over (partition by event_id order by priority)` = 1, with
  * a left-anti join tagging unmatched rows `OTHER`
  * (`04_silver_transformation.py:96-125`). We express the cross+filter
  * directly as an inner θ-join so Spark plans a single
  * BroadcastNestedLoopJoin without materializing non-matching pairs.
  *
  * Scale: the dimension is broadcast (12 rows in the reference; anything up
  * to the broadcast threshold works), so the fact side streams with no
  * shuffle. The priority pick windows on the fact key — one hash shuffle.
  */
object BandJoin {

  /** @param facts     fact table
    * @param factKey   unique fact key (window partition for the pick)
    * @param dim       small dimension (broadcast)
    * @param joinCond  θ condition, e.g. fact value between dim lo/hi
    * @param pickOrder total order choosing one dim row per fact
    *                  (e.g. priority asc, dim code asc)
    * @param fallback  dim-column -> literal for facts matching no band
    */
  def enrich(
      facts: DataFrame,
      factKey: String,
      dim: DataFrame,
      joinCond: Column,
      pickOrder: Seq[Column],
      fallback: Map[String, Column]): DataFrame = {

    // LEFT OUTER θ-join instead of the reference's inner-join + anti-join
    // + union: unmatched facts survive with null dim columns, the priority
    // window picks exactly one row per fact (an unmatched fact's only row
    // is its null row — nulls sort last), and coalesce applies the
    // fallback. Same result, one BroadcastNestedLoopJoin and ONE shuffle
    // (the window) instead of two joins + a union.
    val joined = facts.join(broadcast(dim), joinCond, "left_outer")
    // no nulls-ordering tweak needed: an unmatched fact's null row is the
    // only row in its window group, so pickOrder never compares nulls
    val picked = Dedup.keepFirst(joined, Seq(factKey), pickOrder)
    fallback.foldLeft(picked) { case (df, (c, v)) =>
      df.withColumn(c, coalesce(col(c), v))
    }
  }
}
