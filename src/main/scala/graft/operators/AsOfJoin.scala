package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the temporal join the reference lacks
  * (SURVEY.md §2c "engine additions"): for every left row, the LATEST
  * right row whose timestamp is ≤ the left timestamp, within matching
  * keys. The canonical "state of X as of event time" primitive
  * (enrich trades with quotes, events with the last prior click, facts
  * with an SCD snapshot).
  *
  * Implementation is the union-tag trick, not a range join: tag both
  * sides, union, and take `last(payload, ignoreNulls)` over a window
  * ordered by (ts, tag) — right rows sort before left rows at equal
  * timestamps, so the join is inclusive. ONE shuffle on the keys, state
  * bounded by the window frame; no quadratic candidate space, no
  * per-row binary search. At 100 TB both sides shuffle-partition by key
  * and each partition is a single merge pass.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side, pre-projected to `keys`, `rightTs`,
    *                  and payload columns whose names must not collide
    *                  with `left`'s
    * @param keys      equality keys
    * @param leftTs    left event-time column
    * @param rightTs   right event-time column
    * @param rightTieBreak extra ordering among right rows sharing
    *                  (keys, ts) — pass a unique column for determinism
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      rightTieBreak: Seq[Column] = Seq.empty): DataFrame = {
    val payload = right.columns.filterNot(c =>
      keys.contains(c) || c == rightTs).toSeq
    require(payload.nonEmpty, "right side carries no payload columns")
    require(payload.forall(!left.columns.contains(_)),
      s"payload columns ${payload.mkString(",")} collide with left side")

    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(1))
      .withColumns(payload.map(p => p -> lit(null)).toMap)
    // a NULL right timestamp must never match (SQL `l.ts >= r.ts` is
    // UNKNOWN) — without this filter it would sort nulls-first and act
    // as an always-available earliest row
    val r = right
      .filter(col(rightTs).isNotNull)
      .withColumn("__ts", col(rightTs))
      .withColumn("__tag", lit(0))
      .withColumns(leftCols.filterNot(c => keys.contains(c))
        .map(c => c -> lit(null)).toMap)
      .select(l.columns.toIndexedSeq.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(Seq(col("__ts").asc, col("__tag").asc) ++ rightTieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // fill the payload as ONE struct, not column-by-column: independent
    // last(ignoreNulls) per column would tear values from DIFFERENT right
    // rows whenever the latest right row carries a null in some payload
    // column (a composite row that never existed)
    l.unionByName(r)
      .withColumn("__payload",
        when(col("__tag") === 0, struct(payload.map(col): _*)))
      .withColumn("__last",
        last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select((leftCols.map(col) ++
        payload.map(p => col(s"__last.$p").as(p))): _*)
  }
}
