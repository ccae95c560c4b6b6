package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Spark 4's `transformWithState` arbitrary-state API (the successor to
  * `flatMapGroupsWithState`, `streaming/Sessionize.scala`) demonstrated
  * on a funnel measure that no windowed aggregate expresses: for every
  * purchase, how many clicks the user made SINCE THEIR LAST PURCHASE —
  * state must reset on emission, not on a time boundary.
  *
  * Per-key state is a single `ValueState[Long]` click counter living in
  * the RocksDB state store (`transformWithState` requires the RocksDB
  * provider — set `spark.sql.streaming.stateStore.providerClass` to
  * `...state.RocksDBStateStoreProvider` on the session). At scale the
  * state is hash-partitioned by user across executors and each value is
  * 8 bytes — the whole point of the API over buffering raw events.
  * State carries across micro-batches (spec-asserted); a production
  * deployment would add a `TTLConfig` so abandoned funnels expire.
  */
object ClickFunnel {

  case class FunnelEvent(user_id: String, event_id: String,
      ts: java.sql.Timestamp, event_type: String)

  case class FunnelHit(user_id: String, purchase_id: String,
      ts: java.sql.Timestamp, clicks_before: Long)

  class Processor
      extends StatefulProcessor[String, FunnelEvent, FunnelHit] {
    @transient private var clicks: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      clicks = getHandle.getValueState[Long]("clicks", Encoders.scalaLong,
        TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[FunnelEvent],
        timerValues: TimerValues): Iterator[FunnelHit] = {
      // a micro-batch delivers a key's rows unordered — restore event time
      val sorted = rows.toArray.sortBy(e =>
        (e.ts.toInstant.getEpochSecond, e.ts.getNanos.toLong, e.event_id))
      val out = scala.collection.mutable.ArrayBuffer.empty[FunnelHit]
      var c = if (clicks.exists()) clicks.get() else 0L
      sorted.foreach { e =>
        e.event_type match {
          case "click" => c += 1
          case "purchase" =>
            out += FunnelHit(key, e.event_id, e.ts, c)
            c = 0L
          case _ => ()
        }
      }
      clicks.update(c)
      out.iterator
    }
  }

  /** Wire the processor over a streaming frame with the `events` fixture
    * schema (ids cast to string so the same code serves Long-id fixtures
    * and String-id test streams).
    */
  def apply(events: DataFrame): Dataset[FunnelHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr("CAST(user_id AS STRING) AS user_id",
        "CAST(event_id AS STRING) AS event_id", "ts", "event_type")
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Append())
  }
}
