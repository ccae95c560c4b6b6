package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.QuerySpec
import graft.streaming.StreamingPipeline

/** Structured Streaming surfaced into the oracle gate: the stream runs to
  * completion over the same parquet the oracle reads (file source +
  * `Trigger.AvailableNow`, memory sink), so a STREAMED windowed
  * aggregation hash-compares against a BATCH DuckDB query — the
  * stream/batch equivalence that makes the Kappa-style reuse of these
  * operators trustworthy. Decimal-backed sums make the equivalence exact:
  * micro-batch boundaries reorder the accumulation, which a double sum
  * would expose.
  */
object StreamingQueries {

  /** Tumbling 1-hour per-type counts computed by a STREAM, verified
    * against the batch oracle (`window(ts, '1 hour').start` is the
    * epoch-aligned hour = `date_trunc('hour', ts)`).
    */
  val streamWindowCounts: QuerySpec = QuerySpec.sql(
    "q56_stream_window_counts",
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |  count(*) AS n_events,
      |  round(CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) + 1e-9, 2) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin
  ) { (spark, dir) =>
    // explicit schema: a streaming source cannot infer one (ts arrives as
    // nanosecond Long, normalized exactly like Tables.load)
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // the fixture table is a single FILE; the streaming file source lists
    // a DIRECTORY, so stream the parent with a name filter
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    val ev =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else raw
    // complete mode: every window survives to the final table, matching
    // the batch oracle (the watermark only bounds append-mode eviction)
    val sink = "q56_sink_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val query = StreamingPipeline.windowedCounts(ev, "1 hour", "1 hour")
      .writeStream.format("memory").queryName(sink)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    spark.table(sink)
      .select(col("window_start"), col("event_type"), col("n_events"),
        round(col("sum_value") + lit(1e-9), 2).as("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
  }

  /** Native `session_window` (gap-based merging windows) in batch mode,
    * verified against a gaps-and-islands oracle: Spark merges an event
    * into the open session while `ts < prev_end` (= prev ts + gap,
    * STRICT), which is exactly `lag`-diff `< INTERVAL` islanding; the
    * session end is `last ts + gap` in both. This pins the semantics the
    * streaming sessionization operators ([[graft.streaming.Sessionize]],
    * q62/q68's islands) rely on, with the engine-native operator rather
    * than a hand-built window chain — at scale it is one shuffle on
    * user_id with state merged inside the aggregation.
    */
  val sessionWindow: QuerySpec = QuerySpec.sql(
    "q76_session_window",
    """WITH d AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              < INTERVAL 30 MINUTE
      |         THEN 0 ELSE 1 END AS brk
      |  FROM events),
      |s AS (
      |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM d)
      |SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end,
      |  count(*) AS n_events,
      |  round(CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) + 1e-9, 2)
      |    AS sum_value
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin
  ) { (spark, dir) =>
    graft.sources.Tables.load(spark, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        round(graft.functions.Stable.sumD(col("value")) + lit(1e-9), 2)
          .as("sum_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))
  }

  val all: Seq[QuerySpec] = Seq(streamWindowCounts, sessionWindow)
}
