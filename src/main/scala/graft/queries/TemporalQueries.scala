package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.functions.Stable
import graft.operators.{AsOfJoin, Scd2}
import graft.sources.Tables

/** Temporal operators beyond the reference's surface (SURVEY.md §2c/§2e
  * "engine additions"): backward as-of join, interval (range) join via
  * bin-bucketing, and lag/lead sessionization with island aggregates.
  */
object TemporalQueries {

  /** For every purchase, the user's latest click at-or-before it —
    * [[AsOfJoin]] (union-tag + last-ignoreNulls window, one shuffle).
    * DuckDB's native ASOF LEFT JOIN is the oracle.
    */
  val asofLastClick: QuerySpec = QuerySpec.sql(
    "q35_asof_last_click",
    """WITH clicks AS (
      |  SELECT user_id, ts, event_id AS click_id, ts AS click_ts,
      |         round(value, 2) AS click_value
      |  FROM events WHERE event_type = 'click'),
      |purchases AS (
      |  SELECT user_id, ts, event_id FROM events
      |  WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, p.ts,
      |       c.click_id, c.click_ts, c.click_value
      |FROM purchases p ASOF LEFT JOIN clicks c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin
  ) { (spark, dir) =>
    val ev = Tables.load(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("ts").as("click_ts"),
        round(col("value"), 2).as("click_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    AsOfJoin.asofBackward(purchases, clicks, Seq("user_id"), "ts", "ts",
        rightTieBreak = Seq(col("click_id").asc))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("click_id"), col("click_ts"), col("click_value"))
      .orderBy(col("event_id"))
  }

  /** Sessionization via lag + running sum + ntile (§2e "easy
    * extensions" made concrete): per-user event gaps, 30-minute session
    * breaks, session sequence numbers, and activity quartiles.
    */
  val sessionGaps: QuerySpec = QuerySpec.sql(
    "q36_session_gaps",
    """WITH g AS (
      |  SELECT user_id, event_id, ts,
      |    CAST(floor(epoch(ts)) AS BIGINT) -
      |      CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) AS gap_seconds
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT *,
      |    CASE WHEN gap_seconds IS NULL OR gap_seconds > 1800
      |         THEN 1 ELSE 0 END AS is_new_session
      |  FROM g)
      |SELECT user_id, event_id, ts, gap_seconds,
      |  CAST(is_new_session AS BOOLEAN) AS is_new_session,
      |  CAST(sum(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq,
      |  CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS quartile
      |FROM s
      |ORDER BY user_id, ts, event_id""".stripMargin
  ) { (spark, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("gap_seconds",
        floor(unix_timestamp(col("ts"))).cast("long") -
          floor(unix_timestamp(lag(col("ts"), 1).over(w))).cast("long"))
      .withColumn("is_new_session",
        col("gap_seconds").isNull || col("gap_seconds") > 1800)
      .withColumn("session_seq",
        sum(when(col("is_new_session"), 1).otherwise(0)).over(wRun)
          .cast("long"))
      .withColumn("quartile", ntile(4).over(w))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Top-3 events per user by value, executed by the CUSTOM physical
    * operator ([[graft.operators.Dedup.topKPerKey]] →
    * [[graft.plans.TopKPerKeyExec]] with map-side partial reduction) —
    * the DuckDB oracle is the equivalent window formulation, so the
    * driver gate verifies the custom operator end-to-end.
    */
  val topEventsPerUser: QuerySpec = QuerySpec.sql(
    "q46_top_events_per_user",
    """SELECT user_id, event_id, round(value, 2) AS value
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
      |        ORDER BY value DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn <= 3
      |ORDER BY user_id, value DESC, event_id DESC""".stripMargin
  ) { (spark, dir) =>
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("value"))
    graft.operators.Dedup.topKPerKey(ev, Seq("user_id"),
        Seq(col("value").desc, col("event_id").desc), 3)
      .select(col("user_id"), col("event_id"),
        round(col("value"), 2).as("value"))
      .orderBy(col("user_id"), col("value").desc, col("event_id").desc)
  }

  /** Interval (range) join, bin-bucketed: per purchase, the count and value
    * of the same user's clicks in the trailing 30 minutes. A naive range
    * θ-join plans BroadcastNestedLoopJoin (quadratic per user); instead both
    * sides are bucketed into 30-minute epoch bins — a window of exactly one
    * bin width overlaps at most 2 bins, so each purchase probes (bin-1, bin)
    * and the join is a plain shuffled HASH join on (user_id, bin) with the
    * exact range predicate as a residual filter. At 100 TB the cost tracks
    * events-per-(user, half-hour), not events-per-user².
    */
  val clickWindowJoin: QuerySpec = QuerySpec.sql(
    "q61_interval_join",
    s"""WITH purchases AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      |clicks AS (
      |  SELECT user_id, ts, value FROM events WHERE event_type = 'click')
      |SELECT p.event_id, p.user_id, p.ts,
      |  CAST(count(c.ts) AS BIGINT) AS n_clicks_30m,
      |  ${Stable.sum2Sql("c.value")} AS clicks_value
      |FROM purchases p LEFT JOIN clicks c
      |  ON p.user_id = c.user_id
      | AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts < p.ts
      |GROUP BY p.event_id, p.user_id, p.ts
      |ORDER BY p.event_id""".stripMargin
  ) { (spark, dir) =>
    val BinSec = 1800L // = the window length, so a window spans ≤ 2 bins
    val ev = Tables.load(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    // click bin from floored epoch seconds; purchase probes (bin-1, bin).
    // floor(long / 1800.0) is exact at epoch magnitudes (< 2^53).
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("c_value"),
        floor(unix_timestamp(col("ts")) / BinSec).as("c_bin"))
    val probes = purchases.withColumn("p_bin",
      explode(array(floor(unix_timestamp(col("ts")) / BinSec) - 1,
        floor(unix_timestamp(col("ts")) / BinSec))))
    // a click's single bin matches exactly one of the two probe bins, so
    // the equi-join introduces no duplicate pairs to dedup away
    val matched = probes.join(clicks,
        probes("user_id") === clicks("c_user") &&
          probes("p_bin") === clicks("c_bin") &&
          clicks("c_ts") >= probes("ts") - expr("INTERVAL 30 MINUTES") &&
          clicks("c_ts") < probes("ts"))
      .groupBy(col("event_id"))
      .agg(count(col("c_ts")).as("n"), Stable.sum2(col("c_value")).as("cv"))
    purchases.join(matched, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"), col("ts"),
        coalesce(col("n"), lit(0L)).as("n_clicks_30m"),
        col("cv").as("clicks_value"))
      .orderBy(col("event_id"))
  }

  /** Gaps-and-islands rollup: q36's per-event session tags aggregated to
    * session grain (start/end/duration/value per island). Same two-window
    * shape — both windows share the (user_id, ts) partitioning, so the
    * whole query is ONE shuffle plus a per-partition sort.
    */
  val sessionStats: QuerySpec = QuerySpec.sql(
    "q62_session_stats",
    s"""WITH g AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |              OR CAST(floor(epoch(ts)) AS BIGINT) -
      |                 CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
      |         THEN 1 ELSE 0 END AS is_new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT *, sum(is_new_session) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      |  FROM g)
      |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
      |  count(*) AS n_events,
      |  min(ts) AS session_start, max(ts) AS session_end,
      |  CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT)
      |    AS duration_seconds,
      |  ${Stable.sum2Sql("value")} AS session_value
      |FROM s
      |GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin
  ) { (spark, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("is_new_session",
        when(lag(col("ts"), 1).over(w).isNull ||
          floor(unix_timestamp(col("ts"))).cast("long") -
            floor(unix_timestamp(lag(col("ts"), 1).over(w))).cast("long") > 1800,
          1).otherwise(0))
      .withColumn("session_seq", sum(col("is_new_session")).over(wRun).cast("long"))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        (floor(unix_timestamp(max(col("ts")))) -
          floor(unix_timestamp(min(col("ts"))))).cast("long")
          .as("duration_seconds"),
        Stable.sum2(col("value")).as("session_value"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  /** Pure range θ-join through the SQL front door, written NAIVELY — no
    * user equality, so vanilla Catalyst plans BroadcastNestedLoopJoin
    * (|signups|·|errors| comparisons). The injected
    * [[graft.plans.RewriteIntervalJoin]] rule rewrites it into the
    * bin-bucketed hash join automatically (the declarative text stays
    * naive; the optimizer owns the scale shape — spec-asserted in
    * `RewriteIntervalJoinSpec`, plan-asserted in `PlanQualitySpec`).
    * LEFT JOIN is safe because the preserved side is the bounded one.
    * One query text runs in BOTH engines (DuckDB plans its native
    * IEJoin for the same SQL).
    */
  val errorFollowup: QuerySpec = {
    val sql =
      """SELECT s.event_id, s.ts, CAST(count(e.ts) AS BIGINT) AS n_errors_5m
        |FROM (SELECT event_id, ts FROM events WHERE event_type = 'signup') s
        |LEFT JOIN (SELECT ts FROM events WHERE event_type = 'error') e
        |  ON e.ts > s.ts AND e.ts <= s.ts + INTERVAL 5 MINUTES
        |GROUP BY s.event_id, s.ts
        |ORDER BY s.event_id""".stripMargin
    QuerySpec.sql("q64_range_join_followup", sql) { (spark, dir) =>
      Tables.load(spark, dir, "events").createOrReplaceTempView("events")
      spark.sql(sql)
    }
  }

  /** q62's session rollup computed through the TYPED Dataset API —
    * `Dataset[SessionEv].groupByKey(_.user_id).flatMapGroups` walking
    * each user's timeline imperatively (the per-partition state-machine
    * style that windows cannot always express) — and verified against
    * the SAME oracle SQL as q62, so the typed and declarative paths are
    * proven equivalent end-to-end.
    *
    * Scale notes: one shuffle on the grouping key (same as the window
    * formulation); a group must fit in memory (99 events/user max here;
    * a power-law user at 100 TB would need the chunk-and-stitch noted
    * for as-of joins). Float semantics replicate [[Stable.sum2]]
    * exactly — per-value HALF_UP to the 1e-10 grid, exact decimal
    * accumulation (order-invariant), one double cast, then Spark's
    * `round(x + 1e-9, 2)` — so the hash still matches the oracle.
    */
  val typedSessions: QuerySpec = QuerySpec.sql(
    "q68_typed_sessions",
    s"""WITH g AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |              OR CAST(floor(epoch(ts)) AS BIGINT) -
      |                 CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
      |         THEN 1 ELSE 0 END AS is_new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT *, sum(is_new_session) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      |  FROM g)
      |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
      |  count(*) AS n_events,
      |  min(ts) AS session_start, max(ts) AS session_end,
      |  CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT)
      |    AS duration_seconds,
      |  ${Stable.sum2Sql("value")} AS session_value
      |FROM s
      |GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin
  ) { (spark, dir) =>
    import spark.implicits._
    val ds = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[SessionEv]
    ds.groupByKey(_.user_id)
      .flatMapGroups { (uid: Long, it: Iterator[SessionEv]) =>
        SessionWalk.sessions(uid, it)
      }
      .toDF()
      .orderBy(col("user_id"), col("session_seq"))
  }

  /** GLOBAL trailing-hour rolling metrics at event grain
    * ([[graft.operators.StitchedWindow]]): the oracle is the naive
    * unpartitioned window — `ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR
    * PRECEDING AND CURRENT ROW` with no PARTITION BY, a single-partition
    * WindowExec in Spark — while the engine evaluates the identical
    * frames partitioned by month with the previous month's trailing hour
    * ghost-copied across the boundary. Decimal-backed frame sum for the
    * usual order-invariance reasons ([[graft.functions.Stable]]).
    */
  val stitchedRolling: QuerySpec = QuerySpec.sql(
    "q84_stitched_rolling",
    """SELECT event_id, ts,
      |  CAST(count(*) OVER w AS BIGINT) AS events_last_hour,
      |  round(CAST(sum(CAST(value AS DECIMAL(28,10))) OVER w AS DOUBLE) + 1e-9, 2) AS value_last_hour
      |FROM events
      |WINDOW w AS (ORDER BY ts
      |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
      |ORDER BY ts, event_id""".stripMargin
  ) { (spark, dir) =>
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("value"))
    graft.operators.StitchedWindow
      .trailing(ev, "ts", "month", "INTERVAL 1 HOUR",
        Seq("count(*)" -> "__n",
          "sum(CAST(value AS DECIMAL(28,10)))" -> "__s"))
      .select(col("event_id"), col("ts"),
        col("__n").cast("long").as("events_last_hour"),
        round(col("__s").cast("double") + lit(1e-9), 2)
          .as("value_last_hour"))
      .orderBy(col("ts"), col("event_id"))
  }

  // Shared SCD2 oracle pieces: the change log is events deduped to one
  // row per (user_id, ts) — equal-timestamp changes have no defined
  // order in any engine, so the keep-max-event_id rule is part of the
  // replayed contract.
  private def scd2LogSql(src: String): String =
    s"""c0 AS (
      |  SELECT user_id, ts, event_type, round(value, 2) AS value,
      |    row_number() OVER (PARTITION BY user_id, ts
      |      ORDER BY event_id DESC) AS rn
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL$src),
      |c AS (SELECT user_id, ts, event_type, value FROM c0 WHERE rn = 1),
      |d AS (SELECT user_id, event_type, value, ts AS valid_from,
      |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
      |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts)
      |      AS BIGINT) AS version
      |  FROM c)""".stripMargin

  private def scd2Log(spark: org.apache.spark.sql.SparkSession,
      dir: String, src: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame =
    Tables.load(spark, dir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull && src)
      .withColumn("rn", row_number().over(Window
        .partitionBy(col("user_id"), col("ts"))
        .orderBy(col("event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("ts"), col("event_type"),
        round(col("value"), 2).as("value"))

  /** SCD2 build ([[Scd2.build]]): the change log becomes history-
    * preserving interval rows — `[valid_from, valid_to)` per key in
    * time order, a version sequence, and a current flag. This is the
    * type-2 tier above the reference's type-1 MERGE (q06/q60): the
    * upsert forgets, this remembers. One hash partition on the key +
    * an in-partition sort (the q36 island shape); the oracle replays
    * the dedup rule and the lead/row_number windows.
    */
  val scd2Build: QuerySpec = QuerySpec.sql(
    "q185_scd2_build",
    s"""WITH ${scd2LogSql("")}
      |SELECT user_id, event_type, value, valid_from, valid_to, version,
      |  valid_to IS NULL AS is_current
      |FROM d ORDER BY user_id, version""".stripMargin
  ) { (spark, dir) =>
    Scd2.build(scd2Log(spark, dir, lit(true)), Seq("user_id"), "ts")
      .select(col("user_id"), col("event_type"), col("value"),
        col("valid_from"), col("valid_to"), col("version"),
        col("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  /** Point-in-time enrichment ([[Scd2.pointInTime]]): each purchase
    * joined to the dim version covering its event time — the
    * "which profile did this user have WHEN they bought" join that a
    * plain type-1 dim answers wrongly by construction. The dim is the
    * SCD2 chain over the user's CLICK history, so fact timestamps fall
    * strictly inside intervals (not on their boundaries). Equi-join on
    * the key with the interval predicate residual: per-key fanout is
    * the version count, never a quadratic candidate space; intervals
    * partition time, so every fact matches at most once — no dedup
    * needed after the join.
    */
  val scd2PointInTime: QuerySpec = QuerySpec.sql(
    "q186_scd2_pit",
    s"""WITH ${scd2LogSql(" AND event_type = 'click'")},
      |f AS (SELECT event_id, user_id, ts FROM events
      |  WHERE event_type = 'purchase' AND user_id IS NOT NULL
      |    AND ts IS NOT NULL)
      |SELECT f.event_id, f.user_id, f.ts, d.version,
      |  d.value AS click_value
      |FROM f LEFT JOIN d ON f.user_id = d.user_id
      |  AND f.ts >= d.valid_from
      |  AND (d.valid_to IS NULL OR f.ts < d.valid_to)
      |ORDER BY f.event_id""".stripMargin
  ) { (spark, dir) =>
    val dim = Scd2.build(
      scd2Log(spark, dir, col("event_type") === "click")
        .withColumnRenamed("value", "click_value")
        .drop("event_type"),
      Seq("user_id"), "ts")
    val facts = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase" &&
        col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"))
    Scd2.pointInTime(facts, dim, Seq("user_id"), "ts")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("version"), col("click_value"))
      .orderBy(col("event_id"))
  }

  /** Incremental SCD2 maintenance ([[Scd2.merge]]): an existing chain
    * built from part of the change log absorbs the remaining changes as
    * a batch — touched keys' chains replay and re-version through
    * broadcast semi/anti joins against the bounded touched-key set,
    * untouched history never shuffles — and the result is
    * BIT-IDENTICAL to a fresh build over the full log (the oracle),
    * the maintained ≡ fresh discipline every index family here pins,
    * now for the warehouse dim tier.
    */
  val scd2Merge: QuerySpec = QuerySpec.sql(
    "q187_scd2_merge",
    s"""WITH ${scd2LogSql("")}
      |SELECT user_id, event_type, value, valid_from, valid_to, version,
      |  valid_to IS NULL AS is_current
      |FROM d ORDER BY user_id, version""".stripMargin
  ) { (spark, dir) =>
    val log = scd2Log(spark, dir, lit(true))
      .transform(graft.CacheScope.cache)
    val existing = Scd2.build(
      log.filter(abs(hash(col("user_id"), col("ts"))) % 5 =!= 0),
      Seq("user_id"), "ts")
    val batch = log.filter(abs(hash(col("user_id"), col("ts"))) % 5 === 0)
    Scd2.merge(existing, batch, Seq("user_id"), "ts")
      .select(col("user_id"), col("event_type"), col("value"),
        col("valid_from"), col("valid_to"), col("version"),
        col("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  val all: Seq[QuerySpec] =
    Seq(asofLastClick, sessionGaps, topEventsPerUser, clickWindowJoin,
      sessionStats, errorFollowup, typedSessions, stitchedRolling,
      scd2Build, scd2PointInTime, scd2Merge)
}

/** Typed rows for [[TemporalQueries.typedSessions]]. */
case class SessionEv(user_id: Long, event_id: Long,
    ts: java.sql.Timestamp, value: Double)

case class SessionRow(user_id: Long, session_seq: Long, n_events: Long,
    session_start: java.sql.Timestamp, session_end: java.sql.Timestamp,
    duration_seconds: Long, session_value: Double)

/** The imperative per-user session walk (executor-side, one user's
  * events in memory). Kept as plain Scala so the group function stays a
  * serializable closure with no Spark references.
  */
object SessionWalk {

  private def epochSec(ts: java.sql.Timestamp): Long =
    ts.toInstant.getEpochSecond

  /** value → DECIMAL(28,10) grid exactly like Spark's cast (shortest
    * decimal form, HALF_UP) so the exact accumulation matches
    * [[graft.functions.Stable.sumD]].
    */
  private def dec10(v: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(v)
      .setScale(10, java.math.RoundingMode.HALF_UP)

  /** `round(sum + 1e-9, 2)` with Spark's double-round semantics. */
  private def round2(sum: java.math.BigDecimal): Double =
    java.math.BigDecimal.valueOf(sum.doubleValue() + 1e-9)
      .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue()

  def sessions(uid: Long, it: Iterator[SessionEv]): Iterator[SessionRow] = {
    val evs = it.toArray.sortBy(e =>
      (epochSec(e.ts), e.ts.getNanos.toLong, e.event_id))
    val out = scala.collection.mutable.ArrayBuffer.empty[SessionRow]
    var seq = 0L
    var prevSec = Long.MinValue
    var n = 0L
    var start: java.sql.Timestamp = null
    var end: java.sql.Timestamp = null
    var acc = java.math.BigDecimal.ZERO
    def flush(): Unit = if (n > 0)
      out += SessionRow(uid, seq, n, start, end,
        epochSec(end) - epochSec(start), round2(acc))
    evs.foreach { e =>
      val sec = epochSec(e.ts)
      if (prevSec == Long.MinValue || sec - prevSec > 1800) {
        flush()
        seq += 1; n = 0; start = e.ts; acc = java.math.BigDecimal.ZERO
      }
      n += 1; end = e.ts; acc = acc.add(dec10(e.value)); prevSec = sec
    }
    flush()
    out.iterator
  }
}
