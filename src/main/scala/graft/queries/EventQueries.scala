package graft.queries

import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.bronze.Quality
import graft.functions.Stable
import graft.operators.{BandJoin, Dedup, Upsert}
import graft.sources.Tables

/** The reference's bronze→silver event-pipeline operators (SURVEY.md §2a–§2c,
  * §2e, §2j) exercised over the `events` fixture table.
  */
object EventQueries {

  /** Single-pass DQ report (P1 null audit + A6 range stats + A7 duplicate
    * reconciliation — the reference runs one scan per column,
    * `03_bronze_processing.py:33-91`; this is ONE aggregation job).
    */
  val dqReport: QuerySpec = QuerySpec.sql(
    "q02_dq_report",
    s"""SELECT count(*) AS n_rows,
      |  count(DISTINCT event_id) AS distinct_event_id,
      |  count(*) - count(DISTINCT event_id) AS duplicate_count,
      |  round(min(value), 4) AS min_value,
      |  round(max(value), 4) AS max_value,
      |  ${Stable.avg4Sql("value")} AS avg_value,
      |  min(ts) AS min_ts, max(ts) AS max_ts,
      |  CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_id,
      |  CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_ts,
      |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user_id,
      |  CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_type,
      |  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value,
      |  CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props
      |FROM events""".stripMargin
  ) { (spark, dir) =>
    Quality.report(Tables.load(spark, dir, "events"),
      keyCol = "event_id", measureCol = "value", tsCol = "ts")
  }

  /** W1 dedup-keep-latest: `row_number() over (partition by key order by
    * ts desc) = 1` (`03_bronze_processing.py:102-109`), with a unique
    * tiebreaker for determinism.
    */
  val dedupLatest: QuerySpec = QuerySpec.sql(
    "q03_dedup_latest",
    """SELECT user_id, event_type, event_id AS last_event_id,
      |  ts AS last_ts, round(value, 2) AS last_value
      |FROM (SELECT *, row_number() OVER (
      |        PARTITION BY user_id, event_type
      |        ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin
  ) { (spark, dir) =>
    val ev = Tables.load(spark, dir, "events")
    Dedup.keepFirst(ev, Seq("user_id", "event_type"),
        Seq(col("ts").desc, col("event_id").desc))
      .select(col("user_id"), col("event_type"),
        col("event_id").as("last_event_id"), col("ts").as("last_ts"),
        round(col("value"), 2).as("last_value"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** P3 watermark CDC scan + P4 null-repair/clamp + §2h calendar projection
    * (`04_silver_transformation.py:33,69-84,170-182`). The watermark
    * predicate is pushed into the parquet scan by Catalyst.
    */
  val watermarkScan: QuerySpec = QuerySpec.sql(
    "q04_watermark_scan",
    """SELECT event_id, ts, user_id,
      |  CASE WHEN lower(event_type) IN ('click', 'view') THEN 'interaction'
      |       ELSE lower(event_type) END AS event_class,
      |  round(CASE WHEN value IS NULL THEN 0.0
      |             WHEN value < 0 THEN 0.0
      |             WHEN value > 300 THEN 300.0
      |             ELSE value END, 2) AS value_clean,
      |  CAST(hour(ts) AS BIGINT) AS hour_of_day,
      |  CAST(isodow(ts) - 1 AS BIGINT) AS day_of_week,
      |  CAST(day(ts) AS BIGINT) AS day_of_month,
      |  CAST(month(ts) AS BIGINT) AS month,
      |  CAST(quarter(ts) AS BIGINT) AS quarter,
      |  CAST(year(ts) AS BIGINT) AS year
      |FROM events
      |WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
      |ORDER BY event_id""".stripMargin
  ) { (spark, dir) =>
    // watermark predicate pushed into the parquet scan (coarse nanosecond
    // bound + exact residual — see Tables.loadEventsSince)
    val wm = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-15T00:00:00Z"))
    Tables.loadEventsSince(spark, dir, wm)
      .select(
        col("event_id"), col("ts"), col("user_id"),
        when(lower(col("event_type")).isin("click", "view"), "interaction")
          .otherwise(lower(col("event_type"))).as("event_class"),
        round(
          when(col("value").isNull, 0.0)
            .when(col("value") < 0, 0.0)
            .when(col("value") > 300, 300.0)
            .otherwise(col("value")), 2).as("value_clean"),
        hour(col("ts")).cast("long").as("hour_of_day"),
        weekday(col("ts")).cast("long").as("day_of_week"),
        dayofmonth(col("ts")).cast("long").as("day_of_month"),
        month(col("ts")).cast("long").as("month"),
        quarter(col("ts")).cast("long").as("quarter"),
        year(col("ts")).cast("long").as("year"))
      .orderBy(col("event_id"))
  }

  /** J1–J4 spatial-enrichment analog: broadcast θ-join of events against a
    * small banded dimension (overlapping bands), priority pick, left-anti
    * fallback to OTHER, unionByName (`04_silver_transformation.py:96-125`).
    */
  val bandEnrich: QuerySpec = QuerySpec.sql(
    "q05_band_enrich",
    """WITH bands(band_code, band_name, lo, hi, priority) AS (VALUES
      |    ('LOW', 'Low band', 0.0, 50.0, 2),
      |    ('MID', 'Mid band', 40.0, 120.0, 1),
      |    ('HIGH', 'High band', 100.0, 300.0, 3)),
      |matched AS (
      |  SELECT e.event_id, b.band_code, b.band_name, b.priority,
      |         e.value,
      |         row_number() OVER (PARTITION BY e.event_id
      |                            ORDER BY b.priority, b.band_code) AS rn
      |  FROM events e JOIN bands b
      |    ON e.value >= b.lo AND e.value <= b.hi)
      |SELECT event_id, band_code, band_name, CAST(priority AS INT) AS priority,
      |       round(value, 2) AS value
      |FROM matched WHERE rn = 1
      |UNION ALL
      |SELECT e.event_id, 'OTHER', 'Other', 99, round(e.value, 2)
      |FROM events e
      |WHERE NOT EXISTS (SELECT 1 FROM matched m WHERE m.event_id = e.event_id)
      |ORDER BY event_id""".stripMargin
  ) { (spark, dir) =>
    import spark.implicits._
    // project to the two columns the join/window need before shuffling
    val ev = Tables.load(spark, dir, "events").select(col("event_id"), col("value"))
    val bands = Seq(
      ("LOW", "Low band", 0.0, 50.0, 2),
      ("MID", "Mid band", 40.0, 120.0, 1),
      ("HIGH", "High band", 100.0, 300.0, 3))
      .toDF("band_code", "band_name", "lo", "hi", "priority")
    BandJoin.enrich(
        facts = ev,
        factKey = "event_id",
        dim = bands,
        joinCond = ev("value") >= bands("lo") && ev("value") <= bands("hi"),
        pickOrder = Seq(col("priority").asc, col("band_code").asc),
        fallback = Map(
          "band_code" -> lit("OTHER"),
          "band_name" -> lit("Other"),
          "priority" -> lit(99)))
      .select(col("event_id"), col("band_code"), col("band_name"),
        col("priority").cast("int").as("priority"),
        round(col("value"), 2).as("value"))
      .orderBy(col("event_id"))
  }

  /** S7 MERGE-upsert rewrite: latest-per-user snapshot before a cutoff,
    * upserted with the latest-per-user increment after it
    * (`04_silver_transformation.py:196-202` semantics, anti-join + union).
    */
  val mergeUpsert: QuerySpec = QuerySpec.sql(
    "q06_merge_upsert",
    """WITH latest_before AS (
      |  SELECT user_id, event_id AS last_event_id, ts AS last_ts,
      |         round(value, 2) AS last_value, event_type AS last_type
      |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
      |          ORDER BY ts DESC, event_id DESC) AS rn
      |        FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00')
      |  WHERE rn = 1),
      |latest_after AS (
      |  SELECT user_id, event_id AS last_event_id, ts AS last_ts,
      |         round(value, 2) AS last_value, event_type AS last_type
      |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
      |          ORDER BY ts DESC, event_id DESC) AS rn
      |        FROM events WHERE ts >= TIMESTAMP '2024-01-20 00:00:00')
      |  WHERE rn = 1)
      |SELECT * FROM latest_before b
      |WHERE NOT EXISTS (SELECT 1 FROM latest_after a WHERE a.user_id = b.user_id)
      |UNION ALL
      |SELECT * FROM latest_after
      |ORDER BY user_id""".stripMargin
  ) { (spark, dir) =>
    val ev = Tables.load(spark, dir, "events")
    val cutoff = lit("2024-01-20 00:00:00").cast("timestamp")
    def latestPerUser(df: org.apache.spark.sql.DataFrame) =
      Dedup.keepFirst(df, Seq("user_id"),
          Seq(col("ts").desc, col("event_id").desc))
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("ts").as("last_ts"), round(col("value"), 2).as("last_value"),
          col("event_type").as("last_type"))
    val target = latestPerUser(ev.filter(col("ts") < cutoff))
    val updates = latestPerUser(ev.filter(col("ts") >= cutoff))
    Upsert.upsert(target, updates, Seq("user_id"))
      .orderBy(col("user_id"))
  }

  /** A8/O1 groupBy-count distribution (`03_bronze_processing.py:133-136`). */
  val typeDistribution: QuerySpec = QuerySpec.sql(
    "q14_type_distribution",
    s"""SELECT event_type, count(*) AS n_events,
      |  ${Stable.avg4Sql("value")} AS avg_value
      |FROM events
      |GROUP BY event_type
      |ORDER BY n_events DESC, event_type""".stripMargin
  ) { (spark, dir) =>
    Tables.load(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Stable.avg4(col("value")).as("avg_value"))
      .orderBy(col("n_events").desc, col("event_type"))
  }

  /** Pivot: per-user-month event counts spread across event-type columns
    * (`groupBy().pivot(values)` with explicit values keeps the schema
    * static and the plan a single hash aggregate). The oracle mirrors via
    * conditional aggregation — identical output columns.
    */
  val typePivot: QuerySpec = QuerySpec.sql(
    "q40_type_pivot",
    """SELECT user_id, CAST(month(ts) AS BIGINT) AS month,
      |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
      |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
      |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
      |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
      |FROM events
      |GROUP BY user_id, month(ts)
      |ORDER BY user_id, month""".stripMargin
  ) { (spark, dir) =>
    Tables.load(spark, dir, "events")
      .groupBy(col("user_id"), month(col("ts")).cast("long").as("month"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      // absent (group, pivot-value) cells surface as NULL from the pivot
      // itself (they never pass through the aggregate)
      .na.fill(0L, Seq("click", "view", "purchase", "signup", "error"))
      .orderBy(col("user_id"), col("month"))
  }

  /** Deterministic train/val/test split assignment — the training-data
    * staple: a portable arithmetic hash of the stable key buckets rows
    * 80/10/10 reproducibly in ANY engine (no rand(), no engine-specific
    * hash), then per-split profiling.
    */
  val splitAssign: QuerySpec = QuerySpec.sql(
    "q41_split_assign",
    s"""WITH assigned AS (
      |  SELECT *, ((event_id % 1000003) * 2654435761) % 100 AS bucket
      |  FROM events)
      |SELECT CASE WHEN bucket < 80 THEN 'train'
      |            WHEN bucket < 90 THEN 'val'
      |            ELSE 'test' END AS split,
      |  count(*) AS n_events,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |  ${Stable.avg4Sql("value")} AS avg_value
      |FROM assigned
      |GROUP BY 1
      |ORDER BY split""".stripMargin
  ) { (spark, dir) =>
    Tables.load(spark, dir, "events")
      // pre-mod keeps the product under 2^63: a raw multiply overflows
      // for ids past ~3.5e9, where Spark wraps silently but DuckDB errors
      .withColumn("bucket", ((col("event_id") % 1000003L) * 2654435761L) % 100)
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        Stable.avg4(col("value")).as("avg_value"))
      .orderBy(col("split"))
  }

  /** Per-column null audit as ROWS via unpivot (`stack`) with the
    * reference's OK/WARNING banding at 5% (`03_bronze_processing.py:33-51`
    * prints this; here it is an assertable result set).
    */
  val dqUnpivot: QuerySpec = QuerySpec.sql(
    "q42_dq_unpivot",
    """WITH counts AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS event_id,
      |    CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ts,
      |    CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS user_id,
      |    CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS event_type,
      |    CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value
      |  FROM events),
      |long AS (
      |  SELECT 'event_id' AS column_name, event_id AS null_count, n FROM counts
      |  UNION ALL SELECT 'ts', ts, n FROM counts
      |  UNION ALL SELECT 'user_id', user_id, n FROM counts
      |  UNION ALL SELECT 'event_type', event_type, n FROM counts
      |  UNION ALL SELECT 'value', value, n FROM counts)
      |SELECT column_name, null_count,
      |  round(100.0 * null_count / n + 1e-9, 4) AS null_pct,
      |  CASE WHEN 100.0 * null_count / n > 5.0 THEN 'WARNING' ELSE 'OK' END AS status
      |FROM long
      |ORDER BY column_name""".stripMargin
  ) { (spark, dir) =>
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    val counts = Tables.load(spark, dir, "events").agg(
      count(lit(1)).as("n"),
      cols.map(c =>
        sum(when(col(c).isNull, 1).otherwise(0)).as(c)): _*)
    val stackExpr = cols.map(c => s"'$c', $c").mkString(", ")
    counts
      .select(col("n"), expr(
        s"stack(${cols.length}, $stackExpr) AS (column_name, null_count)"))
      .select(col("column_name"), col("null_count"),
        round(lit(100.0) * col("null_count") / col("n") + lit(1e-9), 4)
          .as("null_pct"),
        when(lit(100.0) * col("null_count") / col("n") > 5.0, "WARNING")
          .otherwise("OK").as("status"))
      .orderBy(col("column_name"))
  }

  /** Full MERGE with tombstones (q06 + WHEN MATCHED DELETE): the CDC-feed
    * shape. The post-cutoff change feed updates each user's snapshot row,
    * except users whose latest event is an `error` — those are tombstones
    * and the key vanishes ([[graft.operators.Upsert.merge]]).
    */
  val mergeTombstones: QuerySpec = QuerySpec.sql(
    "q60_merge_tombstones",
    """WITH latest_before AS (
      |  SELECT user_id, event_id AS last_event_id, ts AS last_ts,
      |         round(value, 2) AS last_value, event_type AS last_type
      |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
      |          ORDER BY ts DESC, event_id DESC) AS rn
      |        FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00')
      |  WHERE rn = 1),
      |latest_after AS (
      |  SELECT user_id, event_id AS last_event_id, ts AS last_ts,
      |         round(value, 2) AS last_value, event_type AS last_type
      |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
      |          ORDER BY ts DESC, event_id DESC) AS rn
      |        FROM events WHERE ts >= TIMESTAMP '2024-01-20 00:00:00')
      |  WHERE rn = 1)
      |SELECT * FROM latest_before b
      |WHERE NOT EXISTS (SELECT 1 FROM latest_after a WHERE a.user_id = b.user_id)
      |UNION ALL
      |SELECT * FROM latest_after WHERE last_type <> 'error'
      |ORDER BY user_id""".stripMargin
  ) { (spark, dir) =>
    val ev = Tables.load(spark, dir, "events")
    val cutoff = lit("2024-01-20 00:00:00").cast("timestamp")
    def latestPerUser(df: org.apache.spark.sql.DataFrame) =
      Dedup.keepFirst(df, Seq("user_id"),
          Seq(col("ts").desc, col("event_id").desc))
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("ts").as("last_ts"), round(col("value"), 2).as("last_value"),
          col("event_type").as("last_type"))
    val target = latestPerUser(ev.filter(col("ts") < cutoff))
    val feed = latestPerUser(ev.filter(col("ts") >= cutoff))
      .withColumn("deleted", col("last_type") === "error")
    Upsert.merge(target, feed, Seq("user_id"), "deleted")
      .orderBy(col("user_id"))
  }

  /** Incremental aggregate maintenance on the GATE surface: the fixture
    * is split into three time increments, each reduced to mergeable
    * per-group state ([[graft.operators.IncrementalAgg]] — count /
    * decimal sums / min / max), the states folded, and derived measures
    * computed at read time. The ORACLE is the direct one-shot
    * aggregation over all events — hash equality proves
    * fold-of-increments ≡ direct aggregation bit-for-bit, the property
    * that lets a 100 TB gold table absorb a daily increment without a
    * full rebuild (work per run tracks |increment| + |state|).
    */
  val incrementalGold: QuerySpec = QuerySpec.sql(
    "q72_incremental_gold",
    """WITH st AS (
      |  SELECT event_type,
      |    count(value) AS n_events,
      |    CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS s,
      |    CAST(sum(CAST(value * value AS DECIMAL(28,10))) AS DOUBLE) AS sq,
      |    min(value) AS min_value, max(value) AS max_value
      |  FROM events GROUP BY event_type)
      |SELECT event_type, n_events,
      |  round(s + 1e-9, 2) AS sum_value,
      |  round(s / n_events + 1e-6, 4) AS avg_value,
      |  round(CASE WHEN n_events > 1
      |             THEN sqrt(greatest((sq - s * s / n_events) / (n_events - 1), 0.0))
      |             ELSE 0.0 END + 1e-6, 4) AS stddev_value,
      |  min_value, max_value
      |FROM st
      |ORDER BY event_type""".stripMargin
  ) { (spark, dir) =>
    import graft.operators.IncrementalAgg
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_type"), col("ts"), col("value"))
    val t1 = lit(java.sql.Timestamp.valueOf("2024-01-11 00:00:00"))
    val t2 = lit(java.sql.Timestamp.valueOf("2024-01-21 00:00:00"))
    val state = Seq(
      ev.filter(col("ts") < t1),
      ev.filter(col("ts") >= t1 && col("ts") < t2),
      ev.filter(col("ts") >= t2))
      .map(d => IncrementalAgg.partialState(d, Seq("event_type"), "value"))
      .reduce((a, b) => IncrementalAgg.merge(a, b, Seq("event_type")))
    IncrementalAgg.finalized(state)
      .select(col("event_type"),
        col("state_cnt").as("n_events"),
        round(col("state_sum").cast("double") + lit(1e-9), 2).as("sum_value"),
        round(col("avg_value") + lit(1e-6), 4).as("avg_value"),
        round(col("stddev_value") + lit(1e-6), 4).as("stddev_value"),
        col("state_min").as("min_value"),
        col("state_max").as("max_value"))
      .orderBy(col("event_type"))
  }

  /** Array aggregation surfaced on the gate: the sorted distinct set of
    * high-value event types per user (`collect_set` → `array_sort` →
    * `array_join`), the capability behind per-entity feature vectors
    * (a training-data pipeline's "what behaviors has this user shown"
    * column). Emitted as a canonical comma-joined STRING so the
    * cross-engine hash compares element-order-deterministically —
    * `collect_set`'s internal order is partition-dependent and only the
    * sort makes it stable. One hash-aggregation shuffle on `user_id`;
    * set cardinality is bounded by the type vocabulary, so state per
    * group stays O(|vocab|) at any fact scale.
    */
  val typeSets: QuerySpec = QuerySpec.sql(
    "q74_type_sets",
    """SELECT user_id,
      |  count(DISTINCT event_type) AS n_types,
      |  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS type_set
      |FROM events WHERE value >= 90
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin
  ) { (spark, dir) =>
    // n_types is derived as size(set) rather than countDistinct: a
    // distinct-agg alongside collect_set plans TWO shuffle stages
    // (pre-dedup on (user, type), then re-agg on user), while the set
    // already carries the distinct count — one shuffle total.
    Tables.load(spark, dir, "events")
      .filter(col("value") >= 90)
      .groupBy(col("user_id"))
      .agg(array_sort(collect_set(col("event_type"))).as("types"))
      .select(col("user_id"),
        size(col("types")).cast("long").as("n_types"),
        array_join(col("types"), ",").as("type_set"))
      .orderBy(col("user_id"))
  }

  /** The watermark CDC LOOP itself, gate-checked through REAL state
    * ([[graft.state.WatermarkStore]] — §2j init/read/advance, previously
    * spec-only): three incremental pulls against a fresh store, each
    * reading `ts > stored watermark` up to its cutoff, then advancing
    * the persisted watermark and accumulating `records_processed`. The
    * oracle recomputes every pull's watermark and counts directly from
    * `events`, so the gate proves seed-default → incremental scan →
    * advance → accumulate end-to-end: batches chain exactly-once (each
    * row is processed by exactly one pull; totals telescope to the full
    * table). Driver-side loop over a 3-element cutoff list — the state
    * is one row, the scans are the distributed work, exactly the
    * reference's control-table shape.
    */
  val watermarkCdc: QuerySpec = QuerySpec.sql(
    "q97_watermark_cdc",
    """WITH c(pull, cutoff) AS (VALUES
      |  (1, TIMESTAMP '2024-01-11 00:00:00'),
      |  (2, TIMESTAMP '2024-01-21 00:00:00'),
      |  (3, TIMESTAMP '2024-02-01 00:00:00')),
      |b AS (
      |  SELECT c.pull,
      |    coalesce(max(e.ts), TIMESTAMP '2023-12-31 00:00:00')
      |      AS watermark_ts,
      |    count(e.ts) AS cum
      |  FROM c LEFT JOIN events e
      |    ON e.ts <= c.cutoff AND e.ts > TIMESTAMP '2023-12-31 00:00:00'
      |  GROUP BY c.pull)
      |SELECT pull, watermark_ts,
      |  CAST(cum - coalesce(lag(cum) OVER (ORDER BY pull), 0) AS BIGINT)
      |    AS n_batch,
      |  CAST(cum AS BIGINT) AS total_processed
      |FROM b ORDER BY pull""".stripMargin
  ) { (spark, dir) =>
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val store = new graft.state.WatermarkStore(spark,
      graft.Scratch.fresh("q97") + "/wm")
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    val default = ts("2023-12-31T00:00:00Z")
    val events = Tables.load(spark, dir, "events")
    val rows = Seq("2024-01-11T00:00:00Z", "2024-01-21T00:00:00Z",
      "2024-02-01T00:00:00Z").map(ts).zipWithIndex.map { case (cut, i) =>
      val wm = store.read("events", default)
      val agg = events.filter(col("ts") > wm && col("ts") <= cut)
        .agg(max(col("ts")).as("m"), count(col("ts")).as("n"))
        .collect().head
      val n = agg.getLong(1)
      val newWm =
        if (agg.isNullAt(0)) wm
        else graft.state.WatermarkStore.timestampAt(agg, 0)
      store.advance("events", "ts", newWm, n)
      val total = store.all().filter(col("table_name") === "events")
        .select("records_processed").collect().head.getLong(0)
      Row(i + 1, newWm, n, total)
    }
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(
        StructField("pull", IntegerType, nullable = false),
        StructField("watermark_ts", TimestampType, nullable = false),
        StructField("n_batch", LongType, nullable = false),
        StructField("total_processed", LongType, nullable = false))))
      .orderBy(col("pull"))
  }

  /** GeoJSON FeatureCollection flattening gate (§2a S2, previously
    * spec-only): deterministic FeatureCollection JSON documents are
    * BUILT from events in-query (one per user bucket, features carrying
    * id/time/mag/coordinates/... derived by exact integer arithmetic),
    * round-tripped through `to_json` → `from_json(
    * [[graft.sources.GeoJsonSource.featureCollectionSchema]])`, and
    * flattened by [[graft.sources.GeoJsonSource.flatten]] — the same
    * explode + nested projection + `timestamp_millis` + null-time drop
    * the real feed takes. The oracle computes the flat rows directly
    * from events: JSON round-trip of doubles is exact (shortest-repr
    * serialization), nulls are omitted-then-reparsed, and the feature
    * order inside a collection is irrelevant after the explode + total
    * ORDER BY. Collection assembly is one groupBy; the parse/flatten is
    * per-row executor work — the 100 TB shape of the ingestion path.
    */
  val geojsonRoundtrip: QuerySpec = QuerySpec.sql(
    "q98_geojson_flatten",
    """SELECT CAST(event_id AS VARCHAR) AS event_id,
      |  make_timestamp(epoch_ms(ts) * 1000) AS time,
      |  CAST(user_id % 180 - 90 AS DOUBLE) + 0.25 AS latitude,
      |  CAST(user_id % 360 - 180 AS DOUBLE) + 0.5 AS longitude,
      |  CAST(event_id % 700 AS DOUBLE) AS depth,
      |  value AS mag,
      |  event_type AS mag_type,
      |  CAST(user_id AS INT) AS nst,
      |  CAST(NULL AS DOUBLE) AS gap,
      |  CAST(NULL AS DOUBLE) AS dmin,
      |  CAST(NULL AS DOUBLE) AS rms,
      |  'gr' AS net,
      |  CAST(user_id % 10 AS VARCHAR) AS place,
      |  'earthquake' AS type,
      |  'automatic' AS status,
      |  CAST(NULL AS DOUBLE) AS horizontal_error,
      |  CAST(NULL AS DOUBLE) AS depth_error,
      |  CAST(NULL AS DOUBLE) AS mag_error
      |FROM events WHERE ts IS NOT NULL
      |ORDER BY event_id""".stripMargin
  ) { (spark, dir) =>
    import graft.sources.GeoJsonSource
    val feature = struct(
      col("event_id").cast("string").as("id"),
      struct(
        // epoch extraction needs session-zoned TIMESTAMP; the NTZ→ts
        // cast is value-preserving under the UTC session zone
        unix_millis(col("ts").cast("timestamp")).as("time"),
        col("value").as("mag"),
        col("event_type").as("magType"),
        col("user_id").as("nst"),
        lit(null).cast("double").as("gap"),
        lit(null).cast("double").as("dmin"),
        lit(null).cast("double").as("rms"),
        lit("gr").as("net"),
        (col("user_id") % 10).cast("string").as("place"),
        lit("earthquake").as("type"),
        lit("automatic").as("status"),
        lit(null).cast("double").as("horizontalError"),
        lit(null).cast("double").as("depthError"),
        lit(null).cast("double").as("magError")).as("properties"),
      struct(
        lit("Point").as("type"),
        array(
          (col("user_id") % 360 - 180).cast("double") + lit(0.5),
          (col("user_id") % 180 - 90).cast("double") + lit(0.25),
          (col("event_id") % 700).cast("double")).as("coordinates"))
        .as("geometry"))
    // collection size is bounded by CONSTRUCTION (≤256 features per
    // document via dense event_id ranges), not by a fixed bucket count —
    // a fixed modulus would grow each collected JSON string linearly
    // with the input until it hit the 2 GB string limit
    val docs = Tables.load(spark, dir, "events")
      .select(floor(col("event_id") / 256).as("bucket"), feature.as("f"))
      .groupBy(col("bucket"))
      .agg(collect_list(col("f")).as("features"))
      .select(to_json(struct(col("features"))).as("doc"))
    val parsed = docs
      .select(from_json(col("doc"),
        GeoJsonSource.featureCollectionSchema).as("fc"))
      .select(col("fc.features").as("features"))
    GeoJsonSource.flatten(parsed).orderBy(col("event_id"))
  }

  val all: Seq[QuerySpec] = Seq(
    dqReport, dedupLatest, watermarkScan, bandEnrich, mergeUpsert,
    typeDistribution, typePivot, splitAssign, dqUnpivot, mergeTombstones,
    incrementalGold, typeSets, watermarkCdc, geojsonRoundtrip)
}
