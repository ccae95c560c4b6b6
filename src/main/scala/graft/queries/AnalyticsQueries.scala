package graft.queries

import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.functions.Stable
import graft.sources.Tables

/** Remaining analytics operator families: set operations (§2g — the
  * reference only uses union), exact interpolated percentiles, and
  * semi-structured JSON extraction (§2h "array/map/json" — the events
  * `props` column).
  */
object AnalyticsQueries {

  /** INTERSECT / EXCEPT audience segmentation: users who clicked but
    * never purchased, and users who did both.
    */
  val setOps: QuerySpec = QuerySpec.sql(
    "q43_set_segments",
    """WITH clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
      |buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
      |SELECT 'click_no_purchase' AS segment, user_id
      |FROM (SELECT user_id FROM clickers EXCEPT SELECT user_id FROM buyers)
      |UNION ALL
      |SELECT 'click_and_purchase', user_id
      |FROM (SELECT user_id FROM clickers INTERSECT SELECT user_id FROM buyers)
      |ORDER BY segment, user_id""".stripMargin
  ) { (spark, dir) =>
    val ev = Tables.load(spark, dir, "events")
    def usersOf(t: String) =
      ev.filter(col("event_type") === t).select("user_id").distinct()
    val clickers = usersOf("click")
    val buyers = usersOf("purchase")
    clickers.except(buyers)
      .select(lit("click_no_purchase").as("segment"), col("user_id"))
      .unionByName(clickers.intersect(buyers)
        .select(lit("click_and_purchase").as("segment"), col("user_id")))
      .orderBy(col("segment"), col("user_id"))
  }

  /** Exact interpolated percentiles per group (Spark `percentile` and
    * DuckDB `quantile_cont` share the linear-interpolation definition;
    * `approx_percentile` is the documented sketch path at scale).
    */
  val percentiles: QuerySpec = QuerySpec.sql(
    "q44_value_percentiles",
    """SELECT event_type,
      |  round(quantile_cont(value, 0.5) + 1e-9, 4) AS p50,
      |  round(quantile_cont(value, 0.9) + 1e-9, 4) AS p90,
      |  round(quantile_cont(value, 0.99) + 1e-9, 4) AS p99,
      |  round(max(value), 2) AS p100
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin
  ) { (spark, dir) =>
    Tables.load(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        round(percentile(col("value"), lit(0.5)) + lit(1e-9), 4).as("p50"),
        round(percentile(col("value"), lit(0.9)) + lit(1e-9), 4).as("p90"),
        round(percentile(col("value"), lit(0.99)) + lit(1e-9), 4).as("p99"),
        round(max(col("value")), 2).as("p100"))
      .orderBy(col("event_type"))
  }

  /** JSON field extraction from the `props` payload column — the
    * semi-structured path (`get_json_object` is expression-level; no
    * driver-side parsing).
    */
  val jsonExtract: QuerySpec = QuerySpec.sql(
    "q45_json_extract",
    s"""SELECT CAST(json_extract_string(props, '$$.k') AS BIGINT) % 10 AS k_bucket,
      |  count(*) AS n_events,
      |  CAST(min(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS BIGINT) AS min_k,
      |  CAST(max(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS BIGINT) AS max_k,
      |  ${Stable.avg4Sql("value")} AS avg_value
      |FROM events
      |WHERE props IS NOT NULL
      |GROUP BY 1
      |ORDER BY k_bucket""".stripMargin
  ) { (spark, dir) =>
    // parse the JSON payload ONCE per row — referencing the extraction in
    // the group key and both aggregates would run three parses per row
    Tables.load(spark, dir, "events")
      .filter(col("props").isNotNull)
      .select(col("value"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy((col("k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n_events"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        Stable.avg4(col("value")).as("avg_value"))
      .orderBy(col("k_bucket"))
  }

  /** CUBE grouping sets with GROUPING() disambiguation (SURVEY §2d
    * noted grouping sets as a free Catalyst extension; q15 covers
    * ROLLUP, this covers the full lattice).
    */
  val cubeSummary: QuerySpec = QuerySpec.sql(
    "q47_cube_summary",
    s"""SELECT coalesce(event_type, 'ALL') AS event_type,
      |  CASE WHEN GROUPING(user_id % 10) = 1 THEN -1
      |       ELSE user_id % 10 END AS user_band,
      |  count(*) AS n_events,
      |  ${Stable.sum2Sql("value")} AS sum_value
      |FROM events
      |GROUP BY CUBE(event_type, user_id % 10)
      |ORDER BY event_type, user_band""".stripMargin
  ) { (spark, dir) =>
    Tables.load(spark, dir, "events")
      // materialize the band as a real column: grouping() resolves
      // against grouping ATTRIBUTES, not aliases minted inside cube()
      .withColumn("ub", col("user_id") % 10)
      .cube(col("event_type"), col("ub"))
      // grouping() only resolves inside the aggregate list
      .agg(grouping(col("ub")).as("gub"),
        count(lit(1)).as("n_events"),
        Stable.sum2(col("value")).as("sum_value"))
      .select(
        coalesce(col("event_type"), lit("ALL")).as("event_type"),
        when(col("gub") === 1, -1).otherwise(col("ub"))
          .cast("long").as("user_band"),
        col("n_events"), col("sum_value"))
      .orderBy(col("event_type"), col("user_band"))
  }

  /** RANGE window frame over event time: each event's trailing-1-hour
    * event count and value sum per user — RANGE (value-based bounds)
    * handles irregular event spacing where ROWS frames cannot.
    */
  val rangeFrame: QuerySpec = QuerySpec.sql(
    "q48_trailing_hour",
    """SELECT user_id, event_id, ts,
      |  CAST(count(*) OVER w AS BIGINT) AS events_last_hour,
      |  round(CAST(sum(CAST(value AS DECIMAL(28,10))) OVER w AS DOUBLE) + 1e-9, 2) AS value_last_hour
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts
      |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, ts, event_id""".stripMargin
  ) { (spark, dir) =>
    // interval RANGE frames are SQL-only in current Spark (the typed
    // rangeBetween takes long offsets); expr() carries the frame spec
    val frame = "PARTITION BY user_id ORDER BY ts " +
      "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW"
    Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        expr(s"count(*) OVER ($frame)").cast("long").as("events_last_hour"),
        // decimal-backed frame sum: within-frame addition order depends on
        // the sort's tie order, so double summation would be nondeterministic
        round(expr(s"sum(CAST(value AS DECIMAL(28,10))) OVER ($frame)")
          .cast("double") + lit(1e-9), 2)
          .as("value_last_hour"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Fuzzy string matching — edit-distance near-dup pairs within a
    * blocking key (brand × type), the classic fuzzy-dedup shape: block
    * first so the quadratic comparison runs per block, not per corpus —
    * block granularity IS the knob that bounds candidate volume at scale.
    */
  val fuzzyParts: QuerySpec = QuerySpec.sql(
    "q49_fuzzy_parts",
    """SELECT a.p_partkey AS id1, b.p_partkey AS id2,
      |  a.p_name AS name1, b.p_name AS name2,
      |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_distance
      |FROM part a JOIN part b
      |  ON a.p_brand = b.p_brand AND a.p_type = b.p_type
      |  AND a.p_partkey < b.p_partkey
      |  AND abs(length(a.p_name) - length(b.p_name)) <= 2
      |WHERE levenshtein(a.p_name, b.p_name) <= 2
      |ORDER BY id1, id2""".stripMargin
  ) { (spark, dir) =>
    val parts = Tables.load(spark, dir, "part")
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"))
    parts.as("a").join(parts.as("b"),
        col("a.p_brand") === col("b.p_brand") &&
          col("a.p_type") === col("b.p_type") &&
          col("a.p_partkey") < col("b.p_partkey") &&
          // necessary condition computed in O(1): edit distance is at
          // least the length difference, so the DP runs only on survivors
          // (the oracle carries the same implied conjunct)
          abs(length(col("a.p_name")) - length(col("b.p_name"))) <= 2 &&
          // thresholded variant runs a banded O(len*k) DP with early
          // exit; threshold = 2 (the cutoff itself) returns -1 above it,
          // so ONE `>= 0` compare replaces a two-sided bound — the DP
          // runs once per candidate here instead of twice
          levenshtein(col("a.p_name"), col("b.p_name"), 2) >= 0)
      .select(col("a.p_partkey").as("id1"), col("b.p_partkey").as("id2"),
        col("a.p_name").as("name1"), col("b.p_name").as("name2"),
        // exact for kept pairs: distance <= threshold
        levenshtein(col("a.p_name"), col("b.p_name"), 2).as("edit_distance"))
      .orderBy(col("id1"), col("id2"))
  }

  /** Date arithmetic: order-to-ship latency distribution per priority
    * (datediff / date_diff mirrored across engines).
    */
  val shipLatency: QuerySpec = QuerySpec.sql(
    "q50_ship_latency",
    s"""SELECT o_orderpriority,
      |  count(*) AS n_lines,
      |  CAST(min(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT) AS min_days,
      |  CAST(max(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT) AS max_days,
      |  ${Stable.avg4Sql("date_diff('day', o_orderdate, l_shipdate)")} AS avg_days,
      |  CAST(sum(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60 THEN 1 ELSE 0 END) AS BIGINT) AS late_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin
  ) { (spark, dir) =>
    val l = Tables.load(spark, dir, "lineitem")
    val o = Tables.load(spark, dir, "orders")
    val days = datediff(col("l_shipdate"), col("o_orderdate"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        min(days).cast("long").as("min_days"),
        max(days).cast("long").as("max_days"),
        Stable.avg4(days).as("avg_days"),
        sum(when(days > 60, 1).otherwise(0)).as("late_lines"))
      .orderBy(col("o_orderpriority"))
  }

  /** Declarative expectations report ([[graft.operators.Expectations]]):
    * four scalar constraints evaluated in ONE table scan (the
    * reference's DQ notebook re-scanned per column) plus a referential
    * FK rule as an anti-join count, unioned into one (expectation,
    * n_violations, total_rows, violation_rate) report. Null semantics
    * are SQL-standard in both engines: a NULL predicate is not a
    * violation unless an explicit not-null rule says so.
    */
  val expectations: QuerySpec = QuerySpec.sql(
    "q78_expectations",
    """WITH t AS (SELECT count(*) AS total_rows FROM lineitem),
      |v AS (
      |  SELECT 'discount_range' AS expectation,
      |    CAST(count(*) FILTER (WHERE NOT (l_discount BETWEEN 0 AND 0.1)) AS BIGINT) AS n_violations
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'price_positive',
      |    CAST(count(*) FILTER (WHERE NOT (l_extendedprice > 0)) AS BIGINT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'quantity_range',
      |    CAST(count(*) FILTER (WHERE NOT (l_quantity BETWEEN 1 AND 50)) AS BIGINT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'shipdate_not_null',
      |    CAST(count(*) FILTER (WHERE l_shipdate IS NULL) AS BIGINT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'orderkey_fk',
      |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
      |     LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      |     WHERE o.o_orderkey IS NULL))
      |SELECT expectation, n_violations, CAST(total_rows AS BIGINT) AS total_rows,
      |  round(CAST(n_violations AS DOUBLE) / total_rows + 1e-9, 6) AS violation_rate
      |FROM v, t
      |ORDER BY expectation""".stripMargin
  ) { (spark, dir) =>
    import graft.operators.Expectations
    import graft.operators.Expectations.Rule
    val li = Tables.load(spark, dir, "lineitem")
    val scalarRules = Seq(
      Rule("discount_range", col("l_discount").between(0, 0.1)),
      Rule("price_positive", col("l_extendedprice") > 0),
      Rule("quantity_range", col("l_quantity").between(1, 50)),
      Rule("shipdate_not_null", col("l_shipdate").isNotNull))
    val fk = li
      .join(Tables.load(spark, dir, "orders").select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("orderkey_fk").as("expectation"), col("n_violations"))
    Expectations.report(li, scalarRules)
      .unionByName(fk)
      .crossJoin(li.agg(count(lit(1)).as("total_rows")))
      .select(col("expectation"), col("n_violations"), col("total_rows"),
        round(col("n_violations").cast("double") / col("total_rows")
          + lit(1e-9), 6).as("violation_rate"))
      .orderBy(col("expectation"))
  }

  /** Per-brand least-squares fit + correlation of extended price vs
    * quantity, from decimal-exact moment sums (n, Σx, Σy, Σxx, Σyy,
    * Σxy): the `regr_slope`/`corr` family re-derived order-invariantly
    * — built-in `corr` accumulates doubles in merge-arrival order and
    * cannot hash-match across engines. One broadcast join (part is the
    * small dim) + one hash aggregation; the six moments are one partial
    * state, so scale cost equals a plain groupBy.
    */
  val regrStats: QuerySpec = {
    def sqlMoments(x: String, y: String) = Seq(
      s"count(*) AS n",
      s"${Stable.sumDSql(x)} AS sx", s"${Stable.sumDSql(y)} AS sy",
      s"${Stable.sumDSql(s"($x) * ($x)")} AS sxx",
      s"${Stable.sumDSql(s"($y) * ($y)")} AS syy",
      s"${Stable.sumDSql(s"($x) * ($y)")} AS sxy").mkString(",\n    ")
    QuerySpec.sql(
      "q79_regr_stats",
      s"""WITH m AS (
        |  SELECT p_brand,
        |    ${sqlMoments("l_quantity", "l_extendedprice")}
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand),
        |f AS (
        |  SELECT p_brand, n,
        |    (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
        |    (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
        |      AS intercept,
        |    (n * sxy - sx * sy)
        |      / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS r
        |  FROM m)
        |SELECT p_brand, CAST(n AS BIGINT) AS n_lines,
        |  round(slope + 1e-9, 6) AS slope,
        |  round(intercept + 1e-9, 6) AS intercept,
        |  round(r + 1e-9, 6) AS corr_qty_price
        |FROM f
        |ORDER BY p_brand""".stripMargin
    ) { (spark, dir) =>
      val x = col("l_quantity")
      val y = col("l_extendedprice")
      val m = Tables.load(spark, dir, "lineitem")
        .join(broadcast(Tables.load(spark, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).cast("double").as("n"),
          Stable.sumD(x).as("sx"), Stable.sumD(y).as("sy"),
          Stable.sumD(x * x).as("sxx"), Stable.sumD(y * y).as("syy"),
          Stable.sumD(x * y).as("sxy"))
      val cov = col("n") * col("sxy") - col("sx") * col("sy")
      val varX = col("n") * col("sxx") - col("sx") * col("sx")
      val varY = col("n") * col("syy") - col("sy") * col("sy")
      val slope = cov / varX
      m.select(col("p_brand"), col("n").cast("long").as("n_lines"),
          round(slope + lit(1e-9), 6).as("slope"),
          round((col("sy") - slope * col("sx")) / col("n") + lit(1e-9), 6)
            .as("intercept"),
          round(cov / (sqrt(varX) * sqrt(varY)) + lit(1e-9), 6)
            .as("corr_qty_price"))
        .orderBy(col("p_brand"))
    }
  }

  /** Positional value windows — `first_value` (default running frame),
    * `last_value` and `nth_value` (explicit full frame: the default
    * frame ends at CURRENT ROW, where last_value degenerates to the row
    * itself — the classic window gotcha, pinned here cross-engine).
    * Deterministic: the order key is (date, orderkey), a total order.
    */
  val valueWindows: QuerySpec = QuerySpec.sql(
    "q82_value_windows",
    """SELECT o_orderkey, o_custkey, o_totalprice,
      |  first_value(o_orderkey) OVER w1 AS first_order,
      |  last_value(o_orderkey) OVER w2 AS last_order,
      |  nth_value(o_orderkey, 2) OVER w2 AS second_order
      |FROM orders
      |WINDOW
      |  w1 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |  w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_orderkey""".stripMargin
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w1 = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val w2 = w1.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        first(col("o_orderkey")).over(w1).as("first_order"),
        last(col("o_orderkey")).over(w2).as("last_order"),
        nth_value(col("o_orderkey"), 2).over(w2).as("second_order"))
      .orderBy(col("o_orderkey"))
  }

  /** Write-Audit-Publish admission ([[graft.pipeline.Wap]]) — the
    * Iceberg-WAP / DLT-expectations lifecycle end-to-end through REAL
    * versioned state: a base slice publishes v0, a clean batch audits
    * and publishes v1, a poisoned batch (deterministically injected
    * negative prices) is REFUSED whole in fail-mode (served state
    * untouched — refused batches never become versions), then the same
    * batch re-admits in drop-mode: clean rows publish v2, violators
    * come back quarantined with their failed rule names. The output
    * aggregates the SERVED table (read back off the versioned store)
    * with the audit counts alongside — the oracle replays the rules and
    * the admission algebra (final state = v0 ∪ clean₁ ∪ clean₂), so
    * hash-equality proves both enforcement modes and that the refusal
    * left no trace in the read path.
    */
  val wapAdmission: QuerySpec = QuerySpec.sql(
    "q179_wap_publish",
    """WITH b AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    CASE WHEN o_orderkey % 3 = 2 AND o_orderkey % 7 = 0
      |         THEN -o_totalprice ELSE o_totalprice END AS o_totalprice
      |  FROM orders),
      |served AS (
      |  SELECT * FROM b
      |  WHERE o_orderkey % 3 IN (0, 1)
      |     OR (o_orderkey % 3 = 2 AND o_totalprice > 0)),
      |refused AS (
      |  SELECT CAST(count(*) AS BIGINT) AS refused_violations
      |  FROM b WHERE o_orderkey % 3 = 2 AND NOT (o_totalprice > 0))
      |SELECT o_orderpriority,
      |  CAST(count(*) AS BIGINT) AS n,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,10))) AS DOUBLE)
      |    + 1e-9, 2) AS sum_price,
      |  refused_violations,
      |  refused_violations AS dropped_rows
      |FROM served CROSS JOIN refused
      |GROUP BY o_orderpriority, refused_violations
      |ORDER BY o_orderpriority""".stripMargin
  ) { (spark, dir) =>
    import graft.operators.Expectations.Rule
    val rules = Seq(
      Rule("positive_price", col("o_totalprice") > 0),
      Rule("has_priority", col("o_orderpriority").isNotNull))
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        // poison the third slice deterministically (both engines replay)
        when(col("o_orderkey") % 3 === 2 && col("o_orderkey") % 7 === 0,
          -col("o_totalprice")).otherwise(col("o_totalprice"))
          .as("o_totalprice"))
      .transform(graft.CacheScope.cache)
    val table = graft.Scratch.fresh("q179") + "/wap_orders"
    graft.sources.Snapshots.write(
      orders.filter(col("o_orderkey") % 3 === 0), table) // v0
    val clean = graft.pipeline.Wap.publishOrRefuse(spark, table,
      orders.filter(col("o_orderkey") % 3 === 1), rules)
    require(clean.published.nonEmpty && clean.violations == 0L,
      "clean batch must publish")
    val poisoned = orders.filter(col("o_orderkey") % 3 === 2)
    val refused = graft.pipeline.Wap.publishOrRefuse(spark, table,
      poisoned, rules)
    require(refused.published.isEmpty, "poisoned batch must be refused")
    val (_, quarantined) = graft.pipeline.Wap.publishDropping(spark, table,
      poisoned, rules)
    val droppedRows = quarantined.count()
    graft.sources.Snapshots.read(spark, table)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(graft.functions.Stable.sumD(col("o_totalprice")) + lit(1e-9), 2)
          .as("sum_price"))
      .select(col("o_orderpriority"), col("n"), col("sum_price"),
        lit(refused.violations).as("refused_violations"),
        lit(droppedRows).as("dropped_rows"))
      .orderBy(col("o_orderpriority"))
  }

  val all: Seq[QuerySpec] = Seq(setOps, percentiles, jsonExtract,
    cubeSummary, rangeFrame, fuzzyParts, shipLatency, expectations,
    regrStats, valueWindows, wapAdmission)
}
