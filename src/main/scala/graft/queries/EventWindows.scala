package graft.queries

import graft.{GraftQuery, Tables}
import graft.Tables.dsum
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time windowing over the `events` table (SURVEY §7.2 M5):
  * tumbling windows, running aggregates, gap-based sessionization, and
  * JSON prop extraction. The Structured Streaming twins (watermarked
  * windowed aggs, session_window, flatMapGroupsWithState) are driven
  * by ScalaTest — these batch forms pin the semantics against DuckDB.
  *
  * events.ts is nanosecond-precision parquet; Spark truncates to
  * micros, so oracle-visible timestamps are only emitted after
  * date_trunc/time_bucket ≥ 1 minute, and gap math uses floor-seconds
  * on both engines.
  */
object EventWindows {

  /** Tumbling 1-hour windows via Spark's window() operator (struct
    * start/end), vs DuckDB time_bucket — same epoch alignment. */
  val qTumbling = GraftQuery(
    "w_tumbling_hourly",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n_events"),
             dsum($"value").as("total_value"))
        .select($"window.start".as("w_start"), $"event_type",
                $"n_events", $"total_value")
    },
    Some("""
      SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS w_start,
        event_type, COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
      FROM events
      GROUP BY w_start, event_type"""),
    bench = true)

  /** Sliding-window analog via two granularities: 15-minute buckets
    * rolled up per user per day (map-side partial aggs). */
  val qQuarterHour = GraftQuery(
    "w_quarter_hour_user",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy(window($"ts", "15 minutes").getField("start").as("w_start"),
                 $"user_id")
        .agg(count(lit(1)).as("n_events"))
    },
    Some("""
      SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP)) AS w_start,
        user_id, COUNT(*) AS n_events
      FROM events
      GROUP BY w_start, user_id"""))

  /** Per-user running aggregate ordered by event time (window
    * functions; sequential accumulation is identical both engines). */
  val qRunning = GraftQuery(
    "w_running_user_value",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy($"event_id".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d).select(
        $"event_id", $"user_id", $"event_type",
        round(sum($"value").over(w), 6).as("running_value"),
        count(lit(1)).over(w).as("running_n"),
        lag($"event_type", 1).over(
          Window.partitionBy($"user_id").orderBy($"event_id".asc))
          .as("prev_type"))
    },
    Some("""
      SELECT event_id, user_id, event_type,
        round(SUM(value) OVER (PARTITION BY user_id ORDER BY event_id ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_value,
        COUNT(*) OVER (PARTITION BY user_id ORDER BY event_id ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n,
        lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY event_id ASC) AS prev_type
      FROM events"""))

  /** Gap-based sessionization (30-minute inactivity): islands via
    * lag + cumulative sum of session starts, then per-session rollup.
    * Gap math on floor-seconds so ns-vs-µs truncation can't differ. */
  val qSessionize = GraftQuery(
    "w_sessionize_30m",
    (s, d) => {
      import s.implicits._
      val sec = unix_timestamp($"ts")
      val byUser = Window.partitionBy($"user_id").orderBy($"sec".asc, $"event_id".asc)
      val withGap = Tables.events(s, d)
        .select($"event_id", $"user_id", $"value", sec.as("sec"))
        .withColumn("is_new",
          when(lag($"sec", 1).over(byUser).isNull, 1)
            .when($"sec" - lag($"sec", 1).over(byUser) > 1800, 1)
            .otherwise(0))
        .withColumn("session_id",
          sum($"is_new").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      withGap.groupBy($"user_id", $"session_id")
        .agg(count(lit(1)).as("n_events"),
             min($"sec").as("session_start_sec"),
             max($"sec").as("session_end_sec"),
             dsum($"value").as("session_value"))
    },
    Some("""
      WITH e AS (
        SELECT event_id, user_id, value,
          CAST(floor(epoch(ts)) AS BIGINT) AS sec
        FROM events),
      g AS (
        SELECT *, CASE
            WHEN lag(sec, 1) OVER w IS NULL THEN 1
            WHEN sec - lag(sec, 1) OVER w > 1800 THEN 1
            ELSE 0 END AS is_new
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY sec ASC, event_id ASC)),
      s AS (
        SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY sec ASC, event_id ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM g)
      SELECT user_id, session_id, COUNT(*) AS n_events,
        min(sec) AS session_start_sec, max(sec) AS session_end_sec,
        CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS session_value
      FROM s GROUP BY user_id, session_id"""),
    bench = true)

  /** E13-adjacent: JSON prop extraction + daily rollup. */
  val qJsonProps = GraftQuery(
    "w_json_props_daily",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select(date_trunc("day", $"ts").as("day"), $"event_type",
          get_json_object($"props", "$.k").try_cast("long").as("k"))
        .groupBy($"day", $"event_type")
        .agg(count($"k").as("n_with_k"), sum($"k").as("sum_k"))
    },
    Some("""
      SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, event_type,
        COUNT(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
        CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      FROM events
      GROUP BY day, event_type"""))

  /** Variant twin of [[qJsonProps]]: the same daily prop rollup with
    * the JSON string parsed ONCE into Spark 4's binary `VariantType`
    * (`parse_json`) and fields read with `variant_get` — the modern
    * semi-structured path. At 100 TB the difference is material: a
    * corpus lands props as a variant column ONCE at ingest and every
    * downstream query does typed binary field reads instead of
    * re-tokenizing JSON text per access (get_json_object re-parses
    * the string for every extraction expression). Same oracle as the
    * string path; AnalyticsOpsSpec additionally pins the two engines'
    * row-level equality so the variant decode can never drift from
    * the string decode. */
  val qVariantProps = GraftQuery(
    "w_variant_props_daily",
    (s, d) => {
      import s.implicits._
      val k = try_variant_get(parse_json($"props"), "$.k", "long")
      Tables.events(s, d)
        .select(date_trunc("day", $"ts").as("day"), $"event_type",
          k.as("k"))
        .groupBy($"day", $"event_type")
        .agg(count($"k").as("n_with_k"), sum($"k").as("sum_k"))
    },
    Some("""
      SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, event_type,
        COUNT(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
        CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      FROM events
      GROUP BY day, event_type"""))

  /** As-of join semantics composed from built-ins (preference (a) of
    * the custom-operator ladder): each purchase event joined to the
    * user's most recent PRIOR view event. Instead of a range/as-of
    * join (quadratic or custom-operator territory), a single
    * carry-forward window — last(view_id) IGNORE NULLS over preceding
    * rows — resolves every purchase in one sort per user partition. */
  val qAsOfPriorView = GraftQuery(
    "w_asof_prior_view",
    (s, d) => {
      import s.implicits._
      val sec = unix_timestamp($"ts")
      val w = Window.partitionBy($"user_id")
        .orderBy($"sec".asc, $"event_id".asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .select($"event_id", $"user_id", $"event_type", sec.as("sec"))
        .withColumn("prior_view_id",
          last(when($"event_type" === "view", $"event_id"), ignoreNulls = true)
            .over(w))
        .filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"sec".as("purchase_sec"),
          $"prior_view_id")
    },
    Some("""
      WITH e AS (
        SELECT event_id, user_id, event_type,
          CAST(floor(epoch(ts)) AS BIGINT) AS sec
        FROM events),
      c AS (
        SELECT *, last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY sec ASC, event_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_view_id
        FROM e)
      SELECT event_id, user_id, sec AS purchase_sec, prior_view_id
      FROM c WHERE event_type = 'purchase'"""))

  /** Interval (range) join: purchase ⋈ views of the same user within
    * the preceding hour — the batch twin of the watermarked
    * stream-stream join (StreamStreamJoinSpec). Equi key on user
    * carries the join; the time range is a post-join band filter, so
    * the plan stays a hash/SMJ join, never a cross product. */
  val qIntervalJoin = GraftQuery(
    "w_interval_join_purchase_view",
    (s, d) => {
      import s.implicits._
      val e = Tables.events(s, d)
        .select($"event_id", $"user_id", $"event_type",
          unix_timestamp($"ts").as("sec"))
      val p = e.filter($"event_type" === "purchase")
        .select($"event_id".as("purchase_id"), $"user_id",
          $"sec".as("p_sec"))
      val v = e.filter($"event_type" === "view")
        .select($"event_id".as("view_id"), $"user_id".as("v_user"),
          $"sec".as("v_sec"))
      p.join(v, $"user_id" === $"v_user" &&
          $"v_sec" <= $"p_sec" && $"v_sec" >= $"p_sec" - 3600)
        .select($"purchase_id", $"user_id", $"view_id",
          ($"p_sec" - $"v_sec").as("gap_sec"))
    },
    Some("""
      WITH e AS (
        SELECT event_id, user_id, event_type,
          CAST(floor(epoch(ts)) AS BIGINT) AS sec
        FROM events)
      SELECT p.event_id AS purchase_id, p.user_id, v.event_id AS view_id,
        p.sec - v.sec AS gap_sec
      FROM e p JOIN e v
        ON p.user_id = v.user_id
       AND v.sec <= p.sec AND v.sec >= p.sec - 3600
      WHERE p.event_type = 'purchase' AND v.event_type = 'view'"""))

  /** Ordered funnel analysis: per user, how deep into
    * view → click-after-view → purchase-after-click the event stream
    * got (0 = no view). Each stage is a min-timestamp aggregate on
    * user_id conditioned on the prior stage's timestamp — three
    * hash-aggregates and three joins, ALL keyed on the large user_id
    * space, so parallelism scales with users (no window over a global
    * sort, no per-user collect). Timestamps never appear in the
    * output (micros-vs-nanos trap); only the reached stage does. */
  val qFunnel = GraftQuery(
    "w_funnel_stage",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).select($"user_id", $"event_type", $"ts")
      val v = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts").as("v_ts"))
      val c = ev.filter($"event_type" === "click")
        .join(v, "user_id").filter($"ts" >= $"v_ts")
        .groupBy($"user_id").agg(min($"ts").as("c_ts"))
      val p = ev.filter($"event_type" === "purchase")
        .join(c, "user_id").filter($"ts" >= $"c_ts")
        .groupBy($"user_id").agg(min($"ts").as("p_ts"))
      ev.select($"user_id").distinct()
        .join(v, Seq("user_id"), "left")
        .join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select($"user_id",
          when($"p_ts".isNotNull, 3)
            .when($"c_ts".isNotNull, 2)
            .when($"v_ts".isNotNull, 1)
            .otherwise(0).as("funnel_stage"))
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
      v AS (SELECT user_id, min(ts) AS v_ts FROM e
            WHERE event_type = 'view' GROUP BY 1),
      c AS (SELECT e.user_id, min(e.ts) AS c_ts FROM e
            JOIN v ON e.user_id = v.user_id AND e.ts >= v.v_ts
            WHERE e.event_type = 'click' GROUP BY 1),
      p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM e
            JOIN c ON e.user_id = c.user_id AND e.ts >= c.c_ts
            WHERE e.event_type = 'purchase' GROUP BY 1),
      u AS (SELECT DISTINCT user_id FROM e)
      SELECT u.user_id,
        CASE WHEN p.p_ts IS NOT NULL THEN 3
             WHEN c.c_ts IS NOT NULL THEN 2
             WHEN v.v_ts IS NOT NULL THEN 1
             ELSE 0 END AS funnel_stage
      FROM u
      LEFT JOIN v ON u.user_id = v.user_id
      LEFT JOIN c ON u.user_id = c.user_id
      LEFT JOIN p ON u.user_id = p.user_id"""))

  /** Weekly cohort retention — the engagement report every
    * product/training-data pipeline runs: users are grouped into
    * cohorts by the week of their first event; each later active week
    * counts toward that cohort's retention at its week offset.
    *
    * Scale shape: one distinct on (user_id, week) — the only
    * corpus-sized shuffle; the per-user first-week aggregate and the
    * cohort join are both keyed on user_id, so the exchange is
    * reused; the cohort×offset matrix is tiny (weeks², not users),
    * and the offset-0 base joins back broadcast. */
  val qRetentionCohorts = GraftQuery(
    "w_retention_cohorts",
    (s, d) => {
      import s.implicits._
      // cohort_week stays TimestampType end-to-end (parquet DATE vs
      // DuckDB DATE decode differently in the driver's compare)
      val weeks = Tables.events(s, d)
        .select($"user_id", date_trunc("week", $"ts").as("w"))
        .distinct()
      val cohorts = weeks.groupBy($"user_id").agg(min($"w").as("cohort_week"))
      val counts = weeks.join(cohorts, "user_id")
        .select($"cohort_week",
          (datediff($"w".cast("date"), $"cohort_week".cast("date")) / 7)
            .cast("int").as("week_offset"))
        .groupBy($"cohort_week", $"week_offset")
        .agg(count(lit(1)).as("n_users"))
      val base = counts.filter($"week_offset" === 0)
        .select($"cohort_week", $"n_users".as("cohort_size"))
      counts.join(broadcast(base), "cohort_week")
        .select($"cohort_week", $"week_offset", $"n_users",
          round($"n_users".cast("double") / $"cohort_size", 6).as("retention"))
    },
    Some("""
      WITH uw AS (
        SELECT DISTINCT user_id,
          date_trunc('week', CAST(ts AS TIMESTAMP)) AS w
        FROM events),
      c AS (SELECT user_id, min(w) AS cohort_week FROM uw GROUP BY 1),
      j AS (
        SELECT c.cohort_week,
          CAST(date_diff('day', CAST(c.cohort_week AS DATE),
                         CAST(uw.w AS DATE)) / 7 AS INT) AS week_offset
        FROM uw JOIN c USING (user_id)),
      n AS (SELECT cohort_week, week_offset, COUNT(*) AS n_users
            FROM j GROUP BY 1, 2),
      b AS (SELECT cohort_week, n_users AS cohort_size FROM n
            WHERE week_offset = 0)
      SELECT n.cohort_week, n.week_offset,
        CAST(n.n_users AS BIGINT) AS n_users,
        round(CAST(n.n_users AS DOUBLE) / b.cohort_size, 6) AS retention
      FROM n JOIN b USING (cohort_week)"""))

  /** Two-pass z-score outlier flagging per (user, event_type): pass 1
    * aggregates exact fixed-point moments — `value` quantized to 1e4
    * (two decimal places in the data, so lossless) makes n / Σq / Σq²
    * pure integer sums, associative and therefore partition-order-free
    * on both engines; pass 2 joins the moment table back by key and
    * computes z in double FROM those exact integers, so every float op
    * sees bit-identical inputs in a fixed order. Σq² rides a
    * DECIMAL(38,0) because bigint overflows around 4·10⁵ events/user
    * at this value range (DuckDB's SUM(BIGINT) widens to HUGEINT —
    * same exactness, different spelling).
    *
    * Scale shape: the moment table is keyed on (user_id, event_type) —
    * a key space that grows with the data — and the join back is a
    * same-key shuffle join AQE can plan either way; no global moment,
    * no driver-side stats, no window. Degenerate groups (zero
    * variance, e.g. n = 1) emit z = 0 by the same guard on both
    * engines; the variance guard compares the exact integers
    * (n·Σq² > Σq·Σq ⟺ population variance > 0) so float cancellation
    * can never flip it. */
  val qValueOutliers = GraftQuery(
    "w_value_outliers",
    (s, d) => {
      import s.implicits._
      val q = floor($"value" * 1e4 + 0.5).cast("long")
      val ev = Tables.events(s, d)
        .select($"event_id", $"user_id", $"event_type", q.as("q"))
      val moments = ev.groupBy($"user_id", $"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"q").as("s"),
          sum(($"q" * $"q").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .as("ss"))
      val dn = $"n".cast("double")
      val mean = $"s".cast("double") / dn
      val varp = $"ss".cast("double") / dn - mean * mean
      val z = round(($"q".cast("double") - mean) / sqrt(varp), 6)
      ev.join(moments, Seq("user_id", "event_type"))
        .select($"event_id", $"user_id", $"event_type",
          when($"n" * $"ss" > $"s".cast(
              org.apache.spark.sql.types.DecimalType(38, 0)) * $"s", z)
            .otherwise(0.0).as("z"),
          (when($"n" * $"ss" > $"s".cast(
              org.apache.spark.sql.types.DecimalType(38, 0)) * $"s", abs(z))
            .otherwise(0.0) > 3.0).as("is_outlier"))
    },
    Some("""
      WITH ev AS (
        SELECT event_id, user_id, event_type,
          CAST(floor(value * 1e4 + 0.5) AS BIGINT) AS q
        FROM events),
      m AS (
        SELECT user_id, event_type, COUNT(*) AS n,
          CAST(SUM(q) AS BIGINT) AS s, SUM(q * q) AS ss
        FROM ev GROUP BY 1, 2)
      SELECT ev.event_id, ev.user_id, ev.event_type,
        CASE WHEN n * ss > CAST(s AS HUGEINT) * s
          THEN round((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) / n) /
            sqrt(CAST(ss AS DOUBLE) / n -
              (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)), 6)
          ELSE 0.0 END AS z,
        CASE WHEN n * ss > CAST(s AS HUGEINT) * s
          THEN abs(round((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) / n) /
            sqrt(CAST(ss AS DOUBLE) / n -
              (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)), 6))
          ELSE 0.0 END > 3.0 AS is_outlier
      FROM ev JOIN m USING (user_id, event_type)"""))

  /** Trailing 1-hour RANGE-frame rollup per user — the time-based
    * sliding frame ([[qRunning]] is the rows-based one): every event
    * sees the sum/count of its user's events in the preceding hour
    * INCLUDING simultaneous ones (RANGE pulls in all rows tied on the
    * order key, so intra-second order can't matter — and the summed
    * value is quantized to an exact long, so neither can accumulation
    * order). Keyed on user_id: parallelism grows with users, the sort
    * is per-partition. The oracle spells the identical frame. */
  val qRolling1h = GraftQuery(
    "w_rolling_1h_user",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"sec")
        .rangeBetween(-3600L, 0L)
      Tables.events(s, d)
        .select($"event_id", $"user_id",
          unix_timestamp($"ts").as("sec"),
          floor($"value" * 1e4 + 0.5).cast("long").as("q"))
        .select($"event_id", $"user_id",
          (sum($"q").over(w).cast("double") / 1e4).as("rolling_value_1h"),
          count(lit(1)).over(w).as("rolling_n_1h"))
    },
    Some("""
      WITH ev AS (
        SELECT event_id, user_id,
          CAST(floor(epoch(ts)) AS BIGINT) AS sec,
          CAST(floor(value * 1e4 + 0.5) AS BIGINT) AS q
        FROM events)
      SELECT event_id, user_id,
        CAST(SUM(q) OVER w AS DOUBLE) / 1e4 AS rolling_value_1h,
        COUNT(*) OVER w AS rolling_n_1h
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY sec
                   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)"""))

  /** Fixed-bucket value histogram per event type — the distribution
    * report that pairs with the percentile queries: width_bucket over
    * a DECLARED range (0, 500, 25 buckets), so the histogram is one
    * map-side-partial hash aggregate with no data-dependent planning
    * (a quantile-based binning would need a stats pass first; the
    * fixed range is what monitoring dashboards pin anyway). DuckDB
    * has no width_bucket, so the oracle spells out Spark's exact
    * formula — floor((v−min)/(max−min)·n)+1 in that operation order,
    * with out-of-range values in the 0 / n+1 overflow buckets — so
    * the boundary doubles are bit-identical. */
  val qValueHistogram = GraftQuery(
    "w_value_histogram",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"event_type",
          width_bucket($"value", lit(0.0), lit(500.0), lit(25)).as("bucket"))
        .agg(count(lit(1)).as("n"),
          dsum($"value").as("sum_value"))
        .select($"event_type", $"bucket",
          round(lit(0.0) + ($"bucket" - 1) * 20.0, 6).as("bucket_lo"),
          $"n", $"sum_value")
    },
    Some("""
      WITH b AS (
        SELECT event_type, value,
          CASE WHEN value < 0.0 THEN 0
               WHEN value >= 500.0 THEN 26
               ELSE CAST(floor(value / 500.0 * 25) AS BIGINT) + 1
          END AS bucket
        FROM events)
      SELECT event_type, bucket,
        round((bucket - 1) * 20.0, 6) AS bucket_lo,
        COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
      FROM b
      GROUP BY event_type, bucket"""))

  /** Hopping (sliding) windows — 1-hour span every 15 minutes, the
    * overlapping-window semantics [[qTumbling]] can't express: every
    * event lands in exactly span/slide = 4 windows. Spark's
    * window(ts, '1 hour', '15 minutes') expands each row map-side
    * into its 4 member windows before ONE hash-aggregate — no
    * self-join of the event table against a window spine. The oracle
    * replays the same expansion arithmetically: the k-th containing
    * window starts at time_bucket(15 min, ts) − k·15 min, k ∈ 0..3
    * (both engines align window starts to the epoch, so containment
    * needs no extra filter). Fan-out is the fixed span/slide ratio —
    * a constant ×4 row multiplier at any corpus size, the standard
    * cost of hopping windows everywhere. */
  val qHopping = GraftQuery(
    "w_hopping_1h_15m",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy(window($"ts", "1 hour", "15 minutes"), $"event_type")
        .agg(count(lit(1)).as("n_events"),
             dsum($"value").as("total_value"))
        .select($"window.start".as("w_start"), $"event_type",
                $"n_events", $"total_value")
    },
    Some("""
      SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
               - k * INTERVAL '15 minutes' AS w_start,
        event_type, COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
      FROM events, (SELECT unnest(range(0, 4)) AS k) hops
      GROUP BY w_start, event_type"""))

  /** Time-series resample + forward fill — the gap-filling step every
    * downstream forecaster/dashboard needs before it can difference or
    * window a series: the hourly per-type rollup is joined onto a
    * DENSE hour spine (no missing hours), counts zero-fill, and the
    * last observed hourly total carries forward across gaps
    * (`last(..., ignoreNulls)` over the series order).
    *
    * Scale shape: the corpus-sized work is ONE hash-aggregate (the
    * hourly rollup). Everything after runs on the AGGREGATED series —
    * |hours| × |event types| rows, a size that grows with calendar
    * time and type cardinality, not data volume — so the forward-fill
    * window (partitioned by type, ordered by hour) never sees the
    * corpus. The spine derives from a 1-row min/max aggregate crossed
    * with the distinct type dim, both broadcast. Values stay in the
    * 1e4-quantized exact longs of [[qValueOutliers]] until the final
    * divide, so fill values are bit-identical cross-engine. */
  val qGapFill = GraftQuery(
    "w_gap_fill_hourly",
    (s, d) => {
      import s.implicits._
      val hr = expr("unix_timestamp(ts) div 3600L * 3600L")
      val hourly = Tables.events(s, d)
        .select(hr.as("hr"), $"event_type",
          floor($"value" * 1e4 + 0.5).cast("long").as("q"))
        .groupBy($"hr", $"event_type")
        .agg(count(lit(1)).as("n"), sum($"q").as("sq"))
        .localCheckpoint(true) // bounds + dim + the spine join read it
      val bounds = hourly.agg(min($"hr").as("mn"), max($"hr").as("mx"))
      val spine = bounds
        .select(explode(sequence($"mn", $"mx", lit(3600L))).as("hr"))
      val dim = hourly.select($"event_type").distinct()
      val w = Window.partitionBy($"event_type").orderBy($"hr")
      spine.crossJoin(broadcast(dim))
        .join(hourly, Seq("hr", "event_type"), "left")
        .select(timestamp_seconds($"hr").as("w_start"), $"event_type",
          coalesce($"n", lit(0L)).as("n_events"),
          (coalesce(last($"sq", ignoreNulls = true).over(w), lit(0L))
            .cast("double") / 1e4).as("ffill_value"),
          $"n".isNull.as("is_gap"))
    },
    Some("""
      WITH ev AS (
        SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 * 3600 AS hr,
          event_type, CAST(floor(value * 1e4 + 0.5) AS BIGINT) AS q
        FROM events),
      h AS (SELECT hr, event_type, COUNT(*) AS n, CAST(SUM(q) AS BIGINT) AS sq
            FROM ev GROUP BY 1, 2),
      b AS (SELECT min(hr) AS mn, max(hr) AS mx FROM h),
      spine AS (SELECT unnest(range(mn, mx + 3600, 3600)) AS hr FROM b),
      dim AS (SELECT DISTINCT event_type FROM ev),
      g AS (SELECT s.hr, dim.event_type, h.n, h.sq
            FROM spine s CROSS JOIN dim
            LEFT JOIN h ON h.hr = s.hr AND h.event_type = dim.event_type)
      SELECT make_timestamp(hr * 1000000) AS w_start, event_type,
        COALESCE(n, 0) AS n_events,
        CAST(COALESCE(last_value(sq IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY hr), 0) AS DOUBLE) / 1e4
          AS ffill_value,
        n IS NULL AS is_gap
      FROM g"""))

  /** Median/MAD robust outliers per event type — the heavy-tail twin
    * of [[qValueOutliers]]'s z-score: mean/stddev move with the very
    * outliers they're meant to flag, the median and the median
    * absolute deviation don't (50% breakdown point). Flag when
    * |q − med| > 3·1.4826·MAD, the standard consistency-scaled cut.
    *
    * Exact medians WITHOUT a corpus sort: both passes aggregate to the
    * VALUE-DISTRIBUTION table first — (event_type, q) → count — and
    * take the lower median by cumulative count over that table. The
    * only windows run over distinct quantized values per type, a space
    * bounded by the value range (≤ 5·10⁶ rows at 1e-4 quantization)
    * regardless of corpus size — the same aggregate-then-window shape
    * as t_nll_yield_curve, vs. the per-type corpus sort a naive
    * median() would plan over the 5-value type key. The outlier test
    * compares scaled integers (10⁴·|q−med| > 44478·MAD ⟺
    * |v−med| > 4.4478·MAD) so no float enters any comparison. */
  val qMadOutliers = GraftQuery(
    "w_mad_outliers",
    (s, d) => {
      import s.implicits._
      def lowerMedian(dist: org.apache.spark.sql.DataFrame,
          valCol: String): org.apache.spark.sql.DataFrame = {
        val w = Window.partitionBy($"event_type").orderBy(col(valCol))
        dist
          .withColumn("cum", sum($"cnt").over(w))
          .withColumn("tot", sum($"cnt").over(
            Window.partitionBy($"event_type")))
          .where($"cum" * 2 >= $"tot")
          .groupBy($"event_type").agg(min(col(valCol)).as("med"))
      }
      val ev = Tables.events(s, d)
        .select($"event_id", $"event_type",
          floor($"value" * 1e4 + 0.5).cast("long").as("q"))
        .localCheckpoint(true) // both median passes + the verdict read it
      val med = lowerMedian(
        ev.groupBy($"event_type", $"q").agg(count(lit(1)).as("cnt")), "q")
      val dev = ev.join(broadcast(med), "event_type")
        .select($"event_id", $"event_type", $"q", abs($"q" - $"med").as("dv"))
      val mad = lowerMedian(
        dev.groupBy($"event_type", $"dv").agg(count(lit(1)).as("cnt")), "dv")
        .withColumnRenamed("med", "mad")
      dev.join(broadcast(mad), "event_type")
        .join(broadcast(med), "event_type")
        .select($"event_id", $"event_type",
          round($"med".cast("double") / 1e4, 6).as("median"),
          round($"mad".cast("double") / 1e4, 6).as("mad"),
          ($"dv" * 10000L > $"mad" * 44478L).as("is_outlier"))
    },
    Some("""
      WITH ev AS (
        SELECT event_id, event_type,
          CAST(floor(value * 1e4 + 0.5) AS BIGINT) AS q
        FROM events),
      qd AS (SELECT event_type, q, COUNT(*) AS cnt FROM ev GROUP BY 1, 2),
      qc AS (SELECT event_type, q,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY q) AS cum,
               SUM(cnt) OVER (PARTITION BY event_type) AS tot
             FROM qd),
      med AS (SELECT event_type, min(q) AS med FROM qc
              WHERE cum * 2 >= tot GROUP BY event_type),
      dev AS (SELECT ev.event_id, ev.event_type, ev.q,
                abs(ev.q - med.med) AS dv
              FROM ev JOIN med USING (event_type)),
      dd AS (SELECT event_type, dv, COUNT(*) AS cnt FROM dev GROUP BY 1, 2),
      dc AS (SELECT event_type, dv,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY dv) AS cum,
               SUM(cnt) OVER (PARTITION BY event_type) AS tot
             FROM dd),
      mad AS (SELECT event_type, min(dv) AS mad FROM dc
              WHERE cum * 2 >= tot GROUP BY event_type)
      SELECT dev.event_id, dev.event_type,
        round(CAST(med.med AS DOUBLE) / 1e4, 6) AS median,
        round(CAST(mad.mad AS DOUBLE) / 1e4, 6) AS mad,
        dev.dv * 10000 > mad.mad * 44478 AS is_outlier
      FROM dev JOIN mad USING (event_type) JOIN med USING (event_type)"""))

  /** Hour-of-week seasonality profile per event type — the baseline
    * every anomaly detector and capacity planner needs before it can
    * call a spike "unusual": activity share per (type, hour-of-week)
    * cell. The hour-of-week index is pure integer epoch arithmetic
    * ((sec div 3600) mod 168 — slot 0 = Thursday 00:00 UTC, the epoch
    * origin's weekday), identical on both engines with no calendar
    * functions (Spark's dayofweek starts Sunday=1, DuckDB's Sunday=0 —
    * a classic cross-engine drift the epoch formulation sidesteps).
    * share_micro is exact integer fixed point; is_peak flags slots
    * above 2× the uniform share via an all-integer cross-multiply.
    *
    * Scale shape: ONE map-side-partial hash-aggregate over the corpus
    * onto the bounded (type × 168) key space; the per-type total rides
    * a window over that 840-row table, never the corpus. */
  val qSeasonal = GraftQuery(
    "w_seasonal_hourofweek",
    (s, d) => {
      import s.implicits._
      val cell = Tables.events(s, d)
        .select($"event_type",
          expr("(unix_timestamp(ts) div 3600L) % 168L").as("how"),
          $"value")
        .groupBy($"event_type", $"how")
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("total_value"))
      val w = Window.partitionBy($"event_type")
      cell
        .withColumn("n_type", sum($"n_events").over(w))
        .select($"event_type", $"how", $"n_events", $"total_value",
          expr("(n_events * 1000000) div n_type").as("share_micro"),
          ($"n_events" * 168L > $"n_type" * 2L).as("is_peak"))
    },
    Some("""
      WITH cell AS (
        SELECT event_type,
          (CAST(floor(epoch(ts)) AS BIGINT) // 3600) % 168 AS how,
          COUNT(*) AS n_events,
          CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2)
      SELECT event_type, how, CAST(n_events AS BIGINT) AS n_events,
        total_value,
        CAST((n_events * 1000000) //
          SUM(n_events) OVER (PARTITION BY event_type) AS BIGINT)
          AS share_micro,
        n_events * 168 > SUM(n_events) OVER (PARTITION BY event_type) * 2
          AS is_peak
      FROM cell"""))

  /** RFM feature table — the classic per-entity feature-engineering
    * rollup (recency / frequency / monetary) every churn or LTV model
    * starts from: days since last event, event count, exact total
    * value, an activity flag, and order-of-magnitude bands. "Now" is
    * the corpus max event time (broadcast 1-row aggregate), so the
    * table is deterministic and re-derivable. Bands are DIGIT COUNTS
    * (decimal order of magnitude) rather than data-dependent
    * quantiles: a quantile band would need a second stats pass and a
    * global rank; the magnitude band is map-side integer arithmetic
    * with identical semantics at any scale — and no float ever enters
    * (value stays in the 1e4-quantized exact longs).
    *
    * Scale shape: ONE user-keyed hash-aggregate over the corpus plus
    * a broadcast scalar; everything else is map-side expression work
    * on the user-sized table. */
  val qRfmFeatures = GraftQuery(
    "w_rfm_features",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select($"user_id", expr("CAST(floor(unix_timestamp(ts)) AS BIGINT)").as("sec"),
          floor($"value" * 1e4 + 0.5).cast("long").as("q"))
      val now = ev.agg(max($"sec").as("now"))
      ev.groupBy($"user_id")
        .agg(max($"sec").as("last_sec"), count(lit(1)).as("frequency"),
          sum($"q").as("monetary_q"))
        .crossJoin(broadcast(now))
        .select($"user_id",
          expr("(now - last_sec) div 86400").as("recency_days"),
          $"frequency",
          ($"monetary_q".cast("double") / 1e4).as("monetary"),
          (expr("(now - last_sec) div 86400") <= 30L).as("is_active"),
          length($"frequency".cast("string")).as("f_band"),
          length(greatest(expr("monetary_q div 10000"), lit(1L))
            .cast("string")).as("m_band"))
    },
    Some("""
      WITH ev AS (
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
          CAST(floor(value * 1e4 + 0.5) AS BIGINT) AS q
        FROM events),
      agg AS (
        SELECT user_id, max(sec) AS last_sec, COUNT(*) AS frequency,
          CAST(SUM(q) AS BIGINT) AS monetary_q
        FROM ev GROUP BY 1),
      n AS (SELECT max(sec) AS now FROM ev)
      SELECT user_id,
        (n.now - last_sec) // 86400 AS recency_days,
        frequency,
        CAST(monetary_q AS DOUBLE) / 1e4 AS monetary,
        (n.now - last_sec) // 86400 <= 30 AS is_active,
        CAST(length(CAST(frequency AS VARCHAR)) AS INT) AS f_band,
        CAST(length(CAST(greatest(monetary_q // 10000, 1) AS VARCHAR)) AS INT)
          AS m_band
      FROM agg, n"""))

  /** Behavioral transition matrix — the Markov-chain view of user
    * journeys ([[qFunnel]] checks ONE prescribed path; this measures
    * every observed one): consecutive event-type pairs per user,
    * rolled up to a (from, to) matrix with exact fixed-point
    * transition shares. The lag window is keyed on user_id (the house
    * window discipline — parallelism grows with users); the share
    * division runs over the |types|² matrix, and p_micro is integer
    * floor division so no float enters the output.
    *
    * Ties inside one second order by event_id on both engines, so the
    * pair sequence — and therefore every count — is deterministic. */
  val qEventTransitions = GraftQuery(
    "w_event_transitions",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"sec", $"event_id")
      val pairs = Tables.events(s, d)
        .select($"user_id", $"event_id",
          expr("CAST(floor(unix_timestamp(ts)) AS BIGINT)").as("sec"),
          $"event_type")
        .withColumn("prev", lag($"event_type", 1).over(w))
        .where($"prev".isNotNull)
        .select($"prev".as("from_type"), $"event_type".as("to_type"))
        .groupBy($"from_type", $"to_type")
        .agg(count(lit(1)).as("n"))
      val tot = pairs.groupBy($"from_type").agg(sum($"n").as("n_from"))
      pairs.join(tot, "from_type")
        .select($"from_type", $"to_type", $"n",
          expr("(n * 1000000) div n_from").as("p_micro"))
    },
    Some("""
      WITH seq AS (
        SELECT user_id, event_type,
          LAG(event_type) OVER (PARTITION BY user_id
            ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS prev
        FROM events),
      pairs AS (
        SELECT prev AS from_type, event_type AS to_type, COUNT(*) AS n
        FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
      tot AS (SELECT from_type, SUM(n) AS n_from FROM pairs GROUP BY 1)
      SELECT p.from_type, p.to_type, CAST(p.n AS BIGINT) AS n,
        CAST((p.n * 1000000) // t.n_from AS BIGINT) AS p_micro
      FROM pairs p JOIN tot t USING (from_type)"""))

  /** Audience-growth curve — per day, how many users are NEW (first
    * ever seen) and the cumulative distinct-user count to date. The
    * trick that makes exact running-distinct affordable at any scale:
    * cumulative distinct users through day D equals the count of
    * users whose FIRST-SEEN day ≤ D, so one min-per-user
    * hash-aggregate plus a per-day rollup replaces the running
    * COUNT(DISTINCT) a naive formulation would window over the whole
    * event log.
    *
    * Scale shape: one user-keyed hash-aggregate (min day per user,
    * map-side partials), one day-keyed count, and the cumulative
    * window runs over the DAY table only — bounded by the calendar,
    * not the corpus. */
  val qCumulativeUsers = GraftQuery(
    "w_cumulative_users",
    (s, d) => {
      import s.implicits._
      val firstSeen = Tables.events(s, d)
        .select($"user_id", date_trunc("day", $"ts").as("day"))
        .groupBy($"user_id").agg(min($"day").as("day"))
      val w = Window.orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      firstSeen.groupBy($"day").agg(count(lit(1)).as("new_users"))
        .select($"day", $"new_users",
          sum($"new_users").over(w).as("cum_users"))
    },
    Some("""
      WITH fs AS (
        SELECT user_id,
          min(date_trunc('day', CAST(ts AS TIMESTAMP))) AS day
        FROM events GROUP BY 1),
      nd AS (SELECT day, COUNT(*) AS new_users FROM fs GROUP BY 1)
      SELECT day, new_users,
        CAST(SUM(new_users) OVER (ORDER BY day
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
      FROM nd"""))

  /** Inter-arrival-time histogram — the traffic-shape diagnostic
    * (bot-vs-human cadence, retry storms, session pacing): per event
    * type, the distribution of seconds between a user's consecutive
    * events, in power-of-4 buckets (0s collapses to bucket 0, then
    * ⌊log₄⌋ bands: 1–3s, 4–15s, 16–63s, …) — log-banded because
    * inter-arrival times span six orders of magnitude and fixed-width
    * bins would put everything in one bin. Bucketing is pure integer
    * arithmetic (floor-seconds diff, then length of the base-4
    * digits; the band floor 4^(bucket-1) is an integer left shift by
    * 2·(bucket-1) bits), identical on both engines — no float
    * enters.
    *
    * Scale shape: the lag runs in a user-keyed window — a
    * high-cardinality partition key, so parallelism follows users
    * (the sanctioned w_running/w_sessionize shape, NOT a
    * low-cardinality straggler window) — and the rollup lands on the
    * (event_type × ~25 buckets) bounded key space. */
  val qInterarrivalHist = GraftQuery(
    "w_interarrival_hist",
    (s, d) => {
      import s.implicits._
      val byUser = Window.partitionBy($"user_id")
        .orderBy($"sec".asc, $"event_id".asc)
      val gaps = Tables.events(s, d)
        .select($"event_id", $"user_id", $"event_type",
          unix_timestamp($"ts").as("sec"))
        .withColumn("gap", $"sec" - lag($"sec", 1).over(byUser))
        .where($"gap".isNotNull)
      // bucket = number of base-4 digits of gap: 0 → 0, else
      // floor(log4(gap)) + 1 — computed by integer string length in
      // base 4 (conv), no float logarithm.
      gaps.select($"event_type",
          when($"gap" === 0, lit(0L))
            .otherwise(length(conv($"gap".cast("string"), 10, 4)).cast("long"))
            .as("bucket"))
        .groupBy($"event_type", $"bucket")
        .agg(count(lit(1)).as("n_gaps"))
        .select($"event_type", $"bucket",
          when($"bucket" === 0, lit(0L))
            .otherwise(expr("shiftleft(CAST(1 AS BIGINT), CAST(2 * (bucket - 1) AS INT))"))
            .as("gap_lo_sec"),
          $"n_gaps")
    },
    Some("""
      WITH e AS (
        SELECT event_id, user_id, event_type,
          CAST(floor(epoch(ts)) AS BIGINT) AS sec
        FROM events),
      g AS (
        SELECT event_type, sec - lag(sec, 1) OVER
          (PARTITION BY user_id ORDER BY sec ASC, event_id ASC) AS gap
        FROM e),
      b AS (
        SELECT event_type,
          CASE WHEN gap = 0 THEN 0
               ELSE CAST(length(to_base(gap, 4)) AS BIGINT) END AS bucket
        FROM g WHERE gap IS NOT NULL)
      SELECT event_type, bucket,
        CASE WHEN bucket = 0 THEN 0
             ELSE (CAST(1 AS BIGINT) << (2 * (bucket - 1))) END AS gap_lo_sec,
        COUNT(*) AS n_gaps
      FROM b GROUP BY 1, 2"""))

  /** CUSUM mean-shift drift monitor per event type — the classic
    * change-point screen a training-data pipeline runs on ingestion
    * volume (a feed silently halving or doubling shows up as a
    * sustained cumulative deviation long before any single hour looks
    * anomalous; MAD/z-score outlier queries catch spikes, CUSUM
    * catches DRIFT). Two-sided: per hour, the upward and downward
    * clamped cumulative sums of (deviation ∓ slack) with slack = 10%
    * of the type's mean hourly volume, flagged when the accumulated
    * drift exceeds one full mean-hour.
    *
    * The clamped recurrence C_h = max(0, C_{h−1} + x_h) looks
    * sequential, but is window-expressible exactly:
    * C_h = S_h − min(0, min_{j≤h} S_j) where S is the plain running
    * sum of x — one running sum + one running min per side, both in
    * the same window. All arithmetic is 1e6 integer fixed point
    * (integer div mean, exact sums — running |S| ≤ hours·maxN·10⁶ ≈
    * 10¹² here, overflow at ~10⁶× that), so both engines agree
    * bit-for-bit.
    *
    * Scale shape: the windows ride the (event_type × hours) BOUNDED
    * hourly bucket table (3,600 rows at sf0.01 — the t_ppl_buckets
    * tier-window discipline), never raw events; the raw scan is one
    * hash-aggregate with map-side partials, and the per-type means
    * are a broadcast. */
  val qCusumDrift = GraftQuery(
    "w_cusum_drift",
    (s, d) => {
      import s.implicits._
      val hourly = Tables.events(s, d)
        .groupBy(window($"ts", "1 hour").getField("start").as("w_start"),
          $"event_type")
        .agg(count(lit(1)).as("n"))
      val stats = hourly.groupBy($"event_type")
        .agg(expr("(sum(n) * 1000000) div count(1)").as("mu_fp"))
      val w = Window.partitionBy($"event_type").orderBy($"w_start".asc)
        .rowsBetween(Window.unboundedPreceding, 0)
      hourly.join(broadcast(stats), "event_type")
        .withColumn("d_fp", $"n" * 1000000L - $"mu_fp")
        .withColumn("slack_fp", expr("mu_fp div 10"))
        .withColumn("s_up", sum($"d_fp" - $"slack_fp").over(w))
        .withColumn("s_dn", sum(-$"d_fp" - $"slack_fp").over(w))
        .withColumn("cusum_up_fp",
          $"s_up" - least(min($"s_up").over(w), lit(0L)))
        .withColumn("cusum_dn_fp",
          $"s_dn" - least(min($"s_dn").over(w), lit(0L)))
        .select($"event_type", $"w_start", $"n".as("n_events"),
          $"cusum_up_fp", $"cusum_dn_fp",
          ($"cusum_up_fp" > $"mu_fp").as("drift_up"),
          ($"cusum_dn_fp" > $"mu_fp").as("drift_dn"))
    },
    Some("""
      WITH hourly AS (
        SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS w_start,
          event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2),
      st AS (
        SELECT event_type, (SUM(n) * 1000000) // COUNT(*) AS mu_fp
        FROM hourly GROUP BY 1),
      dv AS (
        SELECT h.event_type, w_start, n, mu_fp,
          n * 1000000 - mu_fp AS d_fp, mu_fp // 10 AS slack_fp
        FROM hourly h JOIN st USING (event_type)),
      su AS (
        SELECT *,
          SUM(d_fp - slack_fp) OVER (PARTITION BY event_type
            ORDER BY w_start ROWS UNBOUNDED PRECEDING) AS s_up,
          SUM(-d_fp - slack_fp) OVER (PARTITION BY event_type
            ORDER BY w_start ROWS UNBOUNDED PRECEDING) AS s_dn
        FROM dv),
      cu AS (
        SELECT *,
          s_up - LEAST(MIN(s_up) OVER (PARTITION BY event_type
            ORDER BY w_start ROWS UNBOUNDED PRECEDING), 0) AS cusum_up_fp,
          s_dn - LEAST(MIN(s_dn) OVER (PARTITION BY event_type
            ORDER BY w_start ROWS UNBOUNDED PRECEDING), 0) AS cusum_dn_fp
        FROM su)
      SELECT event_type, w_start, CAST(n AS BIGINT) AS n_events,
        CAST(cusum_up_fp AS BIGINT) AS cusum_up_fp,
        CAST(cusum_dn_fp AS BIGINT) AS cusum_dn_fp,
        cusum_up_fp > mu_fp AS drift_up,
        cusum_dn_fp > mu_fp AS drift_dn
      FROM cu"""))

  val all: Seq[GraftQuery] =
    Seq(qTumbling, qQuarterHour, qRunning, qSessionize, qJsonProps,
      qAsOfPriorView, qIntervalJoin, qFunnel, qRetentionCohorts,
      qValueOutliers, qVariantProps, qRolling1h, qValueHistogram,
      qHopping, qGapFill, qMadOutliers, qSeasonal, qRfmFeatures,
      qEventTransitions, qCumulativeUsers, qInterarrivalHist,
      qCusumDrift)
}
