package graft.operators

import graft.{Q, Tables}
import graft.Core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch time-series surface over the `events` table: tumbling and
  * sliding windows, gap-based sessionization, and JSON extraction.
  * (The streaming lift of the same windows lives in
  * [[graft.streaming]]; these batch forms are the oracle-checkable
  * semantics.)
  *
  * The driver's events.parquet stores `ts` as a naive microsecond
  * parquet timestamp; [[load]] keeps `ets` as the session-UTC
  * TIMESTAMP and rebuilds the integer `ts` (epoch NANOSECONDS, an
  * exact ×1000 of the stored µs) that all downstream frame
  * arithmetic and the DuckDB oracles' `epoch_ns(ts)` compute with.
  * Window starts are emitted as formatted strings so
  * timestamp-encoding differences can never affect the compare.
  *
  * Scale posture: windowing is just `groupBy(bucket)` — a partial+
  * final HashAggregate keyed by (bucket, type); sessionization
  * shuffles once on user_id and sorts in-partition (user_id is
  * high-cardinality, so no task hot-spots).
  */
object Events {

  /** events with `ets` = TIMESTAMP (µs, UTC) and `ts` = epoch ns. */
  def load(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "events")
      .withColumn("ets", col("ts").cast("timestamp"))
      .withColumn("ts", epochNs(col("ets")))

  private def fmt(c: org.apache.spark.sql.Column) =
    date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Tumbling 1-hour windows per event_type via Spark's `window()`. */
  def tumblingHour(s: SparkSession, d: String): DataFrame =
    load(s, d)
      .groupBy(window(col("ets"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(fmt(col("w.start")).as("win_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("win_start", "event_type")

  /** Sliding windows: 1-hour length, 30-minute slide — each event
    * lands in 2 windows (epoch-aligned, like Structured Streaming). */
  def slidingWindows(s: SparkSession, d: String): DataFrame =
    load(s, d)
      .groupBy(window(col("ets"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(fmt(col("w.start")).as("win_start"), col("n"), col("sum_value"))
      .orderBy("win_start")

  /** The ONE spelling of the 30-minute-gap session-boundary
    * definition (shared by [[sessionize]] and [[topPaths]] so the
    * session semantics and their oracles can never diverge): lag()
    * marks session starts, a running sum numbers them. One shuffle
    * on user_id. */
  private def withSessionIds(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("gap_ns", col("ts") - lag("ts", 1).over(byUser))
      .withColumn("is_new",
        when(col("gap_ns").isNull || col("gap_ns") > lit(30L * 60 * 1000000000L), 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("is_new").over(run))
  }

  /** Gap-based sessionization (30-minute inactivity gap) per user:
    * mark session starts with lag(), number sessions with a running
    * sum, then aggregate per session. One shuffle on user_id. */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    withSessionIds(load(s, d))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        fmt(min("ets")).as("session_start"),
        fmt(max("ets")).as("session_end"))
      .orderBy("user_id", "session_id")
  }

  /** Gap sessionization via the custom WHOLE-OPERATOR extension
    * [[graft.plans.SessionAgg]] — the third A/B spelling of the same
    * query (vs the window formulation in [[sessionize]] and the
    * built-in `session_window` in [[sessionWindow]]): one streaming
    * fold over (user, ts)-sorted rows with O(1) state — no window
    * buffers, no (user, session) hash table; plan shape
    * Exchange → spillable Sort → SessionAgg (PlanSpec-pinned). Same
    * oracle as `events_sessionize`, so the custom operator's
    * semantics are hash-checked against DuckDB, not just eyeballed. */
  def sessionizeNative(s: SparkSession, d: String): DataFrame =
    graft.plans.SessionAgg(
      load(s, d).select(col("user_id"), col("ts")),
      "user_id", "ts", 30L * 60 * 1000000000L)
      .select(col("user_id"), col("session_id"), col("n_events"),
        // ns → µs must be INTEGER division: epoch-ns ≈ 1.7e18 exceeds
        // double's 53-bit mantissa, so a `/ 1000.0` detour would
        // corrupt the timestamp
        fmt(timestamp_micros(expr("start_ns DIV 1000"))).as("session_start"),
        fmt(timestamp_micros(expr("end_ns DIV 1000"))).as("session_end"))
      .orderBy("user_id", "session_id")

  /** Gap sessionization via the BUILT-IN `session_window` (dynamic
    * gap windows merged by the aggregation) — same semantics as the
    * window-function formulation in [[sessionize]], one shuffle on
    * (user, merged window). Works identically under Structured
    * Streaming, which is the point of using the built-in. */
  def sessionWindow(s: SparkSession, d: String): DataFrame =
    load(s, d)
      .groupBy(col("user_id"), session_window(col("ets"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), fmt(min("ets")).as("session_start"))
      .select(col("user_id"), col("session_start"), col("n_events"))
      .orderBy("user_id", "session_start")

  /** Exact interpolated percentiles (SQL `percentile`): identical
    * definition to DuckDB's `quantile_cont`, so values match
    * bit-for-bit — unlike approx sketches. Grouped medians stay
    * a partial+final aggregate. */
  def quantiles(s: SparkSession, d: String): DataFrame =
    load(s, d)
      .groupBy("event_type")
      .agg(
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.95)").as("p95"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  /** Ordered conversion funnel view → click → purchase: a user
    * counts for a stage only if the stage event happened STRICTLY
    * AFTER their entry into the previous stage. Three stacked
    * whole-partition window minima over the SAME partition key
    * (user_id) — one exchange, one sort, zero self-joins; each
    * stage's threshold is the previous window's result. Comparisons
    * run at microsecond precision (`ets`) on both engines. */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    load(s, d)
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("ets"))).over(byUser))
      .withColumn("t_click",
        min(when(col("event_type") === "click" && col("ets") > col("t_view"), col("ets")))
          .over(byUser))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" && col("ets") > col("t_click"), col("ets")))
          .over(byUser))
      .agg(
        countDistinct(when(col("t_view").isNotNull, col("user_id"))).as("view_users"),
        countDistinct(when(col("t_click").isNotNull, col("user_id"))).as("click_users"),
        countDistinct(when(col("t_purchase").isNotNull, col("user_id"))).as("purchase_users"))
  }

  /** Fixed-width histogram of `value`: bin = floor(value / 50) — a
    * plain partial+final aggregate keyed by the bin (no windowing,
    * no sort), the shape a 100 TB profiling pass wants. */
  def histogram(s: SparkSession, d: String): DataFrame =
    load(s, d)
      .groupBy(floor(col("value") / 50).as("bin"))
      .agg(
        count(lit(1)).as("n"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        dsum(col("value")).as("sum_value"))
      .orderBy("bin")

  /** z-score anomaly detection per event type, with PORTABLE
    * variance: `stddev()` over doubles is aggregation-order-dependent
    * and can never hash-match across engines, so mean and variance
    * are derived from EXACT decimal Σv and Σv² (2-decimal inputs →
    * 4-decimal squares, both exact), combined in double by one fixed
    * expression — deterministic at any parallelism. Two-pass shape: a
    * tiny per-type stats aggregate broadcasts back onto one event
    * scan (NOT a whole-partition window — |types| is small, so a
    * window would hot-spot its few partitions at 100 TB). */
  def anomalies(s: SparkSession, d: String): DataFrame = {
    val dv = col("value").cast("decimal(12,2)")
    val stats = load(s, d).groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(dv).as("s"), sum(dv * dv).as("ss"))
      .withColumn("mean", col("s").cast("double") / col("n"))
      .withColumn("varr",
        (col("ss").cast("double") - col("s").cast("double") * col("s").cast("double") / col("n"))
          / col("n"))
    load(s, d).join(broadcast(stats), "event_type")
      .withColumn("z", (col("value") - col("mean")) / sqrt(col("varr")))
      .groupBy("event_type")
      .agg(
        max("n").as("n"), max("mean").as("mean"),
        max(sqrt(col("varr"))).as("std"),
        sum(when(abs(col("z")) > 3, 1L).otherwise(0L)).as("n_anomalies"))
      .orderBy("event_type")
  }

  /** VALUE-range window frame (`RANGE BETWEEN ... PRECEDING`): per
    * event, activity in the user's trailing 30 minutes — the frame is
    * bounded by the ORDER-BY VALUE (nanosecond ts), not a row count,
    * so ties and irregular event spacing are handled by definition.
    * Pure integer frame bounds keep both engines' peer semantics
    * identical. One shuffle on user_id, in-partition sort — same
    * scale shape as every other window here. */
  def rangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts")
      .rangeBetween(-30L * 60 * 1000000000L, 0L)
    load(s, d)
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_30m"),
        sum(col("value").cast("decimal(12,2)")).over(w).cast("double").as("sum_30m"))
      .orderBy("event_id")
  }

  /** Cohort retention: users are cohorted by the hour of their first
    * event; each later active hour counts them at its offset. The
    * classic growth-analytics matrix, built from one window-min per
    * user (one shuffle on the high-cardinality user_id) plus the
    * (cohort, offset) distinct-user rollup. Hours are pure integer
    * arithmetic on the nanosecond timestamps (`ts div 3.6e12`) so
    * both engines bucket identically with no timezone/calendar
    * machinery in the hot path. */
  def retention(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    load(s, d)
      .withColumn("hr", expr("ts div 3600000000000"))
      .withColumn("cohort_hr", min("hr").over(byUser))
      .groupBy(col("cohort_hr"), (col("hr") - col("cohort_hr")).as("offset_hours"))
      .agg(countDistinct("user_id").as("n_users"))
      .select(
        fmt(timestamp_micros(col("cohort_hr") * 3600000000L)).as("cohort"),
        col("offset_hours"), col("n_users"))
      .orderBy("cohort", "offset_hours")
  }

  /** Session path analysis: the top-20 most common session-opening
    * event sequences (first 3 event types per session, in order) —
    * the product-analytics "what do users do first" query, and the
    * engine's order-SENSITIVE list aggregation surface (vs the
    * order-blind aggs everywhere else). Sessions come from the same
    * 30-minute-gap window pass as [[sessionize]]; each session's
    * path is built by sorting the collected (ts, event_id, type)
    * structs — deterministic under any partitioning because the sort
    * key is total. One shuffle on user_id, a rollup keyed by path
    * (cardinality ≤ |types|³), and a TakeOrdered top-20 — per-session
    * state is bounded by session length, never corpus size. */
  def topPaths(s: SparkSession, d: String): DataFrame = {
    withSessionIds(load(s, d))
      .groupBy("user_id", "session_id")
      .agg(array_join(
        transform(
          slice(sort_array(collect_list(
            struct(col("ts"), col("event_id"), col("event_type")))), 1, 3),
          x => x.getField("event_type")), ">").as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(desc("n_sessions"), col("path"))
      .limit(20)
  }

  /** Exact decile bucketing WITHOUT `ntile`: per event_type, the nine
    * interpolated decile boundaries come from one `percentile` agg
    * (the same definition [[quantiles]] already pins bit-equal to
    * DuckDB's quantile_cont), broadcast back onto the scan, and each
    * row's decile is simply how many boundaries sit strictly below
    * its value — a per-row array fold. `ntile(10) OVER (PARTITION BY
    * event_type ORDER BY value)` computes the same buckets but sorts
    * EVERY row through |types| window partitions — a handful of
    * hot tasks at 100 TB; the boundary-broadcast spelling is two
    * ordinary aggregates and never sorts the fact table. */
  def valueDeciles(s: SparkSession, d: String): DataFrame = {
    val qs = (1 to 9).map(i => s"0.$i").mkString(",")
    val bounds = load(s, d).groupBy("event_type")
      .agg(expr(s"percentile(value, array($qs))").as("bs"))
    load(s, d).join(broadcast(bounds), "event_type")
      .withColumn("decile",
        aggregate(col("bs"), lit(0),
          (acc, b) => acc + when(col("value") > b, 1).otherwise(0)))
      .groupBy("event_type", "decile")
      .agg(count(lit(1)).as("n"),
        min("value").as("min_value"), max("value").as("max_value"))
      .orderBy("event_type", "decile")
  }

  /** Time-series gap filling: the hourly per-type rollup re-densified
    * onto a gap-free hour spine, with missing hours carrying `n = 0`
    * and the last observed `sum_value` forward-filled. The dashboard/
    * feature-store shape ("every (type, hour) cell must exist").
    *
    * Scale posture: the expensive part — the hourly rollup — is one
    * partial+final HashAggregate over the raw events; everything after
    * runs on the ROLLUP (|types| × |hours| rows, millions at most even
    * for years of 100 TB telemetry). The spine is built DISTRIBUTED
    * with `sequence()+explode` per type (no driver-side range loop),
    * and the forward-fill window partitions by event_type over that
    * already-tiny frame — bounded by the time range, not corpus size,
    * so the low-cardinality partition key cannot hot-spot. */
  def gapfill(s: SparkSession, d: String): DataFrame = {
    val hourly = load(s, d)
      .withColumn("hr", expr("ts div 3600000000000"))
      .groupBy("event_type", "hr")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
    val spine = hourly.groupBy("event_type")
      .agg(min("hr").as("min_hr"), max("hr").as("max_hr"))
      .select(col("event_type"),
        explode(sequence(col("min_hr"), col("max_hr"))).as("hr"))
    val ffill = Window.partitionBy("event_type").orderBy("hr")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("event_type", "hr"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("filled_sum", last("sum_value", ignoreNulls = true).over(ffill))
      .select(col("event_type"),
        fmt(timestamp_micros(col("hr") * 3600000000L)).as("hr_start"),
        col("n"), col("filled_sum"))
      .orderBy("event_type", "hr_start")
  }

  /** Linear interpolation over the same dense hour spine as
    * [[gapfill]] — the third missing-value policy (zero-fill,
    * forward-fill, interpolate): a gap hour gets the value linearly
    * between its nearest observed neighbors; leading/trailing gaps
    * fall back to the single available neighbor. Four windows over
    * the SAME (event_type, hr) ordering — one exchange of the tiny
    * rollup-sized frame, reused by all four (two backward, two
    * forward). The interpolation arithmetic is one fixed IEEE
    * expression evaluated identically by both engines — no
    * accumulation, so no order sensitivity. */
  def interpolate(s: SparkSession, d: String): DataFrame = {
    val hourly = load(s, d)
      .withColumn("hr", expr("ts div 3600000000000"))
      .groupBy("event_type", "hr")
      .agg(dsum(col("value")).as("sum_value"))
    val spine = hourly.groupBy("event_type")
      .agg(min("hr").as("min_hr"), max("hr").as("max_hr"))
      .select(col("event_type"),
        explode(sequence(col("min_hr"), col("max_hr"))).as("hr"))
    val back = Window.partitionBy("event_type").orderBy("hr")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy("event_type").orderBy("hr")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsHr = when(col("sum_value").isNotNull, col("hr"))
    spine.join(hourly, Seq("event_type", "hr"), "left")
      .withColumn("pv", last("sum_value", ignoreNulls = true).over(back))
      .withColumn("ph", last(obsHr, ignoreNulls = true).over(back))
      .withColumn("nv", first("sum_value", ignoreNulls = true).over(fwd))
      .withColumn("nh", first(obsHr, ignoreNulls = true).over(fwd))
      .withColumn("value_interp",
        when(col("sum_value").isNotNull, col("sum_value"))
          .when(col("pv").isNotNull && col("nv").isNotNull,
            col("pv") + (col("nv") - col("pv")) *
              ((col("hr") - col("ph")).cast("double") /
                (col("nh") - col("ph")).cast("double")))
          .otherwise(coalesce(col("pv"), col("nv"))))
      .select(col("event_type"),
        fmt(timestamp_micros(col("hr") * 3600000000L)).as("hr_start"),
        col("sum_value").isNotNull.as("observed"),
        col("value_interp"))
      .orderBy("event_type", "hr_start")
  }

  /** JSON extraction from the `props` column + aggregation. */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    load(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        min("k").as("min_k"),
        max("k").as("max_k"),
        sum(col("k").cast("long")).as("sum_k"))
      .orderBy("event_type")

  /** [[jsonExtract]] through Spark 4's VARIANT type: `parse_json`
    * shreds the props string once into the binary variant encoding,
    * `variant_get` reads typed paths without re-parsing — the modern
    * semi-structured path (per-row parse cost paid once even when
    * many fields are read, and open-schema data needs no DDL). Same
    * aggregation and oracle as the string-path twin, so the two
    * spellings are pinned equal. */
  def variantExtract(s: SparkSession, d: String): DataFrame =
    load(s, d)
      .withColumn("v", parse_json(col("props")))
      .withColumn("k", expr("variant_get(v, '$.k', 'int')"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        min("k").as("min_k"),
        max("k").as("max_k"),
        sum(col("k").cast("long")).as("sum_k"))
      .orderBy("event_type")

  /** SCD2 (slowly-changing-dimension type 2) interval build: collapse
    * each user's event-type stream into state-change rows with
    * `[valid_from, valid_to)` validity; `valid_to` is null (and
    * `is_current` true) for the latest state. The classic dimension-
    * table maintenance query, as one plan: lag() marks type changes,
    * lead() over the surviving change rows closes each interval. Both
    * window passes partition by user_id, so the single exchange is
    * reused; user_id is high-cardinality — no task hot-spots. */
  def scd2(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val changes = load(s, d)
      .withColumn("prev", lag("event_type", 1).over(byUser))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
    changes
      .withColumn("next_ts", lead("ts", 1).over(byUser))
      .select(col("user_id"), col("event_type"),
        fmt(timestamp_micros(expr("ts div 1000"))).as("valid_from"),
        fmt(timestamp_micros(expr("next_ts div 1000"))).as("valid_to"),
        col("next_ts").isNull.as("is_current"))
      .orderBy("user_id", "valid_from", "event_type")
  }

  /** Shared by the string-path and VARIANT-path twins. */
  private val oJsonSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  min(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
      |  max(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
      |  CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Winsorization — the outlier-clipping cleanup a metrics pipeline
    * runs before aggregating heavy-tailed values: clip each value to
    * its group's exact [p05, p95] and account for the edit (clip
    * counts, boundaries, clipped sum).
    *
    * EXACT rank-based percentiles (percentile_disc semantics: the
    * smallest value whose cumulative count reaches ceil(q·n)),
    * computed WITHOUT a per-group row sort: counts collapse to the
    * (group, distinct value) table first, and the cumulative window
    * runs over that vocabulary — at 100 TB the window sorts distinct
    * values per group, never events. Boundary selection and clipping
    * are pure comparisons, so the boundary doubles pass through
    * bit-identical to the oracle; the clipped sum uses the exact
    * decimal spelling. (The sketch-based scale alternative is
    * already covered by `sketch_approx_quantiles`.) */
  def winsorize(s: SparkSession, d: String): DataFrame = {
    val e = Tables(s, d, "events")
    val vc = e.groupBy(col("event_type"), col("value"))
      .agg(count(lit(1)).as("c"))
    val cum = vc.withColumn("cum",
      sum(col("c")).over(Window.partitionBy("event_type").orderBy("value")))
    // ceil(q·n) in exact integer math: ceil(n/20), ceil(19n/20)
    val ks = vc.groupBy("event_type").agg(sum(col("c")).as("n"))
      .select(col("event_type"), col("n"),
        ((col("n") + 19) / 20).cast("long").as("k_lo"),
        ((col("n") * 19 + 19) / 20).cast("long").as("k_hi"))
    val bounds = cum.join(ks, "event_type")
      .groupBy("event_type")
      .agg(min(when(col("cum") >= col("k_lo"), col("value"))).as("p05"),
        min(when(col("cum") >= col("k_hi"), col("value"))).as("p95"))
    e.join(bounds, "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum((col("value") < col("p05")).cast("long")).as("n_low"),
        sum((col("value") > col("p95")).cast("long")).as("n_high"),
        min(col("p05")).as("p05"), min(col("p95")).as("p95"),
        dsum(least(greatest(col("value"), col("p05")), col("p95")))
          .as("sum_winsorized"))
      .orderBy("event_type")
  }

  /** EXACT trailing-7-day distinct active users per observed day —
    * the rolling-retention headline metric. Sliding-window DISTINCT
    * cannot ride a window frame (distinct doesn't decompose), and the
    * naive per-day self-join rescans six days of raw events per day;
    * instead each distinct (user, day) pair is exploded to the ≤ 7
    * target days it can serve (the interval-contribution spelling —
    * a fixed ×7 fan-out of the DEDUPLICATED pair table, not of raw
    * events), then `countDistinct` per target day.
    *
    * Scale posture: the pre-explode `.distinct()` collapses raw
    * events to |user × day| pairs first (partial+final agg), so the
    * fan-out rides the small table. `countDistinct(day, user)`
    * expands to a two-stage plan — dedupe shuffled on (day, user),
    * THEN count shuffled on day — so low-cardinality day groups
    * never serialize through single tasks. The inner join back to
    * per-day counts drops phantom target days past the last observed
    * day. */
  def rollingDistinct(s: SparkSession, d: String): DataFrame = {
    // integral `div`, not `/`: long/long is DOUBLE division in Spark
    // and epoch-ns exceeds 2^53, so a midnight-exact timestamp could
    // round across the day boundary
    val NsPerDay = 86400L * 1000000000L
    rollingFromPairs(cached(load(s, d)
      .select(col("user_id"), expr(s"ts div $NsPerDay").as("day"))
      .distinct()))
  }

  /** The rolling report from the distinct (user_id, day) pair table —
    * shared by [[rollingDistinct]] and the streaming maintenance twin
    * (`stream_rolling_distinct`): the pair table is a SET, the state
    * a stream can maintain with plain union+distinct (idempotent
    * under any redelivery — the KMV discipline, free of the additive
    * state's batch-keying needs). */
  private[graft] def rollingFromPairs(ud: DataFrame): DataFrame = {
    val daily = ud.groupBy("day")
      .agg(countDistinct("user_id").as("n_users_1d"))
    val rolling = ud
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + 6)).as("day"))
      .groupBy("day")
      .agg(countDistinct("user_id").as("n_users_7d"))
    daily.join(rolling, "day")
      .select("day", "n_users_1d", "n_users_7d")
      .orderBy("day")
  }

  /** `events_rolling_distinct`'s oracle — shared verbatim by the
    * streaming twin, whose set state folds to the same pair table. */
  private[graft] val oRollingSql: String =
    """WITH ud AS MATERIALIZED (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
      |roll AS (
      |  SELECT day + g AS day, user_id
      |  FROM (SELECT user_id, day, unnest(generate_series(0, 6)) AS g FROM ud)),
      |r7 AS (SELECT day, COUNT(DISTINCT user_id) AS n_users_7d FROM roll GROUP BY day),
      |r1 AS (SELECT day, COUNT(DISTINCT user_id) AS n_users_1d FROM ud GROUP BY day)
      |SELECT r1.day, n_users_1d, n_users_7d
      |FROM r1 JOIN r7 ON r1.day = r7.day ORDER BY r1.day""".stripMargin

  /** Day-of-week × hour-of-day seasonal baseline + the cells that
    * deviate most from it — the seasonality-aware alarm
    * `events_anomaly`'s flat z-score misses (a quiet Sunday 3 am is
    * NORMAL; the same count Tuesday noon is an outage). Everything
    * stays exact integers: dow = (day+4) mod 7 (pure arithmetic from
    * epoch days — no calendar functions to diverge on), the baseline
    * comparison cross-multiplies instead of dividing
    * (|c·n_days − total| as bigint), and only the report's
    * convenience ratio is a double.
    *
    * Scale posture: one events scan → (type, day, hour) partial+final
    * agg; the (type, dow, hour) baseline is ≤ |types|·168 rows and
    * joins back broadcast; top-20 is a TakeOrdered. */
  def seasonalBaseline(s: SparkSession, d: String): DataFrame = {
    val NsPerDay = 86400L * 1000000000L
    val NsPerHour = 3600L * 1000000000L
    val cells = cached(load(s, d)
      .select(col("event_type"),
        expr(s"ts div $NsPerDay").as("day"),
        expr(s"(ts div $NsPerHour) % 24").as("hr"))
      .groupBy("event_type", "day", "hr")
      .agg(count(lit(1)).as("c"))
      .withColumn("dow", pmod(col("day") + 4, lit(7))))
    val nDays = cells.select("day", "dow").distinct()
      .groupBy("dow").agg(count(lit(1)).as("n_days"))
    val base = cells.groupBy("event_type", "dow", "hr")
      .agg(sum("c").as("total"))
    cells
      .join(broadcast(base), Seq("event_type", "dow", "hr"))
      .join(broadcast(nDays), Seq("dow"))
      .withColumn("dev", abs(col("c") * col("n_days") - col("total")))
      .select(col("event_type"), col("day"), col("dow"), col("hr"),
        col("c"), col("total"), col("n_days"), col("dev"),
        (col("c").cast("double") * col("n_days").cast("double") /
          col("total").cast("double")).as("lift"))
      .orderBy(col("dev").desc, col("event_type"), col("day"), col("hr"))
      .limit(20)
  }

  /** First-order Markov transition matrix over each user's event
    * stream — the sequence-model summary a next-event predictor or a
    * funnel-defect hunt starts from: P(next = b | current = a) with
    * EXACT integer counts and one double division. The successor
    * comes from `lead()` over the (ts, event_id) total order per
    * user — deterministic under any partitioning — and the
    * per-source normalizer is a plain partial+final agg joined back
    * (|types| rows, broadcast).
    *
    * Scale: one shuffle on user_id (high-cardinality, no hot spots)
    * for the lead window; the pair tally is ≤ |types|² rows. */
  def transitionMatrix(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = load(s, d)
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("type_from"),
        col("next_type").as("type_to"))
      .agg(count(lit(1)).as("n"))
    val fromTot = pairs.groupBy("type_from").agg(sum("n").as("n_from"))
    pairs.join(broadcast(fromTot), "type_from")
      .select(col("type_from"), col("type_to"), col("n"), col("n_from"),
        (col("n").cast("double") / col("n_from").cast("double")).as("p"))
      .orderBy("type_from", "type_to")
  }

  /** Power-iteration rounds for [[markovStationary]], shared with its
    * unrolled oracle. Fixed (not convergence-gated) so replay parity
    * is exact; 4 rounds mix a handful-of-states chain to ~stationary. */
  private[graft] val MarkovRounds = 4
  private val MkScale = 1000000000L // probability mass in integer micro-units

  /** STATIONARY distribution of the event-type Markov chain — where
    * [[transitionMatrix]] reports one-step behavior, this answers the
    * long-run question ("what share of a user's journey is spent in
    * each state?") by [[MarkovRounds]] power-iteration rounds
    * π·P, π·P², … ENTIRELY in integer micro-units (the
    * `text_pagerank` trajectory idiom): each edge's mass transfer is
    * `(π(from)·n) div n_from`, a floor division BEFORE the sum, so
    * every round is a sum of longs — order-independent, hash-exact —
    * where a float π could never replay across engines. The state
    * space is every type seen on either side, with SINK states (no
    * out-edges) given a probability-1 self-loop — the standard
    * absorbing-state treatment that keeps P row-stochastic over the
    * full space, so mass is conserved within floor loss on ANY
    * chain shape (dropping sink-bound edges instead is not a
    * fixpoint: a state feeding only sinks would leak all its mass).
    *
    * Scale: the chain is |event types|² cells built from one
    * lead-window scan; each round is a cells⋈π join over ≤ |types|
    * rows. The one `.count()` is loop-control reading a 1-row frame
    * (the CC/BPE precedent). π(from)·n headroom: π ≤ 10⁹ micro-units
    * and n ≤ 9.2×10⁹ keeps the product in long to ~10¹⁹-transition
    * corpora; past that the cell counts (not the corpus) would ride
    * decimal(38,0). */
  def markovStationary(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    stationaryFromPairs(load(s, d)
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("tf"), col("next_type").as("tt"))
      .agg(count(lit(1)).as("n")))
  }

  /** The power iteration from a (tf, tt, n) transition-count table —
    * shared by [[markovStationary]] and the streaming maintenance
    * twin (`stream_markov_stationary`), whose folded state is
    * exactly this table. */
  def stationaryFromPairs(pairs0: DataFrame): DataFrame = {
    val pairs = cached(pairs0)
    // state space = every type seen on EITHER side; sink states (no
    // out-edges) get a probability-1 self-loop. Dropping sink-bound
    // edges instead is NOT a fixpoint (a state whose every out-edge
    // targets a sink would keep pi rows but no trans rows and its
    // mass would vanish); the self-loop keeps P row-stochastic over
    // the full space, so mass is conserved within floor loss on ANY
    // chain shape.
    val states = cached(pairs.select(col("tf").as("t"))
      .unionAll(pairs.select(col("tt").as("t"))).distinct())
    val sinks = states.join(pairs.select(col("tf").as("t")), Seq("t"), "left_anti")
      .select(col("t").as("tf"), col("t").as("tt"), lit(1L).as("n"))
    val all = pairs.unionByName(sinks)
    val nf = all.groupBy("tf").agg(sum("n").as("nf"))
    val trans = cached(all.join(nf, "tf"))
    val k = states.count() // 1-row loop-control read
    var pi = states.select(col("t"), lit(MkScale / k).as("pi"))
    for (_ <- 1 to MarkovRounds) {
      pi = trans.join(pi.toDF("tf", "pi"), "tf")
        .select(col("tt").as("t"), expr("(pi * n) div nf").as("c"))
        .groupBy("t").agg(sum("c").as("pi"))
    }
    states.join(pi, Seq("t"), "left")
      .select(col("t").as("event_type"),
        coalesce(col("pi"), lit(0L)).as("pi_micro"))
      .orderBy("event_type")
  }

  /** CUSUM drift detection over the daily event series — the
    * changepoint alarm that catches SUSTAINED small shifts the
    * per-point detectors miss (`events_anomaly`'s z-score needs one
    * big spike; `events_seasonal_baseline` needs a cell out of
    * profile; CUSUM accumulates evidence). Spelled through the
    * prefix-sum identity instead of the textbook recursion:
    * S_t = max(0, S_{t−1} + (x_t − k)) equals P_t − min_{0≤j≤t} P_j (P_0 = 0, the empty prefix)
    * with P_t = Σ_{i≤t}(x_i − k), so the whole statistic is ONE
    * prefix sum plus ONE running min — window functions, no
    * sequential fold. Reference level k = the day mean, carried
    * CROSS-MULTIPLIED (every term scales by n_days) so everything
    * stays exact integers; `cusum_up` flags sustained rises,
    * `cusum_down` (running max − P) sustained drops.
    *
    * Scale: the fact collapses to |days| rows in one partial+final
    * agg; the unpartitioned windows run over that tiny series (the
    * `quality_ks_drift` offsets-frame precedent — deliberately
    * small), never over raw events. */
  def cusumChangepoint(s: SparkSession, d: String): DataFrame = {
    val daily = Tables(s, d, "events")
      .select(graft.Core.epochUs(col("ts")).as("us"))
      .select(expr("us div 86400000000").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n"))
    val tot = daily.agg(sum("n").as("total"), count(lit(1)).as("n_days"))
    val byDay = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    daily.crossJoin(broadcast(tot))
      .withColumn("p", sum(col("n") * col("n_days") - col("total")).over(byDay))
      // the running extrema must include the EMPTY prefix P_0 = 0
      // (j = 0 in min_{j<=t} P_j), or an all-positive series would
      // anchor to P_1 instead of 0 and understate the statistic
      .withColumn("cusum_up", col("p") - least(min("p").over(byDay), lit(0L)))
      .withColumn("cusum_down",
        greatest(max("p").over(byDay), lit(0L)) - col("p"))
      .select(col("day"), col("n").as("n_events"),
        col("cusum_up"), col("cusum_down"))
      .orderBy("day")
  }

  /** Lags reported by [[acf]]. */
  private val AcfMaxLag = 7

  /** Shared batch/streaming oracle for [[acf]]. */
  val oAcfSql: String =
    s"""WITH daily AS MATERIALIZED (
       |  SELECT epoch_us(ts) // 86400000000 AS day,
       |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
       |  FROM events GROUP BY 1),
       |idx AS MATERIALIZED (
       |  SELECT row_number() OVER (ORDER BY day) AS t, x FROM daily),
       |tt AS (SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS s FROM idx),
       |dev AS MATERIALIZED (
       |  SELECT t, CAST(x AS HUGEINT) * n - s AS e FROM idx, tt),
       |den AS (SELECT SUM(e * e) AS dn FROM dev),
       |lg AS (SELECT unnest(generate_series(1, $AcfMaxLag)) AS lag),
       |num AS (SELECT lag, COUNT(*) AS n_pairs, SUM(a.e * b.e) AS nm
       |        FROM lg, dev a, dev b WHERE b.t = a.t + lg.lag
       |        GROUP BY lag)
       |SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
       |  CAST(nm AS DOUBLE) / CAST(dn AS DOUBLE) AS acf
       |FROM num, den ORDER BY lag""".stripMargin

  /** AUTOCORRELATION function of the daily cents series at lags
    * 1..[[AcfMaxLag]] — the seasonality/memory diagnostic a forecast
    * (Holt, seasonal baseline) is validated against: r_k =
    * Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)². Spelled EXACTLY by
    * multiplying through by n²: e_t = n·x_t − S is an integer
    * (decimal(38,0) — e² at corpus scale passes 2⁶³), num_k = Σ
    * e_t·e_{t+k} and den = Σ e_t² are exact integer moments, and the
    * only float op is the final double division — so the statistic
    * hash-matches at any scale, unlike a mean-subtracted float fold.
    *
    * Scale: the fact collapses to |days| rows in one partial+final
    * agg; lag pairing is a (t+k)-equi-join on the tiny day frame
    * (the deliberate tiny single-partition window of the
    * CUSUM/Holt family). */
  def acf(s: SparkSession, d: String): DataFrame =
    acfFromDaily(Tables(s, d, "events")
      .select(graft.Core.epochUs(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(expr("us div 86400000000").as("day"))
      .agg(sum("cents").as("x")))

  /** The ACF read from a (day, x) daily series — shared by [[acf]]
    * and the streaming twin (whose maintained state IS this additive
    * daily table). */
  def acfFromDaily(daily: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    // |days|-row frame: the deliberate tiny single-partition window.
    // cached: BOTH the (n, s) total and the deviation frame read idx —
    // without the pin the events scan + daily rollup beneath it ran
    // twice (r18; the plan showed two events.parquet scans).
    val byDay = Window.orderBy("day")
    val idx = cached(daily.withColumn("t", row_number().over(byDay).cast("long")))
    val tot = idx.agg(count(lit(1)).as("n"), sum("x").as("s"))
    val dev = cached(idx.crossJoin(broadcast(tot))
      .select(col("t"),
        (col("x").cast(dec) * col("n") - col("s")).cast(dec).as("e")))
    val den = dev.agg(sum(col("e") * col("e")).as("dn"))
    val lags = dev.sparkSession.range(1, AcfMaxLag + 1).toDF("lag")
    lags.crossJoin(dev.select(col("t").as("ta"), col("e").as("ea")))
      .join(dev.select(col("t").as("tb"), col("e").as("eb")),
        col("ta") + col("lag") === col("tb"))
      .groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"), sum(col("ea") * col("eb")).as("nm"))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"),
        (col("nm").cast("double") / col("dn").cast("double")).as("acf"))
      .orderBy("lag")
  }

  /** INTERVAL-OVERLAP self-join — session CONCURRENCY: for every
    * 30-min-gap session ([[withSessionIds]], the one shared boundary
    * definition), how many other sessions overlap it in time (closed
    * intervals: a.s ≤ b.e ∧ b.s ≤ a.e; same-user sessions are
    * disjoint by construction so no self-pairs survive), reported as
    * the concurrency histogram a capacity planner reads.
    *
    * Scale spelling: NEVER a theta join. Each interval explodes into
    * the hour bins it touches; candidates come from a bin EQUI-join
    * (two intervals that overlap share the hour bin of any overlap
    * instant, so the filter is lossless), pair-key distinct collapses
    * multi-bin duplicates, and the exact interval check verifies.
    * Candidate mass is Σ per-bin density² — bounded by peak
    * concurrency, not corpus size (the LSH band-join discipline
    * applied to the time axis). */
  def intervalOverlap(s: SparkSession, d: String): DataFrame =
    overlapHistogram(sessionIntervals(s, d))

  /** The (iid, s_ns, e_ns) session-interval frame [[intervalOverlap]]
    * and its streaming twin both consume. Interval identity must be
    * collision-free at ANY session cardinality: a FIXED arithmetic
    * stride (`user*1e6 + session`) silently ALIASES once a user's
    * session ordinal crosses it, and because the oracle would share
    * the encoding, both engines would agree on the wrong histogram —
    * wrong-but-green (the r15 advice trap). A struct key removes the
    * trap but measured ~25% slower end-to-end (best-of-4 3.40 s vs
    * 2.74 s at sf0.1 — the A/B recorded in SCALE.md's round-16
    * section; the 16-byte key rides the exploded bin join and the
    * pair rollup). So the key is a
    * DATA-DERIVED stride: `stride = max(session_id) + 1` (1-row
    * broadcast), which makes `user·stride + session` injective BY
    * CONSTRUCTION — session_id < stride always — at long-key cost;
    * the one remaining edge (user_id · stride overflowing a long)
    * RAISES instead of aliasing. [[overlapHistogram]] stays
    * key-type-generic (the collision spec drives it with struct
    * keys), so the choice here is purely a shuffle-width
    * optimization, never a semantic one. */
  private[graft] def sessionIntervals(s: SparkSession, d: String): DataFrame = {
    // cached: the stride aggregate and the keyed projection both read
    // the sessionized frame — without the pin, sessionization (the
    // user-keyed shuffle + window) would run twice
    val sess = cached(withSessionIds(load(s, d))
      .groupBy("user_id", "session_id")
      .agg(min("ts").as("s_ns"), max("ts").as("e_ns")))
    val strideF = sess.agg((max("session_id") + 1).as("stride"))
    // the guard is INTEGER arithmetic end to end: Column./ is double
    // division (imprecise past 2^53), so the bound uses `div`, and it
    // is exact per row — user·stride + session > Long.Max iff
    // user > (Long.Max − session) div stride (session < stride by
    // construction). Negative ids can't ride the fast path either.
    sess.crossJoin(broadcast(strideF))
      .select(
        when(col("user_id") < 0 || col("session_id") < 0 ||
          col("user_id") >
            expr(s"(${Long.MaxValue}L - session_id) div stride"),
          raise_error(lit("interval key would overflow: user_id too large for stride")))
          .otherwise(col("user_id") * col("stride") + col("session_id"))
          .as("iid"),
        col("s_ns"), col("e_ns"))
  }

  /** The concurrency histogram over ANY (iid, s_ns, e_ns) interval
    * frame — the bin-blocked candidate join + exact verify documented
    * on [[intervalOverlap]]. Factored so the streaming twin and the
    * key-collision spec (which feeds intervals whose ordinals would
    * alias any fixed arithmetic stride) run the identical plan. */
  private[graft] def overlapHistogram(iv: DataFrame): DataFrame = {
    val H = 3600L * 1000000000L // hour bin, ns
    val sess = cached(iv)
    val bins = sess.select(col("iid"), col("s_ns"), col("e_ns"),
      explode(sequence(expr(s"s_ns div $H"), expr(s"e_ns div $H"))).as("bin"))
    // multi-bin duplicate suppression WITHOUT a distinct shuffle (the
    // spatial-join reporting trick): a pair sharing several bins is
    // emitted only at the max of the two start bins — always a shared
    // bin when the pair shares any, so no candidate is lost, and it
    // is unique per pair, so none repeats
    val cand = bins
      .select(col("bin"), col("iid").as("ia"),
        col("s_ns").as("sa"), col("e_ns").as("ea"))
      .join(bins.select(col("bin"), col("iid").as("ib"),
        col("s_ns").as("sb"), col("e_ns").as("eb")), "bin")
      .filter(col("ia") < col("ib"))
      .filter(col("bin") === greatest(expr(s"sa div $H"), expr(s"sb div $H")))
      .filter(col("sa") <= col("eb") && col("sb") <= col("ea"))
    val deg = cand.select(col("ia").as("iid"))
      .unionByName(cand.select(col("ib").as("iid")))
      .groupBy("iid").agg(count(lit(1)).as("c"))
    // The zero-concurrency bucket used to ride a LeftOuter join of the
    // FULL interval frame against deg — an extra iid shuffle + sort of
    // both sides whose only purpose was counting the intervals deg
    // missed. Count them arithmetically instead (r18, guide §2.4):
    // every deg row is one interval with c ≥ 1 overlaps, so
    // n_zero = |intervals| − |deg rows|, appended as a literal
    // concurrency-0 bucket when positive. Bit-identical histogram —
    // same buckets, same counts — with the interval-frame shuffle and
    // the outer join gone; hist is cached because the n_nz rollup and
    // the report both read it (tiny: one row per distinct concurrency).
    val hist = cached(deg
      .groupBy(col("c").as("concurrency")).agg(count(lit(1)).as("n_sessions")))
    val nz = hist.agg(coalesce(sum("n_sessions"), lit(0L)).as("n_nz"))
    val zero = sess.agg(count(lit(1)).as("n_total"))
      .crossJoin(broadcast(nz))
      .select(lit(0L).as("concurrency"),
        (col("n_total") - col("n_nz")).as("n_sessions"))
      .filter(col("n_sessions") > 0)
    hist.unionByName(zero).orderBy("concurrency")
  }

  /** PEAK LOAD — [[intervalOverlap]]'s time-axis twin: per hour bin,
    * how many sessions were active (span intersects the hour), top
    * hours first — the capacity dashboard's headline view where the
    * overlap histogram is the per-session view. Same lossless
    * hour-bin explode; the report is one (bin)-keyed count, so the
    * only shuffle carries hour keys. */
  def peakLoad(s: SparkSession, d: String): DataFrame =
    peakFromIntervals(withSessionIds(load(s, d))
      .groupBy("user_id", "session_id")
      .agg(min("ts").as("s_ns"), max("ts").as("e_ns")))

  /** The peak-load report off ANY (s_ns, e_ns) interval frame —
    * shared by [[peakLoad]] and the streaming twin, which reads it
    * over its incrementally maintained interval state. */
  private[graft] def peakFromIntervals(iv: DataFrame): DataFrame = {
    val H = 3600L * 1000000000L
    iv
      .select(explode(sequence(expr(s"s_ns div $H"), expr(s"e_ns div $H")))
        .as("hour_bin"))
      .groupBy("hour_bin").agg(count(lit(1)).as("n_active"))
      .orderBy(col("n_active").desc, col("hour_bin"))
      .limit(20)
  }

  /** KAPLAN–MEIER survival estimate of time-to-first-purchase — the
    * censoring-aware conversion statistic a naive "average days to
    * purchase" gets wrong: users who had not purchased by the end of
    * the study window haven't converted YET, and dropping or
    * counting them as converted both bias the curve. The study
    * window is the corpus's first 7 days (a cutoff that actually
    * censors on the driver corpus — a corpus-end horizon censors
    * nobody because every user stays active to the end); cohort =
    * users first seen inside the window; duration = first purchase
    * day − first day if the purchase lands in the window (event
    * observed), else cutoff − first day (right-censored). At each
    * distinct event time t: d = conversions at t, n_risk = users
    * with duration ≥ t (censored included — the point of KM), and
    * S(t) = Π_{t'≤t} (1 − d/n_risk).
    *
    * Exactness: d and n_risk are integers (the at-risk counts come
    * from a cumulative sum over the duration-frequency table); each
    * factor is one double division, and the survival products are
    * ORDERED prefix folds over the collected ≤|durations| KM table
    * with seed 1.0 — the same IEEE sequence in both engines (the
    * ewma discipline). Scale: one user-keyed shuffle collapses the
    * fact; everything after is |distinct durations| rows. */
  def kaplanMeier(s: SparkSession, d: String): DataFrame =
    kmFromUserDays(Tables(s, d, "events")
      .select(col("user_id"), col("event_type"),
        graft.Core.epochUs(col("ts")).as("us"))
      .select(col("user_id"), col("event_type"),
        expr("us div 86400000000").as("day"))
      .groupBy("user_id")
      .agg(min("day").as("d0"),
        min(when(col("event_type") === "purchase", col("day"))).as("dp")))

  /** The KM estimate read from a per-user (d0 = first day, dp = first
    * purchase day or null) table — shared by [[kaplanMeier]] and the
    * streaming twin (whose maintained state IS this min-fold). */
  def kmFromUserDays(usr: DataFrame): DataFrame = {
    val endF = usr.agg((min("d0") + 6).as("cutoff"))
    val freq = cached(usr.crossJoin(broadcast(endF))
      .filter(col("d0") <= col("cutoff"))
      .select(
        when(col("dp").isNotNull && col("dp") <= col("cutoff"),
          col("dp") - col("d0"))
          .otherwise(col("cutoff") - col("d0")).as("dur"),
        when(col("dp").isNotNull && col("dp") <= col("cutoff"), 1L)
          .otherwise(0L).as("churn"))
      .groupBy("dur").agg(count(lit(1)).as("m"), sum("churn").as("d")))
    val tot = freq.agg(sum("m").as("n_users"))
    // |distinct durations|-row frame: the deliberate tiny window
    val byT = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    val km = freq.crossJoin(broadcast(tot))
      .withColumn("below", coalesce(sum("m").over(byT), lit(0L)))
      .withColumn("n_risk", col("n_users") - col("below"))
      .filter(col("d") > 0)
      .select(col("dur").as("t"), col("d"), col("n_risk"),
        (lit(1.0) - col("d").cast("double") / col("n_risk").cast("double"))
          .as("f"))
    km.agg(sort_array(collect_list(struct(
        col("t"), col("d"), col("n_risk"), col("f")))).as("a"))
      .select(explode(expr(
        """transform(a, (x, i) -> struct(
          |  x.t AS t, x.d AS d, x.n_risk AS n_risk,
          |  aggregate(slice(a, 1, i + 1), CAST(1.0 AS DOUBLE),
          |    (acc, y) -> acc * y.f) AS survival))""".stripMargin)).as("r"))
      .select(col("r.t").as("t"), col("r.d").as("d"),
        col("r.n_risk").as("n_risk"), col("r.survival").as("survival"))
      .orderBy("t")
  }

  /** Holt LINEAR-TREND smoothing of the daily event series — the
    * forecasting step up from [[ewma]]: two coupled recursions,
    * ℓ_t = α·x_t + (1−α)(ℓ_{t−1} + b_{t−1}) and
    * b_t = β(ℓ_t − ℓ_{t−1}) + (1−β)·b_{t−1}, so the forecast
    * ℓ + h·b extrapolates a TREND where EWMA's flat level always
    * lags a growing series. α = 1/4 and β = 1/8 are POWERS OF TWO
    * (the ewma discipline): every constant is exactly representable
    * and the order-dependent IEEE fold is the same arithmetic
    * sequence in both engines. Init ℓ_1 = x_1, b_1 = x_2 − x_1;
    * updates run t = 2..n.
    *
    * Scale: the fact collapses to |days| rows in one partial+final
    * agg; the fold runs once over that tiny ordered series inside a
    * single aggregate row (the ewma/KS small-state precedent). */
  def holtLinear(s: SparkSession, d: String): DataFrame = {
    val daily = Tables(s, d, "events")
      .select(graft.Core.epochUs(col("ts")).as("us"))
      .select(expr("us div 86400000000").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n"))
    val one = daily
      .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("s"))
      .select(transform(col("s"), x => x("n").cast("double")).as("xs"))
    val l1 = element_at(col("xs"), 1)
    val b1 = element_at(col("xs"), 2) - element_at(col("xs"), 1)
    val fin = aggregate(
      slice(col("xs"), lit(2), size(col("xs")) - 1),
      struct(l1.as("l"), b1.as("b")),
      (acc, xv) => {
        val newL = xv * 0.25 + (acc("l") + acc("b")) * 0.75
        struct(newL.as("l"),
          ((newL - acc("l")) * 0.125 + acc("b") * 0.875).as("b"))
      })
    one.select(size(col("xs")).cast("long").as("n_days"), fin.as("f"))
      .select(col("n_days"), col("f.l").as("level"), col("f.b").as("trend"),
        (col("f.l") + col("f.b")).as("forecast_1"),
        (col("f.l") + col("f.b") * 7.0).as("forecast_7"))
  }

  /** Cohort LIFETIME-VALUE triangle — the product-analytics report
    * next to [[transitionMatrix]] and retention: users cohort by
    * first-seen day, every event lands in a (cohort, age) cell, and
    * each cohort's purchase revenue accumulates over age — the
    * classic lower-triangular LTV table a payback-period decision
    * reads. Revenue is exact integer cents; the running total is a
    * per-cohort window over the CELLS frame (≤ |days|² rows — the
    * raw events never window-sort); LTV-per-user is the single
    * exact-integer division at the end.
    *
    * Scale: one scan → per-user min-day agg (|users| rows) → a
    * user-keyed join back (broadcast when the user dimension is
    * small; shuffle otherwise) → (cohort, age) partial+final agg.
    * The window and the division run on the tiny cells frame. */
  def cohortLtv(s: SparkSession, d: String): DataFrame = {
    // integer `div` for the day bucket: `/` on longs is DOUBLE
    // division in Spark, and epoch-µs sits near the 53-bit mantissa
    val ev = Tables(s, d, "events")
      .select(col("user_id"),
        graft.Core.epochUs(col("ts")).as("us"),
        when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long")).otherwise(0L).as("cents"))
      .select(col("user_id"), expr("us div 86400000000").as("day"),
        col("cents"))
    ltvFromDayCents(
      ev.groupBy("user_id", "day").agg(sum("cents").as("cents")))
  }

  /** `events_cohort_ltv`'s oracle — also the oracle of
    * `stream_cohort_ltv`, whose maintained state folds to the
    * identical triangle. */
  val oCohortLtvSql: String =
    """WITH ev AS MATERIALIZED (
      |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
      |    CASE WHEN event_type = 'purchase'
      |         THEN CAST(round(value*100) AS BIGINT) ELSE 0 END AS cents
      |  FROM events),
      |ch AS MATERIALIZED (
      |  SELECT user_id, MIN(day) AS cohort FROM ev GROUP BY user_id),
      |cells AS MATERIALIZED (
      |  SELECT ch.cohort, ev.day - ch.cohort AS age,
      |    CAST(SUM(ev.cents) AS BIGINT) AS rev_cents,
      |    CAST(COUNT(DISTINCT ev.user_id) AS BIGINT) AS active_users
      |  FROM ev JOIN ch USING (user_id) GROUP BY 1, 2),
      |sz AS (SELECT cohort, COUNT(*) AS n_users FROM ch GROUP BY cohort)
      |SELECT cells.cohort, age, n_users, active_users, rev_cents,
      |  CAST(SUM(rev_cents) OVER (PARTITION BY cells.cohort ORDER BY age
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_rev_cents,
      |  CAST(SUM(rev_cents) OVER (PARTITION BY cells.cohort ORDER BY age
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / CAST(n_users AS DOUBLE) AS ltv_cents_per_user
      |FROM cells JOIN sz ON cells.cohort = sz.cohort
      |ORDER BY cells.cohort, age""".stripMargin

  /** The LTV triangle from a per-(user, day) PURCHASE-cents table —
    * shared by [[cohortLtv]] and the streaming maintenance twin
    * (`stream_cohort_ltv`), whose folded state is exactly this table
    * (rows exist for cents-0 days too, so active-user counts are
    * preserved; per-day pre-summing changes nothing — integer
    * addition is associative). */
  def ltvFromDayCents(udc: DataFrame): DataFrame = {
    val cohort = udc.groupBy("user_id").agg(min("day").as("cohort"))
    val cells = udc.join(cohort, "user_id")
      .groupBy(col("cohort"), (col("day") - col("cohort")).as("age"))
      .agg(sum("cents").as("rev_cents"),
        countDistinct(col("user_id")).as("active_users"))
    val sizes = cohort.groupBy("cohort").agg(count(lit(1)).as("n_users"))
    val cum = Window.partitionBy("cohort").orderBy("age")
      .rowsBetween(Window.unboundedPreceding, 0)
    cells.join(sizes, "cohort")
      .withColumn("cum_rev_cents", sum("rev_cents").over(cum))
      .select(col("cohort"), col("age"), col("n_users"), col("active_users"),
        col("rev_cents"), col("cum_rev_cents"),
        (col("cum_rev_cents").cast("double") / col("n_users").cast("double"))
          .as("ltv_cents_per_user"))
      .orderBy("cohort", "age")
  }

  /** `events_markov_stationary`'s oracle — also the oracle of
    * `stream_markov_stationary`, whose folded pair state derives the
    * identical vector: the same [[MarkovRounds]] integer
    * power-iteration rounds unrolled as MATERIALIZED CTEs (each
    * round references its predecessor — the inlining-explosion
    * class), same floor-divide-before-sum mass transfer, same
    * out-edge-support closure. */
  val oMarkovSql: String = {
    val rounds = (1 to MarkovRounds).map { r =>
      s"""pi$r AS MATERIALIZED (
         |  SELECT tr.tt AS t, CAST(SUM((p.pi * tr.n) // tr.nf) AS BIGINT) AS pi
         |  FROM tr JOIN pi${r - 1} p ON tr.tf = p.t GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH nx AS MATERIALIZED (
       |  SELECT event_type AS tf,
       |    lead(event_type, 1) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS tt
       |  FROM events),
       |p0 AS MATERIALIZED (
       |  SELECT tf, tt, COUNT(*) AS n FROM nx
       |  WHERE tt IS NOT NULL GROUP BY 1, 2),
       |st AS MATERIALIZED (SELECT DISTINCT t FROM (
       |  SELECT tf AS t FROM p0 UNION ALL SELECT tt FROM p0) q0),
       |sk AS MATERIALIZED (
       |  SELECT t AS tf, t AS tt, CAST(1 AS BIGINT) AS n FROM st
       |  WHERE t NOT IN (SELECT tf FROM p0)),
       |al AS MATERIALIZED (
       |  SELECT tf, tt, n FROM p0 UNION ALL SELECT tf, tt, n FROM sk),
       |nf AS MATERIALIZED (
       |  SELECT tf, CAST(SUM(n) AS BIGINT) AS nf FROM al GROUP BY tf),
       |tr AS MATERIALIZED (
       |  SELECT al.tf, al.tt, al.n, nf.nf FROM al JOIN nf USING (tf)),
       |ns AS (SELECT COUNT(*) AS k FROM st),
       |pi0 AS MATERIALIZED (
       |  SELECT t, $MkScale // k AS pi FROM st CROSS JOIN ns),
       |$rounds
       |SELECT st.t AS event_type,
       |  COALESCE(pi$MarkovRounds.pi, 0) AS pi_micro
       |FROM st LEFT JOIN pi$MarkovRounds ON st.t = pi$MarkovRounds.t
       |ORDER BY event_type""".stripMargin
  }

  /** Per-user EWMA of transaction value — the classic streaming
    * smoother (RFC 6298's RTT estimator, monitoring baselines):
    * ewma₀ = x₁, ewmaₜ = 0.875·ewmaₜ₋₁ + 0.125·xₜ over each user's
    * (ts, event_id) total order. α = 1/8 is a POWER OF TWO, so both
    * constants are exactly representable and the fold is the same
    * IEEE sequence in both engines — order-dependent recursions only
    * hash-match when the order is total and the arithmetic shape is
    * pinned, which is exactly what the sorted-struct collect + left
    * fold gives. Inputs ride exact cents.
    *
    * Scale: one shuffle on user_id; per-user state is the user's own
    * event list (bounded by per-user activity — the same budget the
    * sessionizer's collect-based twin declares; the O(1)-state
    * alternative is a [[graft.plans.SessionAgg]]-style fold
    * operator, which this deliberately does NOT need because EWMA
    * reads each row once). */
  def ewma(s: SparkSession, d: String): DataFrame = {
    val arr = sort_array(collect_list(struct(
      col("ts"), col("event_id"),
      round(col("value") * 100).cast("long").as("cents"))))
    Tables(s, d, "events")
      .withColumn("ts", epochUs(col("ts")))
      .groupBy("user_id")
      .agg(arr.as("xs"))
      .select(col("user_id"), size(col("xs")).as("n_events"),
        aggregate(
          slice(col("xs"), lit(2), size(col("xs")) - 1),
          element_at(col("xs"), 1).getField("cents").cast("double"),
          (acc, e) => acc * 0.875 + e.getField("cents").cast("double") * 0.125)
          .as("ewma_cents"))
      .orderBy("user_id")
  }

  /** Shared batch/streaming oracle for [[kaplanMeier]]. */
  val oKaplanMeierSql: String =
          """WITH ud AS (
            |  SELECT user_id, MIN(epoch_us(ts) // 86400000000) AS d0,
            |    MIN(CASE WHEN event_type = 'purchase'
            |             THEN epoch_us(ts) // 86400000000 END) AS dp
            |  FROM events GROUP BY user_id),
            |e AS (SELECT MIN(d0) + 6 AS cutoff FROM ud),
            |u AS (SELECT
            |        CASE WHEN dp IS NOT NULL AND dp <= cutoff THEN dp - d0
            |             ELSE cutoff - d0 END AS dur,
            |        CASE WHEN dp IS NOT NULL AND dp <= cutoff THEN 1
            |             ELSE 0 END AS churn
            |      FROM ud, e WHERE d0 <= cutoff),
            |freq AS (SELECT dur, COUNT(*) AS m,
            |           CAST(SUM(churn) AS BIGINT) AS d FROM u GROUP BY dur),
            |tot AS (SELECT CAST(SUM(m) AS BIGINT) AS n_users FROM freq),
            |atrisk AS (
            |  SELECT dur AS t, d,
            |    n_users - CAST(COALESCE(SUM(m) OVER (ORDER BY dur
            |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            |      AS n_risk
            |  FROM freq, tot),
            |km AS (SELECT t, d, n_risk,
            |         1e0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS f
            |       FROM atrisk WHERE d > 0),
            |lst AS (SELECT list(t ORDER BY t) AS ts, list(d ORDER BY t) AS ds,
            |               list(n_risk ORDER BY t) AS ns, list(f ORDER BY t) AS fs
            |        FROM km)
            |SELECT ts[i] AS t, ds[i] AS d, ns[i] AS n_risk,
            |  list_reduce(list_prepend(CAST(1 AS DOUBLE), fs[1:i]),
            |    (a, b) -> a * b) AS survival
            |FROM lst, LATERAL (SELECT unnest(generate_series(1, len(ts))) AS i) q
            |ORDER BY t""".stripMargin

  /** join_interval_overlap's oracle — the naive interval THETA
    * self-join over the gap-sessionized intervals. Shared VERBATIM by
    * the streaming twin, whose maintained interval state must
    * converge to the same histogram in any arrival order. */
  private[graft] val oIntervalOverlapSql: String =
    """WITH marked AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS is_new
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, ts,
      |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM marked),
      |iv AS MATERIALIZED (
      |  SELECT user_id AS u, session_id AS sid,
      |    epoch_ns(min(ts)) AS s_ns, epoch_ns(max(ts)) AS e_ns
      |  FROM sessions GROUP BY user_id, session_id),
      |p AS (SELECT a.u AS ua, a.sid AS sa, b.u AS ub, b.sid AS sb
      |      FROM iv a JOIN iv b
      |      ON (a.u, a.sid) < (b.u, b.sid)
      |         AND a.s_ns <= b.e_ns AND b.s_ns <= a.e_ns),
      |deg AS (SELECT u, sid, COUNT(*) AS c FROM
      |        (SELECT ua AS u, sa AS sid FROM p
      |         UNION ALL SELECT ub, sb FROM p) q
      |        GROUP BY u, sid)
      |SELECT CAST(COALESCE(c, 0) AS BIGINT) AS concurrency,
      |  COUNT(*) AS n_sessions
      |FROM iv LEFT JOIN deg USING (u, sid)
      |GROUP BY 1 ORDER BY concurrency""".stripMargin

  /** events_peak_load's oracle — shared verbatim by the streaming
    * twin (same maintained interval state as stream_interval_overlap,
    * different read-time report). */
  private[graft] val oPeakLoadSql: String =
    """WITH marked AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS is_new
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, ts,
      |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM marked),
      |iv AS (SELECT epoch_ns(min(ts)) // 3600000000000 AS b0,
      |              epoch_ns(max(ts)) // 3600000000000 AS b1
      |       FROM sessions GROUP BY user_id, session_id),
      |bins AS (SELECT unnest(generate_series(b0, b1)) AS hour_bin FROM iv)
      |SELECT hour_bin, COUNT(*) AS n_active
      |FROM bins GROUP BY hour_bin
      |ORDER BY n_active DESC, hour_bin LIMIT 20""".stripMargin

  val queries: Seq[Q] = Seq(
    // oracle: the identical left fold over the identical total order;
    // alpha = 1/8 is exactly representable so the IEEE sequences agree
    Q("events_ewma", ewma, Some(
      """WITH xs AS MATERIALIZED (
        |  SELECT user_id,
        |    list(CAST(CAST(round(value*100) AS BIGINT) AS DOUBLE)
        |         ORDER BY ts, event_id) AS xs
        |  FROM events GROUP BY user_id)
        |SELECT user_id, CAST(len(xs) AS INTEGER) AS n_events,
        |  list_reduce(xs, (acc, x) -> acc * 0.875 + x * 0.125) AS ewma_cents
        |FROM xs ORDER BY user_id""".stripMargin)),
    // oracle: identical lead-over-total-order spelling
    Q("events_transition_matrix", transitionMatrix, Some(
      """WITH nx AS MATERIALIZED (
        |  SELECT event_type AS type_from,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS type_to
        |  FROM events),
        |pairs AS (SELECT type_from, type_to, COUNT(*) AS n FROM nx
        |          WHERE type_to IS NOT NULL GROUP BY 1, 2),
        |ft AS (SELECT type_from, CAST(SUM(n) AS BIGINT) AS n_from
        |       FROM pairs GROUP BY type_from)
        |SELECT pairs.type_from, type_to, n, n_from,
        |  CAST(n AS DOUBLE) / CAST(n_from AS DOUBLE) AS p
        |FROM pairs JOIN ft USING (type_from)
        |ORDER BY type_from, type_to""".stripMargin)),
    // oracle: the same MarkovRounds integer power-iteration rounds
    // unrolled as MATERIALIZED CTEs (each round references its
    // predecessor — the inlining-explosion class), same floor-divide-
    // before-sum mass transfer, same out-edge-support closure
    Q("events_markov_stationary", markovStationary, Some(oMarkovSql)),
    // oracle: the same first-seen-day cohorts, exact cents cells, and
    // per-cohort running total; one double division at the end
    Q("events_cohort_ltv", cohortLtv, Some(oCohortLtvSql)),
    // oracle: the same ordered fold with the same power-of-two
    // constants (E-NOTATION: DuckDB types plain decimal literals as
    // DECIMAL and the whole fold silently rounds — the benford
    // lesson) and the same expanded-b spelling (see the engine-side
    // note on DuckDB's duplicated-subexpression lambda bug) — bit-identical
    // IEEE trajectory (struct-typed list_reduce with a prepended
    // seed, the engine's separate-acc-type aggregate re-expressed
    // over a homogeneous list)
    // oracle: the identical recursion as a RECURSIVE CTE over the
    // row-numbered daily series — NOT a struct-typed list_reduce:
    // DuckDB 1.0 evaluates lambda struct fields in place, so a
    // second field reading acc.l sees the l just written in the SAME
    // step (measured: the fold spelling returned the decayed-trend
    // trajectory); plain recursive SQL has value semantics and
    // replays Spark's duplicated-newL textbook fold bit-for-bit.
    // Constants in E-NOTATION (the benford DECIMAL-literal lesson).
    Q("events_holt_linear", holtLinear, Some(
      """WITH RECURSIVE daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, COUNT(*) AS n
        |  FROM events GROUP BY 1),
        |d AS (SELECT row_number() OVER (ORDER BY day) AS t,
        |        CAST(n AS DOUBLE) AS x FROM daily),
        |hw(t, l, b) AS (
        |  SELECT 1, (SELECT x FROM d WHERE t = 1),
        |    (SELECT x FROM d WHERE t = 2) - (SELECT x FROM d WHERE t = 1)
        |  UNION ALL
        |  SELECT hw.t + 1,
        |    d.x * 2.5e-1 + (hw.l + hw.b) * 7.5e-1,
        |    ((d.x * 2.5e-1 + (hw.l + hw.b) * 7.5e-1) - hw.l) * 1.25e-1
        |      + hw.b * 8.75e-1
        |  FROM hw JOIN d ON d.t = hw.t + 1)
        |SELECT CAST((SELECT MAX(t) FROM d) AS BIGINT) AS n_days,
        |  l AS level, b AS trend,
        |  l + b AS forecast_1, l + b * 7e0 AS forecast_7
        |FROM hw WHERE t = (SELECT MAX(t) FROM d)""".stripMargin)),
    // oracle: the same cross-multiplied prefix-sum identity over the
    // same tiny daily series — exact integers end to end
    Q("events_cusum_changepoint", cusumChangepoint, Some(
      """WITH daily AS MATERIALIZED (
        |  SELECT epoch_us(ts) // 86400000000 AS day, COUNT(*) AS n
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
        |        COUNT(*) AS n_days FROM daily),
        |p AS (SELECT day, n,
        |        CAST(SUM(n * n_days - total) OVER win AS BIGINT) AS p
        |      FROM daily CROSS JOIN t
        |      WINDOW win AS (ORDER BY day
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT day, n AS n_events,
        |  CAST(p - LEAST(MIN(p) OVER win, 0) AS BIGINT) AS cusum_up,
        |  CAST(GREATEST(MAX(p) OVER win, 0) - p AS BIGINT) AS cusum_down
        |FROM p
        |WINDOW win AS (ORDER BY day
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY day""".stripMargin)),
    // oracle: the same n²-scaled integer moments (HUGEINT ≡
    // decimal(38,0) for these magnitudes) and the same single final
    // double division; lag pairing is the same t+k equi-join
    Q("events_acf", acf, Some(oAcfSql)),
    // oracle: the same integer (d, n_risk) table off the duration
    // frequencies and the same seed-1.0 ordered prefix products —
    // identical IEEE sequences (1e0 literals: the benford lesson)
    Q("events_kaplan_meier", kaplanMeier, Some(oKaplanMeierSql)),
    // oracle: the same sessions exploded over the same hour bins —
    // generate_series per interval, one grouped count
    Q("events_peak_load", peakLoad, Some(oPeakLoadSql)),
    // oracle: the naive interval THETA self-join over the same
    // session intervals (DuckDB plans it as an IEJoin) — the truth
    // the engine's bin-blocked candidate join must reproduce.
    // Interval identity here is the raw (user_id, session_id) PAIR:
    // the oracle deliberately shares NO key encoding with the engine
    // (whose data-derived stride is a shuffle-width optimization), so
    // an engine-side aliasing bug shows as a red row, never as a
    // wrong-but-green agreement.
    Q("join_interval_overlap", intervalOverlap, Some(oIntervalOverlapSql)),
    // oracle: identical interval-contribution spelling; ts div is
    // exact integer µs on both engines (positive epoch values)
    Q("events_rolling_distinct", rollingDistinct, Some(oRollingSql)),
    // oracle: identical cross-multiplied integer deviation; dow is
    // pure epoch-day arithmetic, never a calendar function
    Q("events_seasonal_baseline", seasonalBaseline, Some(
      """WITH cells AS MATERIALIZED (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    (epoch_us(ts) // 3600000000) % 24 AS hr, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2, 3),
        |cd AS (SELECT *, (day + 4) % 7 AS dow FROM cells),
        |nd AS (SELECT dow, COUNT(*) AS n_days FROM
        |         (SELECT DISTINCT day, dow FROM cd) q GROUP BY dow),
        |base AS (SELECT event_type, dow, hr, CAST(SUM(c) AS BIGINT) AS total
        |         FROM cd GROUP BY 1, 2, 3)
        |SELECT cd.event_type, cd.day, cd.dow, cd.hr, cd.c, base.total,
        |  nd.n_days, abs(cd.c * nd.n_days - base.total) AS dev,
        |  CAST(cd.c AS DOUBLE) * CAST(nd.n_days AS DOUBLE)
        |    / CAST(base.total AS DOUBLE) AS lift
        |FROM cd JOIN base USING (event_type, dow, hr) JOIN nd USING (dow)
        |ORDER BY dev DESC, cd.event_type, cd.day, cd.hr LIMIT 20""".stripMargin)),
    Q("events_winsorize", winsorize, Some(
      s"""WITH r AS (
         |  SELECT event_type, value,
         |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         |    COUNT(*) OVER (PARTITION BY event_type) AS n
         |  FROM events),
         |b AS (
         |  SELECT event_type,
         |    MAX(CASE WHEN rn = (n + 19) // 20 THEN value END) AS p05,
         |    MAX(CASE WHEN rn = (19 * n + 19) // 20 THEN value END) AS p95
         |  FROM r GROUP BY event_type)
         |SELECT e.event_type, COUNT(*) AS n,
         |  CAST(SUM(CASE WHEN e.value < b.p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
         |  CAST(SUM(CASE WHEN e.value > b.p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
         |  b.p05, b.p95,
         |  ${oDsum("least(greatest(e.value, b.p05), b.p95)")} AS sum_winsorized
         |FROM events e JOIN b USING (event_type)
         |GROUP BY e.event_type, b.p05, b.p95
         |ORDER BY e.event_type""".stripMargin)),
    Q("events_scd2", scd2, Some(
      """WITH m AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (SELECT user_id, event_type, ts, event_id FROM m
        |      WHERE prev IS NULL OR prev <> event_type),
        |x AS (
        |  SELECT user_id, event_type, ts,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
        |  FROM c)
        |SELECT user_id, event_type,
        |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS valid_from,
        |  strftime(CAST(next_ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS valid_to,
        |  next_ts IS NULL AS is_current
        |FROM x ORDER BY user_id, valid_from, event_type""".stripMargin)),
    Q("events_tumbling", tumblingHour, Some(
      s"""SELECT strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS win_start,
         |  event_type, COUNT(*) AS n, ${oDsum("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin)),
    Q("events_sliding", slidingWindows, Some(
      s"""WITH buckets AS (
         |  SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS win_start, value FROM events
         |  UNION ALL
         |  SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP), INTERVAL '30 minutes') AS win_start, value FROM events)
         |SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
         |  COUNT(*) AS n, ${oDsum("value")} AS sum_value
         |FROM buckets GROUP BY 1 ORDER BY win_start""".stripMargin)),
    Q("events_sessionize", sessionize, Some(
      """WITH marked AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM marked)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  strftime(CAST(min(ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(CAST(max(ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS session_end
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin)),
    Q("events_sessionize_native", sessionizeNative, Some(
      """WITH marked AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM marked)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  strftime(CAST(min(ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(CAST(max(ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS session_end
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin)),
    Q("events_session_window", sessionWindow, Some(
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT user_id,
        |  strftime(CAST(min(ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  COUNT(*) AS n_events
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin)),
    Q("events_quantiles", quantiles, Some(
      """SELECT event_type,
        |  quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.95) AS p95,
        |  COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),
    Q("events_funnel", funnel, Some(
      """WITH w1 AS (
        |  SELECT user_id, ts, event_type,
        |    min(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id) AS t_view
        |  FROM events),
        |w2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
        |    OVER (PARTITION BY user_id) AS t_click FROM w1),
        |w3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
        |    OVER (PARTITION BY user_id) AS t_purchase FROM w2)
        |SELECT
        |  COUNT(DISTINCT CASE WHEN t_view IS NOT NULL THEN user_id END) AS view_users,
        |  COUNT(DISTINCT CASE WHEN t_click IS NOT NULL THEN user_id END) AS click_users,
        |  COUNT(DISTINCT CASE WHEN t_purchase IS NOT NULL THEN user_id END) AS purchase_users
        |FROM w3""".stripMargin)),
    Q("events_histogram", histogram, Some(
      s"""SELECT CAST(floor(value / 50) AS BIGINT) AS bin, COUNT(*) AS n,
         |  min(value) AS min_value, max(value) AS max_value,
         |  ${oDsum("value")} AS sum_value
         |FROM events GROUP BY 1 ORDER BY bin""".stripMargin)),
    Q("events_anomaly", anomalies, Some(
      """WITH st AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    SUM(CAST(value AS DECIMAL(12,2))) AS s,
        |    SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS ss
        |  FROM events GROUP BY event_type),
        |m AS (
        |  SELECT event_type, n,
        |    CAST(s AS DOUBLE) / n AS mean,
        |    (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n AS varr
        |  FROM st)
        |SELECT e.event_type, max(m.n) AS n, max(m.mean) AS mean,
        |  max(sqrt(m.varr)) AS std,
        |  CAST(SUM(CASE WHEN abs((e.value - m.mean) / sqrt(m.varr)) > 3
        |        THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
        |FROM events e JOIN m USING (event_type)
        |GROUP BY e.event_type ORDER BY event_type""".stripMargin)),
    Q("events_range_frame", rangeFrame, Some(
      """SELECT event_id, user_id,
        |  COUNT(*) OVER w AS n_30m,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_30m
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts)
        |  RANGE BETWEEN 1800000000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin)),
    Q("events_retention", retention, Some(
      """WITH h AS (
        |  SELECT user_id, epoch_ns(ts) // 3600000000000 AS hr FROM events),
        |c AS (
        |  SELECT user_id, hr, min(hr) OVER (PARTITION BY user_id) AS cohort_hr FROM h)
        |SELECT strftime(make_timestamp(cohort_hr * 3600000000), '%Y-%m-%d %H:%M:%S') AS cohort,
        |  hr - cohort_hr AS offset_hours, COUNT(DISTINCT user_id) AS n_users
        |FROM c GROUP BY cohort_hr, hr - cohort_hr
        |ORDER BY cohort, offset_hours""".stripMargin)),
    Q("events_top_paths", topPaths, Some(
      """WITH marked AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM marked),
        |ranked AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id, session_id ORDER BY ts, event_id) AS rn
        |  FROM sessions),
        |p AS (
        |  SELECT user_id, session_id,
        |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |  FROM ranked WHERE rn <= 3 GROUP BY user_id, session_id)
        |SELECT path, COUNT(*) AS n_sessions FROM p GROUP BY path
        |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin)),
    Q("events_value_deciles", valueDeciles, Some(
      """WITH b AS (
        |  SELECT event_type,
        |    quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bs
        |  FROM events GROUP BY event_type)
        |SELECT e.event_type,
        |  CAST(len(list_filter(b.bs, x -> e.value > x)) AS INTEGER) AS decile,
        |  COUNT(*) AS n, min(e.value) AS min_value, max(e.value) AS max_value
        |FROM events e JOIN b USING (event_type)
        |GROUP BY 1, 2 ORDER BY event_type, decile""".stripMargin)),
    Q("events_gapfill", gapfill, Some(
      s"""WITH hourly AS (
         |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hr,
         |    COUNT(*) AS n, ${oDsum("value")} AS sum_value
         |  FROM events GROUP BY 1, 2),
         |bounds AS (
         |  SELECT event_type, min(hr) AS mn, max(hr) AS mx FROM hourly GROUP BY 1),
         |spine AS (
         |  SELECT event_type, unnest(generate_series(mn, mx)) AS hr FROM bounds)
         |SELECT s.event_type,
         |  strftime(make_timestamp(s.hr * 3600000000), '%Y-%m-%d %H:%M:%S') AS hr_start,
         |  COALESCE(h.n, 0) AS n,
         |  last_value(h.sum_value IGNORE NULLS) OVER (
         |    PARTITION BY s.event_type ORDER BY s.hr
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum
         |FROM spine s LEFT JOIN hourly h
         |  ON s.event_type = h.event_type AND s.hr = h.hr
         |ORDER BY s.event_type, hr_start""".stripMargin)),
    Q("events_interpolate", interpolate, Some(
      s"""WITH hourly AS (
         |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hr,
         |    ${oDsum("value")} AS sum_value
         |  FROM events GROUP BY 1, 2),
         |bounds AS (
         |  SELECT event_type, min(hr) AS mn, max(hr) AS mx FROM hourly GROUP BY 1),
         |spine AS (
         |  SELECT event_type, unnest(generate_series(mn, mx)) AS hr FROM bounds),
         |j AS (
         |  SELECT s.event_type, s.hr, h.sum_value,
         |    last_value(h.sum_value IGNORE NULLS) OVER wb AS pv,
         |    last_value(CASE WHEN h.sum_value IS NOT NULL THEN s.hr END IGNORE NULLS) OVER wb AS ph,
         |    first_value(h.sum_value IGNORE NULLS) OVER wf AS nv,
         |    first_value(CASE WHEN h.sum_value IS NOT NULL THEN s.hr END IGNORE NULLS) OVER wf AS nh
         |  FROM spine s LEFT JOIN hourly h
         |    ON s.event_type = h.event_type AND s.hr = h.hr
         |  WINDOW
         |    wb AS (PARTITION BY s.event_type ORDER BY s.hr
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |    wf AS (PARTITION BY s.event_type ORDER BY s.hr
         |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT event_type,
         |  strftime(make_timestamp(hr * 3600000000), '%Y-%m-%d %H:%M:%S') AS hr_start,
         |  sum_value IS NOT NULL AS observed,
         |  CASE WHEN sum_value IS NOT NULL THEN sum_value
         |       WHEN pv IS NOT NULL AND nv IS NOT NULL
         |         THEN pv + (nv - pv) * (CAST(hr - ph AS DOUBLE) / CAST(nh - ph AS DOUBLE))
         |       ELSE COALESCE(pv, nv) END AS value_interp
         |FROM j ORDER BY event_type, hr_start""".stripMargin)),
    Q("events_json", jsonExtract, Some(oJsonSql)),
    Q("events_variant", variantExtract, Some(oJsonSql)),
  )
}
