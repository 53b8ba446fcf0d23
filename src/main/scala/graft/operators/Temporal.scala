package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark has no built-in form for (SURVEY
  * §2b "joins … range/as-of"): an event-time AS-OF join and a
  * bounded-interval range join, both expressed scale-first.
  *
  * AS-OF: "for each purchase, the user's most recent click at or
  * before it". Implemented with the union + carry-forward pattern:
  * tag both sides, union, ONE hash-exchange on user_id, sort by time
  * within partition, and carry the latest right-side row forward with
  * a `last(..., ignoreNulls)` running window. Cost is one shuffle of
  * rows — never a join explosion, no per-row probe; the right
  * pattern at any scale (a merge as-of join in shuffle clothing).
  *
  * RANGE: "clicks within 30 minutes before each purchase".
  * Implemented as a BANDED equi-join: both sides bucket time into
  * 30-minute cells, purchases probe their own and the preceding cell
  * (2 candidate buckets), then the exact interval predicate filters.
  * The join key is (user_id, bucket) — an ordinary shuffle join with
  * bounded fan-out, never an inequality-only (cartesian-ish) join.
  *
  * Both oracles use DuckDB's native forms (ASOF JOIN; an inequality
  * join) — the engine must reproduce them row-for-row.
  */
object Temporal {

  private val BucketUs = 30L * 60 * 1000000L

  /** Events with `ts` as integer epoch MICROSECONDS up front: the
    * stored µs timestamp becomes the exact integer both engines'
    * join predicates compare (`epoch_us(ts)` on the DuckDB side), so
    * no unit truncation can flip boundary matches. */
  private def events(s: SparkSession, d: String) =
    Tables(s, d, "events").select(
      col("event_id"), graft.Core.epochUs(col("ts")).as("ts"),
      col("user_id"), col("event_type"))

  /** Latest click at-or-before each purchase, per user (as-of join,
    * backward direction, inclusive). */
  def asofClickBeforePurchase(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val tagged = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(null).cast("long").as("click_ts"), lit(1).as("is_left"))
      .unionByName(
        e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), lit(null).cast("long").as("event_id"),
            col("ts").as("click_ts"), lit(0).as("is_left")))
    // clicks sort before a purchase at the same ts (is_left asc) so
    // "at or before" is inclusive
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
      .filter(col("is_left") === 1)
      .select(
        col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("last_click_ts"))
      .orderBy("user_id", "purchase_ts", "purchase_id")
  }

  /** NEAREST-match as-of join — the sensor-fusion direction the
    * backward as-of can't express: for each purchase, the click
    * minimizing |Δt| in EITHER direction (tie → the earlier click).
    * Same union + one-shuffle pattern as
    * [[asofClickBeforePurchase]], but BOTH directions carry over the
    * same partition sort: a backward `last(ignoreNulls)` and a
    * forward `first(ignoreNulls)` share one exchange and one sort,
    * then a pure projection picks the closer side. A same-ts click
    * sorts before the purchase (is_left asc), so it arrives via the
    * backward carry at distance 0 — still optimal. Cost is identical
    * to the one-directional as-of: one shuffle of rows, no join
    * explosion. */
  def asofNearestClick(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val tagged = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(null).cast("long").as("click_ts"), lit(1).as("is_left"))
      .unionByName(
        e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), lit(null).cast("long").as("event_id"),
            col("ts").as("click_ts"), lit(0).as("is_left")))
    val order = Window.partitionBy("user_id").orderBy(col("ts"), col("is_left"))
    val wb = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val nearest = when(col("prev_ts").isNull, col("next_ts"))
      .when(col("next_ts").isNull, col("prev_ts"))
      // ≤ makes the equidistant tie take the EARLIER click
      .when(col("ts") - col("prev_ts") <= col("next_ts") - col("ts"),
        col("prev_ts"))
      .otherwise(col("next_ts"))
    tagged
      .withColumn("prev_ts", last(col("click_ts"), ignoreNulls = true).over(wb))
      .withColumn("next_ts", first(col("click_ts"), ignoreNulls = true).over(wf))
      .filter(col("is_left") === 1)
      .select(
        col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), nearest.as("nearest_ts"),
        abs(nearest - col("ts")).as("gap_us"))
      .orderBy("user_id", "purchase_ts", "purchase_id")
  }

  /** (purchase, click) TOUCHES inside the trailing 30-minute window —
    * the 2-bucket banded range equi-join shared by
    * [[rangeClicksBeforePurchase]] and [[attributionLinear]]. `p`
    * must carry (user_id, pts µs, …), `c` (user_id, cts µs, …).
    * Integer `div` for bucketing: `/` on longs is DOUBLE division in
    * Spark, and epoch-µs values sit near double's 53-bit mantissa. */
  private def bandedTouches(p: DataFrame, c: DataFrame): DataFrame = {
    val pb = p.withColumn("bkt", explode(array(
      expr(s"pts div ${BucketUs}L"), expr(s"pts div ${BucketUs}L") - 1)))
    val cb = c.withColumn("bkt", expr(s"cts div ${BucketUs}L"))
    pb.join(cb, Seq("user_id", "bkt"))
      .filter(col("cts") >= col("pts") - BucketUs && col("cts") <= col("pts"))
  }

  /** Count + span of clicks in the 30 minutes before each purchase
    * (range join via 2-bucket banding + exact interval filter). */
  def rangeClicksBeforePurchase(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    bandedTouches(
      e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("pts")),
      e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("cts")))
      .groupBy("user_id", "purchase_id", "pts")
      .agg(count(lit(1)).as("n_clicks"), min("cts").as("first_click_ts"))
      .select(col("user_id"), col("purchase_id"), col("n_clicks"), col("first_click_ts"))
      .orderBy("user_id", "purchase_id")
  }

  /** Multi-touch LINEAR ATTRIBUTION — the marketing-analytics closer
    * of the temporal-join family: every purchase's value is split
    * EQUALLY across all clicks in its preceding 30-minute window
    * (as-of gives last-touch; this is the other standard model), and
    * the attributed mass rolls up per click day. Exactness is the
    * point: cents split by INTEGER division with the remainder
    * assigned to the earliest touch (ties to the smaller click id),
    * so per-purchase shares re-sum to the purchase exactly and the
    * whole report is integer arithmetic — a double split would leak
    * sub-cent mass and could never hash-match.
    *
    * Execution: the [[rangeClicksBeforePurchase]] 2-bucket banded
    * range join produces (purchase, click) touches; the per-purchase
    * count and first-touch rank ride ONE purchase-keyed window
    * (bounded by the window's click fan-in, never corpus-wide);
    * the rollup is an ordinary day-keyed partial+final agg. */
  def attributionLinear(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables(s, d, "events").select(
      col("event_id"), graft.Core.epochUs(col("ts")).as("ts"),
      col("user_id"), col("event_type"),
      round(col("value") * 100).cast("long").as("cents"))
    val touches = bandedTouches(
      e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("pid"),
          col("ts").as("pts"), col("cents")),
      e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("cid"),
          col("ts").as("cts")))
      .select("pid", "cents", "cid", "cts")
    val byP = Window.partitionBy("pid")
    val shared = touches
      .withColumn("n", count(lit(1)).over(byP))
      .withColumn("rn", row_number().over(byP.orderBy("cts", "cid")))
      .withColumn("share", expr("cents div n") +
        when(col("rn") === 1, col("cents") - col("n") * expr("cents div n"))
          .otherwise(0L))
    shared.groupBy(expr("cts div 86400000000").as("day"))
      .agg(sum("share").as("attributed_cents"),
        count(lit(1)).as("n_touches"),
        countDistinct(col("pid")).as("n_purchases"))
      .orderBy("day")
  }

  /** Row shape for the typed merge as-of join (public: encoder
    * codegen reflects on the constructor). */
  case class Evt(user_id: Long, ts: Long, event_id: Long)

  /** The SAME as-of semantics as [[asofClickBeforePurchase]], spelled
    * as a true per-partition MERGE JOIN via the typed
    * `cogroupSorted` API — the Spark-native way to get a custom
    * whole-operator join without private physical-plan APIs: the
    * planner gives each side one hash exchange on user_id plus an
    * in-partition sort (asserted in PlanSpec), and the lambda
    * walks both sorted iterators once per user — O(n+m), zero
    * allocation beyond the cursor, no join explosion. The two
    * spellings are verified against the identical DuckDB ASOF JOIN
    * oracle, so hash-green rows prove they agree row-for-row.
    *
    * At 100 TB this is the shape of choice when the right side needs
    * arbitrary per-group logic (multi-column carry-forward, staleness
    * eviction, interpolation) that the window-function spelling can't
    * express. */
  def asofMergeJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = events(s, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id")).as[Evt]
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id")).as[Evt]
    purchases.groupByKey(_.user_id)
      .cogroupSorted(clicks.groupByKey(_.user_id))(col("ts"), col("event_id"))(col("ts")) {
        (uid, ps, cs) =>
          val cIt = cs.buffered
          var lastClick: Option[Long] = None
          ps.map { p =>
            while (cIt.hasNext && cIt.head.ts <= p.ts) lastClick = Some(cIt.next().ts)
            (uid, p.event_id, p.ts, lastClick)
          }
      }
      .toDF("user_id", "purchase_id", "purchase_ts", "last_click_ts")
      .orderBy("user_id", "purchase_ts", "purchase_id")
  }

  val queries: Seq[Q] = Seq(
    // oracle: per-user argmin over the blocked pair set (correct at
    // oracle size; the engine's two-direction carry exists for the
    // 100 TB case where within-user pairing would fan out)
    Q("asof_nearest_click", asofNearestClick, Some(
      """WITH p AS (SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS pts
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_us(ts) AS cts
        |      FROM events WHERE event_type = 'click'),
        |best AS (
        |  SELECT purchase_id, cts FROM (
        |    SELECT p.purchase_id, c.cts,
        |      row_number() OVER (PARTITION BY p.purchase_id
        |        ORDER BY abs(c.cts - p.pts), c.cts) AS rn
        |    FROM p JOIN c USING (user_id)) q WHERE rn = 1)
        |SELECT p.user_id, p.purchase_id, p.pts AS purchase_ts,
        |  best.cts AS nearest_ts, abs(best.cts - p.pts) AS gap_us
        |FROM p LEFT JOIN best USING (purchase_id)
        |ORDER BY user_id, purchase_ts, purchase_id""".stripMargin)),
    Q("asof_click_purchase", asofClickBeforePurchase, Some(
      """SELECT p.user_id AS user_id, p.event_id AS purchase_id,
        |  epoch_us(p.ts) AS purchase_ts, epoch_us(c.ts) AS last_click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY user_id, purchase_ts, purchase_id""".stripMargin)),
    Q("range_clicks_purchase", rangeClicksBeforePurchase, Some(
      """SELECT p.user_id AS user_id, p.event_id AS purchase_id,
        |  COUNT(*) AS n_clicks, min(epoch_us(c.ts)) AS first_click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        |  AND c.ts >= p.ts - INTERVAL '30 minutes' AND c.ts <= p.ts
        |GROUP BY 1, 2 ORDER BY user_id, purchase_id""".stripMargin)),
    // oracle: the same exact integer split — floor shares + the
    // remainder pinned to the (cts, cid)-first touch via row_number
    Q("events_attribution", attributionLinear, Some(
      """WITH p AS (SELECT user_id, event_id AS pid, ts AS pts,
        |             CAST(round(value*100) AS BIGINT) AS cents
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, event_id AS cid, ts AS cts
        |      FROM events WHERE event_type = 'click'),
        |t AS MATERIALIZED (
        |  SELECT p.pid, p.cents, c.cid, epoch_us(c.cts) AS cus
        |  FROM p JOIN c ON p.user_id = c.user_id
        |    AND c.cts >= p.pts - INTERVAL '30 minutes' AND c.cts <= p.pts),
        |sh AS (
        |  SELECT cus, cents // n + CASE WHEN rn = 1
        |      THEN cents - n * (cents // n) ELSE 0 END AS share, pid
        |  FROM (SELECT pid, cents, cid, cus,
        |          COUNT(*) OVER (PARTITION BY pid) AS n,
        |          row_number() OVER (PARTITION BY pid
        |            ORDER BY cus, cid) AS rn
        |        FROM t) q)
        |SELECT cus // 86400000000 AS day,
        |  CAST(SUM(share) AS BIGINT) AS attributed_cents,
        |  COUNT(*) AS n_touches,
        |  CAST(COUNT(DISTINCT pid) AS BIGINT) AS n_purchases
        |FROM sh GROUP BY 1 ORDER BY day""".stripMargin)),
    Q("asof_merge_join", asofMergeJoin, Some(
      """SELECT p.user_id AS user_id, p.event_id AS purchase_id,
        |  epoch_us(p.ts) AS purchase_ts, epoch_us(c.ts) AS last_click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY user_id, purchase_ts, purchase_id""".stripMargin)),
  )
}
