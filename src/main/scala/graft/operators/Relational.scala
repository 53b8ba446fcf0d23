package graft.operators

import graft.{Core, Q, Tables}
import graft.Core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational surface over the driver's TPC-H-ish star schema —
  * the operator categories SURVEY.md §2b lists as absent from the
  * reference (joins, multi-key aggregation, distinct, top-k, set ops,
  * rollup/cube) but required of the engine.
  *
  * Scale posture: every query is a declarative plan — filters and
  * projections reach the parquet scan (PushedFilters/ReadSchema),
  * aggregation is partial+final, dimension joins are explicitly
  * broadcast, fact-fact joins shuffle on their keys and are left to
  * AQE for skew/plan adaptation. No collect-to-driver anywhere.
  *
  * Oracle-parity note: double sums are computed via exact DECIMAL and
  * cast back to double (see [[graft.Core.dsum]]) so Spark and DuckDB
  * agree bit-for-bit regardless of accumulation order.
  */
object Relational {

  private def li(s: SparkSession, d: String) = Tables(s, d, "lineitem")
  private def ord(s: SparkSession, d: String) = Tables(s, d, "orders")
  private def cust(s: SparkSession, d: String) = Tables(s, d, "customer")

  /** TPC-H Q1-style pricing summary: multi-key agg, exact-decimal
    * sums, deterministic avg. Partial agg collapses 6 groups before
    * the exchange — shuffle traffic is O(groups), not O(rows). */
  def pricingSummary(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Filtered scan + narrow projection: Catalyst pushes both the
    * predicate and the 3-column ReadSchema into the parquet scan. */
  def filterPushdown(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .filter(col("l_quantity") > 45 && col("l_discount") > 0.05)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Broadcast hash join of two dimensions — no shuffle at all. */
  def joinBroadcast(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "nation")
      .join(broadcast(Tables(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name"), col("r_name"))
      .orderBy("n_name")

  /** Fact⋈dim join + agg: revenue per market segment. Customer is
    * SF-proportional (SF×150k rows), so no hardcoded broadcast hint:
    * parquet size stats + AQE pick broadcast while it fits under
    * autoBroadcastJoinThreshold and fall back to a shuffled join at
    * cluster scale, where forcing the hint would OOM the driver. */
  def joinMktsegment(s: SparkSession, d: String): DataFrame =
    ord(s, d)
      .join(cust(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment")

  /** Left-semi join: customers that have at least one order (EXISTS).
    * Semi joins ship only the join key of the right side. */
  def joinSemi(s: SparkSession, d: String): DataFrame =
    cust(s, d)
      .join(ord(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  /** Left-anti join: customers with no orders (NOT EXISTS). */
  def joinAnti(s: SparkSession, d: String): DataFrame =
    cust(s, d)
      .join(ord(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  /** NOT IN subquery — NULL-AWARE anti join, the trap `left_anti`
    * does not cover: if the subquery produces even one NULL, SQL says
    * `x NOT IN (...)` is never TRUE and the result must be empty.
    * The `nullif` keeps the planner from proving the subquery
    * non-null, so Spark must plan the runtime null-aware path — a
    * BroadcastHashJoin with its isNullAwareAntiJoin flag set
    * (PlanSpec asserts it) — rather than degrade to a plain anti
    * join; at runtime no NULL materializes (-1 is not a key), so the
    * result equals NOT EXISTS restricted to urgent orders — both
    * engines evaluate the identical three-valued-logic semantics. */
  def joinNullAwareAnti(s: SparkSession, d: String): DataFrame = {
    cust(s, d).createOrReplaceTempView("naa_customer")
    ord(s, d).createOrReplaceTempView("naa_orders")
    s.sql(
      """SELECT c_custkey, c_name FROM naa_customer
        |WHERE c_custkey NOT IN
        |  (SELECT nullif(o_custkey, -1) FROM naa_orders
        |   WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Scalar subquery: orders above the corpus-average price. The
    * average is the exact-decimal [[graft.Core.davg]] spelling IN
    * SQL TEXT, so both engines compare against the bit-identical
    * double threshold (a plain avg(double) is order-dependent and
    * could flip rows at the boundary). */
  def scalarSubquery(s: SparkSession, d: String): DataFrame = {
    ord(s, d).createOrReplaceTempView("sq_orders")
    s.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice FROM sq_orders
        |WHERE o_totalprice >
        |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        |   FROM sq_orders)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Correlated EXISTS subquery: nations that have at least one
    * high-balance customer. Catalyst decorrelates this into a
    * left-semi join on the correlation key (RewritePredicateSubquery)
    * — at scale it ships only nationkeys of qualifying customers, not
    * the customer rows. */
  def existsCorrelated(s: SparkSession, d: String): DataFrame = {
    Tables(s, d, "nation").createOrReplaceTempView("ec_nation")
    cust(s, d).createOrReplaceTempView("ec_customer")
    s.sql(
      """SELECT n_nationkey, n_name FROM ec_nation
        |WHERE EXISTS (SELECT 1 FROM ec_customer
        |              WHERE c_nationkey = n_nationkey AND c_acctbal > 9000)
        |ORDER BY n_nationkey""".stripMargin)
  }

  /** arg-min/arg-max aggregation: per order priority, the order that
    * has the highest / lowest total price. Spelled as `max(struct(
    * price, key))` — the composite makes ties deterministic (price
    * first, then key), unlike a bare `max_by`, and still plans as one
    * partial+final HashAggregate (no window, no second pass). */
  def argMinMax(s: SparkSession, d: String): DataFrame =
    ord(s, d)
      .groupBy("o_orderpriority")
      .agg(
        max(struct(col("o_totalprice"), col("o_orderkey"))).as("hi"),
        min(struct(col("o_totalprice"), col("o_orderkey"))).as("lo"),
        count(lit(1)).as("n"))
      .select(
        col("o_orderpriority"),
        col("hi.o_orderkey").as("top_orderkey"),
        col("hi.o_totalprice").as("top_price"),
        col("lo.o_orderkey").as("bottom_orderkey"),
        col("lo.o_totalprice").as("bottom_price"),
        col("n"))
      .orderBy("o_orderpriority")

  /** 5-way star join: revenue per (region, nation). The two fact
    * tables (lineitem⋈orders) shuffle on orderkey; nation/region are
    * constant-size and carry explicit broadcast hints, while customer
    * (SF-proportional) is left to stats/AQE — broadcast while small,
    * shuffled at the scale where a forced multi-GB broadcast would
    * OOM. One fact shuffle total for the join tree either way. */
  def joinMultiway(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(cust(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("r_name", "n_name")

  /** Top-k with a total order (price desc, key asc) so ties are
    * deterministic. Spark plans this as TakeOrderedAndProject — a
    * per-partition top-k then a k-row merge, never a full sort. */
  def topkOrders(s: SparkSession, d: String): DataFrame =
    ord(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** Exact + distinct aggregation per supplier. */
  def distinctParts(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .groupBy("l_suppkey")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_lines"))
      .orderBy("l_suppkey")

  /** Set ops (distinct semantics, like SQL UNION/INTERSECT/EXCEPT). */
  def setopUnion(s: SparkSession, d: String): DataFrame = {
    val o = ord(s, d)
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .union(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      .distinct()
      .orderBy("o_custkey")
  }

  def setopIntersect(s: SparkSession, d: String): DataFrame = {
    val o = ord(s, d)
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .intersect(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      .orderBy("o_custkey")
  }

  def setopExcept(s: SparkSession, d: String): DataFrame = {
    val o = ord(s, d)
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .except(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      .orderBy("o_custkey")
  }

  /** FULL OUTER join — reconciliation shape: customers (minus a
    * deterministic subset, so the right-only branch is non-empty)
    * against per-customer order counts; unmatched sides survive with
    * nulls. Full outer can't broadcast (both sides must surface
    * unmatched rows), so it plans as a both-sides shuffle on the key
    * — the honest cost of reconciliation at any scale. */
  def joinFullOuter(s: SparkSession, d: String): DataFrame = {
    val c = cust(s, d).filter(col("c_custkey") % 3 =!= 0).select("c_custkey")
    val o = ord(s, d).groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
    c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_custkey").isNotNull.cast("int").as("has_customer"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy("custkey")
  }

  /** SQL LATERAL join: per nation, the top-2 customers by balance via
    * a correlated derived table — the "top-N related rows per driving
    * row" idiom. Catalyst decorrelates the lateral subquery; the
    * equivalent window formulation is [[graft.operators.Windows]]'
    * top-N, and both plan one shuffle on the correlation key. */
  def joinLateral(s: SparkSession, d: String): DataFrame = {
    Tables(s, d, "nation").createOrReplaceTempView("jl_nation")
    cust(s, d).createOrReplaceTempView("jl_customer")
    s.sql(
      """SELECT n_nationkey, n_name, c_custkey, c_acctbal
        |FROM jl_nation JOIN LATERAL (
        |  SELECT c_custkey, c_acctbal FROM jl_customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2)
        |ORDER BY n_nationkey, c_acctbal DESC, c_custkey""".stripMargin)
  }

  /** Explicit SALTED join — the manual skew-mitigation pattern for a
    * shuffle join whose key has heavy hitters. The fact side
    * (lineitem) gets a deterministic salt in [0, 8); the build side
    * (per-order totals) is replicated ×8 with `explode(sequence)` so
    * every (key, salt) cell finds its match; the join runs on the
    * COMPOSITE (key, salt), spreading each hot orderkey across 8
    * reducers. AQE's skew-join split handles sort-merge skew
    * adaptively, but salting is the portable form — it also fixes
    * skew AQE can't touch (hash-agg hot keys, pre-AQE engines,
    * bucketed layouts) — so the engine carries it as a first-class
    * spelling. Same oracle as the unsalted join: the salt must be
    * invisible in the result. The salt is deterministic (hash of the
    * line number, not rand()) so reruns and retried tasks agree. */
  def joinSkewSalted(s: SparkSession, d: String): DataFrame = {
    val S = 8
    val fact = li(s, d)
      .select(col("l_orderkey"), col("l_quantity"))
      .withColumn("salt", pmod(hash(col("l_orderkey"), col("l_quantity")), lit(S)))
    val dim = ord(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .withColumn("salt", explode(sequence(lit(0), lit(S - 1))))
    fact.hint("merge")
      .join(dim, col("l_orderkey") === col("o_orderkey") && fact("salt") === dim("salt"))
      .groupBy("o_orderpriority")
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_lines"))
      .orderBy("o_orderpriority")
  }

  /** Multiset (bag) semantics: EXCEPT ALL keeps multiplicity
    * max(m−n, 0) per key, INTERSECT ALL keeps min(m, n) — both plan
    * as one shuffle with per-side counts, no join explosion. The
    * result is aggregated per key (key, multiplicity) so the check
    * pins the bag cardinalities exactly. */
  def setopExceptAll(s: SparkSession, d: String): DataFrame = {
    val o = ord(s, d)
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .exceptAll(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      .groupBy("o_custkey").agg(count(lit(1)).as("multiplicity"))
      .orderBy("o_custkey")
  }

  def setopIntersectAll(s: SparkSession, d: String): DataFrame = {
    val o = ord(s, d)
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .intersectAll(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      .groupBy("o_custkey").agg(count(lit(1)).as("multiplicity"))
      .orderBy("o_custkey")
  }

  /** ROLLUP over (returnflag, linestatus). Grouping levels are marked
    * by coalescing to 'ALL' (data is never null) so null-ordering
    * differences between engines can't bite. */
  def rollupSales(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"), col("n"))
      .orderBy("rf", "ls")

  /** PIVOT: one row per linestatus, one quantity-total column per
    * return flag. Values are supplied explicitly, so Spark plans a
    * SINGLE aggregate with conditional partials (no extra
    * distinct-values job) — exactly the SUM(CASE …) plan the oracle
    * spells; at 100 TB that is one map-side-combined exchange on the
    * group key, identical to any other aggregate. */
  def pivotSales(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .groupBy("l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(dsum(col("l_quantity")))
      .select(col("l_linestatus"), col("A").as("qty_a"),
        col("N").as("qty_n"), col("R").as("qty_r"))
      .orderBy("l_linestatus")

  /** UNPIVOT (melt) — the inverse of [[pivotSales]]: the wide
    * per-flag quantity columns come back as (flag, qty) rows. Melt is
    * a zero-shuffle projection (each input row explodes to |columns|
    * rows map-side). */
  def unpivotSales(s: SparkSession, d: String): DataFrame =
    pivotSales(s, d)
      .unpivot(
        Array(col("l_linestatus")),
        Array(col("qty_a"), col("qty_n"), col("qty_r")),
        "flag", "qty")
      .filter(col("qty").isNotNull)
      .orderBy("l_linestatus", "flag")

  /** CUBE over (returnflag, linestatus) — all 2^2 grouping sets. */
  def cubeSales(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .cube("l_returnflag", "l_linestatus")
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"), col("n"))
      .orderBy("rf", "ls")

  /** TPC-H Q6-style forecast: single-table agg under a selective
    * conjunctive predicate — everything pushes to the scan. */
  def revenueForecast(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n"))

  /** TPC-H Q14-style promotion-revenue share: conditional aggregation
    * as a RATIO — both numerator and denominator accumulate in one
    * partial+final aggregate over one scan (no self-join, no second
    * pass), the dimension predicate rides the part join. Part is
    * SF-proportional (SF×200k rows) so the join strategy is left to
    * stats/AQE — broadcast while the 2-column projection is small,
    * shuffled at cluster scale. Exact decimal sums on both sides of
    * the division keep the ratio bit-identical across engines. */
  def promoRevenue(s: SparkSession, d: String): DataFrame = {
    val part = Tables(s, d, "part").select("p_partkey", "p_type")
    val dp = dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - dec(col("l_discount")))
    li(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(part, col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) * sum(when(col("p_type") === "PROMO", dp).otherwise(lit(0).cast("decimal(12,2)"))).cast("double")
          / sum(dp).cast("double")).as("promo_share_pct"),
        count(lit(1)).as("n"))
  }

  /** TPC-H Q18-style large-volume orders: a grouped HAVING subquery
    * feeding a fact⋈fact join. The per-order quantity rollup hash-
    * partitions lineitem on l_orderkey — the SAME key the orders join
    * needs, so the aggregate's exchange is reused by the join (one
    * lineitem shuffle total, asserted in PlanSpec); the HAVING
    * filter collapses the join input to the few giant orders before
    * anything wide touches `orders`; the customer join strategy is
    * stats-driven (no hint — customer is SF-proportional). Ties at
    * the limit boundary are impossible to mis-order: o_orderkey is
    * unique and breaks o_totalprice ties. */
  def largeOrders(s: SparkSession, d: String): DataFrame = {
    val big = li(s, d)
      .groupBy("l_orderkey")
      .agg(dsum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 300)
    ord(s, d)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(cust(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Recursive CTE (Spark 4 `WITH RECURSIVE`): a data-derived month
    * spine — anchor = first order month (carrying the last month
    * along as the stop bound so the recursive member references only
    * the recursive relation), step = +1 month — LEFT-joined to the
    * per-month order rollup so gap months surface as explicit zero
    * rows. The spine is |months| rows built driver-side by the
    * recursion (depth ≈ 80 « the 100-level default limit); the scan
    * and rollup stay fully distributed, so at 100 TB the recursion
    * cost is invisible — a deliberate contrast with the day-grain
    * alternative (2400+ sequential levels), which is the WRONG tool:
    * a `sequence()` explode generates large spines in parallel. */
  def monthSpine(s: SparkSession, d: String): DataFrame = {
    ord(s, d).createOrReplaceTempView("cf_orders")
    s.sql(
      """WITH RECURSIVE spine AS (
        |  SELECT CAST(date_trunc('MONTH', min(o_orderdate)) AS DATE) AS mo,
        |         CAST(date_trunc('MONTH', max(o_orderdate)) AS DATE) AS mx
        |  FROM cf_orders
        |  UNION ALL
        |  SELECT add_months(mo, 1), mx FROM spine WHERE mo < mx
        |)
        |SELECT date_format(mo, 'yyyy-MM') AS month,
        |  coalesce(n_orders, 0L) AS n_orders,
        |  coalesce(revenue, 0.0D) AS revenue
        |FROM spine LEFT JOIN (
        |  SELECT CAST(date_trunc('MONTH', o_orderdate) AS DATE) AS mo,
        |    COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |  FROM cf_orders GROUP BY 1) agg USING (mo)
        |ORDER BY month""".stripMargin)
  }

  /** TPC-H Q3-style shipping priority: selective fact⋈fact join +
    * grouped revenue + top-10. The filtered customer side is still
    * SF-proportional (one market segment ≈ SF×30k rows), so no
    * broadcast hint — stats/AQE choose, and AQE re-plans to broadcast
    * at runtime when the filtered size comes in under threshold. */
  def shippingPriority(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .filter(col("l_shipdate") > lit("1996-03-15").cast("timestamp"))
      .join(ord(s, d).filter(col("o_orderdate") < lit("1996-03-15").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust(s, d).filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .select(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  /** TPC-H Q10-style returned-item revenue: which customers returned
    * the most revenue in one half-year. Both fact filters (returnflag,
    * order-date range) push into the parquet scans; the fact⋈fact
    * join shuffles on orderkey once; customer is SF-proportional so
    * its join is stats-driven (no hint), nation broadcasts by hint.
    * Top-20 plans as TakeOrderedAndProject (per-partition heap +
    * 20-row merge, never a global sort); o_custkey... c_custkey
    * breaks revenue ties, so the limit boundary is deterministic. */
  def returnedRevenue(s: SparkSession, d: String): DataFrame =
    li(s, d).filter(col("l_returnflag") === "R")
      .join(ord(s, d).filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** TPC-H Q19-style disjunctive predicate: revenue from an OR of
    * three (brand, size-range, quantity-range) clauses — the classic
    * "can the optimizer see through a disjunction" probe. Catalyst
    * pushes the whole OR below the join on each side's columns it
    * can: the per-side disjunction of brand/size terms reaches the
    * part scan, the quantity disjunction the lineitem scan (asserted
    * in PlanSpec), so at 100 TB neither scan materializes
    * non-qualifying rows just to throw them away at the join. */
  def brandQuantity(s: SparkSession, d: String): DataFrame = {
    val part = Tables(s, d, "part").select("p_partkey", "p_brand", "p_size")
    def clause(brand: String, szHi: Int, qLo: Int, qHi: Int) =
      col("p_brand") === brand &&
        col("p_size").between(1, szHi) &&
        col("l_quantity").between(qLo, qHi)
    li(s, d)
      .join(part, col("l_partkey") === col("p_partkey"))
      .filter(clause("Brand#11", 10, 1, 11) ||
        clause("Brand#12", 15, 10, 20) ||
        clause("Brand#13", 25, 20, 30))
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q12-style shipmode classification: join + conditional
    * aggregation (CASE inside SUM). */
  def shipmodePriority(s: SparkSession, d: String): DataFrame =
    ord(s, d)
      .join(li(s, d), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("low_line_count"))
      .orderBy("l_linestatus")

  /** TPC-H Q4-style priority check: EXISTS-correlated subquery →
    * LEFT SEMI join + agg. (The synthetic schema lacks Q4's
    * commit/receipt dates, so the exists predicate is "has a returned
    * line".) The semi join emits each qualifying order once — no
    * duplicate-then-distinct — and the lineitem side's returnflag
    * filter pushes into its scan, so at 100 TB the probe side ships
    * only ~¼ of lineitem keys into the shuffle. */
  def orderPriorityCheck(s: SparkSession, d: String): DataFrame =
    ord(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .join(li(s, d).filter(col("l_returnflag") === "R").select("l_orderkey"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")

  /** TPC-H Q13-style customer order-count distribution: LEFT OUTER
    * join with a predicate in the ON clause (NOT a post-join WHERE —
    * customers with zero matching orders must survive with count 0),
    * then a two-level aggregation. The first agg keys on c_custkey
    * (shuffle is O(customers) — already co-partitioned with the join
    * output, so no second exchange); the distribution agg collapses
    * to |distinct counts| rows map-side. */
  def custOrderDistribution(s: SparkSession, d: String): DataFrame =
    cust(s, d)
      .join(ord(s, d),
        col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= "1-URGENT",
        "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** TPC-H Q17-style small-quantity revenue: a correlated scalar-agg
    * subquery (l_quantity < 0.2 × avg quantity OF THAT PART),
    * decorrelated by hand into pre-agg + join — the plan Catalyst's
    * DecorrelateInnerQuery would produce, written explicitly: compute
    * the per-partkey average ONCE over the brand-qualifying rows
    * (partkey determines brand, so restricting before the avg is
    * semantics-preserving and skips 24/25 of lineitem), then join it
    * back. A per-row subquery re-scan — the naive spelling — would be
    * O(rows × partkeys) at 100 TB. The brand-filtered part side is
    * SF-proportional, so no broadcast hint: stats/AQE decide. */
  def smallQuantityRevenue(s: SparkSession, d: String): DataFrame = {
    val parts = Tables(s, d, "part")
      .filter(col("p_brand") === "Brand#13").select("p_partkey")
    val lq = cached(li(s, d)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(parts, col("l_partkey") === col("p_partkey")))
    val perPart = lq.groupBy("l_partkey").agg(davg(col("l_quantity")).as("avg_qty"))
    lq.join(perPart, "l_partkey")
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
  }

  /** TPC-H Q21-style "sole problem supplier": the classic
    * EXISTS + NOT-EXISTS double-correlation on the fact table itself —
    * suppliers with a returned line in a multi-supplier order where NO
    * other supplier returned anything. Plans as one semi and one anti
    * join over the deduplicated (orderkey, suppkey) pair set: the
    * correlation key is orderkey, so all three legs co-partition on
    * the same shuffle key and AQE can reuse the exchange; nothing is
    * evaluated per-row against a subquery. Supplier is
    * SF-proportional — stats-driven join, no hint. */
  def soleProblemSupplier(s: SparkSession, d: String): DataFrame = {
    val pairs = li(s, d).select("l_orderkey", "l_suppkey").distinct()
    val rPairs = li(s, d).filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_suppkey").distinct()
    val others = pairs
      .withColumnRenamed("l_orderkey", "o2_orderkey")
      .withColumnRenamed("l_suppkey", "o2_suppkey")
    val rOthers = rPairs
      .withColumnRenamed("l_orderkey", "r2_orderkey")
      .withColumnRenamed("l_suppkey", "r2_suppkey")
    rPairs
      .join(others, col("l_orderkey") === col("o2_orderkey") &&
        col("l_suppkey") =!= col("o2_suppkey"), "left_semi")
      .join(rOthers, col("l_orderkey") === col("r2_orderkey") &&
        col("l_suppkey") =!= col("r2_suppkey"), "left_anti")
      .join(Tables(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** TPC-H Q22-style dormant high-balance accounts: a scalar-agg
    * subquery (global average balance of in-credit customers) feeding
    * a filter, plus a NOT EXISTS anti join against orders. The scalar
    * is one row — broadcast as a 1-row cross join, evaluated once,
    * never per-row; the anti join probes the filtered custkey set.
    * Grouped by nation (the synthetic schema's analog of Q22's phone
    * country code; "dormant" here = no urgent-priority orders, since
    * every synthetic customer has at least one order). */
  def dormantBalances(s: SparkSession, d: String): DataFrame = {
    val avgBal = cust(s, d).filter(col("c_acctbal") > 0)
      .agg(davg(col("c_acctbal")).as("avg_bal"))
    cust(s, d)
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(ord(s, d).filter(col("o_orderpriority") === "1-URGENT")
        .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy("c_nationkey")
  }

  /** Incremental aggregate maintenance — the pattern that makes a
    * 100 TB rollup affordable day over day: yesterday's materialized
    * partial aggregate MERGES with today's delta through a full-outer
    * join + coalesced combine, never rescanning history. Works
    * because sum/count partials are re-aggregatable state (the same
    * property the HLL rollup exploits for distincts); the decimal
    * sums stay exact through the merge and convert to double ONCE at
    * the end, so the merged result is bit-identical to the oracle's
    * single-pass aggregate over all rows. */
  def incrementalRollup(s: SparkSession, d: String): DataFrame = {
    val cut = lit("1999-01-01").cast("timestamp")
    def rollup(df: DataFrame, n: String, t: String) = df
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as(n), sum(dec(col("o_totalprice"))).as(t))
    val base = rollup(ord(s, d).filter(col("o_orderdate") < cut), "n0", "t0")
    val delta = rollup(ord(s, d).filter(col("o_orderdate") >= cut), "n1", "t1")
    base.join(delta, Seq("o_orderpriority"), "full_outer")
      .select(col("o_orderpriority"),
        (coalesce(col("n0"), lit(0L)) + coalesce(col("n1"), lit(0L))).as("n_orders"),
        (coalesce(col("t0"), lit(0).cast("decimal(22,2)")) +
          coalesce(col("t1"), lit(0).cast("decimal(22,2)")))
          .cast("double").as("sum_price"))
      .orderBy("o_orderpriority")
  }

  /** Incremental aggregate maintenance under RETRACTIONS — the CDC
    * half [[incrementalRollup]] doesn't cover: the change feed
    * carries DELETEs as well as inserts, and the materialized rollup
    * is repaired, never recomputed. Signed-weight folding is the
    * whole trick: each change row carries op = ±1 and contributes
    * (op, op·measure) to the same re-aggregatable (count, sum)
    * state, so a delete is just a negative partial and the merge is
    * the identical full-outer + coalesced combine. Works for any
    * group the deletes can empty (a count repaired to 0 simply
    * stays as a zero row — distinguishable, and prunable downstream).
    * Feed fixture: base = even event_ids, deletes retract the
    * multiples of 4, inserts add the odd ids — so the maintained
    * state must land exactly on the direct aggregate of
    * `event_id % 4 <> 0`. Exactness: the measure folds in integer
    * CENTS (the `stream_user_stats` scheme), so negative partials
    * cancel bit-for-bit. */
  def retractRollup(s: SparkSession, d: String): DataFrame = {
    val ev = Tables(s, d, "events")
    val cents =
      floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
    def rollup(df: DataFrame, n: String, t: String) = df
      .groupBy("event_type")
      .agg(sum(col("op")).as(n), sum(col("op") * cents).as(t))
    val base = rollup(
      ev.filter(col("event_id") % 2 === 0).withColumn("op", lit(1L)),
      "n0", "t0")
    val changes =
      ev.filter(col("event_id") % 4 === 0).withColumn("op", lit(-1L))
        .unionByName(
          ev.filter(col("event_id") % 2 === 1).withColumn("op", lit(1L)))
    val delta = rollup(changes, "n1", "t1")
    base.join(delta, Seq("event_type"), "full_outer")
      .select(col("event_type"),
        (coalesce(col("n0"), lit(0L)) + coalesce(col("n1"), lit(0L))).as("n_events"),
        (coalesce(col("t0"), lit(0L)) + coalesce(col("t1"), lit(0L))).as("sum_cents"))
      // groups the retractions emptied are pruned, matching the
      // direct aggregate (which never sees them)
      .filter(col("n_events") > 0)
      .orderBy("event_type")
  }

  /** Explicit GROUPING SETS through the SQL surface: per-flag,
    * per-status, and grand-total rows in one pass. */
  def groupingSets(s: SparkSession, d: String): DataFrame = {
    li(s, d).createOrReplaceTempView("lineitem_gs")
    s.sql(
      s"""SELECT coalesce(l_returnflag, 'ALL') AS rf,
         |  coalesce(l_linestatus, 'ALL') AS ls,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
         |  COUNT(*) AS n
         |FROM lineitem_gs
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY rf, ls""".stripMargin)
  }

  /** TPC-DS-style 8-set reporting cube (r16 verdict stretch): revenue
    * by order-year × customer-nation × order-priority across the FULL
    * grouping lattice — the channel × cohort × time report shape
    * TPC-DS's rollup queries (q27/q36/q67) run, where a single fact
    * pass feeds every aggregation level and `GROUPING_ID` labels the
    * level. [[groupingSets]] is the 3-set version over one table;
    * this is the 8-set star version: fact (orders) joins the
    * dimension (customer → nation, nation broadcast) ONCE, then one
    * Expand ×8 feeds one partial+final aggregate — never eight scans
    * (PlanSpec pins the single orders scan + Expand).
    *
    * Scale: Expand multiplies rows ×8 BEFORE the exchange, but
    * partial aggregation collapses each set to its group cardinality
    * map-side, so the shuffle carries ~|years×nations×priorities|
    * rows per set, not ×8 fact rows. */
  /** The 8-set lattice frame shared by [[groupingSetsDs8]] (the raw
    * report) and [[ds8TopCells]] (the ranked consumer). */
  private def ds8Lattice(s: SparkSession, d: String): DataFrame = {
    val f = ord(s, d)
      .select(col("o_custkey"), year(col("o_orderdate")).as("yr"),
        col("o_orderpriority").as("priority"), dec(col("o_totalprice")).as("rev"))
      .join(cust(s, d).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(s, d, "nation").select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
    f.cube(col("yr"), col("n_name"), col("priority"))
      .agg(grouping_id().as("gid"), sum(col("rev")).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .select(col("gid").cast("long").as("gid"),
        coalesce(col("yr").cast("long"), lit(-1L)).as("yr"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        coalesce(col("priority"), lit("ALL")).as("priority"),
        col("revenue"), col("n_orders"))
  }

  def groupingSetsDs8(s: SparkSession, d: String): DataFrame =
    ds8Lattice(s, d).orderBy("gid", "yr", "nation", "priority")

  /** Rank-over-rollup — the standard TPC-DS reporting consumer the
    * 8-set lattice is FOR (q67's shape: `rank() OVER (PARTITION BY
    * category ORDER BY sumsales DESC)` over the rollup output, top-k
    * kept): within every (gid, yr) slice of the lattice, the top-3
    * cells by revenue. The Window runs over the LATTICE FRAME — a few
    * hundred rows of aggregates — never the fact table (PlanSpec pins
    * the Window above the aggregate, one orders scan below it); the
    * ordering is total ((revenue DESC, nation, priority) — exact
    * doubles from exact decimal sums, then unique group keys), so
    * row_number is deterministic and equals rank. */
  def ds8TopCells(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("gid"), col("yr"))
      .orderBy(col("revenue").desc, col("nation"), col("priority"))
    ds8Lattice(s, d)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .orderBy("gid", "yr", "rnk")
  }

  /** TPC-H Q5-style local-supplier volume: the six-table regional
    * revenue join. The region filter collapses to a handful of nation
    * keys that BROADCAST into the supplier join, so fact rows from
    * non-ASIA suppliers die before anything wide happens; the
    * customer join then carries the classic Q5 twist — an equi-key
    * (o_custkey = c_custkey) PLUS the residual c_nationkey =
    * s_nationkey "local" condition, which Catalyst keeps as a cheap
    * post-probe filter on the same hash join rather than a second
    * shuffle. Customer/supplier are SF-proportional: stats/AQE pick
    * their strategies. */
  def localSupplierVolume(s: SparkSession, d: String): DataFrame = {
    val natAsia = Tables(s, d, "nation")
      .join(broadcast(Tables(s, d, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    li(s, d)
      .join(Tables(s, d, "supplier").select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(natAsia), col("s_nationkey") === col("n_nationkey"))
      .join(ord(s, d).filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust(s, d).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q7-style two-nation shipping volume: both nation dims are
    * pre-filtered to the two nations of interest BEFORE broadcasting,
    * so each fact join is also a prune (only lines with a qualifying
    * supplier survive to meet orders/customer); the residual
    * disjunction then only rejects the two same-nation pairings. The
    * group key includes a derived year column — computed once in the
    * projection, partial-aggregated map-side. */
  def nationVolume(s: SparkSession, d: String): DataFrame = {
    val pair = Seq("NATION_18", "NATION_19")
    val n1 = Tables(s, d, "nation").filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables(s, d, "nation").filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    li(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables(s, d, "supplier").select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(ord(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust(s, d).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q8-style market share: one nation's fraction of regional
    * revenue per year — numerator and denominator accumulate in ONE
    * partial+final aggregate (conditional sum), no self-join. The
    * customer-side region restriction broadcasts as a filtered
    * nation-key set; part is SF-proportional (no hint — its
    * type-filtered 1-column projection is left to stats/AQE, which
    * broadcast it while small and shuffle it at cluster scale). */
  def marketShare(s: SparkSession, d: String): DataFrame = {
    val vol = dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - dec(col("l_discount")))
    val asiaKeys = Tables(s, d, "nation")
      .join(broadcast(Tables(s, d, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("asia_nk"))
    val n2 = Tables(s, d, "nation")
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    li(s, d)
      .join(Tables(s, d, "part").filter(col("p_type") === "ECONOMY")
        .select("p_partkey"),
        col("l_partkey") === col("p_partkey"))
      .join(ord(s, d).filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust(s, d).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(asiaKeys), col("c_nationkey") === col("asia_nk"))
      .join(Tables(s, d, "supplier").select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        (sum(when(col("supp_nation") === "NATION_3", vol)
          .otherwise(lit(0).cast("decimal(12,2)"))).cast("double")
          / sum(vol).cast("double")).as("mkt_share"),
        count(lit(1)).as("n_lines"))
      .orderBy("o_year")
  }

  /** TPC-H Q9-SHAPED profit rollup, partsupp-free: profit by supplier
    * nation and order year over lineitem⋈part⋈supplier⋈nation⋈orders
    * with a COMPUTED two-term measure — the one TPC-H plan shape
    * (two-fact multi-dim rollup over a derived measure with a
    * part-name LIKE filter) that the partsupp-dependent exclusions
    * (Q2/9/11/16/20) left unexercised. The per-unit supply cost is a
    * surrogate (10% of p_retailprice; the driver's generator ships no
    * partsupp table — TESTDATA.md), so the measure is arbitrary but
    * EXACT: every term stays decimal until the final double cast.
    * Plan: the selective p_name filter prunes part before the fact
    * join; nation broadcasts; one shuffle per fact join key and one
    * for the rollup. */
  def profitShape(s: SparkSession, d: String): DataFrame = {
    val profit =
      dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))) -
        dec(col("p_retailprice")) * dec(col("l_quantity")) * lit(0.10).cast("decimal(12,2)")
    li(s, d)
      .join(Tables(s, d, "part").filter(col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice"),
        col("l_partkey") === col("p_partkey"))
      .join(Tables(s, d, "supplier").select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables(s, d, "nation")
        .select(col("n_nationkey"), col("n_name").as("nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(ord(s, d).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(profit).cast("double").as("sum_profit"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q15-style top supplier: a grouped revenue rollup consumed
    * TWICE — once to find the global max, once as the join input —
    * so it is [[graft.Core.cached]] (one lineitem scan, not two; the
    * rollup is O(suppliers), small enough to pin). The max is a
    * 1-row broadcast; the tie-exact equality compares the EXACT
    * DECIMAL sums (doubles only appear in the final projection), so
    * "ties at the max" mean true value equality on both engines. */
  def topSupplier(s: SparkSession, d: String): DataFrame = {
    val rev = cached(li(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
        .as("rev_dec")))
    val mx = rev.agg(max(col("rev_dec")).as("mx"))
    Tables(s, d, "supplier").select("s_suppkey", "s_name")
      .join(rev, col("s_suppkey") === col("l_suppkey"))
      .crossJoin(broadcast(mx))
      .filter(col("rev_dec") === col("mx"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev_dec").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** Market-basket pair mining with lift — the frequent-itemset
    * report (parts bought together more often than chance) behind
    * recommendation and assortment analytics. Support counting is
    * the A-priori level-2 pass: distinct (order, part) items
    * self-join ON THE ORDER KEY with `pa < pb`, so fan-out per order
    * is C(basket, 2) — bounded by basket size (≤ 7 lineitems in
    * TPC-H-shaped data), never by item popularity: a part in a
    * million orders contributes a million×(basket−1) pairs, not a
    * million², because pairing is within-order only. Lift =
    * P(ab)/(P(a)P(b)) = n_ab·N / (n_a·n_b): exact longs until ONE
    * double division, so the oracle matches bit-for-bit. Shuffles
    * carry (order) then (pa, pb) keys; per-part supports join back
    * onto the pair table as plain equi-joins (part-cardinality — AQE
    * broadcasts them at small SF, shuffles at catalog scale; only
    * the 1-row order total is an explicit broadcast). Support
    * threshold ≥ 3 keeps the report the size a human reads. */
  def basketLift(s: SparkSession, d: String): DataFrame = {
    val items = cached(li(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct())
    val nOrders = items.select(countDistinct(col("o")).as("n_total"))
    val partN = items.groupBy(col("p")).agg(count(lit(1)).as("np"))
    val pairs = items.toDF("o", "pa").join(items.toDF("o", "pb"), "o")
      .filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 3)
    pairs
      .join(partN.toDF("pa", "n_a"), "pa")
      .join(partN.toDF("pb", "n_b"), "pb")
      .crossJoin(broadcast(nOrders))
      .select(col("pa").as("part_a"), col("pb").as("part_b"),
        col("n_ab"), col("n_a"), col("n_b"),
        ((col("n_ab") * col("n_total")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
      .orderBy("part_a", "part_b")
  }

  private val discPrice =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))"

  /** 2-D skyline (Pareto frontier) over parts: minimize price,
    * maximize size — the "best trade-off" operator (classic skyline;
    * Börzsönyi et al., ICDE'01). A point is on the frontier iff no
    * other part is both cheaper-or-equal AND larger-or-equal with one
    * strict. For two dimensions the frontier is a RUNNING MAX, not a
    * quadratic dominance join: after collapsing to distinct
    * (price, size) points and ordering by (price asc, size desc),
    * point p is dominated exactly when some earlier point has
    * size ≥ p.size — so `max(size) OVER (preceding rows) < size` is
    * the whole test.
    *
    * Scale posture: the ordered running max is the TWO-PHASE
    * range-partition spelling (same idiom as `quality_ks_drift` /
    * `pipeline_global_ids`) — range-repartition the distinct points
    * by the sort key, per-partition window, broadcast per-partition
    * prefix maxima — never a single-partition global window. The
    * distinct-point collapse is a partial+final agg, so the heavy
    * table contributes |distinct (price,size)| rows to the sort, not
    * |rows|. Price rides exact integer cents (`round(x*100)` — both
    * engines round the identical IEEE product). */
  def skylineParts(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pts = Tables(s, d, "part")
      .select(round(col("p_retailprice") * 100).cast("long").as("price_c"),
        col("p_size"), col("p_partkey"))
      .groupBy("price_c", "p_size")
      .agg(count(lit(1)).as("n_pts"), min("p_partkey").as("min_partkey"))
    val parts = cached(
      pts.repartitionByRange(32, col("price_c").asc, col("p_size").desc)
        .withColumn("pid", spark_partition_id()))
    // |partitions| rows: the deliberate tiny single-partition window
    val prior = Window.orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = parts.groupBy("pid").agg(max("p_size").as("pmax"))
      .select(col("pid"), max("pmax").over(prior).as("omax"))
    val w = Window.partitionBy("pid")
      .orderBy(col("price_c").asc, col("p_size").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    parts
      .withColumn("lmax", max("p_size").over(w))
      .join(broadcast(offs), "pid")
      // greatest() skips nulls; both null (global first row) → frontier
      .filter(coalesce(greatest(col("lmax"), col("omax")),
        lit(Int.MinValue)) < col("p_size"))
      .select("price_c", "p_size", "n_pts", "min_partkey")
      .orderBy("price_c")
  }

  /** TPC-H Q2-SHAPED minimum-cost supplier, partsupp-free: for every
    * small STANDARD part, which EUROPE supplier offers it cheapest?
    * Q2's defining plan shape is the CORRELATED MIN-COST SUBQUERY
    * over the same relation the detail branch reads — decorrelated
    * (as Catalyst would) into a per-part min aggregate joined back on
    * (part, EXACT decimal cost equality), so ties at the min report
    * every tying supplier, TPC-H semantics. The offering relation is
    * DERIVED from lineitem (the driver corpus ships no partsupp —
    * TESTDATA.md): per (part, supplier), the minimum discounted line
    * price ever shipped, exact DECIMAL end to end (a double cost
    * would make the min-equality tie set diverge between engines
    * under reordered sums).
    *
    * Scale: lineitem shuffles ONCE on the (partkey, suppkey) pair;
    * both consumers — the min-per-part branch and the detail branch —
    * read the identical regional subtree, which exchange reuse
    * materializes once (PlanSpec pins the ReusedExchange). The region
    * restriction broadcasts as a filtered nation-key set; part's
    * selective filter prunes before its join; the final top-100 is a
    * TakeOrdered, never a global sort. */
  def q2MinCostSupplier(s: SparkSession, d: String): DataFrame = {
    val offers = li(s, d)
      .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .agg(min(dec(col("l_extendedprice")) *
        (lit(1).cast("decimal(12,2)") - dec(col("l_discount")))).as("cost"))
    val eurKeys = Tables(s, d, "nation")
      .join(broadcast(Tables(s, d, "region").filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("eu_nk"), col("n_name"))
    val regional = offers
      .join(Tables(s, d, "supplier"), col("sk") === col("s_suppkey"))
      .join(broadcast(eurKeys), col("s_nationkey") === col("eu_nk"))
    val minCost = regional.groupBy(col("pk").as("mpk"))
      .agg(min(col("cost")).as("min_cost"))
    regional
      .join(minCost, col("pk") === col("mpk") && col("cost") === col("min_cost"))
      .join(Tables(s, d, "part")
        .filter(col("p_type") === "STANDARD" && col("p_size") <= 7)
        .select("p_partkey", "p_brand"),
        col("pk") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_brand"),
        col("cost").cast("double").as("supply_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  /** TPC-H Q20-SHAPED excess-shipper chain, partsupp-free: which ASIA
    * suppliers CONCENTRATED their shipments of red parts in 1998 —
    * more quantity that year than all other years combined, yet not
    * exclusively (so single-burst pairs don't trivially qualify)?
    * Q20's defining shape is a SEMI-JOIN OF A SEMI-JOIN: supplier
    * semi-joins the qualifying (part, supplier) relation, which
    * itself semi-joins the name-filtered part list, with the quantity
    * threshold correlated per (part, supplier). The correlated
    * `availqty > 0.5·sum(qty in window)` comparison becomes a
    * CONDITIONAL aggregate off ONE lineitem scan — all-time sum vs
    * in-1998 sum per pair, filtered `2·y > all ∧ y < all`,
    * integer-exact (quantities are integral and ride longs; both
    * engines compare the same integers) — never a second fact pass
    * (PlanSpec pins the single scan).
    *
    * Scale: one (partkey, suppkey) fact shuffle; the part list
    * semi-joins BEFORE touching supplier, so the supplier semi-probe
    * sees only qualifying pairs; nation/region ride a broadcast;
    * output is |suppliers|-bounded. */
  def q20ExcessShippers(s: SparkSession, d: String): DataFrame = {
    val qty = col("l_quantity").cast("long")
    val ship = li(s, d)
      .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .agg(sum(qty).as("all_qty"),
        sum(when(year(col("l_shipdate")) === 1998, qty).otherwise(0L))
          .as("y_qty"))
      .filter(col("y_qty") * 2 > col("all_qty") &&
        col("y_qty") < col("all_qty"))
    val redParts = Tables(s, d, "part")
      .filter(col("p_name").startsWith("red "))
      .select(col("p_partkey"))
    val asiaKeys = Tables(s, d, "nation")
      .join(broadcast(Tables(s, d, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("asia_nk"), col("n_name"))
    Tables(s, d, "supplier")
      .join(ship.join(redParts, col("pk") === col("p_partkey"), "left_semi"),
        col("s_suppkey") === col("sk"), "left_semi")
      .join(broadcast(asiaKeys), col("s_nationkey") === col("asia_nk"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"), col("s_acctbal"))
      .orderBy("s_name", "s_suppkey")
  }

  /** TPC-H Q11-SHAPED value concentration, partsupp-free: which parts
    * carry an outsized share of one nation's shipped value? Q11's
    * defining shape is the HAVING-AGAINST-A-GLOBAL-SCALAR: the same
    * grouped rollup feeds both the per-part values and (re-aggregated)
    * the global threshold — so the rollup is [[graft.Core.cached]]
    * (one fact scan; the [[topSupplier]] discipline) and the 1-row
    * total broadcasts back. The per-part value is the exact-decimal
    * discounted-price sum of NATION_3's shipments; the threshold test
    * `value · 10000 > total` keeps BOTH sides exact decimals —
    * multiplying by the integer instead of the 1e-4 fraction avoids
    * introducing any rounding either engine could order differently.
    * Scale: one nation-pruned fact shuffle on partkey; the rollup is
    * |parts| rows (pinnable); threshold and sort are rollup-sized. */
  def q11ValueConcentration(s: SparkSession, d: String): DataFrame = {
    val natKeys = Tables(s, d, "nation")
      .filter(col("n_name") === "NATION_3")
      .select(col("n_nationkey").as("nk"))
    val suppKeys = Tables(s, d, "supplier")
      .join(broadcast(natKeys), col("s_nationkey") === col("nk"))
      .select(col("s_suppkey").as("sk"))
    val vals = cached(li(s, d)
      .join(broadcast(suppKeys), col("l_suppkey") === col("sk"))
      .groupBy(col("l_partkey"))
      .agg(sum(dec(col("l_extendedprice")) *
        (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
        .as("val_dec")))
    val tot = vals.agg(sum(col("val_dec")).as("tot_dec"))
    vals.crossJoin(broadcast(tot))
      .filter(col("val_dec") * 10000 > col("tot_dec"))
      .select(col("l_partkey").as("p_partkey"),
        col("val_dec").cast("double").as("value"))
      .orderBy(col("value").desc, col("p_partkey"))
  }

  /** TPC-H Q16-SHAPED supplier-count report, partsupp-free: how many
    * DISTINCT suppliers ship each (brand, type, size) of the
    * non-excluded catalog — excluding distrusted suppliers via Q16's
    * defining NOT IN (a NULL-AWARE anti-join; the exclusion list is
    * suppliers in negative account balance, the corpus's stand-in
    * for the `%Complaints%` comment filter). The (part, supplier)
    * relation is the distinct pair projection of lineitem; part
    * carries Q16's triple predicate (brand ≠, type NOT LIKE prefix,
    * size IN-list).
    *
    * Scale: pairs collapse in a partial+final (pk, sk) distinct
    * before any join; the exclusion list is |suppliers|-bounded and
    * broadcasts. The exclusion keys are non-null, so the plain
    * LEFT ANTI here is semantically identical to Q16's NOT IN — the
    * null-aware variant itself is exercised (and PlanSpec-pinned) by
    * `join_null_aware_anti`. count(DISTINCT sk) per attribute triple
    * is the standard two-stage expand aggregate. */
  def q16SupplierCounts(s: SparkSession, d: String): DataFrame = {
    val pairs = li(s, d)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .distinct()
    val excluded = Tables(s, d, "supplier")
      .filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    val parts = Tables(s, d, "part")
      .filter(col("p_brand") =!= "Brand#4" &&
        !col("p_type").like("MEDIUM%") &&
        col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    pairs
      .join(parts, col("pk") === col("p_partkey"))
      .join(excluded, col("sk") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("sk")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  val queries: Seq[Q] = Seq(
    // oracle: single global window (fine at sf0.01; the Spark side is
    // the two-phase scale spelling of the same running max)
    Q("skyline_parts", skylineParts, Some(
      """WITH pts AS (
        |  SELECT CAST(round(p_retailprice * 100) AS BIGINT) AS price_c, p_size,
        |    COUNT(*) AS n_pts, MIN(p_partkey) AS min_partkey
        |  FROM part GROUP BY 1, 2),
        |w AS (
        |  SELECT *, MAX(p_size) OVER (ORDER BY price_c ASC, p_size DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max
        |  FROM pts)
        |SELECT price_c, p_size, n_pts, min_partkey FROM w
        |WHERE prior_max IS NULL OR prior_max < p_size
        |ORDER BY price_c""".stripMargin)),
    // oracle: the same within-order self-join + exact-integer lift
    Q("basket_lift", basketLift, Some(
      """WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |tot AS (SELECT COUNT(DISTINCT o) AS n_total FROM items),
        |pn AS (SELECT p, COUNT(*) AS np FROM items GROUP BY p),
        |pairs AS (
        |  SELECT a.p AS part_a, b.p AS part_b, COUNT(*) AS n_ab
        |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
        |  GROUP BY a.p, b.p HAVING COUNT(*) >= 3)
        |SELECT part_a, part_b, n_ab, na.np AS n_a, nb.np AS n_b,
        |  CAST(n_ab * n_total AS DOUBLE) / CAST(na.np * nb.np AS DOUBLE) AS lift
        |FROM pairs
        |  JOIN pn na ON na.p = part_a
        |  JOIN pn nb ON nb.p = part_b
        |  CROSS JOIN tot
        |ORDER BY part_a, part_b""".stripMargin)),
    Q("q1_pricing", pricingSummary, Some(
      s"""SELECT l_returnflag, l_linestatus,
         |  ${oDsum("l_quantity")} AS sum_qty,
         |  ${oDsum("l_extendedprice")} AS sum_base_price,
         |  CAST(SUM($discPrice) AS DOUBLE) AS sum_disc_price,
         |  ${oDavg("l_quantity")} AS avg_qty,
         |  ${oDavg("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin)),
    Q("q_filter_pushdown", filterPushdown, Some(
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 45 AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)),
    Q("join_broadcast", joinBroadcast, Some(
      """SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_name""".stripMargin)),
    Q("join_mktsegment", joinMktsegment, Some(
      s"""SELECT c_mktsegment, ${oDsum("o_totalprice")} AS revenue, COUNT(*) AS n_orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),
    Q("join_semi", joinSemi, Some(
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin)),
    Q("join_anti", joinAnti, Some(
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin)),
    Q("join_null_aware_anti", joinNullAwareAnti, Some(
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT nullif(o_custkey, -1) FROM orders
        |                        WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin)),
    Q("subquery_above_avg", scalarSubquery, Some(
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_totalprice >
        |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        |   FROM orders)
        |ORDER BY o_orderkey""".stripMargin)),
    Q("subquery_exists_corr", existsCorrelated, Some(
      """SELECT n_nationkey, n_name FROM nation
        |WHERE EXISTS (SELECT 1 FROM customer
        |              WHERE c_nationkey = n_nationkey AND c_acctbal > 9000)
        |ORDER BY n_nationkey""".stripMargin)),
    // The oracle spells the same deterministic (price, key) composite
    // ordering with rank-1 rows folded back by conditional aggregation.
    Q("agg_arg_minmax", argMinMax, Some(
      """WITH ranked AS (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
        |  FROM orders)
        |SELECT o_orderpriority,
        |  max(CASE WHEN rmax = 1 THEN o_orderkey END) AS top_orderkey,
        |  max(CASE WHEN rmax = 1 THEN o_totalprice END) AS top_price,
        |  max(CASE WHEN rmin = 1 THEN o_orderkey END) AS bottom_orderkey,
        |  max(CASE WHEN rmin = 1 THEN o_totalprice END) AS bottom_price,
        |  COUNT(*) AS n
        |FROM ranked GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),
    Q("join_multiway", joinMultiway, Some(
      s"""SELECT r_name, n_name,
         |  CAST(SUM($discPrice) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_lines
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation   ON c_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)),
    Q("topk_orders", topkOrders, Some(
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),
    Q("distinct_parts", distinctParts, Some(
      """SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_lines
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin)),
    Q("setop_union", setopUnion, Some(
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |UNION
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin)),
    Q("setop_intersect", setopIntersect, Some(
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin)),
    Q("setop_except", setopExcept, Some(
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin)),
    Q("join_full_outer", joinFullOuter, Some(
      """WITH c AS (SELECT c_custkey FROM customer WHERE c_custkey % 3 <> 0),
        |o AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey)
        |SELECT coalesce(c_custkey, o_custkey) AS custkey,
        |  CAST(c_custkey IS NOT NULL AS INTEGER) AS has_customer,
        |  coalesce(n_orders, 0) AS n_orders
        |FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin)),
    Q("join_skew_salted", joinSkewSalted, Some(
      s"""SELECT o_orderpriority, ${oDsum("l_quantity")} AS sum_qty, COUNT(*) AS n_lines
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),
    Q("join_lateral", joinLateral, Some(
      """SELECT n_nationkey, n_name, c_custkey, c_acctbal
        |FROM nation, LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n_nationkey, c_acctbal DESC, c_custkey""".stripMargin)),
    Q("setop_except_all", setopExceptAll, Some(
      """WITH x AS (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |SELECT o_custkey, COUNT(*) AS multiplicity
        |FROM x GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)),
    Q("setop_intersect_all", setopIntersectAll, Some(
      """WITH x AS (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |SELECT o_custkey, COUNT(*) AS multiplicity
        |FROM x GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)),
    Q("rollup_sales", rollupSales, Some(
      s"""SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
         |  ${oDsum("l_quantity")} AS sum_qty, COUNT(*) AS n
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY rf, ls""".stripMargin)),
    Q("q14_promo_share", promoRevenue, Some(
      s"""SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
         |    THEN $discPrice ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
         |  / CAST(SUM($discPrice) AS DOUBLE) AS promo_share_pct,
         |  COUNT(*) AS n
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-01-01'""".stripMargin)),
    Q("q6_forecast", revenueForecast, Some(
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin)),
    Q("q3_shipping_priority", shippingPriority, Some(
      s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority,
         |  CAST(SUM($discPrice) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1996-03-15'
         |  AND l_shipdate > TIMESTAMP '1996-03-15'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)),
    Q("q10_returned_revenue", returnedRevenue, Some(
      s"""SELECT c_custkey, c_name, n_name,
         |  CAST(SUM($discPrice) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_lines
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1996-07-01'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),
    Q("q19_brand_quantity", brandQuantity, Some(
      s"""SELECT CAST(SUM($discPrice) AS DOUBLE) AS revenue, COUNT(*) AS n_lines
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),
    Q("q4_order_priority", orderPriorityCheck, Some(
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),
    Q("q13_custdist", custOrderDistribution, Some(
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin)),
    Q("q17_small_qty_avg", smallQuantityRevenue, Some(
      s"""WITH lq AS (
         |  SELECT l_partkey, l_quantity, l_extendedprice
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE p_brand = 'Brand#13'),
         |pp AS (
         |  SELECT l_partkey, ${oDavg("l_quantity")} AS avg_qty
         |  FROM lq GROUP BY l_partkey)
         |SELECT ${oDsum("l_extendedprice")} / 7.0 AS avg_yearly
         |FROM lq JOIN pp USING (l_partkey)
         |WHERE l_quantity < 0.2 * avg_qty""".stripMargin)),
    Q("q21_sole_supplier", soleProblemSupplier, Some(
      """WITH pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
        |rpairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
        |           WHERE l_returnflag = 'R')
        |SELECT s_name, COUNT(*) AS numwait
        |FROM rpairs r JOIN supplier ON r.l_suppkey = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM pairs p
        |              WHERE p.l_orderkey = r.l_orderkey
        |                AND p.l_suppkey <> r.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM rpairs r2
        |                  WHERE r2.l_orderkey = r.l_orderkey
        |                    AND r2.l_suppkey <> r.l_suppkey)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)),
    Q("q22_dormant_balances", dormantBalances, Some(
      s"""SELECT c_nationkey, COUNT(*) AS numcust,
         |  ${oDsum("c_acctbal")} AS totacctbal
         |FROM customer
         |WHERE c_acctbal > (SELECT ${oDavg("c_acctbal")} FROM customer
         |                   WHERE c_acctbal > 0)
         |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
         |                  AND o_orderpriority = '1-URGENT')
         |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),
    Q("agg_incremental_merge", incrementalRollup, Some(
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),
    // oracle = the direct aggregate of the post-change set (base
    // minus deletes plus inserts collapses to event_id % 4 <> 0)
    Q("agg_incremental_retract", retractRollup, Some(
      """SELECT event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(floor(value * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events WHERE event_id % 4 <> 0
        |GROUP BY event_type ORDER BY event_type""".stripMargin)),
    Q("q18_large_orders", largeOrders, Some(
      s"""WITH big AS (
         |  SELECT l_orderkey, ${oDsum("l_quantity")} AS total_qty
         |  FROM lineitem GROUP BY l_orderkey
         |  HAVING ${oDsum("l_quantity")} > 300)
         |SELECT c_name, c_custkey, o_orderkey,
         |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
         |  o_totalprice, total_qty
         |FROM orders JOIN big ON o_orderkey = l_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),
    Q("rcte_month_spine", monthSpine, Some(
      """WITH spine AS (
        |  SELECT unnest(generate_series(
        |    date_trunc('month', (SELECT min(o_orderdate) FROM orders)),
        |    date_trunc('month', (SELECT max(o_orderdate) FROM orders)),
        |    INTERVAL 1 MONTH)) AS mo),
        |agg AS (
        |  SELECT date_trunc('month', o_orderdate) AS mo, COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |  FROM orders GROUP BY 1)
        |SELECT strftime(mo, '%Y-%m') AS month,
        |  coalesce(n_orders, 0) AS n_orders, coalesce(revenue, 0.0) AS revenue
        |FROM spine LEFT JOIN agg USING (mo) ORDER BY month""".stripMargin)),
    Q("q12_shipmode", shipmodePriority, Some(
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)),
    Q("q5_local_supplier", localSupplierVolume, Some(
      s"""SELECT n_name, CAST(SUM($discPrice) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)),
    Q("q7_nation_volume", nationVolume, Some(
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  year(l_shipdate) AS l_year,
         |  CAST(SUM($discPrice) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_lines
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE n1.n_name IN ('NATION_18', 'NATION_19')
         |  AND n2.n_name IN ('NATION_18', 'NATION_19')
         |  AND n1.n_name <> n2.n_name
         |  AND l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),
    Q("q8_market_share", marketShare, Some(
      s"""SELECT year(o_orderdate) AS o_year,
         |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_3' THEN $discPrice
         |               ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
         |    / CAST(SUM($discPrice) AS DOUBLE) AS mkt_share,
         |  COUNT(*) AS n_lines
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |JOIN region ON n1.n_regionkey = r_regionkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY 1 ORDER BY o_year""".stripMargin)),
    Q("q9_shape_profit", profitShape, Some(
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  CAST(SUM(
        |    CAST(l_extendedprice AS DECIMAL(12,2))
        |      * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
        |    - CAST(p_retailprice AS DECIMAL(12,2))
        |      * CAST(l_quantity AS DECIMAL(12,2)) * CAST(0.10 AS DECIMAL(12,2))
        |  ) AS DOUBLE) AS sum_profit,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin)),
    // oracle: the classic correlated-subquery spelling — cost equals
    // the per-part regional minimum — which DuckDB decorrelates the
    // same way the engine spells explicitly; the min-equality ties
    // compare exact decimals on both sides
    Q("q2_shape_min_cost", q2MinCostSupplier, Some(
      """WITH offers AS MATERIALIZED (
        |  SELECT l_partkey AS pk, l_suppkey AS sk,
        |    MIN(CAST(l_extendedprice AS DECIMAL(12,2))
        |      * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |      AS cost
        |  FROM lineitem GROUP BY 1, 2),
        |regional AS MATERIALIZED (
        |  SELECT o.pk, o.cost, s.s_name, s.s_acctbal, n.n_name
        |  FROM offers o
        |  JOIN supplier s ON o.sk = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |    AND r.r_name = 'EUROPE')
        |SELECT rg.s_acctbal, rg.s_name, rg.n_name, p.p_partkey, p.p_brand,
        |  CAST(rg.cost AS DOUBLE) AS supply_cost
        |FROM regional rg
        |JOIN part p ON rg.pk = p.p_partkey
        |WHERE p.p_type = 'STANDARD' AND p.p_size <= 7
        |  AND rg.cost = (SELECT MIN(r2.cost) FROM regional r2
        |                 WHERE r2.pk = rg.pk)
        |ORDER BY rg.s_acctbal DESC, rg.n_name, rg.s_name, p.p_partkey
        |LIMIT 100""".stripMargin)),
    // oracle: the classic nested-IN spelling of the semi-join chain;
    // the quantity threshold compares the same exact integers
    Q("q20_shape_excess_semi", q20ExcessShippers, Some(
      """WITH ship AS (
        |  SELECT l_partkey AS pk, l_suppkey AS sk,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS all_qty,
        |    CAST(SUM(CASE WHEN year(l_shipdate) = 1998
        |      THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS y_qty
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT s.s_suppkey, s.s_name, n.n_name, s.s_acctbal
        |FROM supplier s
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
        |WHERE s.s_suppkey IN (
        |  SELECT sk FROM ship
        |  WHERE 2 * y_qty > all_qty AND y_qty < all_qty
        |    AND pk IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red %'))
        |ORDER BY s_name, s_suppkey""".stripMargin)),
    // oracle: the classic HAVING-against-a-scalar-subquery spelling;
    // the threshold compares exact decimals ×10000 on both sides
    Q("q11_shape_value_conc", q11ValueConcentration, Some(
      """WITH sk AS (
        |  SELECT s_suppkey FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_3'),
        |vals AS MATERIALIZED (
        |  SELECT l_partkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |      * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |      AS val_dec
        |  FROM lineitem
        |  WHERE l_suppkey IN (SELECT s_suppkey FROM sk)
        |  GROUP BY 1),
        |tot AS (SELECT SUM(val_dec) AS tot_dec FROM vals)
        |SELECT l_partkey AS p_partkey, CAST(val_dec AS DOUBLE) AS value
        |FROM vals CROSS JOIN tot
        |WHERE val_dec * 10000 > tot_dec
        |ORDER BY value DESC, p_partkey""".stripMargin)),
    // oracle: the classic distinct-pair + triple-predicate + NOT IN
    // spelling; the exclusion keys are non-null so NOT IN ≡ anti-join
    Q("q16_shape_supplier_cnt", q16SupplierCounts, Some(
      """SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#4' AND p_type NOT LIKE 'MEDIUM%'
        |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)),
    Q("q15_top_supplier", topSupplier, Some(
      s"""WITH revenue AS (
         |  SELECT l_suppkey, SUM($discPrice) AS rev_dec
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
         |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
         |WHERE rev_dec = (SELECT max(rev_dec) FROM revenue)
         |ORDER BY s_suppkey""".stripMargin)),
    Q("grouping_sets_sales", groupingSets, Some(
      s"""SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
         |  ${oDsum("l_quantity")} AS sum_qty, COUNT(*) AS n
         |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY rf, ls""".stripMargin)),
    // oracle: GROUPING() bits composed in Spark's grouping_id() order
    // (leftmost dim = highest bit); decimal sum, double only in the
    // final projection
    Q("grouping_sets_ds8", groupingSetsDs8, Some(
      s"""SELECT CAST(4 * GROUPING(yr) + 2 * GROUPING(n_name)
         |    + GROUPING(o_orderpriority) AS BIGINT) AS gid,
         |  coalesce(CAST(yr AS BIGINT), -1) AS yr,
         |  coalesce(n_name, 'ALL') AS nation,
         |  coalesce(o_orderpriority, 'ALL') AS priority,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_orders
         |FROM (SELECT year(o_orderdate) AS yr, o_orderpriority, o_totalprice,
         |        n_name
         |      FROM orders JOIN customer ON o_custkey = c_custkey
         |        JOIN nation ON c_nationkey = n_nationkey)
         |GROUP BY CUBE (yr, n_name, o_orderpriority)
         |ORDER BY gid, yr, nation, priority""".stripMargin)),
    // oracle: the same cube wrapped in the same total-ordered window
    // — QUALIFY-style rank ≤ 3 per (gid, yr) lattice slice
    Q("ds8_top_cells", ds8TopCells, Some(
      s"""WITH lat AS (
         |  SELECT CAST(4 * GROUPING(yr) + 2 * GROUPING(n_name)
         |      + GROUPING(o_orderpriority) AS BIGINT) AS gid,
         |    coalesce(CAST(yr AS BIGINT), -1) AS yr,
         |    coalesce(n_name, 'ALL') AS nation,
         |    coalesce(o_orderpriority, 'ALL') AS priority,
         |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
         |    COUNT(*) AS n_orders
         |  FROM (SELECT year(o_orderdate) AS yr, o_orderpriority, o_totalprice,
         |          n_name
         |        FROM orders JOIN customer ON o_custkey = c_custkey
         |          JOIN nation ON c_nationkey = n_nationkey)
         |  GROUP BY CUBE (yr, n_name, o_orderpriority)),
         |rk AS (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY gid, yr
         |    ORDER BY revenue DESC, nation, priority) AS BIGINT) AS rnk
         |  FROM lat)
         |SELECT gid, yr, nation, priority, revenue, n_orders, rnk
         |FROM rk WHERE rnk <= 3 ORDER BY gid, yr, rnk""".stripMargin)),
    Q("cube_sales", cubeSales, Some(
      s"""SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
         |  ${oDsum("l_quantity")} AS sum_qty, COUNT(*) AS n
         |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         |ORDER BY rf, ls""".stripMargin)),
    // Unpivot names columns qty_a/qty_n/qty_r; the oracle re-derives
    // the same (flag, qty) rows from the grouped base table.
    Q("unpivot_sales", unpivotSales, Some(
      """WITH wide AS (
        |  SELECT l_linestatus, l_returnflag,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_linestatus, 'qty_' || lower(l_returnflag) AS flag, qty
        |FROM wide ORDER BY l_linestatus, flag""".stripMargin)),
    // Empty pivot cells are NULL in both engines (SUM over no rows).
    Q("pivot_sales", pivotSales, Some(
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_a,
        |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_n,
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_r
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)),
  )
}
