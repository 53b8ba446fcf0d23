package graft.operators

import graft.{Q, Tables}
import graft.Core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface (SURVEY §2b "window functions", §7.2 step 3):
  * ranking, lag/lead, running totals, and frame-bounded moving
  * aggregates. Every window has a TOTAL order (ties broken by key
  * columns) so results are deterministic and oracle-comparable.
  *
  * Scale posture: a window = one hash-Exchange on the partition key +
  * an in-partition sort. Partition keys (custkey/suppkey) are
  * high-cardinality, so partitions stay small and spill-safe; no
  * window is ever unpartitioned (a global window would serialize on
  * one task at 100 TB).
  */
object Windows {

  /** Top-3 orders per customer — row_number + filter (the standard
    * grouped-top-k that avoids a global sort entirely). */
  def topnPerCustomer(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(s, d, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy("o_custkey", "rn")
  }

  /** [[topnPerCustomer]] re-planned through the engine's own
    * whole-operator extension ([[graft.plans.TopKPerGroup]]): same
    * result set, but the physical plan is Exchange → bounded-heap
    * TopKPerGroupExec instead of Exchange → full per-partition Sort →
    * Window → Filter. At 100 TB the window spelling sorts every
    * group's n rows to keep 3; the heap does O(n log k) comparisons
    * in O(groups·k) memory with no sort/spill buffer. PlanSpec
    * asserts the sort-free shape; the oracle is the same SQL as the
    * window twin (minus the rank column). */
  def topnPerCustomerNative(s: SparkSession, d: String): DataFrame =
    graft.plans.TopKPerGroup(
      Tables(s, d, "orders").select("o_custkey", "o_orderkey", "o_totalprice"),
      Seq("o_custkey"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true),
      3)
      .orderBy("o_custkey", "o_orderkey")

  /** rank vs dense_rank over order priority per status. */
  def rankByPriority(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_orderstatus").orderBy(col("o_orderpriority"))
    Tables(s, d, "orders")
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(min("rnk").as("rnk"), min("drnk").as("drnk"), count(lit(1)).as("n"))
      .orderBy("o_orderstatus", "o_orderpriority")
  }

  /** Running (cumulative) exact-decimal sum of quantity per supplier,
    * over a total order — deterministic prefix sums. */
  def runningSum(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, d, "lineitem")
      .withColumn("running_qty", sum(dec(col("l_quantity"))).over(w).cast("double"))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("running_qty"))
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
  }

  /** lag/lead: previous/next order price per customer + delta. */
  def lagLead(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables(s, d, "orders")
      .withColumn("prev_price", lag("o_totalprice", 1).over(w))
      .withColumn("next_price", lead("o_totalprice", 1).over(w))
      .withColumn("delta", col("o_totalprice") - col("prev_price"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("prev_price"), col("next_price"), col("delta"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** 3-row moving average (frame ROWS BETWEEN 2 PRECEDING AND CURRENT
    * ROW) of order totals per customer — exact-decimal sum / count. */
  def movingAvg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(-2, Window.currentRow)
    Tables(s, d, "orders")
      .withColumn("mavg",
        sum(dec(col("o_totalprice"))).over(w).cast("double") /
          count(lit(1)).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("mavg"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Distribution + frame-navigation window functions: ntile
    * quartiles, percent_rank / cume_dist (exact integer-ratio
    * doubles — (rank-1)/(n-1) and k/n are the same IEEE values in
    * both engines), and first/last over the full-partition frame. */
  def distribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables(s, d, "orders")
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .withColumn("cheapest", first("o_orderkey").over(wf))
      .withColumn("priciest", last("o_orderkey").over(wf))
      .select(col("o_custkey"), col("o_orderkey"), col("quartile"),
        col("pct_rank"), col("cume"), col("cheapest"), col("priciest"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val queries: Seq[Q] = Seq(
    Q("window_distribution", distribution, Some(
      """SELECT o_custkey, o_orderkey,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  first_value(o_orderkey) OVER wf AS cheapest,
        |  last_value(o_orderkey) OVER wf AS priciest
        |FROM orders
        |WINDOW
        |  w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)),
    Q("window_topn_per_cust", topnPerCustomer, Some(
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),
    Q("window_topk_native", topnPerCustomerNative, Some(
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, o_orderkey""".stripMargin)),
    Q("window_rank", rankByPriority, Some(
      """SELECT o_orderstatus, o_orderpriority, min(rnk) AS rnk, min(drnk) AS drnk, COUNT(*) AS n FROM (
        |  SELECT o_orderstatus, o_orderpriority,
        |    rank() OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority) AS rnk,
        |    dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority) AS drnk
        |  FROM orders)
        |GROUP BY o_orderstatus, o_orderpriority
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)),
    Q("window_running_sum", runningSum, Some(
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER (
        |    PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |FROM lineitem
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin)),
    Q("window_lag_lead", lagLead, Some(
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  o_totalprice - lag(o_totalprice, 1) OVER w AS delta
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)),
    Q("window_moving_avg", movingAvg, Some(
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE)
        |    / COUNT(*) OVER w AS mavg
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)),
  )
}
