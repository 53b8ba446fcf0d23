package graft.operators

import graft.{Q, Tables}
import graft.Core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketing: pre-shuffled storage so fact⋈fact joins run WITHOUT an
  * exchange (SURVEY §2b "joins"; the builder directive's "bucketing
  * for co-located joins").
  *
  * The query materializes `lineitem` and `orders` bucketed (and
  * bucket-sorted) by their join key into a temp-path external table,
  * then joins the bucketed tables: Spark aligns the 8 buckets
  * one-to-one and the SortMergeJoin runs with ZERO Exchange on
  * either side (asserted in PlanSpec). At cluster scale this is the
  * pattern for repeated joins against the same key: pay the shuffle
  * once at write time, never again at read time.
  *
  * Excluded from the benchmark set (`headline = false`) because the
  * measured time would be dominated by the one-off bucketed WRITE,
  * which is precisely the cost this layout amortizes away.
  */
object Bucketing {

  private val Buckets = 8

  /** sfDir the bucketed lineitem table was last written from — the
    * reuse guard ([[bucketedAgg]]) must never serve one scale
    * factor's layout to another's query in a shared session. */
  @volatile private var bucketedLineitemDir: Option[String] = None

  /** Guards the (catalog write, [[bucketedLineitemDir]]) pair:
    * [[bucketedJoin]] overwrites the table [[bucketedAgg]]'s reuse
    * guard check-then-acts against, so both the overwrite+record and
    * the check+maybe-write must be atomic w.r.t. each other or a
    * concurrent run could read a mid-overwrite table / pair one
    * scale factor's data with another's guard value. */
  private val bucketLock = new Object

  def bucketedJoin(s: SparkSession, d: String): DataFrame = {
    val tmp = graft.Core.tempDir("graft-bucketed")
    bucketLock.synchronized {
      Tables(s, d, "lineitem")
        .select("l_orderkey", "l_quantity")
        .write.mode("overwrite")
        .bucketBy(Buckets, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$tmp/lineitem_b")
        .saveAsTable("graft_lineitem_bucketed")
      bucketedLineitemDir = Some(d)
    }
    Tables(s, d, "orders")
      .select("o_orderkey", "o_orderstatus")
      .write.mode("overwrite")
      .bucketBy(Buckets, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$tmp/orders_b")
      .saveAsTable("graft_orders_bucketed")
    joinBucketed(s)
      .groupBy("o_orderstatus")
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_lines"))
      .orderBy("o_orderstatus")
  }

  /** Exchange-free AGGREGATION on the bucket key: per-order line
    * counts and quantity totals over the bucketed lineitem table.
    * The scan reports the bucket spec's hash distribution, so the
    * groupBy(l_orderkey) needs NO Exchange — the same pay-the-
    * shuffle-once-at-write-time amortization as the join, applied to
    * the other wide-operator family (PlanSpec asserts zero
    * exchanges). Reuses [[bucketedJoin]]'s written table when it
    * exists; writes it otherwise, so the query is self-contained
    * under any execution order. */
  def bucketedAgg(s: SparkSession, d: String): DataFrame = {
    bucketLock.synchronized {
      if (!s.catalog.tableExists("graft_lineitem_bucketed")
          || !bucketedLineitemDir.contains(d)) {
        val tmp = graft.Core.tempDir("graft-bucketed-agg")
        Tables(s, d, "lineitem")
          .select("l_orderkey", "l_quantity")
          .write.mode("overwrite")
          .bucketBy(Buckets, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"$tmp/lineitem_b")
          .saveAsTable("graft_lineitem_bucketed")
        bucketedLineitemDir = Some(d)
      }
    }
    aggBucketed(s)
      .filter(col("n_lines") >= 3)
      .orderBy("l_orderkey")
  }

  /** The exchange-free aggregate (split out for PlanSpec). */
  def aggBucketed(s: SparkSession): DataFrame =
    s.table("graft_lineitem_bucketed")
      .groupBy("l_orderkey")
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_lines"))

  /** The exchange-free join of the two bucketed tables (split out so
    * PlanSpec can assert the plan shape). The merge hint pins the
    * shuffle-join code path — at real fact×fact scale neither side
    * broadcasts, and that is the path bucketing de-shuffles; without
    * it the small test tables would auto-broadcast and hide the
    * demonstration. */
  def joinBucketed(s: SparkSession): DataFrame =
    s.table("graft_lineitem_bucketed").hint("merge")
      .join(s.table("graft_orders_bucketed"),
        col("l_orderkey") === col("o_orderkey"))

  val queries: Seq[Q] = Seq(
    Q("bucketed_join", bucketedJoin, Some(
      s"""SELECT o_orderstatus, ${oDsum("l_quantity")} AS sum_qty, COUNT(*) AS n_lines
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
      headline = false),
    Q("bucketed_agg", bucketedAgg, Some(
      s"""SELECT l_orderkey, ${oDsum("l_quantity")} AS sum_qty, COUNT(*) AS n_lines
         |FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) >= 3
         |ORDER BY l_orderkey""".stripMargin),
      headline = false),
  )
}
