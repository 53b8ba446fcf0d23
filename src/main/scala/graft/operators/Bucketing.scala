package graft.operators

import graft.{Q, Tables}
import graft.Core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketing: pre-shuffled storage so fact⋈fact joins run WITHOUT an
  * exchange (SURVEY §2b "joins"; the builder directive's "bucketing
  * for co-located joins").
  *
  * The queries materialize `lineitem` / `orders` bucketed (and
  * bucket-sorted) by their join key into temp-path external tables,
  * then join/aggregate the bucketed tables: Spark aligns the 8
  * buckets one-to-one and both the SortMergeJoin and the groupBy run
  * with ZERO Exchange (asserted in PlanSpec). At cluster scale this
  * is the pattern for repeated work against the same key: pay the
  * shuffle once at write time, never again at read time.
  *
  * Catalog-state discipline (r12, after review): table names embed a
  * digest of the source dir, so two scale factors NEVER share a
  * catalog entry — the earlier shared-name design left a window
  * where one query's lazily-executed scan could read the table
  * another scale factor's query had overwritten (a lock around the
  * write cannot cover a scan that runs at collect() time). Builds
  * memoize per dir through a ConcurrentHashMap computeIfAbsent (one
  * writer per table, existence-revalidated like the fuzzy index).
  *
  * Excluded from the benchmark set (`headline = false`) because the
  * measured time would be dominated by the one-off bucketed WRITE,
  * which is precisely the cost this layout amortizes away.
  */
object Bucketing {

  private val Buckets = 8

  /** dir → (lineitem table, orders table); values only ever written
    * under the map's per-key lock. */
  private val builtTables =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]

  private def dirTag(d: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString

  /** Idempotently materialize both bucketed tables for `d` and return
    * their names. computeIfAbsent runs the write at most once per
    * (dir, session lifetime); a vanished catalog entry (external
    * clear) triggers a rebuild. */
  private def ensureBucketed(s: SparkSession, d: String): (String, String) = {
    builtTables.compute(d, (_, prev) => {
      val tag = dirTag(d)
      val li = s"graft_lineitem_bucketed_$tag"
      val o = s"graft_orders_bucketed_$tag"
      if (prev != null && s.catalog.tableExists(li) && s.catalog.tableExists(o)) prev
      else {
        val tmp = graft.Core.tempDir("graft-bucketed")
        Tables(s, d, "lineitem")
          .select("l_orderkey", "l_quantity")
          .write.mode("overwrite")
          .bucketBy(Buckets, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"$tmp/lineitem_b")
          .saveAsTable(li)
        Tables(s, d, "orders")
          .select("o_orderkey", "o_orderstatus")
          .write.mode("overwrite")
          .bucketBy(Buckets, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"$tmp/orders_b")
          .saveAsTable(o)
        (li, o)
      }
    })
  }

  def bucketedJoin(s: SparkSession, d: String): DataFrame =
    joinBucketed(s, d)
      .groupBy("o_orderstatus")
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_lines"))
      .orderBy("o_orderstatus")

  /** Exchange-free AGGREGATION on the bucket key: per-order line
    * counts and quantity totals over the bucketed lineitem table.
    * The scan reports the bucket spec's hash distribution, so the
    * groupBy(l_orderkey) needs NO Exchange — the same pay-the-
    * shuffle-once-at-write-time amortization as the join, applied to
    * the other wide-operator family (PlanSpec asserts zero
    * exchanges). */
  def bucketedAgg(s: SparkSession, d: String): DataFrame =
    aggBucketed(s, d)
      .filter(col("n_lines") >= 3)
      .orderBy("l_orderkey")

  /** The exchange-free aggregate (split out for PlanSpec). */
  def aggBucketed(s: SparkSession, d: String): DataFrame = {
    val (li, _) = ensureBucketed(s, d)
    s.table(li)
      .groupBy("l_orderkey")
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_lines"))
  }

  /** The exchange-free join of the two bucketed tables (split out so
    * PlanSpec can assert the plan shape). The merge hint pins the
    * shuffle-join code path — at real fact×fact scale neither side
    * broadcasts, and that is the path bucketing de-shuffles; without
    * it the small test tables would auto-broadcast and hide the
    * demonstration. */
  def joinBucketed(s: SparkSession, d: String): DataFrame = {
    val (li, o) = ensureBucketed(s, d)
    s.table(li).hint("merge")
      .join(s.table(o), col("l_orderkey") === col("o_orderkey"))
  }

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
