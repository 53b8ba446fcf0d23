package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-format connector surface (SURVEY §2b "file formats"): CSV and
  * JSON-lines round-trips. The reference reads whitespace text only
  * (1.cpp:248–264); the engine speaks parquet (everywhere), CSV and
  * JSON with explicit schemas.
  *
  * Each query converts a (small, dimension-sized) driver table to the
  * target format in a fresh temp directory, reads it back with an
  * explicit schema — never inference in production paths — and runs a
  * verifiable query on the round-tripped data. The oracle runs on the
  * original parquet: a green row proves the round-trip is lossless.
  */
object Connectors {

  private def tmp(prefix: String): String = graft.Core.tempDir(prefix)

  private val nationSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  /** nation → CSV (header) → read back → broadcast-join region. */
  def csvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = tmp("graft-csv")
    Tables(s, d, "nation").write.mode("overwrite")
      .option("header", "true").csv(s"$dir/nation_csv")
    s.read.schema(nationSchema).option("header", "true")
      .csv(s"$dir/nation_csv")
      .join(broadcast(Tables(s, d, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
      .orderBy("n_nationkey")
  }

  /** supplier → JSON lines → read back → per-nation aggregate. */
  def jsonRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = tmp("graft-json")
    Tables(s, d, "supplier").write.mode("overwrite").json(s"$dir/supplier_json")
    val supplierSchema = StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType),
      StructField("s_acctbal", DoubleType)))
    s.read.schema(supplierSchema).json(s"$dir/supplier_json")
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("s_acctbal").cast("decimal(12,2)")).cast("double").as("sum_acctbal"))
      .orderBy("s_nationkey")
  }

  /** customer → ORC → read back (explicit schema) → per-segment
    * aggregate. ORC is the second columnar format large deployments
    * mix with parquet; its reader supports the same predicate
    * pushdown / column pruning as the parquet path, so a lakehouse
    * with mixed layouts runs the identical declarative plan. */
  def orcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = tmp("graft-orc")
    Tables(s, d, "customer").write.mode("overwrite").orc(s"$dir/customer_orc")
    val customerSchema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    s.read.schema(customerSchema).orc(s"$dir/customer_orc")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast("decimal(12,2)")).cast("double").as("sum_acctbal"))
      .orderBy("c_mktsegment")
  }

  /** Hive-style partitioned layout + partition pruning: events are
    * written `partitionBy(event_type)`; reading one type back scans
    * ONLY that directory — the pruning happens at file listing, not
    * at row filtering (PlanSpec asserts the PartitionFilters). This
    * is the table-layout half of predicate pushdown at 100 TB. */
  def partitionedPruning(s: SparkSession, d: String): DataFrame = {
    val dir = tmp("graft-part")
    Tables(s, d, "events")
      .write.mode("overwrite").partitionBy("event_type")
      .parquet(s"$dir/events_part")
    partitionedRead(s, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .orderBy("user_id")
  }

  /** The pruned single-partition read (split out for PlanSpec). */
  def partitionedRead(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events_part")
      .filter(col("event_type") === "purchase")

  /** Small-files compaction — the table-maintenance pass every
    * large-scale ingest needs: a fragmented table (here deliberately
    * shattered into 64 shards) is rewritten as a few large,
    * range-partitioned, key-sorted files. `repartitionByRange` +
    * `sortWithinPartitions` gives each output file a tight
    * min/max range on the sort key, so later scans with key
    * predicates skip whole files on parquet footer stats;
    * `maxRecordsPerFile` bounds file size without an extra shuffle.
    * The registered result is a content aggregate over the COMPACTED
    * copy — a green row proves the rewrite lost nothing; the
    * file-count collapse itself is asserted in PlanSpec. */
  def compactionWithDirs(s: SparkSession, d: String): (DataFrame, String, String) = {
    val dir = tmp("graft-compact")
    Tables(s, d, "orders").repartition(64)
      .write.mode("overwrite").parquet(s"$dir/frag")
    s.read.parquet(s"$dir/frag")
      .repartitionByRange(4, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
      .write.mode("overwrite").option("maxRecordsPerFile", 500000)
      .parquet(s"$dir/compact")
    val agg = s.read.parquet(s"$dir/compact")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("sum_price"))
      .orderBy("o_orderpriority")
    (agg, s"$dir/frag", s"$dir/compact")
  }

  def compaction(s: SparkSession, d: String): DataFrame =
    compactionWithDirs(s, d)._1

  val queries: Seq[Q] = Seq(
    Q("connector_compaction", compaction, Some(
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      headline = false),
    Q("partition_pruning", partitionedPruning, Some(
      """SELECT user_id, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY user_id ORDER BY user_id""".stripMargin),
      headline = false),
    Q("connector_csv", csvRoundtrip, Some(
      """SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin)),
    Q("connector_orc", orcRoundtrip, Some(
      """SELECT c_mktsegment, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),
    Q("connector_json", jsonRoundtrip, Some(
      """SELECT s_nationkey, COUNT(*) AS n_suppliers,
        |  CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)),
  )
}
