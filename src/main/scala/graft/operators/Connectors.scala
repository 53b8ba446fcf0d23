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

  /** nation → XML (rowTag framing) → read back with an explicit
    * schema → per-region count. Exercises Spark 4's BUILT-IN xml
    * data source (the spark-xml package merged into core) on both
    * the write and read sides; like every connector here, inference
    * is off and the oracle on the original parquet proves the
    * round-trip lossless. */
  def xmlRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = tmp("graft-xml")
    Tables(s, d, "nation").write.mode("overwrite")
      .option("rowTag", "nation").format("xml").save(s"$dir/nation_xml")
    s.read.schema(nationSchema).option("rowTag", "nation")
      .format("xml").load(s"$dir/nation_xml")
      .groupBy("n_regionkey")
      .agg(count(lit(1)).as("n_nations"),
        min("n_name").as("first_nation"))
      .orderBy("n_regionkey")
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

  /** Spool the documents corpus as one loose text file per doc in a
    * Hive-layout directory (`doc_id=N/part-*.txt`) — the "raw corpus
    * on object storage" fixture shared by the batch and streaming
    * binary-ingest queries. Fully distributed write, no driver loop;
    * memoized per dataset dir so the two consumers (and repeated runs
    * in one session) spool the corpus once. */
  private val spooled =
    new java.util.concurrent.ConcurrentHashMap[String, String]
  def spoolRawDocs(s: SparkSession, d: String): String =
    spooled.compute(d, (_, prev) => {
      // Re-validate the memo on every hit: the spool lives under a
      // tmp dir, so an external cleanup mid-session would otherwise
      // hand consumers a silently-missing path. Re-spool on miss.
      if (prev != null && new java.io.File(prev).isDirectory) prev
      else {
        val dir = tmp("graft-binf")
        Tables(s, d, "documents").select(col("doc_id"), col("text"))
          // Contract made explicit: the text sink writes `text + '\n'`
          // per row, so a null would emit a bare newline while the
          // DuckDB oracle's strlen(text)+1 goes NULL — a silent
          // engine/oracle divergence. The driver generator never
          // produces null text; this pins that assumption at the
          // fixture boundary rather than depending on it.
          .filter(col("text").isNotNull)
          .write.partitionBy("doc_id").mode("overwrite").text(s"$dir/raw")
        s"$dir/raw"
      }
    })

  /** Raw-file corpus ingest via the `binaryFile` source — the entry
    * path for image/audio/document corpora that land on object
    * storage as loose files rather than parquet (the reference's own
    * input is a loose text file, 1.cpp:248–264; multimodal pipelines
    * start from millions of media files). The [[spoolRawDocs]]
    * directory is read back as binary with partition discovery
    * recovering `doc_id` from the path, and the registered result is
    * (doc_id, byte length, md5 of the raw bytes) — a green row proves
    * ingest is byte-exact. Scale: binaryFile splits by file across
    * partitions, `pathGlobFilter` prunes at listing time, and a
    * metadata-only projection (path/length) never reads content. The
    * text sink terminates each row with '\n'; the oracle accounts for
    * that byte explicitly. */
  def binaryFileRoundtrip(s: SparkSession, d: String): DataFrame =
    s.read.format("binaryFile").option("pathGlobFilter", "*.txt")
      .load(spoolRawDocs(s, d))
      .select(col("doc_id").cast("long").as("doc_id"),
        col("length"), md5(col("content")).as("content_md5"))
      .orderBy("doc_id")

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

  /** DYNAMIC partition pruning: the partition predicate is not a
    * literal but the output of a dim-side filter, known only at
    * runtime — the other half of layout pruning at 100 TB (static
    * pruning handles literals; star-schema queries filter the fact
    * through a dimension). Spark broadcasts the filtered dim and
    * injects its join keys into the fact scan's PartitionFilters as a
    * `dynamicpruningexpression` (asserted in PlanSpec), so only the
    * matching event_type directories are ever listed or read. */
  def dynamicPruning(s: SparkSession, d: String): DataFrame = {
    val dir = tmp("graft-dpp")
    Tables(s, d, "events")
      .write.mode("overwrite").partitionBy("event_type")
      .parquet(s"$dir/events_part")
    dynamicPrunedJoin(s, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .orderBy("event_type")
  }

  /** The runtime-pruned join (split out for PlanSpec): fact
    * partitioned by event_type ⋈ dim filtered on a NON-partition
    * attribute (category). The dim is a real parquet scan — a literal
    * in-memory relation constant-folds its filter away and Spark's
    * DPP rule then sees no selective predicate to prune with. */
  def dynamicPrunedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Seq(
      ("purchase", "conversion"), ("signup", "conversion"),
      ("click", "engagement"), ("view", "engagement"),
      ("error", "telemetry")).toDF("event_type", "category")
      .write.mode("overwrite").parquet(s"$dir/event_dim")
    val dim = s.read.parquet(s"$dir/event_dim")
    s.read.parquet(s"$dir/events_part")
      .join(broadcast(dim).filter(col("category") === "conversion"), Seq("event_type"))
  }

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

  /** The point-probe key set for [[bloomSkip]]: a deterministic mix
    * of likely-present keys (small multiples of 37 — customer keys
    * are dense from 1) and certainly-absent keys (≥ 10⁹, far past any
    * driver SF's key space). Shared with the oracle literal. */
  private[graft] val BloomProbes: Seq[Long] =
    (1 to 8).map(_ * 37L) ++ (1 to 4).map(1000000000L + _)

  /** Parquet BLOOM-FILTER file skipping (r17 verdict item #7) — the
    * data-skipping axis [[compactionWithDirs]]' footer stats cannot
    * cover: the compacted layout sorts by `o_orderkey`, so every
    * file's min/max range on `o_custkey` spans essentially the whole
    * key domain (SourceSpec measures it) and range stats prune
    * NOTHING for customer point probes. Writing a bloom filter on
    * `o_custkey` (per-write parquet option, no session mutation)
    * gives each row group a probabilistic membership summary the
    * reader consults on equality probes: absent keys skip whole row
    * groups (no false negatives, ~1% false positives at the declared
    * NDV). The registered result is the point-probe report over the
    * bloom-written copy — present probes return exact counts/sums,
    * absent probes return zero rows — proving the rewrite lost
    * nothing; SourceSpec pins the physical claims (filters present in
    * the footers, absent keys answered "definitely not" while ranges
    * cannot exclude them).
    *
    * Scale: at 100 TB the bloom bitsets ride in the footers (~1 MB
    * per 128 MB row group at NDV 10⁶), and a point probe touches only
    * the row groups whose filter fires — the difference between
    * scanning a lake and reading a handful of pages. */
  def bloomSkipWithDir(s: SparkSession, d: String): (DataFrame, String) = {
    import s.implicits._
    val dir = tmp("graft-bloom")
    Tables(s, d, "orders")
      .repartitionByRange(4, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#o_custkey", "true")
      .option("parquet.bloom.filter.expected.ndv#o_custkey", "20000")
      // parquet-mr OMITS the bloom filter when a chunk stays fully
      // dictionary-encoded (the dictionary is already an exact
      // membership filter, and the reader uses it for the same
      // row-group skip). Driver-SF custkey cardinality fits a
      // dictionary page, so the bloom path would silently never be
      // exercised; disabling dictionary on the ONE probe column
      // forces the bloom representation — at production NDV the
      // dictionary overflows to plain encoding and the bloom filter
      // appears without this override.
      .option("parquet.enable.dictionary#o_custkey", "false")
      .parquet(s"$dir/t")
    val t = s.read.parquet(s"$dir/t")
    // the IN probe pushes to the scan (PushedFilters, PlanSpec) where
    // the parquet reader's row-group filter consults the bloom bitset
    val agg = t.filter(col("o_custkey").isin(BloomProbes: _*))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        graft.Core.dsum(col("o_totalprice")).as("sum_price"))
    val report = BloomProbes.toDF("probe")
      .join(agg, col("probe") === col("o_custkey"), "left")
      .select(col("probe"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        col("sum_price"))
      .orderBy("probe")
    (report, s"$dir/t")
  }

  def bloomSkip(s: SparkSession, d: String): DataFrame =
    bloomSkipWithDir(s, d)._1

  /** Z-order (Morton) clustering digest: rank-normalize `l_orderkey`
    * and `l_partkey` to 16-bit grids, interleave the bits into one
    * 32-bit code, and report row count + both keys' min/max per
    * top-4-bit code bucket (= the 4×4 quadrant grid). The point of
    * the interleave is multi-dimensional data skipping: a layout
    * `repartitionByRange(morton).sortWithinPartitions(morton)` bounds
    * EVERY file's min/max footer range in BOTH keys at once (a plain
    * sort bounds only its leading key), so scans filtering on either
    * column prune files. This query is the layout's audit — each
    * bucket's key spans cover ~1/4 of the global span in each
    * dimension. Normalization must start from the MOST significant
    * bits of the key's span (raw low-bit interleaving has no spatial
    * locality), so ranks are `(x - min)·65535 div (max - min)` with
    * the min/max from a broadcast 1-row aggregate — all exact integer
    * arithmetic (key spans < 2^47 keep the product < 2^63), expanded
    * to literal-shift terms at plan build since Spark's `shiftright`
    * takes a literal bit count; DuckDB reproduces it with `//`. */
  def zorderStats(s: SparkSession, d: String): DataFrame = {
    val stats = Tables(s, d, "lineitem").agg(
      min("l_orderkey").as("ok_min"), max("l_orderkey").as("ok_max"),
      min("l_partkey").as("pk_min"), max("l_partkey").as("pk_max"))
    def rank(k: String, lo: String, hi: String) =
      expr(s"(($k - $lo) * 65535) div ($hi - $lo)")
    val morton = (0 until 16).map { b =>
      (shiftright(col("r_ok"), b) % 2) * lit(1L << (2 * b)) +
        (shiftright(col("r_pk"), b) % 2) * lit(1L << (2 * b + 1))
    }.reduce(_ + _)
    Tables(s, d, "lineitem")
      .crossJoin(broadcast(stats))
      .select(col("l_orderkey"), col("l_partkey"),
        rank("l_orderkey", "ok_min", "ok_max").as("r_ok"),
        rank("l_partkey", "pk_min", "pk_max").as("r_pk"))
      .select(col("l_orderkey"), col("l_partkey"), morton.as("morton"))
      .groupBy(shiftright(col("morton"), 28).as("z_bucket"))
      .agg(count(lit(1)).as("n"),
        min("l_orderkey").as("min_ok"), max("l_orderkey").as("max_ok"),
        min("l_partkey").as("min_pk"), max("l_partkey").as("max_pk"))
      .orderBy("z_bucket")
  }

  /** CDC MERGE apply — the lakehouse upsert: a change feed of
    * inserts / updates / deletes applied to the customer snapshot in
    * one plan, decomposed the way every MERGE INTO executes: an
    * ANTI-join drops deleted keys, a LEFT join overlays updates
    * (coalesce picks the new value), and inserts union on top. The
    * change feed is derived deterministically from the snapshot
    * (keys ≡3 mod 7 delete; ≡0 mod 5 update, delete wins; ≡4 mod 11
    * insert under fresh keys) so the oracle rebuilds it exactly.
    *
    * Scale: both joins key on the table's primary key — one hash
    * exchange each at worst, and a nightly-sized change feed
    * broadcasts (the production MERGE fast path); output is the full
    * post-image, exactly what a Delta/Iceberg writer would commit. */
  /** DYNAMIC partition overwrite — the standard backfill idiom at
    * catalog scale: a corrected batch replaces ONLY the partitions it
    * contains, while every untouched partition survives byte-for-byte
    * (static overwrite mode would truncate the whole table — at
    * 100 TB the difference between rewriting one day and rewriting
    * the lake). Here the base `events` table partitioned by
    * event_type gets a click-only backfill (rows deduped by
    * `event_id % 10 != 0`, values corrected ×2) written with
    * `partitionOverwriteMode=dynamic` as a per-WRITE option (no
    * session-level conf mutation); the read-back per-type report can
    * only match the oracle if clicks show the backfilled data AND
    * the other types still show the originals. SourceSpec pins the
    * stronger physical claim: the untouched partitions' files are
    * literally the same files afterwards. */
  def dynamicOverwrite(s: SparkSession, d: String): DataFrame =
    dynamicOverwriteWithDir(s, d)._1

  private[graft] def dynamicOverwriteWithDir(
      s: SparkSession, d: String): (DataFrame, String) = {
    val dir = tmp("graft-dynover")
    val ev = Tables(s, d, "events")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(s"$dir/t")
    ev.filter(col("event_type") === "click" && col("event_id") % 10 =!= 0)
      .withColumn("value", col("value") * 2)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_type").parquet(s"$dir/t")
    val report = s.read.parquet(s"$dir/t")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .orderBy("event_type")
    (report, s"$dir/t")
  }

  def mergeApply(s: SparkSession, d: String): DataFrame = {
    val src = Tables(s, d, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    val del = src.filter(col("c_custkey") % 7 === 3)
      .select(col("c_custkey").as("k"))
    val upd = src.filter(col("c_custkey") % 5 === 0 && col("c_custkey") % 7 =!= 3)
      .select(col("c_custkey").as("k"),
        concat(col("c_name"), lit(" (updated)")).as("new_name"),
        (col("c_acctbal") + lit(100.0)).as("new_bal"))
    // fresh keys in the NEGATIVE space: TPC-H keys are positive at
    // every scale factor, so -(k+1) can never collide with a live key
    // (an additive offset like k+1e6 collides once the table outgrows
    // the offset) and c_custkey stays a total order for the oracle
    val ins = src.filter(col("c_custkey") % 11 === 4)
      .select((-(col("c_custkey") + 1L)).as("c_custkey"),
        concat(lit("New "), col("c_name")).as("c_name"),
        col("c_acctbal"))
    src
      .join(del, col("c_custkey") === col("k"), "left_anti")
      .join(upd, col("c_custkey") === col("k"), "left")
      .select(col("c_custkey"),
        coalesce(col("new_name"), col("c_name")).as("c_name"),
        coalesce(col("new_bal"), col("c_acctbal")).as("c_acctbal"))
      .unionByName(ins)
      .orderBy("c_custkey")
  }

  /** Snapshot reconciliation (table diff): classify every primary key
    * across two versions of `orders` as added / removed / changed /
    * unchanged — the audit a lakehouse runs after a merge/backfill to
    * confirm the write did what the CDC batch said. The "new"
    * snapshot derives deterministically from the old (drop every
    * 97th key, bump totalprice on every 13th, insert fresh keys in
    * the negative space — same convention as [[mergeApply]]).
    *
    * Scale posture: each side reduces to (key, md5-of-row) at scan
    * time, so the FULL OUTER join — the honest reconciliation
    * shuffle, both sides keyed by PK — carries 8-byte keys + 32-byte
    * digests, never row payloads. Doubles enter the digest through
    * DECIMAL(12,2) rendering so both engines hash identical strings.
    * The |change-types|-row rollup is free. */
  def tableDiff(s: SparkSession, d: String): DataFrame = {
    val a = Tables(s, d, "orders")
    val b = a.filter(col("o_orderkey") % 97 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 13 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
      .unionByName(a.filter(col("o_orderkey") % 101 === 0)
        .withColumn("o_orderkey", -(col("o_orderkey") + 1L)))
    def dig(df: DataFrame, k: String, h: String) = df.select(
      col("o_orderkey").as(k),
      md5(concat_ws("|", col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice").cast("decimal(12,2)").cast("string"),
        col("o_orderpriority"))).as(h))
    dig(a, "ka", "ha")
      .join(dig(b, "kb", "hb"), col("ka") === col("kb"), "full_outer")
      .select(
        when(col("kb").isNull, "removed")
          .when(col("ka").isNull, "added")
          .when(col("ha") === col("hb"), "unchanged")
          .otherwise("changed").as("change_type"))
      .groupBy("change_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("change_type")
  }

  /** Schema evolution — the lakehouse reality that table schemas
    * WIDEN over time: an "old" batch (no `o_orderstatus`) and a
    * "new" batch (with it) land in one dataset; `mergeSchema` reads
    * the union schema and old rows surface the added column as NULL.
    * The rollup buckets old rows under 'MISSING' via coalesce —
    * exactly the backfill-visibility query a pipeline owner runs
    * after a schema change. The deterministic key-parity split makes
    * the oracle able to reconstruct which rows were "old". Scale
    * note: mergeSchema footer-merges ALL file schemas at planning
    * time — fine per-partition-directory; for 10⁶-file tables the
    * production posture is a table catalog holding the schema, with
    * the reader pinned to it (the explicit-schema read every other
    * connector query demonstrates). */
  def schemaEvolution(s: SparkSession, d: String): DataFrame = {
    val dir = tmp("graft-evolve")
    val o = Tables(s, d, "orders")
    o.filter(col("o_orderkey") % 2 === 0)
      .select("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/data/batch=old")
    o.filter(col("o_orderkey") % 2 =!= 0)
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
      .write.mode("overwrite").parquet(s"$dir/data/batch=new")
    s.read.option("mergeSchema", "true").parquet(s"$dir/data")
      .groupBy(coalesce(col("o_orderstatus"), lit("MISSING")).as("status"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("sum_price"))
      .orderBy("status")
  }

  /** Round-trip through the custom DSv2 SINK
    * ([[graft.sources.GraftDocsSink]]): documents written via the
    * staging + atomic-manifest-commit protocol, read back through the
    * manifest-gated scan, and aggregated — integrity proof that the
    * commit protocol publishes exactly the written rows (count, byte
    * mass, and id-sum must match the source table bit-for-bit).
    * Protocol-level scenarios (abort, zombie orphan files, overwrite
    * visibility) are driven directly in SourceSpec. */
  def dsv2SinkRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = graft.Core.tempDir("graft-dsv2-sink")
    Tables(s, d, "documents").select(col("doc_id"), col("text"))
      .write.format("graft.sources.GraftDocsSink")
      .option("path", dir).mode("overwrite").save()
    s.read.format("graft.sources.GraftDocsSink").option("path", dir).load()
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("n_chars"),
        sum(col("doc_id")).as("id_sum"))
  }

  /** Snapshot time travel through the DSv2 sink: version 1 holds the
    * even-keyed half of the corpus, version 2 overwrites with the
    * full corpus, and the query reads BOTH — v1 pinned with
    * `versionAsOf` while v2 is current — proving the manifest
    * protocol retains and resolves superseded snapshots (the same
    * table-format capability `maint_table_diff` demonstrates over
    * plain parquet copies). */
  def dsv2TimeTravel(s: SparkSession, d: String): DataFrame = {
    val dir = graft.Core.tempDir("graft-dsv2-tt")
    val docs = Tables(s, d, "documents").select(col("doc_id"), col("text"))
    def sink(df: DataFrame): Unit =
      df.write.format("graft.sources.GraftDocsSink")
        .option("path", dir).mode("overwrite").save()
    sink(docs.filter(col("doc_id") % 2 === 0))
    sink(docs)
    val v1 = s.read.format("graft.sources.GraftDocsSink")
      .option("path", dir).option("versionAsOf", "1").load()
      .agg(count(lit(1)).as("n_v1"), sum(col("doc_id")).as("v1_id_sum"))
    val v2 = s.read.format("graft.sources.GraftDocsSink")
      .option("path", dir).load()
      .agg(count(lit(1)).as("n_v2"), sum(col("doc_id")).as("v2_id_sum"))
    v1.crossJoin(v2)
      .select("n_v1", "n_v2", "v1_id_sum", "v2_id_sum")
  }

  /** Snapshot RESTORE through the DSv2 sink — the lakehouse rollback
    * idiom completed: time travel ([[dsv2TimeTravel]]) reads an old
    * snapshot; RESTORE makes it current again AS A NEW COMMIT (v3 =
    * v1's content), never by deleting history — v2 stays readable
    * under `versionAsOf`, exactly how production table formats spell
    * rollback so concurrent readers of v2 are never invalidated. The
    * query reads all three versions and reports per-version digests:
    * a green row proves the restore wrote v1's content bit-for-bit
    * while preserving the superseded snapshot. */
  def dsv2Restore(s: SparkSession, d: String): DataFrame = {
    val dir = tmp("graft-dsv2-restore")
    val docs = Tables(s, d, "documents").select(col("doc_id"), col("text"))
    def sink(df: DataFrame): Unit =
      df.write.format("graft.sources.GraftDocsSink")
        .option("path", dir).mode("overwrite").save()
    sink(docs.filter(col("doc_id") % 2 === 0)) // v1
    sink(docs)                                 // v2
    // RESTORE: read the pinned v1 snapshot, commit it as v3
    sink(s.read.format("graft.sources.GraftDocsSink")
      .option("path", dir).option("versionAsOf", "1").load())
    def stats(ver: String, tag: Int): DataFrame =
      s.read.format("graft.sources.GraftDocsSink")
        .option("path", dir).option("versionAsOf", ver).load()
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"),
          sum(length(col("text"))).as("n_chars"))
        .select(lit(tag.toLong).as("version"), col("n_docs"),
          col("id_sum"), col("n_chars"))
    stats("1", 1).unionAll(stats("2", 2)).unionAll(stats("3", 3))
      .orderBy("version")
  }

  /** Incremental JOIN-view maintenance — the delta identity every IVM
    * engine rests on: with both sides split into base and delta,
    * V_new = (O∖ΔO ⋈ L∖ΔL) ∪ (ΔO ⋈ L∖ΔL) ∪ (O∖ΔO ⋈ ΔL) ∪ (ΔO ⋈ ΔL).
    * [[mergeApply]]/`agg_incremental_retract` maintain AGGREGATES
    * under change feeds; this maintains a JOIN — the other half of a
    * materialized-view stack. Deltas are deterministic hash slices of
    * each side (~10% of orders, ~14% of lineitem, decorrelated keys
    * so all three delta terms are non-empty). The engine computes the
    * view BOTH ways — one full join vs the four-way decomposition —
    * and emits both counts/sums per priority; the oracle pins
    * incr = full from the plain join, so ANY overlap or gap in the
    * engine's case split (the classic IVM double-count bug) breaks
    * the hash.
    *
    * Scale posture: in production V_old = base⋈base is the STORED
    * view — only the three delta terms run per refresh, each
    * shuffling delta-keyed rows (ΔO and ΔL broadcast when the feed is
    * small); the full join here exists as the self-check. All sums
    * are exact integer cents. */
  def joinDelta(s: SparkSession, d: String): DataFrame = {
    import graft.Core.HashMod
    val o = Tables(s, d, "orders").select(col("o_orderkey"), col("o_orderpriority"))
    val l = Tables(s, d, "lineitem").select(col("l_orderkey"),
      col("l_linenumber"),
      round(col("l_quantity") * 100).cast("long").as("qty_cents"))
    val oNew = pmod(col("o_orderkey") * lit(2654435761L), lit(HashMod)) % 10 === 0
    val lNew = pmod((col("l_orderkey") * 31 + col("l_linenumber")) *
      lit(2654435761L), lit(HashMod)) % 7 === 0
    val oOld = o.filter(!oNew); val oD = o.filter(oNew)
    val lOld = l.filter(!lNew); val lD = l.filter(lNew)
    def j(a: DataFrame, b: DataFrame): DataFrame =
      a.join(b, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderpriority").as("priority"), col("qty_cents"))
    val incr = j(oOld, lOld).unionAll(j(oD, lOld))
      .unionAll(j(oOld, lD)).unionAll(j(oD, lD))
      .groupBy("priority")
      .agg(count(lit(1)).as("n_incr"), sum("qty_cents").as("qty_incr_cents"))
    val full = j(o, l).groupBy("priority")
      .agg(count(lit(1)).as("n_full"), sum("qty_cents").as("qty_full_cents"))
    full.join(incr, Seq("priority"), "full")
      .select(col("priority"), col("n_full"), col("n_incr"),
        col("qty_full_cents"), col("qty_incr_cents"))
      .orderBy("priority")
  }

  val queries: Seq[Q] = Seq(
    // oracle: the PLAIN join emitted twice — the delta decomposition
    // is an exact identity, so the engine's four-way union must
    // reproduce the full join's numbers bit-for-bit or the case
    // split has an overlap/gap
    Q("maint_join_delta", joinDelta, Some(
      """SELECT o_orderpriority AS priority,
        |  COUNT(*) AS n_full, COUNT(*) AS n_incr,
        |  CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_full_cents,
        |  CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_incr_cents
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY priority""".stripMargin)),
    Q("connector_dsv2_sink", dsv2SinkRoundtrip, Some(
      """SELECT COUNT(*) AS n_docs,
        |  CAST(SUM(length(text)) AS BIGINT) AS n_chars,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM documents""".stripMargin)),
    Q("connector_dsv2_timetravel", dsv2TimeTravel, Some(
      """SELECT COUNT(CASE WHEN doc_id % 2 = 0 THEN 1 END) AS n_v1,
        |  COUNT(*) AS n_v2,
        |  CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN doc_id END) AS BIGINT) AS v1_id_sum,
        |  CAST(SUM(doc_id) AS BIGINT) AS v2_id_sum
        |FROM documents""".stripMargin)),
    Q("maint_table_diff", tableDiff, Some(
      """WITH b AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS o_totalprice,
        |    o_orderpriority
        |  FROM orders WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT -(o_orderkey + 1), o_custkey, o_orderstatus, o_totalprice,
        |    o_orderpriority
        |  FROM orders WHERE o_orderkey % 101 = 0),
        |da AS (SELECT o_orderkey AS k, md5(concat_ws('|', o_custkey, o_orderstatus,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR), o_orderpriority)) AS h
        |  FROM orders),
        |db AS (SELECT o_orderkey AS k, md5(concat_ws('|', o_custkey, o_orderstatus,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR), o_orderpriority)) AS h
        |  FROM b)
        |SELECT CASE WHEN db.k IS NULL THEN 'removed'
        |            WHEN da.k IS NULL THEN 'added'
        |            WHEN da.h = db.h THEN 'unchanged'
        |            ELSE 'changed' END AS change_type,
        |  COUNT(*) AS n
        |FROM da FULL OUTER JOIN db ON da.k = db.k
        |GROUP BY 1 ORDER BY change_type""".stripMargin)),
    Q("maint_merge_apply", mergeApply, Some(
      """WITH del AS (SELECT c_custkey AS k FROM customer WHERE c_custkey % 7 = 3),
        |upd AS (SELECT c_custkey AS k, c_name || ' (updated)' AS new_name,
        |    c_acctbal + CAST(100 AS DOUBLE) AS new_bal
        |  FROM customer WHERE c_custkey % 5 = 0 AND c_custkey % 7 <> 3),
        |ins AS (SELECT -(c_custkey + 1) AS c_custkey, 'New ' || c_name AS c_name,
        |    c_acctbal
        |  FROM customer WHERE c_custkey % 11 = 4),
        |kept AS (
        |  SELECT c.c_custkey,
        |    COALESCE(u.new_name, c.c_name) AS c_name,
        |    COALESCE(u.new_bal, c.c_acctbal) AS c_acctbal
        |  FROM customer c LEFT JOIN upd u ON u.k = c.c_custkey
        |  WHERE c.c_custkey NOT IN (SELECT k FROM del))
        |SELECT c_custkey, c_name, c_acctbal FROM kept
        |UNION ALL SELECT c_custkey, c_name, c_acctbal FROM ins
        |ORDER BY c_custkey""".stripMargin)),
    // oracle: the analytic final state — originals for every type
    // except click, which carries the deduped ×2-corrected backfill;
    // only a true dynamic (partition-scoped) overwrite produces it
    Q("connector_dynamic_overwrite", dynamicOverwrite, Some(
      """WITH fin AS (
        |  SELECT event_type, value FROM events WHERE event_type <> 'click'
        |  UNION ALL
        |  SELECT event_type, value * 2 AS value FROM events
        |  WHERE event_type = 'click' AND event_id % 10 <> 0)
        |SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM fin GROUP BY event_type ORDER BY event_type""".stripMargin)),
    Q("connector_schema_evolution", schemaEvolution, Some(
      """SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'MISSING' ELSE o_orderstatus END AS status,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1 ORDER BY status""".stripMargin)),
    Q("maint_zorder_stats", zorderStats, Some {
      val terms = (0 until 16).map { b =>
        s"((r_ok // ${1L << b}) % 2) * ${1L << (2 * b)}" +
          s" + ((r_pk // ${1L << b}) % 2) * ${1L << (2 * b + 1)}"
      }.mkString(" + ")
      s"""WITH st AS (SELECT MIN(l_orderkey) AS ok_min, MAX(l_orderkey) AS ok_max,
         |    MIN(l_partkey) AS pk_min, MAX(l_partkey) AS pk_max FROM lineitem),
         |r AS (SELECT l_orderkey, l_partkey,
         |    ((l_orderkey - ok_min) * 65535) // (ok_max - ok_min) AS r_ok,
         |    ((l_partkey - pk_min) * 65535) // (pk_max - pk_min) AS r_pk
         |  FROM lineitem CROSS JOIN st),
         |m AS (SELECT l_orderkey, l_partkey, ($terms) AS morton FROM r)
         |SELECT morton // ${1L << 28} AS z_bucket, COUNT(*) AS n,
         |  MIN(l_orderkey) AS min_ok, MAX(l_orderkey) AS max_ok,
         |  MIN(l_partkey) AS min_pk, MAX(l_partkey) AS max_pk
         |FROM m GROUP BY 1 ORDER BY z_bucket""".stripMargin
    }),
    // oracle: the same probe literals against the ORIGINAL orders
    // table — a green row proves the bloom-written copy answers point
    // probes identically (present keys exact, absent keys empty)
    Q("maint_bloom_skip", bloomSkip, Some {
      val pl = BloomProbes.mkString("[", ", ", "]")
      s"""WITH probes AS (SELECT CAST(unnest($pl) AS BIGINT) AS probe),
         |agg AS (
         |  SELECT o_custkey, COUNT(*) AS n_orders,
         |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
         |  FROM orders WHERE o_custkey IN (SELECT probe FROM probes)
         |  GROUP BY 1)
         |SELECT probe, COALESCE(n_orders, 0) AS n_orders, sum_price
         |FROM probes LEFT JOIN agg ON probe = o_custkey
         |ORDER BY probe""".stripMargin
    }),
    Q("connector_compaction", compaction, Some(
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      headline = false),
    Q("partition_pruning_dynamic", dynamicPruning, Some(
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events WHERE event_type IN ('purchase', 'signup')
        |GROUP BY event_type ORDER BY event_type""".stripMargin),
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
    Q("connector_binaryfile", binaryFileRoundtrip, Some(
      """SELECT doc_id, CAST(strlen(text) + 1 AS BIGINT) AS length,
        |  md5(text || chr(10)) AS content_md5
        |FROM documents ORDER BY doc_id""".stripMargin)),
    // oracle: versions 1 and 3 are the even half, 2 the full corpus —
    // derived straight from documents, so a restore that republished
    // the wrong snapshot (or clobbered v2) breaks the hash
    Q("maint_snapshot_restore", dsv2Restore, Some(
      """WITH e AS (SELECT COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS s,
        |             CAST(SUM(strlen(text)) AS BIGINT) AS c
        |           FROM documents WHERE doc_id % 2 = 0),
        |a AS (SELECT COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS s,
        |        CAST(SUM(strlen(text)) AS BIGINT) AS c
        |      FROM documents)
        |SELECT CAST(1 AS BIGINT) AS version, e.n AS n_docs,
        |  e.s AS id_sum, e.c AS n_chars FROM e
        |UNION ALL SELECT 2, a.n, a.s, a.c FROM a
        |UNION ALL SELECT 3, e.n, e.s, e.c FROM e
        |ORDER BY version""".stripMargin)),
    Q("connector_xml", xmlRoundtrip, Some(
      """SELECT n_regionkey, COUNT(*) AS n_nations,
        |  MIN(n_name) AS first_nation
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)),
    Q("connector_json", jsonRoundtrip, Some(
      """SELECT s_nationkey, COUNT(*) AS n_suppliers,
        |  CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)),
  )
}
