package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

/** DataSource V2 connector (SURVEY §2a O1/O2 lifted to the connector
  * SPI): a deterministic synthetic document source,
  * `spark.read.format("graft-docs")`.
  *
  * Options: `rows` (documents), `partitions` (parallelism), `words`
  * (space-separated vocabulary), `wordsPerDoc`, `seed`. Schema is
  * `(doc_id bigint, text string)`.
  *
  * Scale design: the planner emits `partitions` independent
  * [[InputPartition]]s, each generating its own contiguous doc_id
  * range from a counter-based LCG — no coordination, no shared
  * state, no driver-side data; generation parallelism == partition
  * count, exactly how a production connector scales reads. Content
  * is a pure function of (seed, doc_id), so any partitioning of the
  * same options yields identical rows (asserted in SourceSpec).
  */
class SyntheticDocsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocsSource.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new SyntheticDocsTable(properties.asScala.toMap)
}

object SyntheticDocsSource {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  /** Deterministic word index for (seed, doc, pos): a 64-bit LCG. */
  def wordIndex(seed: Long, doc: Long, pos: Int, vocab: Int): Int = {
    val x = seed * 6364136223846793005L + doc * 1442695040888963407L + pos * 2862933555777941757L
    ((((x >>> 33) ^ x) & Long.MaxValue) % vocab).toInt
  }
}

private class SyntheticDocsTable(options: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = "graft_synthetic_docs"
  override def schema(): StructType = SyntheticDocsSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = options ++ caseInsensitive.asScala
    // Production posture: the scan honors column pruning (a doc_id-only
    // projection never GENERATES text — the analogue of a columnar
    // reader skipping pages), per-partition limit pushdown (Spark
    // re-applies the global limit; isPartiallyPushed stays true), and
    // doc_id range-filter pushdown (partition PLANNING starts from the
    // filtered range — the analogue of partition/file skipping, so a
    // `doc_id >= N` probe never generates the skipped prefix at all).
    new ScanBuilder
      with SupportsPushDownRequiredColumns
      with SupportsPushDownLimit
      with SupportsPushDownFilters {
      private var required: StructType = SyntheticDocsSource.schema
      private var limit: Option[Int] = None
      private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
      override def pruneColumns(requiredSchema: StructType): Unit = {
        // preserve source field order; tolerate empty (count-only) scans
        required = StructType(SyntheticDocsSource.schema.fields
          .filter(f => requiredSchema.fieldNames.contains(f.name)))
      }
      override def pushLimit(l: Int): Boolean = { limit = Some(l); true }
      override def pushFilters(
          filters: Array[org.apache.spark.sql.sources.Filter]):
          Array[org.apache.spark.sql.sources.Filter] = {
        val (sup, rest) = filters.partition(SyntheticDocsScan.bound(_).isDefined)
        pushed = sup
        rest // residuals Spark evaluates itself; bounds are exact, so
             // accepted filters need no re-evaluation
      }
      override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
        pushed
      override def build(): Scan =
        new SyntheticDocsScan(merged, required, limit, pushed)
    }
  }
}

private object SyntheticDocsScan {
  import org.apache.spark.sql.sources._
  /** doc_id comparison → `(lo inclusive, hi exclusive)` range bound,
    * None for filters the source can't turn into a range. */
  def bound(f: Filter): Option[(Long, Long)] = {
    // Exact decimal view of the literal: the ScanBuilder SPI is public
    // and callers may probe with fractional values (LessThan("doc_id",
    // 900.5)) that Catalyst would normally have cast away. Because
    // pushFilters accepts exactly the filters bound() handles and
    // Spark never re-evaluates them, the range must be floor/ceil
    // -correct per comparator, not a blind longValue() truncation.
    def dec(v: Any): Option[BigDecimal] = v match {
      case b: java.math.BigDecimal => Some(BigDecimal(b))
      case b: BigDecimal           => Some(b)
      case d: java.lang.Double     => if (d.isNaN || d.isInfinite) None else Some(BigDecimal(d.doubleValue()))
      case fl: java.lang.Float     => if (fl.isNaN || fl.isInfinite) None else Some(BigDecimal(fl.doubleValue()))
      // BigInteger BEFORE the Number fallback: longValue() on 2^63
      // wraps negative and would turn an empty-range predicate into
      // a full-table range that Spark never re-evaluates
      case bi: java.math.BigInteger => Some(BigDecimal(new java.math.BigDecimal(bi)))
      case bi: BigInt              => Some(BigDecimal(bi))
      case n: Number               => Some(BigDecimal(n.longValue()))
      case _                       => None
    }
    val MaxL = BigDecimal(Long.MaxValue)
    // saturating clamp to Long: ids live in [0, rows) with rows ≤
    // MaxValue, so saturation at the boundary is exact (no id ever
    // equals MaxValue; lo is later clamped to ≥ 0).
    def clamp(x: BigDecimal): Long =
      if (x >= MaxL) Long.MaxValue
      else if (x <= BigDecimal(Long.MinValue)) Long.MinValue
      else x.toLong
    def floorL(x: BigDecimal): Long = clamp(x.setScale(0, BigDecimal.RoundingMode.FLOOR))
    def ceilL(x: BigDecimal): Long  = clamp(x.setScale(0, BigDecimal.RoundingMode.CEILING))
    def inc(n: Long): Long = if (n == Long.MaxValue) Long.MaxValue else n + 1
    f match {
      // id == 900.5 matches nothing; id == 900 matches exactly [900, 901)
      case EqualTo("doc_id", v) => dec(v).map { x =>
        if (x.isWhole) { val n = clamp(x); (n, inc(n)) } else (0L, 0L)
      }
      // id > 900.5 ⇒ id ≥ 901 = floor+1; id > 900 ⇒ id ≥ 901 = floor+1
      case GreaterThan("doc_id", v)        => dec(v).map(x => (inc(floorL(x)), Long.MaxValue))
      // id ≥ 900.5 ⇒ id ≥ 901 = ceil; id ≥ 900 ⇒ ceil = 900
      case GreaterThanOrEqual("doc_id", v) => dec(v).map(x => (ceilL(x), Long.MaxValue))
      // id < 900.5 ⇒ id ≤ 900 ⇒ hi-excl 901 = ceil; id < 900 ⇒ hi-excl 900 = ceil
      case LessThan("doc_id", v)           => dec(v).map(x => (0L, ceilL(x)))
      // id ≤ 900.5 ⇒ hi-excl 901 = floor+1; id ≤ 900 ⇒ hi-excl 901 = floor+1
      case LessThanOrEqual("doc_id", v)    => dec(v).map(x => (0L, inc(floorL(x))))
      case IsNotNull("doc_id")             => Some((0L, Long.MaxValue))
      case _                               => None
    }
  }
}

private class SyntheticDocsScan(
    options: Map[String, String],
    required: StructType,
    limit: Option[Int],
    filters: Array[org.apache.spark.sql.sources.Filter]) extends Scan with Batch {
  private val rows = options.getOrElse("rows", "100").toLong
  private val partitions = options.getOrElse("partitions", "4").toInt
  private val words = options.getOrElse("words",
    "the quick brown fox jumps over a lazy dog and runs far away").split("\\s+")
  private val wordsPerDoc = options.getOrElse("wordsperdoc", "12").toInt
  private val seed = options.getOrElse("seed", "42").toLong

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    // intersect all pushed doc_id ranges with [0, rows) and plan
    // partitions over the SURVIVING range only — skipped ids are
    // never generated (partition skipping, not post-filtering)
    val (lo, hi) = filters.flatMap(SyntheticDocsScan.bound)
      .foldLeft((0L, rows)) { case ((a, b), (c, dd)) =>
        (math.max(a, c), math.min(b, dd))
      }
    val span = math.max(0L, hi - lo)
    val per = (span + partitions - 1) / math.max(1, partitions)
    (0 until partitions).map { p =>
      val start = lo + p * per
      val end = math.min(start + per, hi)
      // pushed limit caps each partition's output; Spark still applies
      // the global limit on top
      val capped = limit.fold(end)(l => math.min(end, start + l))
      DocsRange(start, math.max(start, capped), seed, words, wordsPerDoc,
        needId = required.fieldNames.contains("doc_id"),
        needText = required.fieldNames.contains("text"))
        .asInstanceOf[InputPartition]
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val r = partition.asInstanceOf[DocsRange]
        new PartitionReader[InternalRow] {
          private var cur = r.start - 1
          override def next(): Boolean = { cur += 1; cur < r.end }
          override def get(): InternalRow = {
            // pruned columns are never materialized — text generation
            // (the expensive part) is skipped for doc_id-only scans
            def text = UTF8String.fromString((0 until r.wordsPerDoc).map { pos =>
              r.words(SyntheticDocsSource.wordIndex(r.seed, cur, pos, r.words.length))
            }.mkString(" "))
            (r.needId, r.needText) match {
              case (true, true)   => InternalRow(cur, text)
              case (true, false)  => InternalRow(cur)
              case (false, true)  => InternalRow(text)
              case (false, false) => InternalRow.empty
            }
          }
          override def close(): Unit = ()
        }
      }
    }
}

private case class DocsRange(
    start: Long, end: Long, seed: Long,
    words: Array[String], wordsPerDoc: Int,
    needId: Boolean, needText: Boolean) extends InputPartition
