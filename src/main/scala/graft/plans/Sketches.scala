package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Deterministic mergeable summaries #2–#4 (after [[MisraGries]]):
  * KMV distinct sketch, Count-Min frequency sketch, Bloom filter.
  *
  * Shared design constraint (same as the MinHash family in
  * [[TextHashes]]): every hash is `(a·h + b) mod P` with P = 1e9+7
  * and the multipliers successive powers of the Knuth constant mod P
  * — products stay < P² < 2^63 (exact in long arithmetic), and the
  * identical integers are replayable in DuckDB SQL, so the ORACLE
  * CHECKS THE SKETCH VALUES THEMSELVES bit-for-bit, not just a bound.
  * All three summaries are order- and partitioning-independent:
  *  - KMV: the k smallest distinct hash values of a set are a set
  *    property (union-mergeable: k smallest of the union);
  *  - Count-Min: cells are sums, merge = cellwise add;
  *  - Bloom: cells are bits, merge = bitwise OR.
  * That is what makes them safe to hash-match across engines — unlike
  * HLL/GK sketches whose binary states are engine-specific (those are
  * gated by error-band contracts in [[graft.operators.Udaf]]).
  *
  * Scale posture (the reason these exist next to their exact twins):
  * each is a TypedImperativeAggregate whose partial state is O(k),
  * O(depth·width), O(m/64) longs respectively — shuffle traffic is
  * per-PARTITION constants, never per distinct key, where the exact
  * spellings (`countDistinct`, `groupBy(word)`, anti-join) all move
  * one row per distinct key first. At 100 TB the sketch aggregates
  * are the only spellings whose exchange does not grow with the data.
  */
object Sketches {
  val P: Long = graft.Core.HashMod
  private val Kn: Long = 2654435761L % P // Knuth multiplicative constant

  /** Kn^(i+1) mod P — large, well-mixed, distinct multipliers (see
    * the recall-trap note at operators/Dedup.scala:115). */
  def seedA(i: Int): Long = powmod(i + 1)
  def seedB(i: Int): Long = powmod(i + 17)
  private def powmod(e: Int): Long = {
    var r = 1L; var x = Kn; var n = e
    while (n > 0) { if ((n & 1) == 1) r = r * x % P; x = x * x % P; n >>= 1 }
    r
  }

  /** Row/seed-i cell of hash `h` in a table of `width` cells — the one
    * arithmetic shared by Spark, the aggregate buffers, and the DuckDB
    * oracles. */
  def cell(h: Column, i: Int, width: Int): Column =
    (lit(seedA(i)) * h + lit(seedB(i))) % P % width

  /** DuckDB seed table literal: `(i, a, b)` rows for seeds 0..k-1. */
  def oSeedRows(k: Int): String =
    (0 until k).map(i => s"($i, ${seedA(i)}, ${seedB(i)})").mkString(", ")

  def minKHashes(h: Column, k: Int): Column =
    call_function("min_k_hashes", h, lit(k))
  def countMin(h: Column, w: Column, depth: Int, width: Int): Column =
    call_function("count_min", h, w, lit(depth), lit(width))
  def bloomAgg(h: Column, mBits: Int, k: Int): Column =
    call_function("bloom_agg", h, lit(mBits), lit(k))

  /** Map-side membership probe against a built Bloom bitset column
    * (`array<bigint>` of m/64 words): true iff all k bits are set.
    * Composed from codegen'd built-ins (`element_at` + `bit_get`) so
    * the probe fuses into the scan — the broadcast bitset is the only
    * state, and a "false" admits the row with NO join at all. */
  def bloomMightContain(bf: Column, h: Column, mBits: Int, k: Int): Column =
    (0 until k).map { i =>
      val pos = cell(h, i, mBits)
      call_function("bit_get",
        element_at(bf, (pos / 64).cast("int") + 1),
        (pos % 64).cast("int")) === 1
    }.reduce(_ && _)

  /** KMV cardinality estimate from a min-k sketch (array asc): exact
    * regime below k (the sketch IS the distinct set), else the
    * classic (k−1)·M / h_(k) estimator — a fixed IEEE expression,
    * bit-replayable in the oracle. */
  def kmvEstimate(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit((k - 1).toDouble * P.toDouble) / element_at(sk, k).cast("double"))
}

/** `min_k_hashes(h bigint, k literal int) → array<bigint>` — the k
  * smallest DISTINCT hash values seen, ascending. Duplicate-
  * insensitive by construction (a set property), so it estimates
  * distinct cardinality and — unlike HLL — supports INTERSECTION:
  * merge two sketches, keep the k minima of the union, and the
  * fraction of those minima present in both input sketches is an
  * unbiased Jaccard estimate (the k-minima are a uniform sample of
  * the union). Buffer: a capped TreeSet, O(k) state, O(log k) update.
  */
case class MinKHashes(
    hash: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(hash, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (hash.dataType == LongType && kExpr.foldable) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("min_k_hashes(h bigint, k literal int)")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) { buf.add(v); if (buf.size > k) { buf.pollLast(); () } }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val hv = hash.eval(input)
    if (hv != null) add(buf, hv.asInstanceOf[Long])
    buf
  }

  override def merge(
      a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue())
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => buf.add(in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MinKHashes =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinKHashes =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinKHashes =
    copy(hash = c(0), kExpr = c(1))
  override def prettyName: String = "min_k_hashes"
}

/** `count_min(h bigint, w bigint, depth literal, width literal) →
  * array<bigint>` of depth×width cells (row-major). Each row r adds
  * `w` to cell `((a_r·h + b_r) mod P) mod width`; the estimate for a
  * key is the MIN over rows of its cells. Always an OVERcount (cells
  * are sums of non-negative weights) — `est ≥ true` deterministically,
  * and `est ≤ true + εW` with probability 1−δ for width = e/ε,
  * depth = ln(1/δ). Cells are plain sums, so the whole table is
  * deterministic for a fixed seed set regardless of row order or
  * partitioning — the oracle replays every cell exactly. */
case class CountMinSketch(
    hash: Expression,
    weight: Expression,
    depthExpr: Expression,
    widthExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private lazy val depth: Int = depthExpr.eval().asInstanceOf[Number].intValue()
  private lazy val width: Int = widthExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(hash, weight, depthExpr, widthExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (hash.dataType == LongType &&
      (weight.dataType == LongType || weight.dataType == IntegerType) &&
      depthExpr.foldable && widthExpr.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "count_min(h bigint, w int/bigint, depth literal int, width literal int)")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val hv = hash.eval(input)
    val wv = weight.eval(input)
    if (hv != null && wv != null) {
      val h = hv.asInstanceOf[Long]
      val w = wv.asInstanceOf[Number].longValue()
      var r = 0
      while (r < depth) {
        val c = ((Sketches.seedA(r) * h + Sketches.seedB(r)) % Sketches.P % width).toInt
        buf(r * width + c) += w
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(in.readInt())(in.readLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CountMinSketch =
    copy(hash = c(0), weight = c(1), depthExpr = c(2), widthExpr = c(3))
  override def prettyName: String = "count_min"
}

/** `bloom_agg(h bigint, m_bits literal, k literal) → array<bigint>`
  * — an m-bit Bloom filter as m/64 long words (m must be a multiple
  * of 64). Sets bits `((a_i·h + b_i) mod P) mod m` for i < k; merge
  * is bitwise OR. NO FALSE NEGATIVES by construction: a member's k
  * bits are all set in every merge result that saw it — the property
  * the bloom-gated incremental dedup relies on to skip the verify
  * join for "definitely new" rows. Probe with
  * [[Sketches.bloomMightContain]]. */
case class BloomAgg(
    hash: Expression,
    mBitsExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private lazy val mBits: Int = mBitsExpr.eval().asInstanceOf[Number].intValue()
  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(hash, mBitsExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (hash.dataType == LongType && mBitsExpr.foldable && kExpr.foldable &&
      mBitsExpr.eval().asInstanceOf[Number].intValue() % 64 == 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bloom_agg(h bigint, m_bits literal int (multiple of 64), k literal int)")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](mBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val hv = hash.eval(input)
    if (hv != null) {
      val h = hv.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val pos = ((Sketches.seedA(i) * h + Sketches.seedB(i)) % Sketches.P % mBits).toInt
        buf(pos / 64) |= 1L << (pos % 64)
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(in.readInt())(in.readLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomAgg =
    copy(hash = c(0), mBitsExpr = c(1), kExpr = c(2))
  override def prettyName: String = "bloom_agg"
}
