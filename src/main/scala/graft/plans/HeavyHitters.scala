package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Misra-Gries frequent-items sketch as a mergeable aggregate —
  * `misra_gries(key, weight, cap)` (registered by [[GraftExtensions]]).
  *
  * Unlike the top-k paths already in the engine (`topk_counts`
  * consumes an ALREADY-AGGREGATED (word, count) stream; the window /
  * TakeOrdered spellings sort a full per-group set), this sketch
  * ingests the RAW token stream: each partition folds its rows into at
  * most `cap` counters, and partial summaries merge associatively.
  * Shuffle traffic is O(cap × partitions) regardless of vocabulary —
  * at 100 TB this finds frequent tokens with no groupBy over the
  * token stream at all, where the exact spelling must first shuffle
  * one row per distinct key.
  *
  * Semantics (mergeable-summaries formulation): counters undercount —
  * whenever more than `cap` keys are live, every counter is reduced by
  * the (cap+1)-th largest value and non-positive counters are dropped.
  * Guarantees, for total ingested weight W:
  *   - estimate ∈ [true − W/(cap+1), true] for every key;
  *   - every key with true weight > W/(cap+1) survives in the output.
  * With `cap` ≥ the number of distinct keys no reduction ever fires
  * and the sketch is EXACT — the regime the oracle-checked query runs
  * in (the documents vocabulary is ~31 words, cap = 64); the
  * approximate regime's bounds are pinned by [[graft.HeavyHittersSpec]].
  *
  * Result: `array<struct<word,count>>` ordered (count DESC, word ASC)
  * — deterministic ties, oracle-comparable.
  */
case class MisraGries(
    key: Expression,
    weight: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  private lazy val cap: Int = capExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(key, weight, capExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("word", StringType), StructField("count", LongType))))

  override def checkInputDataTypes(): TypeCheckResult =
    if (key.dataType == StringType &&
      (weight.dataType == LongType || weight.dataType == IntegerType) &&
      capExpr.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "misra_gries(key string, weight int/bigint, cap literal int)")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  /** Decrement every counter by the (cap+1)-th largest value and drop
    * the non-positives — at most `cap` counters (those strictly above
    * it) survive. One reduction subtracts ≤ W_ingested/(cap+1) total
    * from any single key across the sketch's lifetime. */
  private def reduceTo(buf: mutable.HashMap[String, Long]): Unit = {
    if (buf.size <= cap) return
    val vals = buf.values.toArray
    java.util.Arrays.sort(vals)
    val m = vals(vals.length - 1 - cap) // (cap+1)-th largest
    val dead = mutable.ArrayBuffer.empty[String]
    buf.foreach { case (k, v) =>
      if (v - m <= 0) dead += k else buf.update(k, v - m)
    }
    dead.foreach(buf.remove)
  }

  override def update(
      buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val kv = key.eval(input)
    val wv = weight.eval(input)
    if (kv != null && wv != null) {
      val w = wv.asInstanceOf[Number].longValue()
      if (w > 0) {
        val k = kv.asInstanceOf[UTF8String].toString
        buf.update(k, buf.getOrElse(k, 0L) + w)
        reduceTo(buf)
      }
    }
    buf
  }

  override def merge(
      a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }
    reduceTo(a)
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toSeq.sortBy { case (w, c) => (-c, w) }
    new GenericArrayData(sorted.map { case (w, c) =>
      InternalRow(UTF8String.fromString(w), c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (w, c) => out.writeUTF(w); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => buf.update(in.readUTF(), in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGries =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGries =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MisraGries =
    copy(key = c(0), weight = c(1), capExpr = c(2))
  override def prettyName: String = "misra_gries"
}
