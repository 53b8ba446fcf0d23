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

/** Bounded top-k aggregate (SURVEY §7.2 step 6b): keeps the k
  * largest (count, key) pairs in a min-heap buffer of size ≤ k —
  * O(k) state per partial aggregate regardless of input cardinality,
  * so a global "top 20 of billions of groups" never materializes or
  * range-shuffles the full set: partials of size k merge to size k.
  *
  * Total order: count DESC, then key ASC (ties deterministic —
  * oracle-comparable). Result is `array<struct<word,count>>` in rank
  * order; pair with `posexplode` for ranked rows.
  *
  * Registered as the SQL function `topk_counts(key, count, k)` by
  * [[GraftExtensions]].
  */
case class TopKCounts(
    key: Expression,
    count: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(String, Long)]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  // min-heap: worst element (smallest count, then LARGEST key) on top
  private val ord: Ordering[(String, Long)] =
    Ordering.by[(String, Long), (Long, String)] { case (w, c) => (c, w) }(
      Ordering.Tuple2(Ordering.Long, Ordering.String.reverse)).reverse

  override def children: Seq[Expression] = Seq(key, count, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("word", StringType), StructField("count", LongType))))

  override def checkInputDataTypes(): TypeCheckResult =
    if (key.dataType == StringType && count.dataType == LongType && kExpr.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "topk_counts(key string, count bigint, k literal int)")

  override def createAggregationBuffer(): mutable.PriorityQueue[(String, Long)] =
    mutable.PriorityQueue.empty[(String, Long)](ord)

  override def update(
      buf: mutable.PriorityQueue[(String, Long)],
      input: InternalRow): mutable.PriorityQueue[(String, Long)] = {
    val kv = key.eval(input)
    val cv = count.eval(input)
    if (kv != null && cv != null) {
      buf.enqueue((kv.asInstanceOf[UTF8String].toString, cv.asInstanceOf[Long]))
      while (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def merge(
      a: mutable.PriorityQueue[(String, Long)],
      b: mutable.PriorityQueue[(String, Long)]): mutable.PriorityQueue[(String, Long)] = {
    b.foreach(a.enqueue(_))
    while (a.size > k) a.dequeue()
    a
  }

  override def eval(buf: mutable.PriorityQueue[(String, Long)]): Any = {
    val sorted = buf.toSeq.sortBy { case (w, c) => (-c, w) }
    new GenericArrayData(sorted.map { case (w, c) =>
      InternalRow(UTF8String.fromString(w), c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[(String, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (w, c) => out.writeUTF(w); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(String, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => buf.enqueue((in.readUTF(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKCounts =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKCounts =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKCounts =
    copy(key = c(0), count = c(1), kExpr = c(2))
  override def prettyName: String = "topk_counts"
}
