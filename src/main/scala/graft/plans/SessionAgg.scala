package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, GenericInternalRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Whole-operator Catalyst extension #2: gap-based SESSION
  * aggregation as its own logical node + strategy + physical
  * operator — the sessionization member of the custom-operator
  * ladder's tier (c), alongside [[TopKPerGroupNode]].
  *
  * The built-in spelling (lag() over user to mark gaps, running sum
  * for session ids, then groupBy(user, session)) plans as Exchange →
  * Sort → Window → Window → HashAggregate: two window passes that
  * buffer each user's frame, plus a hash table keyed by EVERY
  * (user, session) pair. Sessions are a fold over time-ordered rows
  * — nothing about them needs window buffers or a hash table. This
  * operator declares `ClusteredDistribution(user)` plus a required
  * child ordering of (user, ts) and emits closed sessions in ONE
  * streaming pass with O(1) state (current key, session counter,
  * running n/min/max): no per-group buffering, no (user, session)
  * hash table, and the only memory-bound stage left is the sort,
  * which SortExec already spills. At 100 TB the plan is Exchange →
  * spillable Sort → this fold — strictly less state than either
  * built-in spelling.
  *
  * Scale contract: EnsureRequirements inserts (or reuses) the hash
  * exchange and the per-partition sort exactly as it would for a
  * sort aggregate, so the operator composes with AQE and exchange
  * reuse for free; `outputPartitioning` forwards the child's, so a
  * downstream operator keyed on user plans zero extra exchanges.
  *
  * Session semantics (identical to the `events_sessionize` window
  * spelling and DuckDB oracle): a row starts a NEW session when its
  * ts minus the previous row's ts strictly exceeds `gapNs`; session
  * ids number a user's sessions 1, 2, … in time order; output is one
  * row per session — (user, session_id, n_events, start_ns, end_ns).
  * Rows with equal ts order arbitrarily within the sort, which
  * cannot affect results: a zero gap never splits, and n/min/max are
  * order-independent. `ts` must be a non-null LongType (the engine's
  * epoch-ns convention). */
case class SessionAggNode(
    user: Attribute,
    ts: Attribute,
    gapNs: Long,
    child: LogicalPlan,
    aggAttrs: Seq[Attribute] = Seq(
      AttributeReference("session_id", LongType, nullable = false)(),
      AttributeReference("n_events", LongType, nullable = false)(),
      AttributeReference("start_ns", LongType, nullable = false)(),
      AttributeReference("end_ns", LongType, nullable = false)()))
  extends UnaryNode {
  require(gapNs > 0, s"session gap must be positive, got $gapNs")
  override def output: Seq[Attribute] = user +: aggAttrs
  override def producedAttributes: AttributeSet = AttributeSet(aggAttrs)
  override protected def withNewChildInternal(newChild: LogicalPlan): SessionAggNode =
    copy(child = newChild)
}

/** DataFrame-level entry point for [[SessionAggNode]]. */
object SessionAgg {
  import org.apache.spark.sql.DataFrame

  /** One row per (user, gap-delimited session): session_id (1-based
    * per user in time order), n_events, start_ns, end_ns. `tsCol`
    * must be LongType epoch nanoseconds. */
  def apply(df: DataFrame, userCol: String, tsCol: String, gapNs: Long): DataFrame = {
    val plan = df.queryExecution.analyzed
    def attr(n: String): Attribute = plan.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${plan.output.map(_.name).mkString(", ")}"))
    val t = attr(tsCol)
    require(t.dataType == LongType,
      s"$tsCol must be LongType epoch-ns, got ${t.dataType}")
    org.apache.spark.sql.GraftBridge.ofRows(df.sparkSession,
      SessionAggNode(attr(userCol), t, gapNs, plan))
  }
}

/** Plans [[SessionAggNode]] → [[SessionAggExec]]; injected via
  * [[GraftExtensions]] (`injectPlannerStrategy`). */
object SessionAggStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case SessionAggNode(u, t, gap, child, aggAttrs) =>
      SessionAggExec(u, t, gap, aggAttrs, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Single-pass session fold over (user, ts)-sorted input — see
  * [[SessionAggNode]] for the contract. */
case class SessionAggExec(
    user: Attribute,
    ts: Attribute,
    gapNs: Long,
    aggAttrs: Seq[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = user +: aggAttrs
  override def producedAttributes: AttributeSet = AttributeSet(aggAttrs)

  /** All rows of a user in one partition, time-ordered within it —
    * the planner inserts (or reuses) the exchange and a spillable
    * sort, same as for a sort-based aggregate. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(user)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(user, Ascending), SortOrder(ts, Ascending)))

  /** Sessions never move (partition-local fold), so the child's
    * user-clustered partitioning survives. */
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val userAttr = user
    val tsAttr = ts
    val gap = gapNs
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(Seq(userAttr), childOutput)
      val tsProj = UnsafeProjection.create(Seq(tsAttr), childOutput)
      val outProj = UnsafeProjection.create(
        Array[DataType](userAttr.dataType, LongType, LongType, LongType, LongType))
      val outBuf = new GenericInternalRow(5)
      new Iterator[InternalRow] {
        private var prevKey: UnsafeRow = null // copied; owns its buffer
        private var sid = 0L
        private var n = 0L
        private var startNs = 0L
        private var lastNs = 0L
        private var flushed = false
        private var pending: InternalRow = null

        // Emits the CURRENT open session (outProj copies every value
        // into its own buffer immediately, so mutating state or
        // replacing prevKey right after is safe; the returned row is
        // reused across next() calls per the operator contract).
        private def closeSession(): InternalRow = {
          outBuf.update(0, prevKey.get(0, userAttr.dataType))
          outBuf.setLong(1, sid)
          outBuf.setLong(2, n)
          outBuf.setLong(3, startNs)
          outBuf.setLong(4, lastNs)
          outProj(outBuf)
        }

        private def advance(): Unit = {
          while (pending == null && iter.hasNext) {
            val r = iter.next()
            val key = keyProj(r)
            val tsRow = tsProj(r)
            // getLong on a null field would silently read 0 (an
            // epoch-0 event opening a bogus first session); the
            // contract is non-null ts, so fail loudly instead
            if (tsRow.isNullAt(0))
              throw new IllegalStateException(
                s"session_agg: null ${ts.name} — the timestamp column must be non-null")
            val t = tsRow.getLong(0)
            if (prevKey == null) {
              prevKey = key.copy(); sid = 1; n = 1; startNs = t; lastNs = t
            } else if (key != prevKey) { // byte-compare of UnsafeRows
              pending = closeSession()
              prevKey = key.copy(); sid = 1; n = 1; startNs = t; lastNs = t
            } else if (t - lastNs > gap) {
              pending = closeSession()
              sid += 1; n = 1; startNs = t; lastNs = t
            } else {
              n += 1; lastNs = t
            }
          }
          if (pending == null && !iter.hasNext && prevKey != null && !flushed) {
            pending = closeSession() // the partition's last open session
            flushed = true
          }
        }

        override def hasNext: Boolean = { advance(); pending != null }
        override def next(): InternalRow = {
          advance()
          val r = pending
          pending = null
          r
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SessionAggExec =
    copy(child = newChild)
}
