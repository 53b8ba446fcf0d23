package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension: per-group top-k as its own
  * logical node + planner strategy + physical operator — tier (c) of
  * the custom-operator ladder, for semantics the built-ins express
  * only wastefully.
  *
  * The built-in spelling (`row_number() OVER (PARTITION BY g ORDER BY
  * s) WHERE rn <= k`) plans as Exchange → FULL SORT of every
  * partition → Window → Filter: at 100 TB the sort materializes and
  * orders ALL n rows per group just to throw away all but k. This
  * operator holds a bounded k-row heap per group instead — O(n log k)
  * comparisons, O(groups · k) memory, no sort buffer, no spill
  * pressure — the same asymmetics that make [[TopKCounts]] win at the
  * aggregate level, applied at the operator level.
  *
  * Scale contract: `requiredChildDistribution` declares
  * `ClusteredDistribution(group)`, so EnsureRequirements plans the
  * single hash exchange (or reuses an existing one) exactly like any
  * built-in aggregation — the operator composes with AQE and
  * exchange reuse for free. */
case class TopKPerGroupNode(
    group: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

/** Dataframe-level entry point for [[TopKPerGroupNode]]. */
object TopKPerGroup {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}

  /** `df` limited to the top `k` rows per group. `sortSpec` is
    * (column, ascending) in output-rank order — pass `false` for
    * "largest first". */
  def apply(
      df: DataFrame,
      groupCols: Seq[String],
      sortSpec: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    val plan = df.queryExecution.analyzed
    def attr(n: String): Attribute = plan.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${plan.output.map(_.name).mkString(", ")}"))
    val order = sortSpec.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    org.apache.spark.sql.GraftBridge.ofRows(df.sparkSession,
      TopKPerGroupNode(groupCols.map(attr), order, k, plan))
  }
}

/** Plans [[TopKPerGroupNode]] → [[TopKPerGroupExec]]; injected via
  * [[GraftExtensions]] (`injectPlannerStrategy`). */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Opt-in optimizer rule (`spark.graft.topk.rewrite=true`) that
  * rewrites the classic top-k idiom
  * {{{ row_number() OVER (PARTITION BY g ORDER BY s) rn ... WHERE rn <= k }}}
  * into [[TopKPerGroupNode]] whenever the rank column itself is
  * dropped by the enclosing projection — the plan goes from
  * Exchange→Sort→Window→Filter to Exchange→heap with NO user code
  * change. Off by default: with a non-total ORDER BY, row_number
  * breaks ties by sort incidence and the heap by competition order,
  * so the rewrite is only identical under total orders — the user
  * opts in exactly like with any tie-sensitive optimization.
  * Idempotent (the matched shape disappears), and conservative:
  * any reference to the rank column above the filter blocks it. */
object TopKRewrite extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project, Window => LWindow}
  import org.apache.spark.sql.types.IntegerType

  private val ConfKey = "spark.graft.topk.rewrite"

  private def boundOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType)) if a.semanticEquals(rn) => Some(v)
    case LessThan(a: Attribute, Literal(v: Int, IntegerType)) if a.semanticEquals(rn) => Some(v - 1)
    case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: Attribute) if a.semanticEquals(rn) => Some(v)
    case GreaterThan(Literal(v: Int, IntegerType), a: Attribute) if a.semanticEquals(rn) => Some(v - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(ConfKey, "false") != "true") return plan
    plan.transformUp {
      case Project(pl, Filter(cond, LWindow(Seq(al @ Alias(
            WindowExpression(_: RowNumber, WindowSpecDefinition(ps, os, _)), _)),
            _, _, child, _)))
          if boundOf(cond, al.toAttribute).exists(_ > 0) &&
            pl.forall(_.references.subsetOf(child.outputSet)) =>
        Project(pl, TopKPerGroupNode(ps, os, boundOf(cond, al.toAttribute).get, child))
    }
  }
}

/** Bounded-heap per-group top-k. Each partition holds one k-row
  * binary heap per group key (head = worst retained row); a new row
  * competes against the head only — rows beyond the top k are
  * discarded in O(log k) without ever being buffered. Output order
  * within/across groups is unspecified (callers sort, as with any
  * unordered operator output). */
case class TopKPerGroupExec(
    group: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** All rows of a group in one partition — the planner inserts (or
    * reuses) the hash exchange, same as for a hash aggregate. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(group) :: Nil

  /** Rows never move (partition-local heaps), so the child's
    * group-clustered partitioning survives — a downstream operator
    * keyed on the same group (e.g. a rank window over the reduced
    * rows) plans zero additional exchanges. */
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprs = group
    val sortOrders = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      val rowProj = UnsafeProjection.create(childOutput.map(a => a: Expression), childOutput)
      // ord orders rows into output order: ord.compare(a, b) < 0 means
      // a ranks before b. The heap is a MAX-heap under ord (reverse
      // comparator), so peek() is the worst row currently kept.
      val ord = RowOrdering.create(sortOrders, childOutput)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      while (iter.hasNext) {
        val r = iter.next()
        val row = rowProj(r) // projection buffer; copy before storing
        val key = keyProj(r)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](limit + 1, ord.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
