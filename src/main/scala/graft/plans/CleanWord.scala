package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Lower, RegExpReplace, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level worker for [[CleanWord]]: keep ASCII `[A-Za-z0-9]`
  * bytes, lowercase them, drop everything else — a single pass over
  * the UTF8String's bytes with no regex engine, no Unicode tables and
  * no intermediate lowered string.
  *
  * This is the REFERENCE's exact semantics
  * (/root/reference/1.cpp:60–68: per-byte `isalnum` + `tolower` in
  * the C locale), which the composed `lower` + `regexp_replace`
  * reproduces for all inputs whose Unicode lowercase stays ASCII
  * (everything in the test corpora). The two diverge only on exotica
  * like the Kelvin sign K (U+212A), where Unicode `lower` produces an
  * ASCII 'k' the reference would have stripped — the native
  * expression sides with the reference.
  *
  * Defined as a standalone object with no companion class so the
  * compiler emits a static forwarder — generated Java calls
  * `graft.plans.CleanWordUtil.clean(...)` directly.
  */
object CleanWordUtil {
  def clean(s: UTF8String): UTF8String = {
    val in = s.getBytes
    val out = new Array[Byte](in.length)
    var n = 0
    var changed = false
    var i = 0
    while (i < in.length) {
      val b = in(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        out(n) = b; n += 1
      } else if (b >= 'A' && b <= 'Z') {
        out(n) = (b + 32).toByte; n += 1; changed = true
      } else {
        changed = true
      }
      i += 1
    }
    if (!changed) s else UTF8String.fromBytes(java.util.Arrays.copyOf(out, n))
  }
}

/** Native Catalyst expression for the reference's `clean_word`
  * (SURVEY §7.2 step 6): replaces the `RegExpReplace(Lower(x), …)`
  * pair with one codegen'd byte loop. Stays inside whole-stage
  * codegen (doGenCode emits a direct static call), so the hot path
  * of the flagship word count runs regex-free.
  */
case class CleanWord(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"clean_word requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "clean_word"

  override protected def nullSafeEval(input: Any): Any =
    CleanWordUtil.clean(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CleanWordUtil.clean($c)")

  override protected def withNewChildInternal(newChild: Expression): CleanWord =
    copy(child = newChild)
}

/** Optimizer rule: rewrite the declarative spelling
  * `regexp_replace(lower(x), "[^a-z0-9]", "")` into [[CleanWord]].
  * Operator modules keep the portable built-in composition; sessions
  * that enable [[GraftExtensions]] get the native expression
  * transparently.
  */
object CleanWordRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case RegExpReplace(Lower(child), Literal(pat: UTF8String, StringType),
          Literal(rep: UTF8String, StringType), _)
          if pat.toString == "[^a-z0-9]" && rep.toString.isEmpty =>
        CleanWord(child)
    }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) wires the engine's custom
  * rules and functions into a session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => CleanWordRewrite)
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("topk_counts"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[TopKCounts].getName, "topk_counts"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TopKCounts(args(0), args(1), args(2))))
  }
}
