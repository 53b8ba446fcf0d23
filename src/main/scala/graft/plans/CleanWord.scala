package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Lower, RegExpReplace, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Worker for [[CleanWord]]. Semantics are EXACTLY
  * `regexp_replace(lower(x), "[^a-z0-9]", "")` — the rewrite must be
  * observationally invisible on every input, or the optimizer would
  * silently change query results (e.g. Turkish "İstanbul": Unicode
  * lowercase emits an ASCII 'i' that a bytes-first clean would have
  * dropped). So: Unicode lowercase via `UTF8String.toLowerCase`
  * (the same call Spark's `Lower` makes), then one byte pass keeping
  * `[a-z0-9]`. Dropping single bytes equals dropping chars for the
  * regex class because every kept byte is ASCII and every byte of a
  * multi-byte char is ≥ 0x80. No regex engine runs; for all-ASCII
  * inputs (the common case) `toLowerCase` is itself a cheap byte
  * loop. Matches the reference's byte-level clean
  * (/root/reference/1.cpp:60–68) on ASCII, where the two definitions
  * coincide.
  *
  * Defined as a standalone object with no companion class so the
  * compiler emits a static forwarder — generated Java calls
  * `graft.plans.CleanWordUtil.clean(...)` directly.
  */
object CleanWordUtil {
  def clean(s: UTF8String): UTF8String = {
    val lowered = s.toLowerCase
    val in = lowered.getBytes
    val out = new Array[Byte](in.length)
    var n = 0
    var i = 0
    while (i < in.length) {
      val b = in(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        out(n) = b; n += 1
      }
      i += 1
    }
    if (n == in.length) lowered
    else UTF8String.fromBytes(java.util.Arrays.copyOf(out, n))
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
    // whole-operator extension: logical node + strategy + physical
    // bounded-heap top-k per group ([[TopKPerGroup]]), plus the
    // opt-in idiom rewrite that plans it from plain window SQL
    ext.injectPlannerStrategy(_ => TopKPerGroupStrategy)
    ext.injectOptimizerRule(_ => TopKRewrite)
    // whole-operator extension #2: single-pass gap sessionization
    // over sorted input ([[SessionAgg]]) — no window buffers, no
    // (user, session) hash table
    ext.injectPlannerStrategy(_ => SessionAggStrategy)
    // clean_word is normally produced by the rewrite rule above, but
    // register it by name too so a SQL-text user can call it directly.
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("clean_word"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CleanWord].getName, "clean_word"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CleanWord(args(0))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("topk_counts"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[TopKCounts].getName, "topk_counts"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TopKCounts(args(0), args(1), args(2))))
    // Mergeable frequent-items sketch over raw (unaggregated) rows.
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("misra_gries"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[MisraGries].getName, "misra_gries"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MisraGries(args(0), args(1), args(2))))
    // Native signature expressions for the dedup / ANN operators
    // ([[TextHashes]]); invoked by name via functions.call_function.
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("char_gram_hashes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CharGramHashes].getName, "char_gram_hashes"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CharGramHashes(args(0))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("simhash48"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SimHash48].getName, "simhash48"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash48(args(0))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("hyperplane_buckets"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[HyperplaneBuckets].getName, "hyperplane_buckets"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HyperplaneBuckets(args(0))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_sigs"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[MinHashSigs].getName, "minhash_sigs"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashSigs(args(0), args(1))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("dot_double"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotDouble].getName, "dot_double"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotDouble(args(0), args(1))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("poly_hash"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[PolyHash].getName, "poly_hash"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PolyHash(args(0))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("deletion_hashes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DeletionHashes].getName, "deletion_hashes"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DeletionHashes(args(0))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("deletion_hashes2"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DeletionHashes2].getName, "deletion_hashes2"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DeletionHashes2(args(0))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("jaccard_long"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[JaccardLong].getName, "jaccard_long"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        JaccardLong(args(0), args(1))))
    // Unicode NFC canonical composition, named after DuckDB's
    // identical built-in so oracles replay it verbatim
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("nfc_normalize"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        NfcNormalize(args(0))))
    // Jaro-Winkler name similarity, pinned to DuckDB's built-in
    // semantics ([[JaroWinklerUtil]])
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("jaro_winkler_similarity"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[JaroWinklerSim].getName, "jaro_winkler_similarity"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        JaroWinklerSim(args(0), args(1))))
    // binary-column media hash ([[MediaHashes]])
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("ppm_dhash"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[PpmDhash].getName, "ppm_dhash"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PpmDhash(args(0))))
    // deterministic mergeable summaries ([[Sketches]]): KMV distinct,
    // Count-Min frequencies, Bloom membership — oracle-replayable
    // sketch VALUES, O(1)-per-partition shuffle state
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("min_k_hashes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[MinKHashes].getName, "min_k_hashes"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinKHashes(args(0), args(1))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("count_min"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CountMinSketch].getName, "count_min"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CountMinSketch(args(0), args(1), args(2), args(3))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("bloom_agg"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[BloomAgg].getName, "bloom_agg"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BloomAgg(args(0), args(1), args(2))))
  }
}
