package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native media-hash expressions — the binary-column siblings of the
  * text signatures in [[TextHashes]]. Keeping the hash a Catalyst
  * expression (not a mapPartitions lambda) keeps the whole
  * scan → synthesize → hash → aggregate pipeline inside one
  * WholeStageCodegen span and spares the Dataset encoder round-trip
  * the lambda spelling pays per row. */
object MediaHashes {
  /** 42-bit PPM difference hash of a P6 binary (see [[PpmDhashUtil]]). */
  def ppmDhash(c: Column): Column = call_function("ppm_dhash", c)
}

/** Worker for [[PpmDhash]] — THE implementation of the difference
  * hash ([[graft.operators.Multimodal.PpmCodec.dhash]] delegates
  * here, so interpreted, codegen'd, and spec-reference spellings are
  * one function). Gray is the exact integer r+g+b (no luma rounding);
  * bit = "right neighbor brighter", folded row-major MSB-first —
  * (w−1)·h bits, 42 for the 8×6 fixture. Brightness shifts preserve
  * every comparison, so re-encoded copies of an image collide. */
object PpmDhashUtil {
  /** ASCII decimal after optional single-space/newline separators. */
  private def readInt(bytes: Array[Byte], from: Int): (Int, Int) = {
    var i = from
    while (i < bytes.length && (bytes(i) == ' ' || bytes(i) == '\n')) i += 1
    var v = 0
    val start = i
    while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
      v = v * 10 + (bytes(i) - '0'); i += 1
    }
    require(i > start, s"PPM: expected integer at offset $from")
    (v, i)
  }

  def dhash(bytes: Array[Byte]): Long = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      "PPM: bad magic (want P6)")
    val (w, i1) = readInt(bytes, 2)
    val (h, i2) = readInt(bytes, i1)
    val (maxv, i3) = readInt(bytes, i2)
    require(maxv == 255, s"PPM: unsupported maxval $maxv")
    val body = i3 + 1
    require(bytes.length >= body + w * h * 3,
      s"PPM: truncated payload (${bytes.length - body} of ${w * h * 3} bytes)")
    require((w - 1) * h <= 63, s"PPM: dhash needs (w-1)*h <= 63, got ${w}x$h")
    var acc = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w - 1) {
        val i0 = body + 3 * (y * w + x)
        val g0 = (bytes(i0) & 0xff) + (bytes(i0 + 1) & 0xff) + (bytes(i0 + 2) & 0xff)
        val g1 = (bytes(i0 + 3) & 0xff) + (bytes(i0 + 4) & 0xff) + (bytes(i0 + 5) & 0xff)
        acc = acc * 2 + (if (g1 > g0) 1L else 0L)
        x += 1
      }
      y += 1
    }
    acc
  }
}

/** `ppm_dhash(binary) -> bigint` — codegen'd perceptual hash. */
case class PpmDhash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"ppm_dhash requires binary, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "ppm_dhash"

  override protected def nullSafeEval(bytes: Any): Any =
    PpmDhashUtil.dhash(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PpmDhashUtil.dhash($c)")

  override protected def withNewChildInternal(newChild: Expression): PpmDhash =
    copy(child = newChild)
}
