package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.bridge

/** Deflate-compression ratio of a document — the Gopher repetition
  * signal: heavily repeated content (boilerplate loops, keyword stuffing,
  * scraper echo) compresses far below fluent prose, and the ratio catches
  * repetition structures that n-gram ratios miss (long-period repeats,
  * interleaved templates).
  *
  * Per-row, zero shuffle; the Deflater is thread-local (reset per call,
  * never reallocated) so the amortized cost is the deflate pass itself.
  * Deterministic for a fixed zlib: level pinned to BEST_SPEED, raw
  * (nowrap) stream. Engine-internal arithmetic → rows-only gate; value
  * behavior is spec-pinned (repetitive ≪ diverse, ratio bounds).
  */
object Compress {

  private val deflaters: ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial(() =>
      new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED, true))

  def deflatedLen(bytes: Array[Byte]): Int = {
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** compressed_bytes / raw_bytes of the UTF-8 encoding; empty → 1.0.
    * (Can exceed 1.0 for tiny/incompressible inputs — deflate framing.)
    */
  def ratio(s: UTF8String): Double = {
    val b = s.getBytes
    if (b.length == 0) 1.0 else deflatedLen(b).toDouble / b.length
  }
}

case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(Compress.ratio(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Compress.ratio($c);")

  override protected def withNewChildInternal(c: Expression): DeflateRatio =
    copy(child = c)
  override def prettyName: String = "deflate_ratio"
}

object compress {
  def deflate_ratio(text: Column): Column =
    bridge.column(DeflateRatio(bridge.expression(text)))
}
