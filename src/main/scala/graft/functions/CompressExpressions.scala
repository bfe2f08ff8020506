package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deflate compression ratio of a string — the classic repetitiveness /
  * boilerplate signal large-scale curation pipelines gate on (used in
  * Gopher's and FineWeb's quality heuristics): templated or repetitive
  * text compresses far below natural prose, so a LOW ratio flags
  * low-information documents and a ratio near (or above) 1 flags
  * high-entropy noise (base64 blobs, minified code).
  *
  * ratio = deflate(utf8(text)).length / utf8(text).length, level 6,
  * raw deflate (nowrap — no zlib header, so tiny inputs aren't dominated
  * by framing). Empty input → 1.0 by definition. Deterministic for a
  * given JDK (the bundled zlib); spec-pinned against a direct Deflater
  * replay. Codegen'd via a static helper call — the expression stays
  * inside whole-stage codegen like every other graft kernel. */
case class DeflateRatioExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "deflate_ratio"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    CompressExpressions.deflateRatio(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CompressExpressions.deflateRatio($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CompressExpressions {

  /** Static kernel shared by eval and codegen. Level 6 (zlib default),
    * nowrap. A fresh Deflater per call keeps this thread-safe under
    * whole-stage codegen; the allocation is dwarfed by the deflate
    * itself on document-sized inputs. */
  def deflateRatio(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.length == 0) return 1.0
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](1024)
      var compressed = 0L
      while (!d.finished()) compressed += d.deflate(buf)
      compressed.toDouble / raw.length
    } finally d.end()
  }

  /** Column wrapper. */
  def deflateRatio(text: Column): Column =
    ExpressionUtils.column(DeflateRatioExpr(ExpressionUtils.expression(text)))
}
